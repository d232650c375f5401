"""Round-5 decode probe: can a FUSED dense one-hot reduce replace the symbol
loop's per-step merged-LUT gathers? (VERDICT r4 next #1 — the MXU/VPU trick.)

The symbol loop does, per decoded symbol, one gather of NL elements per
alphabet from a (NB, 2^11) LUT (lane l reads LUT[blk[l], peek[l]]). Gathers
run at ~100-200M elem/s (descriptor-bound). The dense alternative groups
lanes so a group shares one LUT row and computes
    out[g, l] = sum_r where(peek[g, l] == r, LUT[g, r], 0)
— a broadcast-compare-select-reduce that XLA fuses into one pass: VPU/HBM
bound instead of descriptor-bound. Also probes:
  * row-gather width (2-wide vs 4-wide rows — is descriptor cost per ROW?)
  * a bf16 one-hot matmul via dot_general (expected dead in XLA: the one-hot
    operand materializes in HBM)

Shapes mirror the flat-batch decoder: NL = 131072 lanes (256 groups x 512),
R = 2048 (lut_bits=11), 24 loop steps, TWO lookups per step (ll + dist).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

G = 256          # lane groups (blocks)
L = 512          # lanes per group
R = 1 << 11      # LUT entries per group
NL = G * L
ITERS = 24


def _alarm(seconds):
    import signal

    class _G:
        def __enter__(self):
            signal.signal(signal.SIGALRM,
                          lambda s, f: (_ for _ in ()).throw(TimeoutError()))
            signal.alarm(seconds)

        def __exit__(self, *a):
            signal.alarm(0)
            return False
    return _G()


def _step_state(salt):
    pk = ((jnp.arange(NL, dtype=jnp.uint32) * np.uint32(2654435761))
          >> np.uint32(16)).astype(jnp.int32)
    pk = (pk + salt.astype(jnp.int32)) & (R - 1)
    return pk.reshape(G, L)


@jax.jit
def run_null(tbl, salt):
    pk0 = _step_state(salt)

    def body(st):
        pk, acc, it = st
        a = (pk * 5 + 1) & (R - 1)
        b = (a * 7 + 3) & (R - 1)
        return b, acc + jnp.sum(a), it + 1

    _, acc, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                   (pk0, jnp.int32(0), jnp.int32(0)))
    return acc


@jax.jit
def run_gather(tbl, salt):
    tblf = tbl.reshape(-1)
    gbase = jnp.repeat(jnp.arange(G, dtype=jnp.int32) * R, L).reshape(G, L)
    pk0 = _step_state(salt)

    def body(st):
        pk, acc, it = st
        a = tblf[(gbase + pk).reshape(-1)].reshape(G, L)       # ll lookup
        pk2 = (pk + a) & (R - 1)
        b = tblf[(gbase + pk2).reshape(-1)].reshape(G, L)      # dist lookup
        return (pk2 * 7 + 3) & (R - 1), acc + jnp.sum(b), it + 1

    _, acc, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                   (pk0, jnp.int32(0), jnp.int32(0)))
    return acc


@jax.jit
def run_dense(tbl, salt):
    riota = jnp.arange(R, dtype=jnp.int32)
    pk0 = _step_state(salt)

    def lookup(pk):
        # (G, L, R) fused compare-select-reduce; LUT row broadcast per group
        return jnp.sum(jnp.where(pk[:, :, None] == riota[None, None, :],
                                 tbl[:, None, :], 0), axis=2)

    def body(st):
        pk, acc, it = st
        a = lookup(pk)
        pk2 = (pk + a) & (R - 1)
        b = lookup(pk2)
        return (pk2 * 7 + 3) & (R - 1), acc + jnp.sum(b), it + 1

    _, acc, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                   (pk0, jnp.int32(0), jnp.int32(0)))
    return acc


@jax.jit
def run_dense_dot(tbl, salt):
    # one-hot bf16 matmul on the MXU: onehot (G, L, R) @ tbl (G, R, 1).
    # Expected dead in XLA (onehot materializes in HBM) — measured to close
    # the VERDICT question about the MXU route definitively.
    riota = jnp.arange(R, dtype=jnp.int32)
    tbl16 = (tbl & 0x3FFF).astype(jnp.bfloat16)[:, :, None]
    pk0 = _step_state(salt)

    def lookup(pk):
        oh = (pk[:, :, None] == riota[None, None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(oh, tbl16, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        return out[:, :, 0].astype(jnp.int32)

    def body(st):
        pk, acc, it = st
        a = lookup(pk)
        pk2 = (pk + a) & (R - 1)
        b = lookup(pk2)
        return (pk2 * 7 + 3) & (R - 1), acc + jnp.sum(b), it + 1

    _, acc, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                   (pk0, jnp.int32(0), jnp.int32(0)))
    return acc


def make_rowgather(width):
    @jax.jit
    def run(rows, salt):
        H = rows.shape[0]
        pk0 = _step_state(salt).reshape(-1)

        def body(st):
            pk, acc, it = st
            r = rows[jnp.clip(pk * 13 & (H - 1), 0, H - 1)]   # (NL, width)
            s = jnp.sum(r.astype(jnp.int32), axis=1)
            return (pk + s) & (R - 1), acc + jnp.sum(s), it + 1

        _, acc, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                       (pk0, jnp.int32(0), jnp.int32(0)))
        return acc
    return run


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    tbl = jax.device_put(jnp.asarray(
        rng.integers(0, 127, (G, R), dtype=np.int32)), dev)
    H = 1 << 20
    rows2 = jax.device_put(jnp.asarray(
        rng.integers(0, 100, (H, 2), dtype=np.uint32).astype(np.uint32)), dev)
    rows4 = jax.device_put(jnp.asarray(
        rng.integers(0, 100, (H, 4), dtype=np.uint32).astype(np.uint32)), dev)
    jax.block_until_ready((tbl, rows2, rows4))
    print("# materialized", flush=True)

    runs = [("null", run_null, tbl), ("gather", run_gather, tbl),
            ("dense", run_dense, tbl), ("dense_dot", run_dense_dot, tbl),
            ("row2", make_rowgather(2), rows2),
            ("row4", make_rowgather(4), rows4)]
    results = {}
    for name, fn, arg in runs + [(n + "@2", f, a) for n, f, a in runs]:
        best = None
        v = None
        for rep in range(3):
            try:
                with _alarm(240):
                    t0 = time.perf_counter()
                    v = int(np.asarray(fn(arg, jnp.int32(rep * 17 + 1))))
                    dt = time.perf_counter() - t0
            except TimeoutError:
                print(f"#  {name} rep {rep} wedged", flush=True)
                continue
            best = dt if best is None else min(best, dt)
            if rep >= 1:
                break
        if best is None:
            print(f"{name:10s} WEDGED", flush=True)
            continue
        results[name.split("@")[0]] = best
        print(f"{name:10s} {best*1000:8.1f} ms total, "
              f"{best/ITERS*1e6:7.1f} us/iter  ({v})", flush=True)
    if "null" in results and "gather" in results:
        g = results["gather"] - results["null"]
        d = results.get("dense", 0) - results["null"]
        print(f"# per-lookup: gather {g/ITERS/2*1e6:.1f} us, "
              f"dense {d/ITERS/2*1e6:.1f} us "
              f"(NL={NL}, R={R})", flush=True)


if __name__ == "__main__":
    main()
