"""Is a vmapped (batched) gather inside a while_loop slower than the same
work as ONE flat gather? Decides whether decode_blocks should fold the
shard batch into flat arrays instead of being vmapped (bench dec_all).

Shapes mirror the decoder's symbol loop: B=8 shards x 4096 lanes, tables
(B, 16K) vs flat (B*16K), 32 loop iterations, 3 gathers + 1 scatter per
iteration.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
LANES = 4096
TBL = 1 << 14
S = 1 << 18
ITERS = 32


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


@jax.jit
def run_vmapped(tbl, tok, salt):
    def one(tbl1, tok1, seed):
        bp0 = (jnp.arange(LANES, dtype=jnp.int32) * 7 + seed) % TBL

        def body(st):
            bp, tok1, it = st
            a = tbl1[jnp.clip(bp, 0, TBL - 1)]
            b = tbl1[jnp.clip((bp + a) % TBL, 0, TBL - 1)]
            c = tbl1[jnp.clip((bp + b) % TBL, 0, TBL - 1)]
            slot = jnp.clip((bp + c) % S, 0, S)
            tok1 = tok1.at[slot].set(a + b + c, mode="drop")
            return (bp + 1) % TBL, tok1, it + 1

        bp, tok1, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                         (bp0, tok1, jnp.int32(0)))
        return jnp.sum(bp) + jnp.sum(tok1[::4096])
    seeds = jnp.arange(B, dtype=jnp.int32) + salt.astype(jnp.int32)
    return jax.vmap(one)(tbl, tok, seeds)


@jax.jit
def run_flat(tbl, tok, salt):
    # identical work, single flat lane set (B*LANES) over flat tables
    FT = B * TBL
    base = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * TBL, LANES)
    tblf = tbl.reshape(-1)
    tokf = tok.reshape(-1)
    SF = B * S
    bp0 = (jnp.arange(B * LANES, dtype=jnp.int32) * 7
           + salt.astype(jnp.int32)) % TBL

    def body(st):
        bp, tokf, it = st
        a = tblf[jnp.clip(base + bp, 0, FT - 1)]
        b = tblf[jnp.clip(base + (bp + a) % TBL, 0, FT - 1)]
        c = tblf[jnp.clip(base + (bp + b) % TBL, 0, FT - 1)]
        sbase = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * S, LANES)
        slot = jnp.clip(sbase + (bp + c) % S, 0, SF)
        tokf = tokf.at[slot].set(a + b + c, mode="drop")
        return (bp + 1) % TBL, tokf, it + 1

    bp, tokf, _ = jax.lax.while_loop(lambda st: st[2] < ITERS, body,
                                     (bp0, tokf, jnp.int32(0)))
    return jnp.sum(bp) + jnp.sum(tokf[::4096])


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    tbl = jax.device_put(jnp.asarray(
        rng.integers(0, TBL, (B, TBL), dtype=np.int32)), dev)
    tok = jax.device_put(jnp.zeros((B, S + 1), jnp.int32), dev)
    jax.block_until_ready((tbl, tok))
    print("# materialized", flush=True)
    for name, fn in [("vmapped", run_vmapped), ("flat", run_flat),
                     ("vmapped2", run_vmapped), ("flat2", run_flat)]:
        best = None
        for rep in range(3):
            try:
                with _alarm(240):
                    t0 = time.perf_counter()
                    v = np.asarray(fn(tbl, tok, jnp.int32(rep + 1))).sum()
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
        per_iter = best / ITERS * 1e3
        print(f"{name:10s} {best*1000:8.1f} ms total, {per_iter:6.2f} "
              f"ms/iter ({v})", flush=True)


if __name__ == "__main__":
    main()
