"""Bisect the compact-tail chase cost at S=8M: which piece of
compact_finish costs ~400 ms on TPU when theory says ~120?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from deflate_compression_tpu.core import scans as _scans  # noqa: E402

S = 1 << 23
CAP = S // 8
TAGB = 24
_TAG = np.uint32(1) << np.uint32(TAGB)
_ADDR = np.uint32((1 << TAGB) - 1)


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


def mkfn(stage):
    @jax.jit
    def fn(v2, salt):
        v2 = v2 ^ (salt & np.uint32(1))          # cache-defeat, tags intact
        j_idx = jnp.arange(S, dtype=jnp.int32)
        t2 = (v2 & _TAG) != 0
        if stage == "round1":
            hop = v2[jnp.clip((v2 & _ADDR).astype(jnp.int32), 0, S - 1)]
            return jnp.sum(jnp.where(t2, hop, v2), dtype=jnp.uint32)
        t2i = t2.astype(jnp.int32)
        rank = _scans.cumsum(t2i) - t2i
        if stage == "cumsum":
            return jnp.sum(rank, dtype=jnp.int32)
        slot = jnp.where(t2 & (rank < CAP), rank, CAP + 1)
        rows = jnp.stack([j_idx, (v2 & _ADDR).astype(jnp.int32)], axis=1)
        carr = jnp.full((CAP + 1, 2), S, jnp.int32).at[slot].set(
            rows, mode="drop")[:CAP]
        if stage == "extract":
            return jnp.sum(carr, dtype=jnp.int32)
        c_pos = carr[:, 0]
        c_addr = jnp.clip(carr[:, 1], 0, S - 1)
        live = c_pos < S
        pos2slot = jnp.zeros((S + 1,), jnp.int32).at[
            jnp.where(live, c_pos, S + 1)].set(
            jnp.arange(CAP, dtype=jnp.int32), mode="drop")[:S]
        tv = v2[c_addr]
        tslot = pos2slot[c_addr]
        ctag = live & ((tv & _TAG) != 0)
        cv0 = jnp.where(ctag, _TAG | tslot.astype(jnp.uint32),
                        jnp.where(live, tv, np.uint32(0)))
        if stage == "init":
            return jnp.sum(cv0, dtype=jnp.uint32)
        cc_rounds = int(np.ceil(np.log2(max(CAP, 2)))) + 2

        def cc_cond(stc):
            cv, ch, rr = stc
            return ch & (rr < cc_rounds)

        def cc_body(stc):
            cv, ch, rr = stc
            tag = (cv & _TAG) != 0
            hop = cv[jnp.clip((cv & _ADDR).astype(jnp.int32), 0, CAP - 1)]
            cvn = jnp.where(tag, hop, cv)
            return cvn, jnp.any((cvn & _TAG) != 0), rr + 1

        cv, cunc, nr = jax.lax.while_loop(
            cc_cond, cc_body, (cv0, jnp.any((cv0 & _TAG) != 0),
                               jnp.int32(0)))
        if stage == "ccrounds":
            return jnp.sum(cv, dtype=jnp.uint32) + nr.astype(jnp.uint32)
        vout = v2.at[jnp.where(live, c_pos, S)].set(cv, mode="drop")
        return jnp.sum(vout, dtype=jnp.uint32) + nr.astype(jnp.uint32)
    return fn


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    # synthetic post-3-rounds state: 8% tagged, chains of depth <= 4 in
    # compact space (tagged entries point at earlier positions; ~75% of
    # targets untagged)
    v = rng.integers(0, 255, S, dtype=np.uint32)
    tagged_idx = np.sort(rng.choice(S, S // 12, replace=False))
    tgt = np.maximum(tagged_idx - rng.integers(1, 30000, len(tagged_idx)), 0)
    v[tagged_idx] = _TAG | tgt.astype(np.uint32)
    dv = jax.device_put(jnp.asarray(v), dev)
    jax.block_until_ready(dv)
    print("# materialized", flush=True)
    for stage in ["round1", "cumsum", "extract", "init", "ccrounds", "full",
                  "round1b", "ccroundsb"]:
        fn = mkfn(stage.rstrip("b"))
        best = None
        for rep in range(2):
            try:
                with _alarm(240):
                    t0 = time.perf_counter()
                    out = int(np.asarray(fn(dv, jnp.uint32(rep))))
                    dt = time.perf_counter() - t0
            except TimeoutError:
                print(f"# {stage} wedged", flush=True)
                continue
            best = dt if best is None else min(best, dt)
        print(f"{stage:10s} {best*1000:8.1f} ms  ({out})", flush=True)


if __name__ == "__main__":
    main()


def mkrounds(n, checked):
    @jax.jit
    def fn(v2, salt):
        v2 = v2 ^ (salt & np.uint32(1))

        def body(v):
            tag = (v & _TAG) != 0
            hop = v[jnp.clip((v & _ADDR).astype(jnp.int32), 0, S - 1)]
            return jnp.where(tag, hop, v)

        if checked:
            def cbody(st):
                v, ch, rr = st
                vn = body(v)
                return vn, jnp.any((vn & _TAG) != 0), rr + 1
            v, _, _ = jax.lax.while_loop(
                lambda st: st[1] & (st[2] < n), cbody,
                (v2, jnp.any((v2 & _TAG) != 0), jnp.int32(0)))
        else:
            v = jax.lax.fori_loop(0, n, lambda i, v: body(v), v2)
        return jnp.sum(v, dtype=jnp.uint32)
    return fn


def main2():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    v = rng.integers(0, 255, S, dtype=np.uint32)
    tagged_idx = np.sort(rng.choice(S, S // 3, replace=False))
    tgt = np.maximum(tagged_idx - rng.integers(1, 30000, len(tagged_idx)), 0)
    v[tagged_idx] = _TAG | tgt.astype(np.uint32)
    dv = jax.device_put(jnp.asarray(v), dev)
    jax.block_until_ready(dv)
    print("# materialized (1/3 tagged)", flush=True)
    for name, fn in [("fix5", mkrounds(5, False)),
                     ("chk5", mkrounds(5, True)),
                     ("fix5b", mkrounds(5, False)),
                     ("chk5b", mkrounds(5, True)),
                     ("fix1", mkrounds(1, False))]:
        best = None
        for rep in range(2):
            with _alarm(240):
                t0 = time.perf_counter()
                out = int(np.asarray(fn(dv, jnp.uint32(rep))))
                dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:8s} {best*1000:8.1f} ms ({out})", flush=True)
