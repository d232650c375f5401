"""Encode bench-harness variants: the stage profiler measures 23.1 ms/shard
(vmap(8), one tile) but bench.py reports ~30.6 (lax.map of 8 x vmap(8) over
64 tiled shards). Where do ~4.7 ms/shard go, and what does K=24 buy?"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHARD = 1 << 18
N_SHARDS = 8


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


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.format.deflate import encode_shard
    from bench import build_corpus

    corpus = build_corpus(SHARD * N_SHARDS)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr, flush=True)
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)
    try:
        with _alarm(240):
            _ = int(np.asarray(jnp.sum(dbatch.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize wedged", file=sys.stderr, flush=True)
    print("# uploaded", file=sys.stderr, flush=True)

    def make(tile, vw, K):
        total = tile * N_SHARDS

        def fn(batch, salt):
            tiles = jnp.tile(batch, (tile, 1))
            tiles = tiles.at[:, 0].set(
                salt + jnp.arange(tiles.shape[0], dtype=jnp.uint8))

            def one(row, fin):
                r = encode_shard(row, jnp.int32(SHARD), fin,
                                 num_candidates=K)
                return (r["total_bits"],
                        jnp.sum(r["words"], dtype=jnp.uint32))
            fins = jnp.zeros((tile, N_SHARDS), jnp.bool_).at[:, -1].set(
                True).reshape(-1)
            bits, fps = jax.lax.map(
                lambda ab: jax.vmap(one)(*ab),
                (tiles.reshape(total // vw, vw, SHARD),
                 fins.reshape(total // vw, vw)))
            return bits.reshape(-1), fps.reshape(-1)
        return fn, total

    def null8(batch, salt):
        tiles = jnp.tile(batch, (8, 1))
        tiles = tiles.at[:, 0].set(
            salt + jnp.arange(tiles.shape[0], dtype=jnp.uint8))
        return jnp.sum(tiles, dtype=jnp.uint32), jnp.uint32(0)

    configs = [("t8_v8", make(8, 8, 32)),
               ("t8_v8b", make(8, 8, 32)),
               ("t4_v8", make(4, 8, 32)),
               ("t4_v8b", make(4, 8, 32)),
               ("t2_v8", make(2, 8, 32)),
               ("t1_v8", make(1, 8, 32)),
               ("t16_v8", make(16, 8, 32))]
    for name, (fn, total) in configs:
        try:
            t0 = time.perf_counter()
            ex = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(dbatch.shape, jnp.uint8),
                jax.ShapeDtypeStruct((), jnp.uint8)).compile()
            ct = time.perf_counter() - t0
            best = None
            for rep in range(3):
                try:
                    with _alarm(240):
                        t0 = time.perf_counter()
                        out = ex(dbatch, jnp.uint8(rep * 17 + 3))
                        _ = np.asarray(out[1]).sum()
                        dt = time.perf_counter() - t0
                except TimeoutError:
                    print(f"#   {name} rep {rep} wedged", flush=True)
                    continue
                best = dt if best is None else min(best, dt)
                if rep >= 1:
                    break
            if best is None:
                print(f"{name:12s} WEDGED", flush=True)
                continue
            mbps = total * SHARD / best / 1e6
            print(f"{name:12s} {best*1000:8.1f} ms ({best*1000/total:5.2f} "
                  f"ms/shard, {mbps:6.2f} MB/s) compile {ct:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
