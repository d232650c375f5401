"""Round-5 probe: greedy_parse phase A/B/C split (_pstop stops) and
chunk/scan_batch configs. Findings: A+C are at their descriptor floor;
B is free once tile-lockstep; chunk size is flat.
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
SHARD = 1 << 18
N_SHARDS = 8

def _alarm(seconds):
    import signal
    class _G:
        def __enter__(self):
            signal.signal(signal.SIGALRM, lambda s,f:(_ for _ in ()).throw(TimeoutError()))
            signal.alarm(seconds)
        def __exit__(self,*a):
            signal.alarm(0); return False
    return _G()

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.core import lz77
    from bench import build_corpus
    corpus = build_corpus(SHARD * N_SHARDS)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)
    dev = jax.devices()[0]
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)
    try:
        with _alarm(240):
            _ = int(np.asarray(jnp.sum(dbatch.astype(jnp.uint32))))
    except TimeoutError:
        pass
    print("# uploaded", flush=True)

    def make(ck, sb, stop=""):
        def fn(batch, salt):
            batch = batch.at[0, 0].set(salt)
            def one(row):
                t = lz77.tokenize(row, jnp.int32(SHARD), _stop=stop,
                                  parse_chunk=ck, parse_scan_batch=sb)
                return jnp.sum(t["length"] + t["dist"]
                               + t["chosen"].astype(jnp.int32), dtype=jnp.int32)
            return jax.vmap(one)(batch)
        return fn

    cfgs = [("full64", make(64, 8)),
            ("full32", make(32, 8)),
            ("full16", make(16, 8)),
            ("full128", make(128, 8)),
            ("full64x", make(64, 8)),
            ("full32x", make(32, 8))]
    for name, fn in cfgs:
        ex = jax.jit(fn).lower(jax.ShapeDtypeStruct(dbatch.shape, jnp.uint8),
                               jax.ShapeDtypeStruct((), jnp.uint8)).compile()
        best = None; v = None
        for rep in range(3):
            try:
                with _alarm(240):
                    t0 = time.perf_counter()
                    v = int(np.asarray(fn and ex(dbatch, jnp.uint8(rep*7+1))).sum())
                    dt = time.perf_counter() - t0
            except TimeoutError:
                continue
            best = dt if best is None else min(best, dt)
            if rep >= 1: break
        print(f"{name:10s} {best*1000:8.1f} ms ({best*1000/8:5.2f} ms/shard) [{v}]", flush=True)

main()
