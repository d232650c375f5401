"""Round-4 encode stage split, null-corrected.

The ~48 ms tunnel dispatch floor (tools/profile_decode dec_null) sat inside
every round-3 stage measurement; this re-measures the big pipeline pieces
with the floor measured alongside:
  null       — dispatch floor (touch inputs, no work)
  matches    — lz77.find_matches only
  tokenize   — find_matches + run detect + chain ext + lazy + parse
  encode     — full encode_shard
All vmap(8) over the 2 MB bench corpus, salted, min of 2 reps.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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


SHARD = 1 << 18
N_SHARDS = 8


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.core import lz77
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
        print("# materialize wedged; continuing", file=sys.stderr, flush=True)
    print("# uploaded", file=sys.stderr, flush=True)

    def st_null(batch, salt):
        batch = batch.at[0, 0].set(salt)
        return jnp.sum(batch, dtype=jnp.uint32)

    def st_matches(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            ln, d = lz77.find_matches(row, 32, 8)
            return jnp.sum(ln + d, dtype=jnp.int32)
        return jax.vmap(one)(batch)

    def make_stop(stop):
        def fn(batch, salt):
            batch = batch.at[0, 0].set(salt)

            def one(row):
                ln, d = lz77.find_matches(row, 32, 8, _stop=stop)
                return jnp.sum(ln + d, dtype=jnp.int32)
            return jax.vmap(one)(batch)
        return fn

    def make_tstop(stop):
        def fn(batch, salt):
            batch = batch.at[0, 0].set(salt)

            def one(row):
                t = lz77.tokenize(row, jnp.int32(SHARD), _stop=stop)
                return jnp.sum(t["length"] + t["dist"]
                               + t["chosen"].astype(jnp.int32),
                               dtype=jnp.int32)
            return jax.vmap(one)(batch)
        return fn

    def st_tokenize(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            t = lz77.tokenize(row, jnp.int32(SHARD))
            return jnp.sum(t["length"] + t["dist"]
                           + t["chosen"].astype(jnp.int32), dtype=jnp.int32)
        return jax.vmap(one)(batch)

    def st_encode(batch, salt):
        # NOTE: returns only total_bits — XLA dead-code-eliminates the
        # bit-pack (total_bits comes from the layout scan, not the
        # scatters). Kept as the "encode minus serialization" stage.
        batch = batch.at[0, 0].set(salt)

        def one(row, fin):
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return r["total_bits"]
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.vmap(one)(batch, fins)

    def st_encode_fp(batch, salt):
        # words fingerprint FORCES the pack: the honest full-encode stage
        batch = batch.at[0, 0].set(salt)

        def one(row, fin):
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return r["total_bits"] + jnp.sum(
                r["words"], dtype=jnp.uint32).astype(jnp.int32)
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.vmap(one)(batch, fins)

    for name, fn in [("null", st_null), ("null2", st_null),
                     ("m_sort", make_stop("sort")),
                     ("m_gather", make_stop("gather")),
                     ("m_presel", make_stop("preselect")),
                     ("matches", st_matches),
                     ("t_rundet", make_tstop("rundet")),
                     ("t_chainext", make_tstop("chainext")),
                     ("t_lazy", make_tstop("lazy")),
                     ("tokenize", st_tokenize),
                     ("encode", st_encode), ("encode2", st_encode),
                     ("encode_fp", st_encode_fp),
                     ("encode_fp2", st_encode_fp)]:
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
                        _ = np.asarray(out).sum()
                        dt = time.perf_counter() - t0
                except TimeoutError:
                    print(f"#   {name} rep {rep} wedged", file=sys.stderr,
                          flush=True)
                    continue
                best = dt if best is None else min(best, dt)
                if rep >= 1 and best is not None:
                    break
            if best is None:
                print(f"{name:10s} WEDGED", flush=True)
                continue
            print(f"{name:10s} {best*1000:8.1f} ms "
                  f"({best*1000/N_SHARDS:6.1f} ms/shard) compile {ct:.0f}s",
                  flush=True)
        except Exception as e:  # noqa
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
