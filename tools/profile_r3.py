"""Round-3 stage profiler: where does the encode time go NOW (batched 8x)?

Runs on the real TPU through the axon tunnel: uploads the 2 MB bench corpus
once, then times a ladder of jitted stage-prefixes plus sort-primitive
alternatives, each salted to defeat execution-result caching. Prints a stage
table on stderr. Run alone — never concurrently with pytest or bench.
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

    n = SHARD * N_SHARDS
    corpus = build_corpus(n)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    t0 = time.perf_counter()
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)
    try:
        with _alarm(200):
            _ = int(np.asarray(jnp.sum(dbatch.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize wedged; continuing", file=sys.stderr)
    print(f"# upload {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    S = SHARD
    HM = np.uint32(2654435761)

    def hash16(row):
        d = row.astype(jnp.uint32)
        b1 = jnp.concatenate([d[1:], jnp.zeros((1,), jnp.uint32)])
        b2 = jnp.concatenate([d[2:], jnp.zeros((2,), jnp.uint32)])
        tri = d | (b1 << np.uint32(8)) | (b2 << np.uint32(16))
        return (tri * HM) >> np.uint32(32 - 16)

    def hash14(row):
        d = row.astype(jnp.uint32)
        b1 = jnp.concatenate([d[1:], jnp.zeros((1,), jnp.uint32)])
        b2 = jnp.concatenate([d[2:], jnp.zeros((2,), jnp.uint32)])
        tri = d | (b1 << np.uint32(8)) | (b2 << np.uint32(16))
        return (tri * HM) >> np.uint32(32 - 14)

    def stage_argsort(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            h = hash16(row)
            order = jnp.argsort(h, stable=True)
            return jnp.sum(order.astype(jnp.uint32))
        return jax.vmap(one)(batch)

    def stage_sortu32(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            h = hash14(row)
            key = (h << np.uint32(18)) | jnp.arange(S, dtype=jnp.uint32)
            ks = jnp.sort(key)
            return jnp.sum(ks)
        return jax.vmap(one)(batch)

    def stage_sort_payload(batch, salt):
        """argsort + the (S,9) payload row gather + back-scatter: the full
        'sort+permute' stage as find_matches uses it."""
        batch = batch.at[0, 0].set(salt)

        def one(row):
            h = hash16(row)
            w4 = lz77._words4(row)
            cols = [w4]
            for t in range(1, 9):
                cols.append(jnp.concatenate(
                    [w4[4 * t:], jnp.zeros((4 * t,), jnp.uint32)]))
            P = jnp.stack(cols, axis=1)
            order = jnp.argsort(h, stable=True)
            pr = P[order]
            return jnp.sum(pr) + jnp.sum(order.astype(jnp.uint32))
        return jax.vmap(one)(batch)

    def stage_find(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            ln, dist = lz77.find_matches(row, 32, 8)
            return jnp.sum(ln) + jnp.sum(dist)
        return jax.vmap(one)(batch)

    def stage_tokenize(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            tok = lz77.tokenize(row, jnp.int32(S))
            return (jnp.sum(tok["chosen"].astype(jnp.int32))
                    + jnp.sum(tok["length"]))
        return jax.vmap(one)(batch)

    def stage_encode(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row, fin):
            r = encode_shard(row, jnp.int32(S), fin)
            return r["total_bits"], jnp.sum(r["words"], dtype=jnp.uint32)
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.vmap(one)(batch, fins)

    stages = [
        ("argsort16(stable)", stage_argsort),
        ("sort_u32(h14|pos)", stage_sortu32),
        ("sort+payload", stage_sort_payload),
        ("find_matches", stage_find),
        ("tokenize", stage_tokenize),
        ("encode_shard", stage_encode),
    ]

    results = {}
    for name, fn in stages:
        try:
            t0 = time.perf_counter()
            ex = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(dbatch.shape, jnp.uint8),
                jax.ShapeDtypeStruct((), jnp.uint8)).compile()
            ct = time.perf_counter() - t0
            best = None
            for rep in range(2):
                with _alarm(150):
                    t0 = time.perf_counter()
                    out = ex(dbatch, jnp.uint8(rep * 37 + 1))
                    jax.tree_util.tree_map(
                        lambda x: np.asarray(x).sum(), out)
                    dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[name] = best
            print(f"{name:24s} {best*1000:8.1f} ms  "
                  f"({best*1000/N_SHARDS:6.1f} ms/shard)  compile {ct:.0f}s",
                  file=sys.stderr)
        except TimeoutError:
            print(f"{name:24s} WEDGED", file=sys.stderr)
            results[name] = None
        except Exception as e:  # noqa
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[name] = None

    print("# deltas (ms/shard):", file=sys.stderr)
    keys = [k for k, v in results.items() if v is not None]
    for a, b in zip(keys, keys[1:]):
        print(f"#   {b} - {a}: "
              f"{(results[b]-results[a])*1000/N_SHARDS:7.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
