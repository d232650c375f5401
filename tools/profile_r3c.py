"""Batch-dilution + Pallas-histogram probe.

Hypothesis: a large slice of encode time is per-op dispatch overhead on
small (NB-sized) arrays, which dilutes with more shards per dispatch.
Times encode_shard at vmap widths 8/16/32 (device-side tiling of the 2 MB
base — shards are window-independent so the per-byte work is identical),
and the XLA scatter histogram vs the Pallas compare-reduce kernel.
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
BASE = 8
NB = SHARD // 32768


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.core import huffman
    from deflate_compression_tpu.format.deflate import encode_shard
    from deflate_compression_tpu.ops.histogram_pallas import tile_histogram
    from bench import build_corpus

    corpus = build_corpus(SHARD * BASE)
    shards = np.frombuffer(corpus, np.uint8).reshape(BASE, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    dbase = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbase)
    try:
        with _alarm(240):
            _ = int(np.asarray(jnp.sum(dbase.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize wedged; continuing", file=sys.stderr)
    print("# uploaded", file=sys.stderr)

    def enc_width(width):
        def fn(batch, salt):
            rows = jnp.tile(batch, (width // BASE, 1))
            rows = rows.at[:, 0].set(salt + jnp.arange(width, dtype=jnp.uint8))

            def one(row):
                r = encode_shard(row, jnp.int32(SHARD), jnp.asarray(False))
                return r["total_bits"]
            return jax.vmap(one)(rows)
        return fn

    def hist_xla(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row):
            pos = jnp.arange(SHARD, dtype=jnp.int32)
            micro = pos // 32768
            k1 = micro * 286 + row.astype(jnp.int32)
            k2 = NB * 286 + micro * 30 + (row.astype(jnp.int32) % 30)
            f = huffman.histogram(jnp.concatenate([k1, k2]), NB * 316)
            return jnp.sum(f)
        return jax.vmap(one)(batch)

    def hist_mxu(batch, salt):
        # the production formulation (format/deflate.py): one-hot x ones on
        # the MXU via huffman.histogram_rows_matmul
        batch = batch.at[0, 0].set(salt)

        def one(row):
            h1 = huffman.histogram_rows_matmul(
                row.astype(jnp.int32).reshape(NB, 32768), 286)
            h2 = huffman.histogram_rows_matmul(
                (row.astype(jnp.int32) % 30).reshape(NB, 32768), 30)
            return jnp.sum(h1) + jnp.sum(h2)
        return jax.vmap(one)(batch)

    def hist_pallas(batch, salt):
        # flatten the batch: one pallas_call, grid = total tiles (vmapping
        # the kernel produces an unsupported (1, tile) block shape)
        batch = batch.at[0, 0].set(salt)
        flat = batch.reshape(-1).astype(jnp.int32)
        h1 = tile_histogram(flat, 286, 32768)
        h2 = tile_histogram(flat % 30, 30, 32768)
        return jnp.sum(h1) + jnp.sum(h2)

    stages = [
        ("warmup", enc_width(8)),
        ("encode_x8", enc_width(8)),
        ("encode_x16", enc_width(16)),
        ("encode_x32", enc_width(32)),
        ("hist_xla", hist_xla),
        ("hist_mxu", hist_mxu),
        ("hist_pallas", hist_pallas),
    ]
    widths = {"warmup": 8, "encode_x8": 8, "encode_x16": 16, "encode_x32": 32,
              "hist_xla": 8, "hist_mxu": 8, "hist_pallas": 8}

    for name, fn in stages:
        try:
            t0 = time.perf_counter()
            ex = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(dbase.shape, jnp.uint8),
                jax.ShapeDtypeStruct((), jnp.uint8)).compile()
            ct = time.perf_counter() - t0
            best = None
            for rep in range(2):
                with _alarm(200):
                    t0 = time.perf_counter()
                    out = ex(dbase, jnp.uint8(rep * 37 + 1))
                    jax.tree_util.tree_map(lambda x: np.asarray(x).sum(), out)
                    dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            w = widths[name]
            print(f"{name:14s} {best*1000:8.1f} ms ({best*1000/w:6.1f} "
                  f"ms/shard, {w*SHARD/best/1e6:6.2f} MB/s) compile {ct:.0f}s",
                  file=sys.stderr)
        except TimeoutError:
            print(f"{name:14s} WEDGED", file=sys.stderr)
        except Exception as e:  # noqa
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
