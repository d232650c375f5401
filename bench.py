"""Benchmark harness: DEFLATE encode throughput on the default JAX device
(TPU under the driver) vs CPython zlib level 6 — the reference's own interop
oracle (util/bin/zlib_encode.py); the C reference never emits a bitstream
(SURVEY §0), so zlib is the baseline encoder.

The whole corpus is device-resident: one upload, one jitted lax.map over all
shards, and only scalar results cross the (slow, tunneled) host link inside
the timed region. Correctness of the benched bytes is spot-verified by
fetching two shards afterwards; the full encoder is exhaustively
oracle-verified in tests/.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time
import zlib

import numpy as np

SHARD = 1 << 18          # 256 KB shards: fast compile, high steady-state
TOTAL_MB = 16


def build_corpus(total_mb: int) -> bytes:
    """Mixed text+binary corpus (BASELINE.json config 4 shape)."""
    bee = open("/root/reference/test_files/original/bee_movie_script.txt",
               "rb").read()
    rng = np.random.default_rng(1234)
    parts = []
    size = 0
    target = total_mb << 20
    while size < target:
        parts.append(bee)
        parts.append(rng.integers(0, 256, 65536, dtype=np.uint8).tobytes())
        parts.append(bytes(np.tile(rng.integers(0, 256, 64, dtype=np.uint8),
                                   256)))
        size += len(bee) + 65536 + 64 * 256
    return b"".join(parts)[:target]


def main():
    import jax
    import jax.numpy as jnp
    from deflate_compression_tpu.core import bits as bits_mod
    from deflate_compression_tpu.format.deflate import encode_shard

    corpus = build_corpus(TOTAL_MB)
    n = len(corpus)
    nsh = n // SHARD
    shards = np.frombuffer(corpus, np.uint8).reshape(nsh, SHARD)

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    @jax.jit
    def encode_all(batch, salt):
        # the salt defeats any execution-result caching between repeats without
        # changing the workload measurably (one byte of one shard)
        batch = batch.at[0, 0].set(salt)
        def one(args):
            row, fin = args
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return (r["words"], r["total_bits"],
                    jnp.sum(r["words"], dtype=jnp.uint32))
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.lax.map(one, (batch, fins))

    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)

    # warmup / compile
    words, bits, fp = encode_all(dbatch, jnp.uint8(shards[0, 0]))
    jax.block_until_ready((bits, fp))

    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        words, bits, fp = encode_all(dbatch, jnp.uint8(rep))
        fps = int(np.asarray(fp).sum())      # full sync via host fetch
        best = min(best, time.perf_counter() - t0)
    # final run with the true first byte for verification below
    words, bits, fp = encode_all(dbatch, jnp.uint8(shards[0, 0]))
    jax.block_until_ready((bits, fp))
    ours_mbps = n / best / 1e6

    bits_h = np.asarray(bits)
    comp_bytes = int(np.sum((bits_h + 7) // 8))
    ratio = comp_bytes / n

    # spot-verify two shards' actual bytes through the zlib oracle
    for idx in (0, nsh - 1):
        w = np.asarray(words[idx])
        blob = bits_mod.words_to_bytes(w, int(bits_h[idx]))
        if idx == nsh - 1:
            got = zlib.decompress(blob, wbits=-15)
        else:
            got = zlib.decompress(blob + b"\x01\x00\x00\xff\xff", wbits=-15)
        assert got == shards[idx].tobytes(), f"shard {idx} mismatch"

    # baseline: zlib level 6 on this host
    t0 = time.perf_counter()
    zcomp = zlib.compress(corpus, 6)
    zdt = time.perf_counter() - t0
    z_mbps = n / zdt / 1e6
    z_ratio = (len(zcomp) - 6) / n

    print(f"# ours: {ours_mbps:.1f} MB/s ratio {ratio:.4f}; "
          f"zlib-6: {z_mbps:.1f} MB/s ratio {z_ratio:.4f}", file=sys.stderr)
    print(json.dumps({
        "metric": "encode_throughput",
        "value": round(ours_mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(ours_mbps / z_mbps, 3),
    }))


if __name__ == "__main__":
    main()
