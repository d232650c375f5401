"""Benchmark harness: end-to-end DEFLATE encode throughput on the current
default JAX device (TPU under the driver), vs CPython zlib level 6 as the
baseline encoder (the reference's own interop oracle, util/bin/zlib_encode.py
— the C reference itself never emits a bitstream, SURVEY §0, so zlib is the
performance stand-in).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time
import zlib

import numpy as np


def build_corpus(total_mb: int = 32) -> bytes:
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
    from deflate_compression_tpu.format.deflate import encode_shard_jit

    corpus = build_corpus(32)
    n = len(corpus)
    shard_size = 1 << 18     # 256 KB: fast compile, high steady-state rate
    nsh = n // shard_size
    shards = np.frombuffer(corpus, np.uint8).reshape(nsh, shard_size)

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # warmup / compile
    d0 = jax.device_put(jnp.asarray(shards[0]), dev)
    r = encode_shard_jit(d0, jnp.int32(shard_size), jnp.asarray(False))
    jax.block_until_ready(r["words"])

    # timed: full host->device->host encode of every shard
    reps = 2
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = []
        for s in range(nsh):
            d = jax.device_put(jnp.asarray(shards[s]), dev)
            r = encode_shard_jit(d, jnp.int32(shard_size),
                                 jnp.asarray(s == nsh - 1))
            outs.append((np.asarray(r["words"]), int(r["total_bits"])))
        comp = b"".join(bits_mod.words_to_bytes(w, tb) for w, tb in outs)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    ours_mbps = n / best / 1e6

    # verify correctness of the benched bytes
    assert zlib.decompress(comp, wbits=-15) == corpus
    ratio = len(comp) / n

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
