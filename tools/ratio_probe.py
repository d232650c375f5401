"""Localize the ratio gap vs zlib-6 by corpus component (CPU-only probe).

Encodes each bench-corpus component separately with our encoder and zlib-6
and prints per-component compressed sizes, so ratio work targets the part
that actually loses.
"""
import sys
import zlib

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def comp_ours(raw: bytes, **kw) -> int:
    from deflate_compression_tpu.format.deflate import deflate_compress_bytes
    blob = deflate_compress_bytes(raw, shard_size=1 << 18, **kw)
    assert zlib.decompress(blob, wbits=-15) == raw
    return len(blob)


def main():
    bee = open("/root/reference/test_files/original/bee_movie_script.txt",
               "rb").read()
    rng = np.random.default_rng(1234)
    rand64k = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    tiled = bytes(np.tile(rng.integers(0, 256, 64, dtype=np.uint8), 256))

    parts = {"bee_57k": bee, "rand_64k": rand64k, "tiled64_16k": tiled,
             "bee_x4_228k": bee * 4}
    for name, raw in parts.items():
        z = len(zlib.compress(raw, 6)) - 6
        o = comp_ours(raw)
        print(f"{name:14s} n={len(raw):7d} zlib6={z:7d} ours={o:7d} "
              f"delta={(o - z) / max(z, 1) * 100:+.2f}%")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
