"""Measure the C++ native runtime paths (host-side, no TPU touched) and
record them in NATIVE.json so the README's native-path throughput claims are
reproducible (VERDICT r4 next #9).

Paths measured (native/deflate_native.cpp via ctypes):
  * dct_inflate_raw  — two-level 10-bit-root LUT inflater
  * dct_build_index  — foreign-stream indexing pass (counts output only)
  * zlib_decompress_native — inflate + slice-by-8 CRC/adler verify

Corpus: the same 2 MB mixed corpus bench.py uses, compressed with CPython
zlib-6 (the baseline encoder), so numbers are comparable to the bench's
"zlib host inflate" row.

Usage: python tools/native_bench.py   (host-only compute, but NEVER run it
while a TPU process is mid-flight: sitecustomize touches the axon relay at
interpreter start and can wedge the other process's transfers — CLAUDE.md)
"""
import json
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")   # never touch the TPU from here

from bench import build_corpus  # noqa: E402
from deflate_compression_tpu import native_bridge  # noqa: E402


def timed(fn, *args, reps=5):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    if not native_bridge.available():
        print("native library unavailable; nothing to record", file=sys.stderr)
        return 1
    n = 2 << 20
    corpus = build_corpus(n)
    zbody = zlib.compress(corpus, 6)[2:-4]          # raw DEFLATE stream

    (out, _), t_inf = timed(native_bridge.inflate_raw_native, zbody, 0)
    assert out == corpus, "native inflate mismatch"
    idx, t_idx = timed(native_bridge.build_index_native, zbody, 0, 1024)
    assert idx[-1] == n, "native index out_len mismatch"
    zfull = zlib.compress(corpus, 6)
    outz, t_z = timed(native_bridge.zlib_decompress_native, zfull, True)
    assert outz == corpus

    rec = {
        "corpus_bytes": n,
        "inflate_raw_MBps": round(n / t_inf / 1e6, 1),
        "build_index_MBps": round(n / t_idx / 1e6, 1),
        "zlib_decompress_verified_MBps": round(n / t_z / 1e6, 1),
        "note": "host C++ (native/deflate_native.cpp), input = zlib-6 "
                "stream of the 2 MB bench corpus, best of 5",
    }
    print(json.dumps(rec, indent=1))
    with open("/root/repo/NATIVE.json", "w") as f:
        json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
