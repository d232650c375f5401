"""Decode-index sidecar tests: build from foreign streams, serialize,
random access, and indexed TPU-parallel decode."""
import zlib

import numpy as np
import pytest

from deflate_compression_tpu.decode.index import (DecodeIndex, build_index,
                                                  decompress_indexed)
from deflate_compression_tpu.format.deflate import deflate_compress_bytes


def test_build_index_on_zlib_stream():
    raw = open("/root/reference/test_files/original/bee_movie_script.txt",
               "rb").read()
    comp = zlib.compress(raw, 6)[2:-4]          # raw deflate body
    idx = build_index(comp)
    assert idx.out_len == len(raw)
    assert idx.n_blocks >= 1
    assert idx.bit_base[0] == 0 and idx.out_start[0] == 0
    assert (np.diff(idx.out_start) > 0).all()


def test_index_roundtrip_serialization():
    comp = deflate_compress_bytes(b"indexed " * 50000, shard_size=1 << 17)
    idx = build_index(comp)
    blob = idx.to_bytes()
    idx2 = DecodeIndex.from_bytes(blob)
    assert (idx2.bit_base == idx.bit_base).all()
    assert (idx2.out_start == idx.out_start).all()
    assert (idx2.btype == idx.btype).all()
    assert idx2.out_len == idx.out_len


def test_random_access_lookup():
    raw = open("/root/reference/docs/rfc1951.txt", "rb").read()
    comp = deflate_compress_bytes(raw, shard_size=1 << 17)
    idx = build_index(comp)
    for off in (0, 100, len(raw) // 2, len(raw) - 1):
        b = idx.block_for_offset(off)
        assert idx.out_start[b] <= off
        assert b == idx.n_blocks - 1 or idx.out_start[b + 1] > off


def test_indexed_decode_own_stream():
    rng = np.random.default_rng(4)
    raw = (open("/root/reference/test_files/original/bee_movie_script.txt",
                "rb").read()
           + rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
           + b"\x00" * 30000)
    comp = deflate_compress_bytes(raw, shard_size=1 << 17)
    idx = build_index(comp)
    got = decompress_indexed(comp, idx, shard_out=1 << 17)
    assert got == raw


def test_indexed_decode_foreign_zlib_stream():
    raw = open("/root/reference/docs/rfc1950.txt", "rb").read()
    comp = zlib.compress(raw, 9)[2:-4]
    idx = build_index(comp)
    got = decompress_indexed(comp, idx, shard_out=1 << 17)
    assert got == raw


def test_indexed_decode_unaligned_groups_cross_window():
    # groups deliberately smaller than encode shards: matches cross group
    # boundaries and must resolve through the carried 32KB window context
    raw = (b"A" * 5000 + open("/root/reference/test_files/original/"
                              "bee_movie_script.txt", "rb").read())
    raw = raw + raw[:40000]          # long-range repetition across blocks
    comp = deflate_compress_bytes(raw, shard_size=1 << 17)
    idx = build_index(comp)
    got = decompress_indexed(comp, idx, shard_out=40000)  # tiny, unaligned
    assert got == raw


def test_native_index_matches_python_oracle():
    """The C++ one-pass index builder (dct_build_index) must produce the
    exact index the Python oracle does, on both foreign zlib streams and
    our own encoder's output."""
    from deflate_compression_tpu import native_bridge
    if not native_bridge.available():
        import pytest
        pytest.skip("native runtime unavailable")
    raw = (open("/root/reference/docs/rfc1951.txt", "rb").read()
           + np.random.default_rng(9).integers(
               0, 256, 40000, dtype=np.uint8).tobytes())
    for comp in (zlib.compress(raw, 6)[2:-4],
                 deflate_compress_bytes(raw, shard_size=1 << 17)):
        a = build_index(comp, prefer_native=True)
        b = build_index(comp, prefer_native=False)
        assert np.array_equal(a.bit_base, b.bit_base)
        assert np.array_equal(a.out_start, b.out_start)
        assert np.array_equal(a.btype, b.btype)
        assert a.out_len == b.out_len
        assert np.array_equal(a.sub_bit, b.sub_bit)
        assert np.array_equal(a.sub_out, b.sub_out)
        assert np.array_equal(a.sub_blk, b.sub_blk)


def test_indexed_decode_verifies_adler():
    """decompress_indexed must verify the container checksum when given one
    (VERDICT r3: the flagship parallel path must never return unverified
    data; reference verify src/deflate_decompress.c:402-404)."""
    import pytest
    from deflate_compression_tpu.core.checksum import adler32_np
    from deflate_compression_tpu.utils.errors import DeflateError
    raw = open("/root/reference/docs/rfc1950.txt", "rb").read()
    comp = deflate_compress_bytes(raw, shard_size=1 << 17)
    idx = build_index(comp)
    good = adler32_np(np.frombuffer(raw, np.uint8))
    assert decompress_indexed(comp, idx, expected_adler=good) == raw
    with pytest.raises(DeflateError):
        decompress_indexed(comp, idx, expected_adler=good ^ 0x10000)


def test_indexed_decode_large_shard_compact_chase():
    """shard_out >= 1<<18 routes the device decode through the round-5b
    scatter-free compact-tail chase (tpu_inflate._compact) on the indexed
    USER path; output must stay byte-exact."""
    base = (open("/root/reference/docs/rfc1951.txt", "rb").read()
            + open("/root/reference/test_files/original/"
                   "bee_movie_script.txt", "rb").read())
    raw = (base * ((1 << 19) // len(base) + 1))[:1 << 19]
    comp = deflate_compress_bytes(raw, shard_size=1 << 18)
    idx = build_index(comp)
    got = decompress_indexed(comp, idx, shard_out=1 << 18)
    assert got == raw
