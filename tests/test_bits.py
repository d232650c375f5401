"""Bitstream primitive tests (reference analogue: the LSB-first cursor
contract of src/include/globals.h:52-64)."""
import numpy as np
import jax.numpy as jnp
import pytest

from deflate_compression_tpu.core import bits


def test_pack_items_roundtrip_random():
    rng = np.random.default_rng(0)
    n = 4096
    nb = rng.integers(0, 17, size=n).astype(np.int32)
    vals = (rng.integers(0, 1 << 16, size=n).astype(np.uint32)
            & ((1 << nb.astype(np.uint32)) - 1))
    off = (np.cumsum(nb) - nb).astype(np.int32)
    total = int(nb.sum())
    words = np.asarray(bits.pack_items_to_words(
        jnp.array(vals), jnp.array(nb), jnp.array(off), total // 32 + 2))
    r = bits.BitReader(bits.words_to_bytes(words, total))
    for v, b in zip(vals, nb):
        assert r.read(int(b)) == int(v)


def test_pack_32bit_items_at_odd_offsets():
    vals = np.array([0xFFFF0000, 0x12345678, 0xDEADBEEF], dtype=np.uint32)
    nb = np.array([32, 32, 32], np.int32)
    off = np.array([5, 37, 69], np.int32)
    words = np.asarray(bits.pack_items_to_words(
        jnp.array(vals), jnp.array(nb), jnp.array(off), 5))
    r = bits.BitReader(bits.words_to_bytes(words, 101))
    r.skip(5)
    assert r.read(32) == 0xFFFF0000
    assert r.read(32) == 0x12345678
    assert r.read(32) == 0xDEADBEEF


def test_zero_width_items_contribute_nothing():
    vals = np.array([0xFF, 0xAB, 0xFF], dtype=np.uint32)
    nb = np.array([0, 8, 0], np.int32)
    off = np.array([0, 0, 8], np.int32)
    words = np.asarray(bits.pack_items_to_words(
        jnp.array(vals), jnp.array(nb), jnp.array(off), 2))
    assert bits.words_to_bytes(words, 8) == b"\xab"


def test_value_masking():
    # packer must mask values wider than nbits
    vals = np.array([0xFFFF], dtype=np.uint32)
    nb = np.array([4], np.int32)
    off = np.array([0], np.int32)
    words = np.asarray(bits.pack_items_to_words(
        jnp.array(vals), jnp.array(nb), jnp.array(off), 1))
    assert bits.words_to_bytes(words, 8) == b"\x0f"


def test_reverse_bits():
    codes = jnp.array([0b1, 0b110, 0b10011], dtype=jnp.uint32)
    nbits = jnp.array([1, 3, 5], dtype=jnp.int32)
    out = np.asarray(bits.reverse_bits(codes, nbits))
    assert list(out) == [0b1, 0b011, 0b11001]


def test_bitreader_align_and_bytes():
    r = bits.BitReader(b"\xff\x01\x02\x03")
    r.read(3)
    r.align_byte()
    assert r.read_bytes(2) == b"\x01\x02"
    assert r.read(8) == 3
    with pytest.raises(EOFError):
        r.read(1)


def test_blocked_scans_match_lax():
    """core/scans blocked two-level scans == jax.lax primitives."""
    import jax
    import jax.numpy as jnp
    from deflate_compression_tpu.core import scans
    rng = np.random.default_rng(3)
    for n in (64, 4096, 1 << 16, 1000):     # incl. non-multiple-of-R
        x = jnp.asarray(rng.integers(-2**30, 2**30, n, dtype=np.int32))
        assert (scans.cummax(x) == jax.lax.cummax(x)).all()
        assert (scans.cummin(x) == jax.lax.cummin(x)).all()
        u = jnp.asarray(rng.integers(0, 50, n, dtype=np.int32))
        assert (scans.cumsum(u) == jnp.cumsum(u)).all()
