"""TPU-parallel indexed decoder tests (decode/tpu_inflate.py).

The decode index comes straight from the encoder's stats; the decoded bytes
must be bit-exact with the original for every block-type mix.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from deflate_compression_tpu.format.deflate import encode_shard_jit
from deflate_compression_tpu.decode.tpu_inflate import decode_shard_indexed

S = 1 << 17


def roundtrip(raw: bytes):
    vl = len(raw)
    buf = np.zeros(S, np.uint8)
    buf[:vl] = np.frombuffer(raw, np.uint8)
    r = encode_shard_jit(jnp.asarray(buf), jnp.int32(vl), jnp.asarray(True))
    res = decode_shard_indexed(r["words"], r["block_bit_base"],
                               r["block_out_start"], r["btype"],
                               r["n_blocks"], jnp.int32(vl), S)
    assert bool(res["ok"])
    assert np.asarray(res["out"])[:vl].tobytes() == raw
    return np.asarray(r["btype"])


def test_dynamic_text():
    bt = roundtrip(open("/root/reference/docs/rfc1951.txt", "rb").read()[:S])
    assert (bt[bt >= 0] == 2).all()


def test_multiblock_mixed():
    raw = (open("/root/reference/test_files/original/bee_movie_script.txt",
                "rb").read()[:60000]
           + np.random.default_rng(0).integers(0, 256, 40000,
                                               dtype=np.uint8).tobytes()
           + b"\0" * 10000)
    roundtrip(raw)


def test_fixed_block():
    bt = roundtrip(b"hello world")
    assert bt[0] == 1


def test_stored_blocks():
    bt = roundtrip(np.random.default_rng(5).integers(
        0, 256, S, dtype=np.uint8).tobytes())
    assert (bt[bt >= 0] == 0).all()


def test_stored_then_dynamic():
    raw = (np.random.default_rng(6).integers(0, 256, S // 2,
                                             dtype=np.uint8).tobytes()
           + b"A" * (S // 2))
    roundtrip(raw)


def test_long_overlapping_matches():
    roundtrip(b"ab" * 40000)


def test_matches_looking_back_across_blocks():
    # dist reaches into the previous block's output (window semantics)
    rng = np.random.default_rng(2)
    blockish = rng.integers(0, 256, 32768 - 100, dtype=np.uint8).tobytes()
    pat = b"0123456789abcdef" * 8
    raw = blockish + pat + pat + blockish[:5000]
    roundtrip(raw)
