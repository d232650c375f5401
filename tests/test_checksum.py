"""Checksum tests vs the CPython zlib oracle (SURVEY §4 oracle class 2)."""
import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from deflate_compression_tpu.core import checksum as cs


@pytest.mark.parametrize("n", [0, 1, 17, 5551, 5552, 5553, 100000])
def test_adler32_np(n):
    d = np.random.default_rng(n).integers(0, 256, size=n).astype(np.uint8)
    assert cs.adler32_np(d) == zlib.adler32(d.tobytes())


@pytest.mark.parametrize("n", [1, 17, 5553, 100000])
def test_adler32_jax_padded(n):
    S = 1 << 17
    rng = np.random.default_rng(n)
    d = np.zeros(S, np.uint8)
    real = rng.integers(0, 256, size=n).astype(np.uint8)
    d[:n] = real
    got = int(cs.adler32_jax(jnp.array(d), jnp.int32(n)))
    assert got == zlib.adler32(real.tobytes())


@pytest.mark.parametrize("n", [0, 1, 100, 4095, 4096, 70000, 1 << 20])
def test_crc32_np(n):
    d = np.random.default_rng(n).integers(0, 256, size=n).astype(np.uint8).tobytes()
    assert cs.crc32_np(d) == zlib.crc32(d)


def test_combines():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, 1000).astype(np.uint8).tobytes()
    b = rng.integers(0, 256, 777).astype(np.uint8).tobytes()
    assert cs.adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b)) \
        == zlib.adler32(a + b)
    assert cs.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b)) \
        == zlib.crc32(a + b)
