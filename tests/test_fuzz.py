"""Robustness fuzzing: mutated/garbage streams must raise DeflateError (or
EOFError at worst) — never crash, hang, or return silently-wrong data.

The reference's decoder relies on longjmp error unwind for malformed input
(SURVEY §5.3); this suite is the equivalent negative-path coverage for all
three decode paths.
"""
import zlib

import numpy as np
import pytest

from deflate_compression_tpu import native_bridge as nb
from deflate_compression_tpu.decode.inflate import (_inflate_raw_py,
                                                    zlib_decompress)
from deflate_compression_tpu.utils.errors import DeflateError

RAW = open("/root/reference/docs/rfc1950.txt", "rb").read()
GOOD = zlib.compress(RAW, 6)


def _mutations(rng, n=60):
    for _ in range(n):
        buf = bytearray(GOOD)
        kind = rng.integers(0, 4)
        if kind == 0:      # flip bits in the deflate body
            for _ in range(rng.integers(1, 8)):
                buf[rng.integers(2, len(buf) - 4)] ^= 1 << rng.integers(0, 8)
        elif kind == 1:    # truncate
            del buf[rng.integers(3, len(buf)):]
        elif kind == 2:    # splice random bytes
            at = rng.integers(2, len(buf) - 4)
            buf[at:at] = bytes(rng.integers(0, 256, rng.integers(1, 32),
                                            dtype=np.uint8))
        else:              # random garbage with zlib-ish header
            buf = bytearray(b"\x78\x9c" + bytes(
                rng.integers(0, 256, rng.integers(8, 200), dtype=np.uint8)))
        yield bytes(buf)


def test_python_inflater_never_crashes():
    rng = np.random.default_rng(1)
    errors = 0
    for data in _mutations(rng):
        try:
            out = _inflate_raw_py(data, 16)[0]
            # survivors must at least be self-consistent length-wise
            assert isinstance(out, bytes)
        except (DeflateError, EOFError):
            errors += 1
    assert errors > 10          # most mutations must be detected


@pytest.mark.skipif(not nb.available(), reason="no native runtime")
def test_native_inflater_never_crashes():
    rng = np.random.default_rng(2)
    errors = 0
    for data in _mutations(rng):
        try:
            nb.zlib_decompress_native(data)
        except DeflateError:
            errors += 1
    assert errors > 10


def test_adler_catches_payload_corruption():
    """Bit flips that decode 'successfully' must still fail the container
    checksum — end-to-end integrity."""
    rng = np.random.default_rng(3)
    silent = 0
    for data in _mutations(rng, n=40):
        try:
            out = zlib_decompress(data)
            if out != RAW:
                silent += 1    # decoded + checksum passed + wrong data
        except (DeflateError, EOFError):
            pass
    assert silent == 0
