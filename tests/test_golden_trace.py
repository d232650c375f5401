"""Golden bit-trace parity (SURVEY §4 oracle class 3).

png/pngtest.png.txt in the reference is a 319-line hand-annotated bit-level
decode of the 151-byte pngtest.png: zlib header fields, every Huffman code,
the decompressed filtered bytes, and the final adler32. This test checks our
decoder against the facts documented in that trace.
"""
import re

import numpy as np

from deflate_compression_tpu.core import checksum
from deflate_compression_tpu.core.bits import BitReader
from deflate_compression_tpu.decode.inflate import inflate_raw
from deflate_compression_tpu.png.decoder import png_decode

GOLDEN = "/root/reference/png/pngtest.png.txt"
PNG = "/root/reference/png/img/pngtest.png"


def idat_stream() -> bytes:
    raw = open(PNG, "rb").read()
    out = b""
    pos = 8
    while pos + 8 <= len(raw):
        ln = int.from_bytes(raw[pos:pos + 4], "big")
        name = raw[pos + 4:pos + 8]
        if name == b"IDAT":
            out += raw[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    return out


def test_zlib_header_fields_match_trace():
    """Trace: CM 8, CINFO 1 (window 512), FCHECK 23, FDICT false
    (pngtest.png.txt:23-29)."""
    z = idat_stream()
    cmf, flg = z[0], z[1]
    assert cmf & 0x0F == 8
    assert cmf >> 4 == 1                     # window 512
    assert flg & 0x1F == 23
    assert not (flg & 0x20)
    assert ((cmf << 8) | flg) % 31 == 0      # "mod 31 satisfied"


def test_block_structure_matches_trace():
    """Trace: single block, BFINAL true, BTYPE fixed (pngtest.png.txt:37-40);
    first code 00110000 -> value 0 (the filter byte)."""
    z = idat_stream()
    r = BitReader(z, 16)
    assert r.read(1) == 1                    # BFINAL
    assert r.read(2) == 1                    # fixed


def test_decompressed_bytes_match_trace_progress():
    """The trace's final Progress line spells out the filtered scanlines:
    \\0 filter bytes and pixel triples like \\237\\28\\36 (= 237,28,36)."""
    z = idat_stream()
    out, _ = inflate_raw(z, 16)
    # 4 rows x (1 filter byte + 4 px * 3) = 52 bytes
    assert len(out) == 52
    expect_start = bytes([0, 237, 28, 36, 0, 162, 232, 255, 127, 39,
                          0, 162, 232])
    assert out[:13] == expect_start
    # every scanline uses filter 0 per the trace
    rows = np.frombuffer(out, np.uint8).reshape(4, 13)
    assert (rows[:, 0] == 0).all()


def test_adler32_matches_trace():
    """Trace: zlib adler32 = 0x72331836 (pngtest.png.txt tail)."""
    z = idat_stream()
    out, end_bits = inflate_raw(z, 16)
    got = checksum.adler32_np(np.frombuffer(out, np.uint8))
    assert got == 0x72331836
    stored = int.from_bytes(z[(end_bits + 7) // 8:][:4], "big")
    assert stored == 0x72331836


def test_full_decode_matches_trace_pixels():
    img = png_decode(PNG)
    assert (img.width, img.height, img.bit_depth, img.color_type) == (4, 4, 8, 2)
    # first pixel row from the trace progress bytes
    assert list(img.pixels[0, 0]) == [237, 28, 36]
    assert list(img.pixels[0, 1]) == [0, 162, 232]
    assert list(img.pixels[0, 2]) == [255, 127, 39]
    # metadata documented in the trace header: sRGB ri 0, gAMA 45455,
    # pHYs 5669/5669 unit 1 (pngtest.png.txt:12-18)
    assert img.metadata["srgb_intent"] == 0
    assert abs(img.metadata["gamma"] - 0.45455) < 1e-9
    assert img.metadata["phys"] == (5669, 5669, 1)
