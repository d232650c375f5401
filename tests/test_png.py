"""PNG decoder tests.

Oracle: PIL (the reference uses PIL the same way — util/bin/read_img.py).
Fixtures: the reference's own PNGs (png/img/pngtest*.png are the golden
fixed-Huffman 4x4 images documented bit-by-bit in png/pngtest.png.txt) plus
generated images covering color types, bit depths and Adam7.
"""
import io
import struct
import zlib

import numpy as np
import pytest
from PIL import Image, PngImagePlugin

from deflate_compression_tpu.core import checksum
from deflate_compression_tpu.png.decoder import png_decode, PngDecoder
from deflate_compression_tpu.utils.errors import PngError

REF_FIXTURES = [
    "/root/reference/png/img/pngtest.png",
    "/root/reference/png/img/pngtest2.png",
    "/root/reference/png/img/pngtest3.png",
    "/root/reference/util/image.png",
    "/root/reference/util/image1.png",
    "/root/reference/util/sunset.png",
]


def pil_bytes(img: Image.Image, **save_kw) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format="PNG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("path", REF_FIXTURES)
def test_reference_fixtures_match_pil(path):
    ours = png_decode(path).to_rgba()
    pil = np.array(Image.open(path).convert("RGBA"))
    assert (ours == pil).all()


def _random_rgb(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


@pytest.mark.parametrize("mode,size", [
    ("RGB", (33, 17)), ("RGBA", (64, 64)), ("L", (40, 25)),
    ("LA", (13, 13)), ("P", (50, 20)), ("1", (41, 9)),
])
def test_modes_match_pil(mode, size):
    w, h = size
    img = _random_rgb(w, h, seed=hash(mode) % 100).convert(mode)
    data = pil_bytes(img)
    got = png_decode(data).to_rgba()
    want = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    assert (got == want).all()


ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _mk_chunk(name: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + name + payload +
            struct.pack(">I", checksum.crc32_np(name + payload)))


def build_interlaced_png(arr: np.ndarray) -> bytes:
    """Independent Adam7 PNG writer (filter 0 rows) — PIL cannot write
    interlaced PNGs, so the test constructs the fixture itself; the decoder
    must invert it."""
    h, w, c = arr.shape
    ct = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 1)
    raw = bytearray()
    for (x0, y0, dx, dy) in ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)                       # filter type None
            raw += row.tobytes()
    idat = zlib.compress(bytes(raw), 6)
    return (b"\x89PNG\r\n\x1a\n" + _mk_chunk(b"IHDR", ihdr)
            + _mk_chunk(b"IDAT", idat) + _mk_chunk(b"IEND", b""))


@pytest.mark.parametrize("c,size", [(3, (37, 23)), (1, (16, 16)),
                                    (4, (8, 3)), (3, (1, 1)), (3, (9, 5))])
def test_adam7_interlaced(c, size):
    # Adam7 pass generator (reference src/png/png_decoder.c:728-801)
    w, h = size
    rng = np.random.default_rng(w * h * c)
    arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    data = build_interlaced_png(arr)
    d = png_decode(data)
    assert d.interlace == 1
    assert (d.pixels == arr).all()
    # PIL reads interlaced PNGs: cross-check
    want = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    assert (d.to_rgba() == want).all()


def test_16bit_grayscale():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 65536, (11, 19), dtype=np.uint16)
    img = Image.fromarray(arr, mode="I;16")
    data = pil_bytes(img)
    d = png_decode(data)
    if d.bit_depth == 16:
        got = d.pixels[..., 0]
        want = np.array(Image.open(io.BytesIO(data)))
        assert (got == want).all()


def test_all_filter_types_decode():
    # large smooth gradient forces PIL's encoder through varied filters
    x = np.linspace(0, 255, 256).astype(np.uint8)
    y = np.linspace(0, 255, 64).astype(np.uint8)
    arr = np.stack([np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)),
                    np.tile(y[:, None], (1, 256))], axis=-1)
    data = pil_bytes(Image.fromarray(arr))
    got = png_decode(data).to_rgba()
    want = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    assert (got == want).all()


def test_metadata_text_chunks():
    img = _random_rgb(8, 8)
    info = PngImagePlugin.PngInfo()
    info.add_text("Comment", "hello world")                 # tEXt
    info.add_text("Big", "x" * 2000, zip=True)              # zTXt
    info.add_itxt("Title", "café", lang="fr", tkey="Titre")  # iTXt
    data = pil_bytes(img, pnginfo=info)
    d = png_decode(data)
    txt = d.metadata.get("text", {})
    assert txt.get("Comment") == "hello world"
    assert txt.get("Big") == "x" * 2000
    assert d.metadata.get("itext", {}).get("Title", {}).get("text") == "café"


def test_gamma_and_srgb():
    img = _random_rgb(4, 4)
    buf = pil_bytes(img)
    # inject a gAMA chunk manually after IHDR
    gama = struct.pack(">I", 45455)
    chunk = struct.pack(">I", 4) + b"gAMA" + gama + struct.pack(
        ">I", checksum.crc32_np(b"gAMA" + gama))
    out = buf[:33] + chunk + buf[33:]
    d = png_decode(out)
    assert abs(d.metadata["gamma"] - 0.45455) < 1e-9


def test_bad_signature():
    with pytest.raises(PngError):
        png_decode(b"NOTAPNG" + b"\0" * 100)


def test_bad_crc_critical_fatal():
    data = bytearray(open(REF_FIXTURES[0], "rb").read())
    data[20] ^= 0xFF  # corrupt IHDR payload -> CRC fails on critical chunk
    with pytest.raises(PngError):
        png_decode(bytes(data))


def test_bad_crc_ancillary_tolerated():
    img = _random_rgb(6, 6)
    info = PngImagePlugin.PngInfo()
    info.add_text("Comment", "corrupt me")
    data = bytearray(pil_bytes(img, pnginfo=info))
    idx = data.find(b"tEXt")
    data[idx + 6] ^= 0xFF  # corrupt payload byte of ancillary chunk
    d = png_decode(bytes(data))         # tolerant mode: warn & skip
    assert any("tEXt" in w for w in d.warnings)
    with pytest.raises(PngError):
        png_decode(bytes(data), tolerant=False)


def test_truncated_stream():
    data = open(REF_FIXTURES[0], "rb").read()
    with pytest.raises(PngError):
        png_decode(data[:40])


def test_missing_idat():
    # signature + IHDR + IEND only
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    def mk(name, payload):
        return (struct.pack(">I", len(payload)) + name + payload +
                struct.pack(">I", checksum.crc32_np(name + payload)))
    data = (b"\x89PNG\r\n\x1a\n" + mk(b"IHDR", ihdr) + mk(b"IEND", b""))
    with pytest.raises(PngError):
        png_decode(data)


def test_unknown_critical_chunk_fatal():
    img = _random_rgb(4, 4)
    buf = pil_bytes(img)
    payload = b"????"
    chunk = struct.pack(">I", 4) + b"XXXX" + payload + struct.pack(
        ">I", checksum.crc32_np(b"XXXX" + payload))
    out = buf[:33] + chunk + buf[33:]
    with pytest.raises(PngError):
        png_decode(out)


def test_unknown_ancillary_chunk_ignored():
    img = _random_rgb(4, 4)
    buf = pil_bytes(img)
    payload = b"????"
    chunk = struct.pack(">I", 4) + b"xxXX" + payload + struct.pack(
        ">I", checksum.crc32_np(b"xxXX" + payload))
    out = buf[:33] + chunk + buf[33:]
    d = png_decode(out)
    assert any("xxXX" in w for w in d.warnings)


def test_golden_pngtest_bit_trace():
    """png/pngtest.png.txt documents the exact decode of pngtest.png: a 4x4
    RGB image; validate our pixel output against the trace's final pixels
    indirectly via PIL equality plus the documented header fields
    (png/pngtest.png.txt:20-36)."""
    d = png_decode(REF_FIXTURES[0])
    assert (d.width, d.height, d.bit_depth, d.color_type) == (4, 4, 8, 2)
    # IDAT must be a zlib stream with 32KB window per the trace
    raw = open(REF_FIXTURES[0], "rb").read()
    i = raw.find(b"IDAT")
    cmf = raw[i + 4]
    assert cmf & 0x0F == 8


def test_native_defilter_matches_python_oracle():
    """dct_png_defilter must reproduce the Python defilter exactly for
    every filter type, bpp, and row mix (the Python loop is the oracle)."""
    from deflate_compression_tpu import native_bridge
    from deflate_compression_tpu.png.decoder import defilter
    if not native_bridge.available():
        import pytest
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(7)
    for bpp in (1, 2, 3, 4, 6, 8):
        H, rb = 40, bpp * 23
        rows = rng.integers(0, 256, (H, rb), dtype=np.uint8)
        filters = rng.integers(0, 5, H, dtype=np.uint8)
        filters[0] = rng.integers(0, 5)     # incl. Paeth/Avg on first row
        a = defilter(rows.copy(), filters, bpp, prefer_native=True)
        b = defilter(rows.copy(), filters, bpp, prefer_native=False)
        assert np.array_equal(a, b), f"mismatch at bpp={bpp}"
