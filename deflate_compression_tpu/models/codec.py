"""Flagship codec models: the user-facing compress/decompress API.

Reference analogues: `deflate_compress(fd_in, fd_out, fd_stats, sw, ops)`
(src/include/deflate_ext.h:17) and `deflate_decompress(&out, &in, ops)`
(src/include/deflate_ext.h:16). File descriptors become bytes/arrays; the
`fd_stats` side channel (struct compress_stats, deflate_ext.h:19-31) becomes
the CompressStats record with the same derived metric
rate = compressed_bits / input_bytes (deflate_ext.h:29-30).
"""
from __future__ import annotations

import dataclasses
import logging

import numpy as np
import jax.numpy as jnp

from ..core import bits as bits_mod
from ..core import checksum
from ..format import constants as C
from ..format import containers
from ..format.deflate import BLOCK, encode_shard_jit
from ..utils.config import CodecConfig, DEFAULT_CONFIG
from ..utils.errors import DeflateError
from ..utils.logging_util import MetricsRecorder

_LOG = logging.getLogger("deflate_compression_tpu.models.codec")


@dataclasses.dataclass
class CompressStats:
    """Per-block compression telemetry (reference: struct compress_stats,
    src/include/deflate_ext.h:19-31 — bytes consumed, tree bits, payload
    bits, and the bits/byte rate; SURVEY §5.1)."""
    input_bytes: int = 0
    output_bytes: int = 0
    n_blocks: int = 0
    n_tokens: int = 0
    n_matches: int = 0
    btype_counts: tuple = (0, 0, 0)       # stored / fixed / dynamic
    tree_bits: int = 0
    block_bits: list = dataclasses.field(default_factory=list)
    block_bytes: list = dataclasses.field(default_factory=list)

    @property
    def rate_bits_per_byte(self) -> float:
        return 8.0 * self.output_bytes / max(1, self.input_bytes)

    def to_csv(self) -> str:
        """Cumulative trace in the reference's format-B shape
        (results/results_.txt: `bytes, compressed_bits`)."""
        lines = ["bytes,compressed_bits"]
        cb = 0
        cby = 0
        for bb, bits in zip(self.block_bytes, self.block_bits):
            cby += bb
            cb += bits
            lines.append(f"{cby},{cb}")
        return "\n".join(lines) + "\n"


def _self_check_shard(shard_bytes: bytes, total_bits: int,
                      original: bytes, shard_idx: int) -> None:
    """Online (during-encode) token verification — the reference's check_lld
    interleaving (tests/check_lld.c:41-66: the parent replays each emitted
    lit/(len,dist) against its own 32 KB ring WHILE the child compresses).
    Here each shard's substream is ring-replayed immediately after encode and
    BEFORE its bytes are committed to output, so a bad token fails at the
    offending shard, not at decode time. Shards start fresh windows, so the
    per-shard replay is self-contained."""
    from ..decode.verify import replay_stream
    try:
        out, _, _ = replay_stream(shard_bytes, 0, stop_at_bits=total_bits)
    except DeflateError as e:
        raise DeflateError(
            "E_SELFCHECK",
            f"self-check: shard {shard_idx} replay failed: {e}")
    if out != original:
        n = next((i for i, (a, b) in enumerate(zip(out, original))
                  if a != b), min(len(out), len(original)))
        raise DeflateError(
            "E_SELFCHECK",
            f"self-check: shard {shard_idx} reconstruction diverges at "
            f"byte {n} ({len(out)} vs {len(original)} bytes)")


class DeflateCodec:
    """Raw DEFLATE (RFC 1951) codec over byte strings, jit-compiled per
    shard shape. The flagship single-process model; parallel/ scales it
    across a device mesh."""

    def __init__(self, config: CodecConfig = DEFAULT_CONFIG):
        self.config = config
        self.metrics = MetricsRecorder()    # SURVEY §5.5 observability

    # -------------------------------------------------------------- encode
    def _encode_shards(self, raw: bytes):
        cfg = self.config
        n = len(raw)
        shard_size = cfg.shard_size
        parts = []
        stats = CompressStats(input_bytes=n)
        if n == 0:
            parts.append(b"\x01\x00\x00\xff\xff")  # final empty stored block
            stats.n_blocks = 1
            stats.btype_counts = (1, 0, 0)
            stats.block_bits = [40]
            stats.block_bytes = [0]
            return parts, stats
        nsh = (n + shard_size - 1) // shard_size
        btc = [0, 0, 0]
        for s in range(nsh):
            part = raw[s * shard_size:(s + 1) * shard_size]
            vl = len(part)
            buf = np.zeros(shard_size, dtype=np.uint8)
            buf[:vl] = np.frombuffer(part, dtype=np.uint8)
            r = encode_shard_jit(jnp.asarray(buf), jnp.int32(vl),
                                 jnp.asarray(s == nsh - 1),
                                 num_candidates=cfg.num_candidates,
                                 lazy=cfg.lazy,
                                 force_btype=cfg.force_btype)
            tb = int(r["total_bits"])
            if bool(r["sub_overflow"]):
                # would make any index built from these stats silently
                # incomplete (VERDICT r4 weak #4): unreachable by the stride
                # arithmetic, loud if it ever fires
                raise DeflateError("E_INDEX",
                                   f"shard {s}: sub-entry capacity overflow")
            sb = bits_mod.words_to_bytes(np.asarray(r["words"]), tb)
            if cfg.self_check:
                _self_check_shard(sb, tb, part, s)
            parts.append(sb)
            bt = np.asarray(r["btype"])
            for t in range(3):
                btc[t] += int((bt == t).sum())
            emitted = bt >= 0
            stats.n_blocks += int(emitted.sum())
            stats.n_tokens += int(r["n_tokens"])
            stats.n_matches += int(r["n_matches"])
            stats.tree_bits += int(np.asarray(r["tree_bits"]).sum())
            stats.block_bits += [int(x) for x in np.asarray(r["block_bits"])[emitted]]
            stats.block_bytes += [int(x) for x in np.asarray(r["block_bytes"])[emitted]]
            self.metrics.record("shard_bytes", vl)
            self.metrics.record("shard_bits", tb)
            _LOG.debug("shard %d/%d: %d bytes -> %d bits (%d blocks)",
                       s + 1, nsh, vl, tb, int(emitted.sum()))
        for bb, bits in zip(stats.block_bytes, stats.block_bits):
            self.metrics.record("block_bytes", bb)
            self.metrics.record("block_bits", bits)
        stats.btype_counts = tuple(btc)
        return parts, stats

    def compress(self, data, return_stats: bool = False):
        raw = bytes(data)
        parts, stats = self._encode_shards(raw)
        out = b"".join(parts)
        stats.output_bytes = len(out)
        return (out, stats) if return_stats else out

    # -------------------------------------------------------------- decode
    def decompress(self, data: bytes) -> bytes:
        from ..decode.inflate import inflate_raw
        out, _ = inflate_raw(bytes(data))
        return out


class ZlibCodec(DeflateCodec):
    """zlib container (RFC 1950): CMF/FLG header + DEFLATE + big-endian
    adler32 (reference: src/deflate_decompress.c:347-409)."""

    def compress(self, data, return_stats: bool = False):
        raw = bytes(data)
        parts, stats = self._encode_shards(raw)
        adler = checksum.adler32_np(np.frombuffer(raw, dtype=np.uint8))
        out = containers.zlib_wrap(b"".join(parts), adler)
        stats.output_bytes = len(out)
        return (out, stats) if return_stats else out

    def decompress(self, data: bytes) -> bytes:
        from ..decode.inflate import zlib_decompress
        return zlib_decompress(bytes(data),
                               verify_adler=self.config.verify_checksums)


class GzipCodec(DeflateCodec):
    """gzip container (RFC 1952): header + DEFLATE + CRC-32 + ISIZE."""

    def compress(self, data, return_stats: bool = False):
        raw = bytes(data)
        parts, stats = self._encode_shards(raw)
        crc = checksum.crc32_np(raw)
        out = containers.gzip_wrap(b"".join(parts), crc, len(raw))
        stats.output_bytes = len(out)
        return (out, stats) if return_stats else out

    def decompress(self, data: bytes) -> bytes:
        return containers.gzip_decompress(bytes(data))


def make_codec(config: CodecConfig = DEFAULT_CONFIG) -> DeflateCodec:
    return {"raw": DeflateCodec, "zlib": ZlibCodec,
            "gzip": GzipCodec}[config.container](config)


# --------------------------------------------------------------- streaming
def _iter_shard_chunks(src, size: int):
    """Yield successive chunks of exactly `size` bytes (last may be short)
    from a file-like object or an iterable of bytes, holding O(size) memory."""
    if hasattr(src, "read"):
        def pieces():
            while True:
                b = src.read(size)
                if not b:
                    return
                yield b
        it = pieces()
    else:
        it = iter(src)
    buf = bytearray()
    for piece in it:
        buf += piece
        while len(buf) >= size:
            yield bytes(buf[:size])
            del buf[:size]
    if buf:
        yield bytes(buf)


from ..decode.index import INDEX_STAT_FIELDS as _INDEX_KEYS  # noqa: E402


def compress_stream(src, config: CodecConfig = DEFAULT_CONFIG,
                    index_sink: list | None = None):
    """Streaming encode: yield container bytes incrementally with O(shard)
    memory — the bytes-API equivalent of the reference's double-window loop
    over an unbounded fd (src/deflate_compress.c:14-37, fetch loop
    :147-154), which handles arbitrarily long input in 32 KB steps with
    O(window) memory. Here the streaming unit is one shard
    (config.shard_size); every non-final shard ends byte-aligned (sync
    flush), so its bytes are final the moment it is encoded.

    Args:
      src: file-like object (.read) or iterable of bytes chunks.
      config: honored fully, including container, force_btype and
        self_check (online per-shard ring replay).
      index_sink: optional list — receives one (stats, total_bits, out_len)
        tuple per shard (host numpy), ready for
        decode.index.index_from_shards to assemble a .dcx sidecar.

    Yields: container header (if any), each shard's substream bytes, footer.
    """
    from ..format.containers import (container_header, gzip_footer,
                                     zlib_footer)
    cfg = config
    shard_size = cfg.shard_size
    yield container_header(cfg.container)

    adler = 1
    crc = 0
    total_in = 0
    pending = None
    s = 0
    emitted_any = False

    def encode_one(part: bytes, is_final: bool) -> bytes:
        vl = len(part)
        buf = np.zeros(shard_size, dtype=np.uint8)
        buf[:vl] = np.frombuffer(part, dtype=np.uint8)
        r = encode_shard_jit(jnp.asarray(buf), jnp.int32(vl),
                             jnp.asarray(is_final),
                             num_candidates=cfg.num_candidates,
                             lazy=cfg.lazy, force_btype=cfg.force_btype)
        tb = int(r["total_bits"])
        if bool(r["sub_overflow"]):
            raise DeflateError("E_INDEX",
                               f"shard {s}: sub-entry capacity overflow")
        sb = bits_mod.words_to_bytes(np.asarray(r["words"]), tb)
        if cfg.self_check:
            _self_check_shard(sb, tb, part, s)
        if index_sink is not None:
            stats = {k: np.asarray(r[k]) for k in _INDEX_KEYS}
            index_sink.append((stats, tb, vl))
        return sb

    for chunk in _iter_shard_chunks(src, shard_size):
        if pending is not None:
            yield encode_one(pending, False)
            s += 1
            emitted_any = True
        pending = chunk
        if cfg.container == "zlib":
            adler = checksum.adler32_np(np.frombuffer(chunk, np.uint8), adler)
        elif cfg.container == "gzip":
            crc = checksum.crc32_np(chunk, crc)
        total_in += len(chunk)

    if pending is not None:
        yield encode_one(pending, True)
    elif not emitted_any:
        yield b"\x01\x00\x00\xff\xff"      # empty input: final stored block

    if cfg.container == "zlib":
        yield zlib_footer(adler)
    elif cfg.container == "gzip":
        yield gzip_footer(crc, total_in)


def compress_file(in_path: str, out_path: str,
                  config: CodecConfig = DEFAULT_CONFIG,
                  index_path: str | None = None) -> int:
    """Stream-compress a file to a file with O(shard) memory; optionally
    write a .dcx decode-index sidecar. Returns compressed byte count."""
    sink = [] if index_path else None
    n = 0
    with open(in_path, "rb") as fin, open(out_path, "wb") as fout:
        for piece in compress_stream(fin, config, index_sink=sink):
            fout.write(piece)
            n += len(piece)
    if index_path:
        from ..decode.index import index_from_shards
        idx = index_from_shards([t[0] for t in sink],
                                [t[1] for t in sink],
                                [t[2] for t in sink])
        with open(index_path, "wb") as f:
            f.write(idx.to_bytes())
    return n
