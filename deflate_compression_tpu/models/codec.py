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
            parts.append(bits_mod.words_to_bytes(np.asarray(r["words"]), tb))
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
