"""Structured logging + metrics observability.

The reference's observability is _DEBUG stderr prints and the fd_stats
side channel (SURVEY §5.5). Here: standard `logging` with a namespaced
hierarchy (deflate_compression_tpu.*), a one-call setup, and a lightweight
metrics recorder whose CSV output matches the reference's trace format B
(`bytes, compressed_bits`, results/results_.txt:1) so existing analysis
notebooks keep working.
"""
from __future__ import annotations

import logging
import os
import sys
import time


def setup_logging(level: str | int | None = None, stream=None) -> None:
    """Configure the framework logger; level also via DCT_LOG env var."""
    if level is None:
        level = os.environ.get("DCT_LOG", "WARNING")
    logger = logging.getLogger("deflate_compression_tpu")
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler(stream or sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)


class MetricsRecorder:
    """Append-only (t, key, value) metric log with reference-format CSV
    export for the cost traces."""

    def __init__(self):
        self.records: list[tuple[float, str, float]] = []
        self._t0 = time.monotonic()

    def record(self, key: str, value: float) -> None:
        self.records.append((time.monotonic() - self._t0, key, float(value)))

    def cost_trace_csv(self) -> str:
        """reference format B: cumulative (bytes, compressed_bits)."""
        lines = ["bytes,compressed_bits"]
        cb = cbits = 0
        for _, key, v in self.records:
            if key == "block_bytes":
                cb += int(v)
            elif key == "block_bits":
                cbits += int(v)
                lines.append(f"{cb},{cbits}")
        return "\n".join(lines) + "\n"

    def summary(self) -> dict:
        out: dict[str, list[float]] = {}
        for _, k, v in self.records:
            out.setdefault(k, []).append(v)
        return {k: {"count": len(v), "sum": sum(v), "last": v[-1]}
                for k, v in out.items()}
