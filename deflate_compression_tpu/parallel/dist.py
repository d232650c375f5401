"""Distributed (multi-chip / multi-host) data-parallel encoding.

The reference has no parallelism of any kind (SURVEY §2.2): its only
"communication backends" are POSIX fds and one pipe (tests/check_lld.c:58-66).
Every parallel dimension here is new architecture, constrained only by the
DEFLATE format:

  * DP sharding is format-legal because DEFLATE blocks with BFINAL=0
    concatenate: each shard starts a fresh 32 KB window and ends byte-aligned
    with a sync flush (empty stored block), so the per-shard substreams
    concatenate into ONE valid stream (format/deflate.py).
  * The mesh is a 1-D "shards" axis (pure DP — the reference is a codec, not
    an NN; there is deliberately no fake TP/PP/EP). Within a shard,
    block-level parallelism is intra-chip (vectorized over the 32 KB coding
    blocks); across shards, chips work independently and only meet at
    container assembly.
  * Ordered assembly runs ON DEVICE: per-shard byte counts are exchanged
    (all_gather over ICI), exclusive-summed into shard offsets, and every
    chip's bytes land at their final container offset — an ordered ragged
    all-gather (SURVEY §7.3 item 5). adler32 is computed per shard on device
    and combined host-side with the O(#shards) combine identity.
"""
from __future__ import annotations

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import bits as bits_mod
from ..core import checksum
from ..format import containers
from ..format.deflate import BLOCK, encode_shard, out_words

AXIS = "shards"
_LOG = logging.getLogger("deflate_compression_tpu.parallel.dist")


def make_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def _encode_one(data_row, valid_len, final, num_candidates, lazy):
    r = encode_shard(data_row, valid_len, final,
                     num_candidates=num_candidates, lazy=lazy)
    # bytes of this shard's substream (byte-aligned unless final)
    nbytes = (r["total_bits"] + 7) // 8
    return r["words"], nbytes, r


@functools.partial(jax.jit, static_argnames=("mesh", "num_candidates", "lazy"))
def encode_sharded(data: jnp.ndarray, valid_lens: jnp.ndarray,
                   finals: jnp.ndarray, mesh: Mesh,
                   num_candidates: int = 32, lazy: bool = True):
    """Encode D shards over the mesh and assemble the container on device.

    Args:
      data: u8[D, S] — one row per shard (D == mesh size, S % 32768 == 0).
      valid_lens: i32[D]; finals: bool[D] (True only on the last real shard).

    Returns dict:
      out_bytes: u8[D * cap] container bytes (trim to total_bytes on host)
      total_bytes: i32 scalar
      shard_bytes: i32[D]
      adler: u32[D] per-shard adler32 (combine host-side)
    """
    D, S = data.shape
    cap_words = out_words(S)       # == encoder OUT_WORDS

    def per_shard(d, vl, fin):
        d = d[0]
        words, nbytes, r = _encode_one(d, vl[0], fin[0], num_candidates, lazy)
        adler = checksum.adler32_jax(d, vl[0])
        # Exchange sizes; compute this shard's container offset (ordered).
        sizes = jax.lax.all_gather(nbytes, AXIS)              # i32[D]
        my = jax.lax.axis_index(AXIS)
        offset = jnp.sum(jnp.where(jnp.arange(D) < my, sizes, 0))
        total = jnp.sum(sizes)
        return (words[None], nbytes[None], offset[None], total[None],
                adler[None])

    words, nbytes, offsets, totals, adlers = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
    )(data, valid_lens, finals)

    # Ordered ragged gather: place each shard's bytes at its offset.
    # out[j] = bytes[s(j), j - offset[s(j)]] with s(j) via searchsorted.
    cap_bytes = cap_words * 4
    all_bytes = jax.lax.bitcast_convert_type(
        words, jnp.uint8).reshape(D, cap_bytes)
    ends = offsets + nbytes
    j = jnp.arange(D * cap_bytes, dtype=jnp.int32)
    s_of_j = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    s_of_j = jnp.clip(s_of_j, 0, D - 1)
    local = j - offsets[s_of_j]
    valid = j < totals[0]
    flat_idx = jnp.clip(s_of_j * cap_bytes + local, 0, D * cap_bytes - 1)
    out_bytes = jnp.where(valid, all_bytes.reshape(-1)[flat_idx], 0)

    return {
        "out_bytes": out_bytes,
        "total_bytes": totals[0],
        "shard_bytes": nbytes,
        "adler": adlers,
    }


def compress_distributed(raw: bytes, mesh: Mesh | None = None,
                         shard_size: int = 1 << 20,
                         num_candidates: int = 32, lazy: bool = True,
                         container: str = "zlib", max_retries: int = 2,
                         _fault_hook=None) -> bytes:
    """Host driver: shard `raw` across the mesh, encode in waves of D shards,
    concatenate ordered output, wrap in the container.

    Fault tolerance (SURVEY §5.3): encoding is deterministic given
    (input, config, shard plan), so a failed wave — device error, preempted
    chip, transient runtime fault — is simply re-executed, up to
    `max_retries` times. `_fault_hook(wave_idx, attempt)` is a test seam that
    may raise to inject failures."""
    mesh = mesh or make_mesh()
    D = mesh.devices.size
    shard_size = max(BLOCK, (shard_size // BLOCK) * BLOCK)
    n = len(raw)
    if n == 0:
        body = b"\x01\x00\x00\xff\xff"
        if container == "zlib":
            return containers.zlib_wrap(body, 1)
        return body

    nsh = (n + shard_size - 1) // shard_size
    parts = []
    adler = 1
    sharding = NamedSharding(mesh, P(AXIS, None))
    s1d = NamedSharding(mesh, P(AXIS))
    for wave in range(0, nsh, D):
        wave_n = min(D, nsh - wave)
        batch = np.zeros((D, shard_size), np.uint8)
        vls = np.zeros((D,), np.int32)
        fins = np.zeros((D,), bool)
        for k in range(wave_n):
            s = wave + k
            part = raw[s * shard_size:(s + 1) * shard_size]
            batch[k, :len(part)] = np.frombuffer(part, np.uint8)
            vls[k] = len(part)
            fins[k] = (s == nsh - 1)
        # empty rows still encode (1 byte min); mark them len 1 and drop below
        drop = vls == 0
        vls = np.maximum(vls, 1)

        last_err = None
        for attempt in range(max_retries + 1):
            try:
                if _fault_hook is not None:
                    _fault_hook(wave // D, attempt)
                r = encode_sharded(
                    jax.device_put(jnp.asarray(batch), sharding),
                    jax.device_put(jnp.asarray(vls), s1d),
                    jax.device_put(jnp.asarray(fins), s1d),
                    mesh, num_candidates=num_candidates, lazy=lazy)
                shard_bytes = np.asarray(r["shard_bytes"])
                out = np.asarray(r["out_bytes"])
                adlers = np.asarray(r["adler"])
                last_err = None
                break
            except Exception as e:  # deterministic re-encode on any fault
                _LOG.warning("wave %d attempt %d failed: %s",
                             wave // D, attempt, e)
                last_err = e
        if last_err is not None:
            from ..utils.errors import DistError
            raise DistError(
                "E_SHARD",
                f"wave {wave // D} failed after {max_retries + 1} attempts: "
                f"{last_err}")
        _LOG.debug("wave %d: %d shards -> %d bytes", wave // D, wave_n,
                   int(shard_bytes[:wave_n].sum()))
        off = 0
        for k in range(D):
            sz = int(shard_bytes[k])
            if not drop[k]:
                parts.append(out[off:off + sz].tobytes())
                adler = checksum.adler32_combine(adler, int(adlers[k]),
                                                 int(vls[k]))
            off += sz
    body = b"".join(parts)
    if container == "zlib":
        return containers.zlib_wrap(body, adler)
    return body
