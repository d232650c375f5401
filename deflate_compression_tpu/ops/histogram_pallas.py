"""Pallas TPU kernel: masked symbol histogram (per-tile). **DEMOTED** —
kept as a measured experiment, not a production path.

Round-3 closure of the "Pallas on the hot path" question (VERDICT r2 #4),
measured on TPU v5e / jax 0.9 / libtpu 0.0.34 (tools/profile_r3c.py):

  * XLA scatter-add histogram:            7.9 ms / 256 KB shard
  * MXU one-hot matmul (production,
    core/huffman.histogram_rows_matmul):  3.2 ms / 256 KB shard
  * this Pallas kernel:                   does not lower — Mosaic rejects
    the (1, num_classes) output block spec ("last two dimensions of your
    block shape [must be] divisible by 8 and 128"), and reshaping the
    grid hits the same constraint on the input side for vmapped callers.
    Dynamic-gather inside kernels is also unsupported on this stack
    (ROADMAP "Mosaic/Pallas dynamic gather").

The MXU formulation won and is what format/deflate.py ships. Revisit this
kernel only after a libtpu/Mosaic upgrade; until then it runs in interpret
mode in tests as a cross-check of the histogram semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _hist_kernel(sym_ref, out_ref, *, num_classes_padded: int, chunk: int):
    """One grid step = one tile: accumulate class counts for the tile."""
    T = sym_ref.shape[0]
    acc = jnp.zeros((8, num_classes_padded), jnp.int32)
    classes = jax.lax.broadcasted_iota(jnp.int32, (8, num_classes_padded), 1)

    def body(i, acc):
        # (chunk,) symbols -> compare against all classes
        s = sym_ref[pl.ds(i * chunk, chunk)]
        s2 = s.reshape(chunk // 8, 8)
        # accumulate over the chunk rows; each row broadcasts 8 symbols
        def row(j, acc):
            srow = s2[j, :].reshape(8, 1)
            acc = acc + (srow == classes).astype(jnp.int32)
            return acc
        return jax.lax.fori_loop(0, chunk // 8, row, acc)

    acc = jax.lax.fori_loop(0, T // chunk, body, acc)
    out_ref[:, :] = jnp.sum(acc, axis=0, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "tile", "interpret"))
def tile_histogram(symbols: jnp.ndarray, num_classes: int, tile: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Per-tile masked histogram.

    symbols: i32[S] with out-of-range values (e.g. -1) ignored.
    Returns i32[S // tile, num_classes].
    """
    S = symbols.shape[0]
    assert S % tile == 0
    ntiles = S // tile
    ncp = _round_up(num_classes, LANES)
    chunk = min(tile, 512)

    out = pl.pallas_call(
        functools.partial(_hist_kernel, num_classes_padded=ncp, chunk=chunk),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ncp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, ncp), jnp.int32),
        interpret=interpret,
    )(symbols.astype(jnp.int32))
    return out[:, :num_classes]


def tile_histogram_auto(symbols: jnp.ndarray, num_classes: int,
                        tile: int) -> jnp.ndarray:
    """Use the Pallas kernel on TPU (incl. the tunneled 'axon' platform),
    interpret mode on CPU."""
    on_tpu = jax.default_backend() not in ("cpu",)
    return tile_histogram(symbols, num_classes, tile, interpret=not on_tpu)
