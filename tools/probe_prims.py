"""Measure TPU primitive rates (gather/scatter/sort) — recalibration probe.

WARNING: touches the TPU; one TPU process at a time (CLAUDE.md). Salted reps
inside one dispatch; scalar fetch only.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S = 1 << 18
R = 8


def timed(name, fn):
    f = jax.jit(lambda x, s0: jax.lax.scan(
        lambda acc, r: (acc + fn(x.at[0].set((s0 + r) & np.uint32(0xFFFF))),
                        None),
        jnp.uint32(0), jnp.arange(R, dtype=jnp.int32))[0])
    x = jnp.arange(S, dtype=jnp.uint32) * np.uint32(2654435761)
    _ = int(f(x, jnp.uint32(3)))
    t0 = time.perf_counter()
    _ = int(f(x, jnp.uint32(123)))
    dt = (time.perf_counter() - t0) / R * 1000
    print(f"{name:44s} {dt:8.2f} ms  ({S / dt / 1e3:8.1f} M elem/s)",
          flush=True)


def main():
    idx_rand = (jnp.arange(S, dtype=jnp.uint32) * np.uint32(40503)
                % np.uint32(S)).astype(jnp.int32)

    timed("random gather S->S",
          lambda x: jnp.sum(x[(idx_rand + x[0].astype(jnp.int32)) %
                              S], dtype=jnp.uint32))
    timed("sorted(arange) gather S->S",
          lambda x: jnp.sum(x[jnp.clip(jnp.arange(S) + x[0].astype(jnp.int32)
                                       % 3, 0, S - 1)], dtype=jnp.uint32))
    timed("random scatter-add S->S",
          lambda x: jnp.sum(jnp.zeros((S,), jnp.uint32).at[
              (idx_rand + x[0].astype(jnp.int32)) % S].add(x),
              dtype=jnp.uint32))
    timed("row gather (S,8) rows",
          lambda x: jnp.sum(jnp.broadcast_to(x[:, None], (S, 8))[
              (idx_rand + x[0].astype(jnp.int32)) % S], dtype=jnp.uint32))
    timed("row scatter (S,2) set",
          lambda x: jnp.sum(jnp.zeros((S + 1, 2), jnp.uint32).at[
              (idx_rand + x[0].astype(jnp.int32)) % S].set(
                  jnp.stack([x, x], 1)), dtype=jnp.uint32))
    timed("argsort u32 stable",
          lambda x: jnp.sum(jnp.argsort(x, stable=True).astype(jnp.uint32),
                            dtype=jnp.uint32))
    timed("cumsum i32",
          lambda x: jnp.cumsum(x.astype(jnp.int32)).astype(jnp.uint32)[-1])
    timed("take_along_axis (4096,64) cols",
          lambda x: jnp.sum(jnp.take_along_axis(
              x.reshape(4096, 64),
              (x.reshape(4096, 64) % np.uint32(64)).astype(jnp.int32),
              axis=1), dtype=jnp.uint32))


if __name__ == "__main__":
    main()
