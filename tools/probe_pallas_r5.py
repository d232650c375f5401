"""Round-5 Pallas re-probe: is dynamic gather inside a Mosaic TPU kernel
still broken on this stack? (CLAUDE.md: blocked on jax 0.9 / libtpu 0.0.34 —
re-check on any libtpu bump before designing around the XLA gather floor.)

Tries, inside a trivial kernel: jnp.take, int-array indexing, and
take_along_axis; plus a VMEM one-hot reduce (compare+select+sum — known to
lower) as the fallback formulation, timed against XLA at decoder shapes.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print(f"# jax {jax.__version__}", flush=True)
try:
    import libtpu
    print(f"# libtpu {getattr(libtpu, '__version__', '?')}", flush=True)
except Exception:
    try:
        import importlib.metadata as md
        print(f"# libtpu {md.version('libtpu')}", flush=True)
    except Exception as e:
        print(f"# libtpu version unknown: {e}", flush=True)

from jax.experimental import pallas as pl  # noqa: E402

R = 2048
L = 4096


def try_lower(name, kernel, *args_shapes):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L,), jnp.int32))
        jitted = jax.jit(fn)
        lowered = jitted.lower(*[jax.ShapeDtypeStruct(s, d)
                                 for s, d in args_shapes]).compile()
        print(f"{name:18s} LOWERS", flush=True)
        return lowered
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:18s} FAILS: {type(e).__name__}: {msg}", flush=True)
        return None


def k_take(tbl_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take(tbl_ref[...], idx_ref[...])


def k_intidx(tbl_ref, idx_ref, out_ref):
    out_ref[...] = tbl_ref[...][idx_ref[...]]


def k_tala(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[...][None, :]
    i = idx_ref[...][None, :]
    out_ref[...] = jnp.take_along_axis(
        jnp.broadcast_to(t, (1, R)), i, axis=1)[0]


def k_onehot(tbl_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    tbl = tbl_ref[...]
    riota = jax.lax.broadcasted_iota(jnp.int32, (L, R), 1)
    out_ref[...] = jnp.sum(
        jnp.where(idx[:, None] == riota, tbl[None, :], 0), axis=1)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    shapes = (((R,), jnp.int32), ((L,), jnp.int32))
    for name, k in [("take", k_take), ("int-index", k_intidx),
                    ("take_along_axis", k_tala), ("onehot-reduce", k_onehot)]:
        fn = try_lower(name, k, *shapes)
        if fn is None:
            continue
        rng = np.random.default_rng(0)
        tbl = jax.device_put(jnp.asarray(
            rng.integers(0, 1000, R, dtype=np.int32)), dev)
        idx = jax.device_put(jnp.asarray(
            rng.integers(0, R, L, dtype=np.int32)), dev)
        jax.block_until_ready((tbl, idx))
        try:
            out = np.asarray(fn(tbl, idx))
            want = np.asarray(tbl)[np.asarray(idx)]
            ok = (out == want).all()
            t0 = time.perf_counter()
            for rep in range(3):
                jax.block_until_ready(fn(tbl, idx))
            dt = (time.perf_counter() - t0) / 3
            print(f"  -> correct={ok}  {dt*1e3:.2f} ms/call", flush=True)
        except Exception as e:
            print(f"  -> EXECUTION FAILS: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
