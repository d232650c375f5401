"""Sort-variant probe: the encoder's argsort is ~26 ms/shard (73%% of
find_matches — tools/profile_r4_encode). Candidates:
  argsort32   — jnp.argsort(u32 hash, stable) [current]
  sort1_u32   — lax.sort of ONE packed u32 (hash14 << 18 | pos) — distinct
                keys make an unstable single-operand sort order-exact
  sort2       — lax.sort((hash u32, iota i32)) two-operand
All vmap(8) over 256 KB shards, salted, min of reps, null-corrected.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _alarm(seconds):
    import signal

    class _G:
        def __enter__(self):
            signal.signal(signal.SIGALRM,
                          lambda s, f: (_ for _ in ()).throw(TimeoutError()))
            signal.alarm(seconds)

        def __exit__(self, *a):
            signal.alarm(0)
            return False
    return _G()


S = 1 << 18
B = 8


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    hs = rng.integers(0, 1 << 16, (B, S), dtype=np.uint32)
    dev = jax.devices()[0]
    dh = jax.device_put(jnp.asarray(hs), dev)
    jax.block_until_ready(dh)
    print("# uploaded", flush=True)

    pos = jnp.arange(S, dtype=jnp.uint32)

    def st_null(h, salt):
        return jnp.sum(h + salt, dtype=jnp.uint32)

    def st_argsort(h, salt):
        def one(row):
            o = jnp.argsort(row + salt, stable=True)
            return jnp.sum(o, dtype=jnp.uint32)
        return jax.vmap(one)(h)

    def st_sort1(h, salt):
        def one(row):
            key = (((row + salt) >> np.uint32(2)) << np.uint32(18)) | pos
            ks = jax.lax.sort(key)
            return jnp.sum(ks & np.uint32(0x3FFFF), dtype=jnp.uint32)
        return jax.vmap(one)(h)

    def st_sort2(h, salt):
        def one(row):
            ks, op = jax.lax.sort((row + salt, pos), num_keys=1)
            return jnp.sum(op, dtype=jnp.uint32)
        return jax.vmap(one)(h)

    for name, fn in [("null", st_null), ("null2", st_null),
                     ("argsort32", st_argsort), ("sort1_u32", st_sort1),
                     ("sort2", st_sort2), ("sort1_u32b", st_sort1)]:
        try:
            ex = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(dh.shape, jnp.uint32),
                jax.ShapeDtypeStruct((), jnp.uint32)).compile()
            best = None
            for rep in range(3):
                try:
                    with _alarm(200):
                        t0 = time.perf_counter()
                        _ = np.asarray(ex(dh, jnp.uint32(rep + 1))).sum()
                        dt = time.perf_counter() - t0
                except TimeoutError:
                    print(f"#   {name} rep {rep} wedged", flush=True)
                    continue
                best = dt if best is None else min(best, dt)
                if rep >= 1 and best is not None:
                    break
            print(f"{name:10s} {('%8.1f ms' % (best*1000)) if best else 'WEDGED'}",
                  flush=True)
        except Exception as e:  # noqa
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
