"""Decompose the TPU while_loop step cost for the decoder's body shape.

Measures, for a carry shaped like decode_blocks' state (a (B, S+1) i32 tok
buffer + per-lane cursors), the per-iteration time as a function of
  * number of gather ops in the body (1 vs 8)
  * number of lanes (512 vs 4096)
  * unrolling (1 symbol-equivalent per iter vs 8)
so we know whether decode throughput is bound by fixed per-iteration
overhead (-> unroll the body) or by gather descriptor traffic (-> cut ops).

WARNING: touches the TPU; never run concurrently with another TPU process.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S = 1 << 18
B = 8
ITERS = 1024


def make(fn_gathers: int, lanes: int, unroll: int):
    @jax.jit
    def run(words, tok, salt):
        bp0 = (jnp.arange(B * lanes, dtype=jnp.int32).reshape(B, lanes)
               + salt.astype(jnp.int32))

        def body(st):
            bp, tok, it = st
            acc = bp
            for u in range(unroll):
                v = jnp.zeros_like(bp)
                for g in range(fn_gathers):
                    v = v + words[jnp.clip((acc + g * 7) % (S // 4), 0,
                                           S // 4 - 1)].astype(jnp.int32)
                acc = acc + (v & 3) + 1
                slot = jnp.clip(acc, 0, S)
                tok = tok.at[jnp.arange(B)[:, None], slot].set(v)
            return acc, tok, it + 1

        def cond(st):
            return st[2] < ITERS // unroll

        bp, tok, _ = jax.lax.while_loop(cond, body, (bp0, tok, jnp.int32(0)))
        return jnp.sum(bp) + jnp.sum(tok[:, ::1024])

    return run


def main():
    dev = jax.devices()[0]
    words = jax.device_put(jnp.arange(S // 4, dtype=jnp.uint32), dev)
    tok = jax.device_put(jnp.zeros((B, S + 1), jnp.int32), dev)
    jax.block_until_ready((words, tok))
    print("# materialized", file=sys.stderr, flush=True)

    for (g, l, u) in [(1, 512, 1), (8, 512, 1), (8, 4096, 1),
                      (8, 512, 8), (8, 4096, 8)]:
        f = make(g, l, u)
        t0 = time.perf_counter()
        v = int(f(words, tok, jnp.int32(1)))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = int(f(words, tok, jnp.int32(2)))
        dt = time.perf_counter() - t0
        per = dt / ITERS * 1e6
        print(f"g={g} lanes={l} unroll={u}: {dt*1000:.1f} ms "
              f"({per:.1f} us/symbol-step; compile+1st {c:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
