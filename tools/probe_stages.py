"""On-device stage profiler for the encoder (tunnel-aware: salted reps
inside ONE dispatch per prefix; scalar fetch only). Not part of the package.

WARNING: this touches the TPU. Never run it concurrently with bench.py or
any other TPU process — a second process through the axon tunnel can wedge
the data plane for minutes (see CLAUDE.md).
"""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deflate_compression_tpu.core import lz77
from deflate_compression_tpu.format.deflate import encode_shard

S = 1 << 18
R = 6

# The early stages duplicate find_matches' prefix computations so they can
# be cut at arbitrary depths; pin the duplicated constants to lz77's so a
# change there can't silently skew stage attribution (ADVICE r1).
assert lz77.HASH_MUL == np.uint32(2654435761)
assert lz77.HASH_BITS == 16
_PW = 8   # must match find_matches' payload width for stage-2 attribution

bee = open("/root/reference/test_files/original/bee_movie_script.txt", "rb").read()
rng = np.random.default_rng(0)
corpus = (bee * 3 + rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
          + bytes(np.tile(rng.integers(0, 256, 64, dtype=np.uint8), 256)))
data_h = np.frombuffer((corpus * 2)[:S], np.uint8).copy()


def prefix(stage):
    """stage: int depth. Returns scalar-valued fn(data, salt)."""
    def fn(data, salt):
        data = data.at[0].set(salt)
        d = data.astype(jnp.uint32)
        b1 = jnp.concatenate([d[1:], jnp.zeros((1,), jnp.uint32)])
        b2 = jnp.concatenate([d[2:], jnp.zeros((2,), jnp.uint32)])
        tri = d | (b1 << np.uint32(8)) | (b2 << np.uint32(16))
        h = ((tri * lz77.HASH_MUL) >> np.uint32(32 - lz77.HASH_BITS)).astype(jnp.uint32)
        if stage == 0:
            return jnp.sum(h, dtype=jnp.uint32)
        order = jnp.argsort(h, stable=True)
        if stage == 1:
            return jnp.sum(order.astype(jnp.uint32), dtype=jnp.uint32)
        w4 = lz77._words4(data)
        cols = [w4]
        for t in range(1, _PW + 1):
            cols.append(jnp.concatenate([w4[4 * t:], jnp.zeros((4 * t,), jnp.uint32)]))
        P = jnp.stack(cols, axis=1)
        hs = h[order]
        pr = P[order]
        if stage == 2:
            return jnp.sum(pr[:, 0], dtype=jnp.uint32) + jnp.sum(hs, dtype=jnp.uint32)
        # full find_matches
        length, dist = lz77.find_matches(data, 32, _PW)
        if stage == 3:
            return jnp.sum(length + dist, dtype=jnp.int32).astype(jnp.uint32)
        tok = lz77.tokenize(data, jnp.int32(S))
        if stage == 4:
            return (jnp.sum(tok["chosen"], dtype=jnp.int32)
                    + jnp.sum(tok["length"])).astype(jnp.uint32)
        r = encode_shard(data, jnp.int32(S), jnp.asarray(True))
        return (r["total_bits"].astype(jnp.uint32)
                + jnp.sum(r["words"], dtype=jnp.uint32))
    return fn


NAMES = ["hash", "+sort", "+payload-gather", "+score/backperm(find_matches)",
         "+runs/lazy/parse(tokenize)", "full encode_shard"]


def timed(stage):
    fn = prefix(stage)

    @jax.jit
    def many(data, salt0):
        def body(acc, r):
            return acc + fn(data, (salt0 + r).astype(jnp.uint8)), None
        acc0 = jnp.uint32(0)
        out, _ = jax.lax.scan(body, acc0, jnp.arange(R, dtype=jnp.int32))
        return out
    return many


def main():
    dev = jax.devices()[0]
    dd = jax.device_put(jnp.asarray(data_h), dev)
    _ = int(jnp.sum(dd.astype(jnp.uint32)))  # materialize
    print("# materialized", file=sys.stderr)

    results = []
    for st in range(6):
        f = timed(st)
        t0 = time.perf_counter()
        v = int(f(dd, jnp.uint8(1)))  # compile+run
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = int(f(dd, jnp.uint8(101)))
        dt = time.perf_counter() - t0
        per = dt / R * 1000
        results.append(per)
        print(f"stage {st} ({NAMES[st]}): {per:.1f} ms/rep  (compile+1st {tc:.1f}s)",
              flush=True)

    print("\n# cumulative and stage deltas (ms per 256KB shard):")
    prev = 0.0
    for st in range(6):
        delta = results[st] - prev
        flag = "  (NEGATIVE: noise — rerun)" if delta < 0 else ""
        print(f"  {NAMES[st]:35s} cum {results[st]:7.1f}  "
              f"delta {delta:7.1f}{flag}")
        prev = results[st]


if __name__ == "__main__":
    main()
