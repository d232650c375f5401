"""On-device timing of the vmap-batched 8-shard encode (the bench workload).

WARNING: touches the TPU. Never run concurrently with bench.py or any other
TPU process (see CLAUDE.md). Salted reps inside ONE dispatch; scalar fetch.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deflate_compression_tpu.format.deflate import encode_shard

SHARD = 1 << 18
N_SHARDS = 8
R = 4

bee = open("/root/reference/test_files/original/bee_movie_script.txt",
           "rb").read()
rng = np.random.default_rng(1234)
parts, size = [], 0
while size < SHARD * N_SHARDS:
    parts += [bee, rng.integers(0, 256, 65536, dtype=np.uint8).tobytes(),
              bytes(np.tile(rng.integers(0, 256, 64, dtype=np.uint8), 256))]
    size += len(bee) + 65536 + 64 * 256
corpus = b"".join(parts)[:SHARD * N_SHARDS]
shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)


@jax.jit
def encode_many(batch, salt0):
    def one_rep(acc, r):
        b = batch.at[0, 0].set((salt0 + r).astype(jnp.uint8))

        def one(row, fin):
            res = encode_shard(row, jnp.int32(SHARD), fin)
            return res["total_bits"], jnp.sum(res["words"], dtype=jnp.uint32)
        fins = jnp.arange(b.shape[0]) == b.shape[0] - 1
        tb, fp = jax.vmap(one)(b, fins)
        return acc + jnp.sum(tb) + jnp.sum(fp).astype(jnp.int32), None
    out, _ = jax.lax.scan(one_rep, jnp.int32(0),
                          jnp.arange(R, dtype=jnp.int32))
    return out


def main():
    dev = jax.devices()[0]
    db = jax.device_put(jnp.asarray(shards), dev)
    _ = int(jnp.sum(db.astype(jnp.uint32)))
    print("# materialized", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    v = int(encode_many(db, jnp.uint8(1)))
    print(f"# compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    v = int(encode_many(db, jnp.uint8(77)))
    dt = (time.perf_counter() - t0) / R
    mb = SHARD * N_SHARDS / 1e6
    print(f"batched encode: {dt * 1000:.1f} ms / {mb:.1f} MB "
          f"=> {mb / dt:.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
