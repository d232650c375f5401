"""Scale evidence for BASELINE configs 4/5 (SCALE.md artifact).

Modes:
  tpu  — 100 MB mixed corpus through the adaptive-split encoder on the single
         real TPU chip, chunked in device-resident waves. The corpus is the
         2 MB bench corpus tiled 50x ON DEVICE (the axon tunnel moves
         ~40 KB/s; uploading 100 MB is a non-starter, and shards are
         window-independent so tiling measures the same per-byte work).
         Reports throughput + ratio vs host zlib-6 on the identical corpus.
  cpu  — scaling efficiency on the 8-device virtual CPU mesh: the same wave
         of shards through parallel/dist.encode_sharded on a 1-device vs
         8-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8).

Run one mode per process; never concurrently with a TPU bench.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHARD = 1 << 18
BASE_SHARDS = 8                 # 2 MB uploaded base
TILE = 50                       # -> 100 MB on device


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


def run_tpu(tile: int = TILE):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import zlib
    from deflate_compression_tpu.format.deflate import encode_shard
    from bench import build_corpus

    base = build_corpus(SHARD * BASE_SHARDS)
    shards = np.frombuffer(base, np.uint8).reshape(BASE_SHARDS, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    dbase = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbase)
    try:
        with _alarm(240):
            _ = int(np.asarray(jnp.sum(dbase.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize wedged; continuing", file=sys.stderr)
    print("# base uploaded", file=sys.stderr)

    # Waves of 64 shards (16 MB per dispatch, the same lax.map-of-vmap(8)
    # dispatch structure as bench.py TILE_ENC=8) so the ~48 ms tunnel
    # roundtrip amortizes identically — VERDICT r4 weak #6: the old 16-shard
    # waves underreported sustained throughput ~20% vs the bench. Each wave
    # re-derives its rows from the device-resident base with a wave-dependent
    # salt so the execution cache cannot shortcut any wave.
    WAVE = 64
    NWAVES = (BASE_SHARDS * tile) // WAVE

    @jax.jit
    def wave_encode(dbase, salt):
        rows = jnp.tile(dbase, (WAVE // BASE_SHARDS, 1))
        rows = rows.at[:, 0].set(salt + jnp.arange(WAVE, dtype=jnp.uint8))

        def one(row):
            r = encode_shard(row, jnp.int32(SHARD), jnp.asarray(False))
            # the words fingerprint FORCES the bit-pack: returning only
            # total_bits lets XLA dead-code-eliminate the entire
            # serialization stage (~7 ms/shard) and inflates the number
            return r["total_bits"], jnp.sum(r["words"], dtype=jnp.uint32)
        bits, fps = jax.lax.map(jax.vmap(one),
                                rows.reshape(WAVE // 8, 8, SHARD))
        return bits.reshape(-1), fps.reshape(-1)

    ex = jax.jit(wave_encode.__wrapped__).lower(
        jax.ShapeDtypeStruct(dbase.shape, jnp.uint8),
        jax.ShapeDtypeStruct((), jnp.uint8)).compile()

    total_bits = 0
    wave_times = []
    t0 = time.perf_counter()
    for w in range(NWAVES):
        for attempt in range(3):
            try:
                with _alarm(200):
                    tw = time.perf_counter()
                    tb, fps = ex(dbase, jnp.uint8((w % 250) + 1))
                    total_bits += int(np.asarray(tb).sum())
                    _ = int(np.asarray(fps).sum())      # force the pack
                    wave_times.append(time.perf_counter() - tw)
                break
            except TimeoutError:
                print(f"# wave {w} attempt {attempt} wedged", file=sys.stderr)
        else:
            raise SystemExit(f"wave {w} unrecoverable after 3 attempts")
        if w % 25 == 0:
            print(f"# wave {w}/{NWAVES}: {wave_times[-1]:.2f}s",
                  file=sys.stderr)
    dt = time.perf_counter() - t0
    n = WAVE * SHARD * NWAVES
    mbps = n / dt / 1e6
    ratio = (total_bits / 8) / n

    # host zlib-6 baseline, STREAMED over the identical tiled corpus
    # (1 GB would not fit comfortably as one bytes object)
    t0 = time.perf_counter()
    co = zlib.compressobj(6)
    zlen = 0
    for _ in range(tile):
        zlen += len(co.compress(base))
    zlen += len(co.flush())
    zdt = time.perf_counter() - t0
    z_mbps = len(base) * tile / zdt / 1e6
    z_ratio = (zlen - 6) / (len(base) * tile)

    q = max(1, NWAVES // 4)
    rec = {"mode": f"tpu_{n >> 20}mb", "bytes": n, "seconds": round(dt, 2),
           "mb_per_s": round(mbps, 2), "ratio": round(ratio, 5),
           "zlib6_mb_per_s": round(z_mbps, 1),
           "zlib6_ratio": round(z_ratio, 5),
           "waves": NWAVES, "wave_shards": WAVE,
           # flat-curve evidence: mean wave time, first vs last quartile
           "wave_s_mean": round(float(np.mean(wave_times)), 3),
           "wave_s_first_quartile": round(float(np.mean(wave_times[:q])), 3),
           "wave_s_last_quartile": round(float(np.mean(wave_times[-q:])), 3)}
    print(json.dumps(rec))
    with open("/root/repo/.scale_tpu.json", "w") as f:
        json.dump(rec, f)


def run_cpu():
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deflate_compression_tpu.parallel import dist
    from bench import build_corpus

    base = build_corpus(SHARD * 8)
    shards = np.frombuffer(base, np.uint8).reshape(8, SHARD)

    def timed(ndev, reps=3):
        mesh = dist.make_mesh(jax.devices("cpu")[:ndev])
        rows = shards[:ndev]
        sh2 = NamedSharding(mesh, P(dist.AXIS, None))
        sh1 = NamedSharding(mesh, P(dist.AXIS))
        vls = jnp.full((ndev,), SHARD, jnp.int32)
        fins = jnp.zeros((ndev,), bool)
        d = jax.device_put(jnp.asarray(rows), sh2)
        v = jax.device_put(vls, sh1)
        f = jax.device_put(fins, sh1)
        r = dist.encode_sharded(d, v, f, mesh)          # compile + warm
        jax.block_until_ready(r["out_bytes"])
        best = None
        for i in range(reps):
            d2 = jax.device_put(jnp.asarray(
                np.bitwise_xor(rows, np.uint8(i + 1))), sh2)
            jax.block_until_ready(d2)
            t0 = time.perf_counter()
            r = dist.encode_sharded(d2, v, f, mesh)
            jax.block_until_ready(r["out_bytes"])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t1 = timed(1)
    t8 = timed(8)
    # This host has only 2 cores, so an 8-virtual-device mesh CANNOT show
    # wall-clock speedup (all devices share the cores). The measurable
    # claim is mesh-machinery efficiency: 8 shards through the 8-device
    # shard_map pipeline vs the serial-equivalent on the same cores
    # (8 x the 1-shard time). >= 0.8 means sharding+collectives add < 20%
    # overhead and nothing serializes.
    import os
    ncore = len(os.sched_getaffinity(0))
    eff = (8 * t1) / t8
    rec = {"mode": "cpu_mesh", "host_cores": ncore,
           "t1_1shard_s": round(t1, 3), "t8_8shards_s": round(t8, 3),
           "mesh_overhead_efficiency": round(min(eff, 1.0), 3),
           # raw ratio recorded uncapped so a suspicious superlinear
           # measurement (e.g. caching artifact) stays visible (advisor r3)
           "mesh_overhead_efficiency_raw": round(eff, 3),
           "note": "8 virtual devices share the host cores; efficiency = "
                   "serial-equivalent (8*t1) / mesh t8"}
    print(json.dumps(rec))
    with open("/root/repo/.scale_cpu.json", "w") as f:
        json.dump(rec, f)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        run_cpu()
    else:
        # `tpu [tile]`: tile 50 -> 100 MB, 500 -> 1 GB
        t = int(sys.argv[2]) if len(sys.argv) > 2 else TILE
        run_tpu(t)
