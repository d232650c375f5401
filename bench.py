"""Benchmark harness: DEFLATE encode throughput on the current default JAX
device (TPU under the driver) vs CPython zlib level 6 — the reference's own
interop oracle (util/bin/zlib_encode.py); the C reference never emits a
bitstream (SURVEY §0), so zlib is the baseline encoder.

Measurement notes (axon-tunneled TPU): host<->device transfers run at only
~40 KB/s through the relay, so the corpus is uploaded ONCE (small, device-
resident) and the timed region re-executes the jitted whole-batch encode
with a one-byte salt (defeats execution-result caching) fetching only
scalars. Verification fetches one shard's words afterwards, untimed.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time
import zlib

import numpy as np

_LAST_GOOD = "/root/repo/.bench_last_good.json"

SHARD = 1 << 18          # 256 KB shards
N_SHARDS = 8             # 2 MB corpus: bounded upload through the tunnel


def build_corpus(total_bytes: int) -> bytes:
    """Mixed text+binary corpus (BASELINE.json config 4 shape)."""
    bee = open("/root/reference/test_files/original/bee_movie_script.txt",
               "rb").read()
    rng = np.random.default_rng(1234)
    parts = []
    size = 0
    while size < total_bytes:
        parts.append(bee)
        parts.append(rng.integers(0, 256, 65536, dtype=np.uint8).tobytes())
        parts.append(bytes(np.tile(rng.integers(0, 256, 64, dtype=np.uint8),
                                   256)))
        size += len(bee) + 65536 + 64 * 256
    return b"".join(parts)[:total_bytes]


def _alarm_guard(seconds):
    """context helper: raise TimeoutError if the block exceeds `seconds`."""
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
    try:  # persistent compile cache: repeat bench runs skip the ~60s compile
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from deflate_compression_tpu.core import bits as bits_mod
    from deflate_compression_tpu.format.deflate import encode_shard

    n = SHARD * N_SHARDS
    corpus = build_corpus(n)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # Each dispatch through the axon tunnel costs ~48 ms of pure roundtrip
    # latency (measured: tools/profile_decode dec_null) on top of device
    # work; the bench therefore processes TILE_ENC copies of the corpus per
    # dispatch — derived ON DEVICE with distinct salts, identical per-byte
    # work (same construction as the 100 MB/1 GB scale runs) — so the
    # reported MB/s reflects sustained throughput, not tunnel latency.
    TILE_ENC = 8

    @jax.jit
    def encode_all(batch, salt):
        # salt defeats execution-result caching between repeats without
        # changing the workload measurably (one byte per shard copy); only
        # scalar-sized outputs leave the device
        tiles = jnp.tile(batch, (TILE_ENC, 1))
        tiles = tiles.at[:, 0].set(
            salt + jnp.arange(tiles.shape[0], dtype=jnp.uint8))

        def one(row, fin):
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return (r["total_bits"], jnp.sum(r["words"], dtype=jnp.uint32))
        fins = jnp.zeros((TILE_ENC, N_SHARDS), jnp.bool_).at[:, -1].set(
            True).reshape(-1)
        # lax.map of vmap(8) chunks: one dispatch (amortizes the tunnel
        # roundtrip) at vmap(8) peak memory — the encoder's stacked
        # candidate scoring is memory-hungry at wider vmaps
        bits, fps = jax.lax.map(
            lambda ab: jax.vmap(one)(*ab),
            (tiles.reshape(TILE_ENC, N_SHARDS, SHARD),
             fins.reshape(TILE_ENC, N_SHARDS)))
        return bits.reshape(-1), fps.reshape(-1)

    @jax.jit
    def encode_last(batch):
        r = encode_shard(batch[N_SHARDS - 1], jnp.int32(SHARD),
                         jnp.asarray(True))
        return r["words"], r["total_bits"]

    t0 = time.perf_counter()
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)
    # force true materialization through the tunnel (block_until_ready alone
    # does not guarantee the bytes arrived): round-trip a reduction. The
    # tunnel occasionally wedges; don't let that kill the whole bench.
    try:
        with _alarm_guard(150):
            _ = int(np.asarray(jnp.sum(dbatch.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize round-trip wedged; continuing", file=sys.stderr)
    print(f"# upload+materialize {n >> 20} MB: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # AOT compile (no execution), so the first — most reliable — execution
    # of the tunnel session is the timed one
    t0 = time.perf_counter()
    ex = jax.jit(encode_all.__wrapped__).lower(
        jax.ShapeDtypeStruct(dbatch.shape, jnp.uint8),
        jax.ShapeDtypeStruct((), jnp.uint8)).compile()
    print(f"# AOT compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    best = None
    bits_h = None
    for attempt in range(2):
        try:
            with _alarm_guard(120):
                t0 = time.perf_counter()
                bits, fp = ex(dbatch, jnp.uint8(attempt * 31 + shards[0, 0]))
                _ = int(np.asarray(fp).sum())    # full sync via scalar fetch
                best = time.perf_counter() - t0
                bits_h = np.asarray(bits)        # keep the good result
            print(f"# timed execution (attempt {attempt}): {best:.2f}s",
                  file=sys.stderr)
            break
        except TimeoutError:
            print(f"# execution attempt {attempt} wedged; re-uploading",
                  file=sys.stderr)
            try:
                with _alarm_guard(45):
                    dbatch = jax.device_put(jnp.asarray(shards), dev)
                    jax.block_until_ready(dbatch)
            except TimeoutError:
                pass
    if best is None:
        # tunnel data-plane unusable right now. If a previous successful run
        # left a measurement, report that (marked); else report 0.
        import os
        print("# all executions wedged", file=sys.stderr)
        if os.path.exists(_LAST_GOOD):
            with open(_LAST_GOOD) as f:
                rec = json.load(f)
            rec["note"] = "cached measurement; tunnel wedged on this run"
            print("# falling back to last good measurement", file=sys.stderr)
            print(json.dumps(rec))
        else:
            print(json.dumps({"metric": "encode_throughput", "value": 0.0,
                              "unit": "MB/s", "vs_baseline": 0.0}))
        return

    # optional second rep (re-execution can wedge through the axon tunnel;
    # guard with an alarm and keep the first measurement if it does)
    import signal

    def _to(sig, frm):
        raise TimeoutError

    signal.signal(signal.SIGALRM, _to)
    signal.alarm(120)
    wedged = False
    try:
        t0 = time.perf_counter()
        b2, f2 = ex(dbatch, jnp.uint8(7))
        _ = int(np.asarray(f2).sum())
        best = min(best, time.perf_counter() - t0)
        print(f"# rep 2: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    except TimeoutError:
        wedged = True
        print("# rep 2 wedged; using first measurement", file=sys.stderr)
    finally:
        signal.alarm(0)
    ours_mbps = n * TILE_ENC / best / 1e6

    comp_bytes = int(np.sum((bits_h + 7) // 8))
    ratio = comp_bytes / (n * TILE_ENC)

    # spot-verify the final shard's actual bytes through the zlib oracle
    # (skipped if the tunnel session wedged — full verification lives in
    # tests/; this is belt-and-braces for the benched bytes)
    if not wedged:
        signal.alarm(240)
        try:
            w_last, tb_last = encode_last(dbatch)
            blob = bits_mod.words_to_bytes(np.asarray(w_last), int(tb_last))
            assert zlib.decompress(blob, wbits=-15) == \
                shards[N_SHARDS - 1].tobytes(), \
                "benched shard failed oracle verification"
            print("# oracle verification OK", file=sys.stderr)
        except TimeoutError:
            print("# verification fetch wedged; skipped", file=sys.stderr)
        finally:
            signal.alarm(0)

    # baseline: zlib level 6 on this host (+ level 9 ratio for context);
    # best of 3 — the shared host's load varies run to run (measured
    # 22-31 MB/s across one afternoon), and min is the conservative
    # denominator for vs_baseline
    zdt = None
    for _ in range(3):
        t0 = time.perf_counter()
        zcomp = zlib.compress(corpus, 6)
        dt_z = time.perf_counter() - t0
        zdt = dt_z if zdt is None else min(zdt, dt_z)
    z_mbps = n / zdt / 1e6
    z_ratio = (len(zcomp) - 6) / n
    z9_ratio = (len(zlib.compress(corpus, 9)) - 6) / n

    print(f"# ours: {ours_mbps:.2f} MB/s ratio {ratio:.4f}; "
          f"zlib-6: {z_mbps:.1f} MB/s ratio {z_ratio:.4f}; "
          f"zlib-9 ratio {z9_ratio:.4f}", file=sys.stderr)

    # ---------------- device decode benchmark (DECODE_rNN.json side artifact)
    # Encode once more keeping words + the .dcx-equivalent index ON DEVICE
    # (block offsets + sub-entries are exactly what the .dcx sidecar stores),
    # then time decode_blocks over all shards. The salt perturbs a capacity-
    # padding word beyond the real stream: new input fingerprint for the
    # tunnel's execution cache, identical decode work.
    try:
        from deflate_compression_tpu.decode.tpu_inflate import (
            decode_blocks_batch)

        @jax.jit
        def enc_keep(batch):
            def one(row, fin):
                r = encode_shard(row, jnp.int32(SHARD), fin)
                return (r["words"], r["block_bit_base"],
                        r["block_out_start"], r["btype"], r["n_blocks"],
                        r["sub_bit"], r["sub_out"], r["sub_blk"],
                        r["sub_overflow"])
            fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
            return jax.vmap(one)(batch, fins)

        # ONE flat dispatch for all shards (vmapping decode_blocks lowers
        # every symbol-loop gather to a slower batched form — ROADMAP r4);
        # TILE_DEC on-device copies amortize the ~48 ms tunnel roundtrip
        # exactly like the encode side.
        TILE_DEC = 4

        def _tile(x):
            return jnp.tile(x, (TILE_DEC,) + (1,) * (x.ndim - 1))

        @jax.jit
        def dec_all(words, bb, bo, bt, nb, sb, so, sk, salt):
            w = _tile(words)
            w = w.at[:, -1].add(salt
                                + jnp.arange(w.shape[0], dtype=jnp.uint32))
            valid = jnp.full((w.shape[0],), SHARD, jnp.int32)
            r = decode_blocks_batch(w, _tile(bb), _tile(bo), _tile(bt),
                                    _tile(nb), _tile(sb), _tile(so),
                                    _tile(sk), valid, SHARD, lut_bits=11)
            return r["ok"], jnp.sum(
                r["out"].astype(jnp.uint32), axis=1, dtype=jnp.uint32)

        @jax.jit
        def dec_adler(words, bb, bo, bt, nb, sb, so, sk):
            # untimed end-to-end verification: device adler32 per decoded
            # shard (the codec guarantee on the user-facing indexed path)
            from deflate_compression_tpu.core.checksum import adler32_jax
            valid = jnp.full((words.shape[0],), SHARD, jnp.int32)
            r = decode_blocks_batch(words, bb, bo, bt, nb, sb, so, sk,
                                    valid, SHARD, lut_bits=11)
            ad = jax.vmap(lambda o: adler32_jax(o, jnp.int32(SHARD)))(
                r["out"])
            return r["ok"], ad

        with _alarm_guard(280):
            enc_full = enc_keep(dbatch)
            jax.block_until_ready(enc_full)
            enc_out = enc_full[:8]
            # a dropped sub-entry would leave a range undecoded with ok=True:
            # gate the decode verdict on it (VERDICT r4 weak #4)
            sub_ovf = bool(np.asarray(enc_full[8]).any())
            dex = jax.jit(dec_all.__wrapped__).lower(
                *[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in enc_out],
                jax.ShapeDtypeStruct((), jnp.uint32)).compile()
        dbest = None
        oks = None
        outsum = None
        for rep in range(2):
            with _alarm_guard(150):
                t0 = time.perf_counter()
                oks, outsum = dex(*enc_out, jnp.uint32(rep + 1))
                oks = np.asarray(oks)
                outsum = np.asarray(outsum)
                dt = time.perf_counter() - t0
            dbest = dt if dbest is None else min(dbest, dt)
        want = np.tile(shards.astype(np.uint32).sum(axis=1), TILE_DEC)
        dec_ok = (not sub_ovf) and bool(oks.all()) and bool(
            (outsum == (want & 0xFFFFFFFF)).all())
        dec_mbps = n * TILE_DEC / dbest / 1e6

        # untimed adler verification of the decoded bytes, on device
        try:
            with _alarm_guard(150):
                aok, adev = dec_adler(*enc_out)
                aok = np.asarray(aok)
                adev = np.asarray(adev)
            want_ad = np.array([zlib.adler32(shards[i].tobytes())
                                for i in range(N_SHARDS)], np.uint32)
            dec_ok = dec_ok and bool(aok.all()) and bool(
                (adev == want_ad).all())
            print(f"# decode adler verify: {bool((adev == want_ad).all())}",
                  file=sys.stderr)
        except TimeoutError:
            print("# adler verify wedged; keeping sum check", file=sys.stderr)

        t0 = time.perf_counter()
        _ = zlib.decompress(zcomp)
        zd_mbps = n / (time.perf_counter() - t0) / 1e6
        print(f"# device decode: {dec_mbps:.2f} MB/s (ok={dec_ok}); "
              f"zlib host inflate: {zd_mbps:.1f} MB/s", file=sys.stderr)
        drec = {"metric": "decode_throughput", "value": round(dec_mbps, 2),
                "unit": "MB/s", "verified": dec_ok,
                "vs_baseline": round(dec_mbps / zd_mbps, 3)}
        with open("/root/repo/DECODE_r05.json", "w") as f:
            json.dump(drec, f)
    except TimeoutError:
        print("# decode bench wedged; skipped", file=sys.stderr)
    except Exception as e:  # decode bench must never break the contract line
        print(f"# decode bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    rec = {
        "metric": "encode_throughput",
        "value": round(ours_mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(ours_mbps / z_mbps, 3),
    }
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump(rec, f)
    except OSError:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
