"""Decode-phase profile: where do the ~61 ms/shard of device decode go?

Times, on the real TPU over the 2 MB bench corpus (8 shards, device-
resident, salted):
  * dec_full      — decode_blocks as benched (symbol loop + phase C)
  * dec_rounds0   — phase C pointer chase capped at 0 doubling rounds
                    (wrong output, same symbol-loop work) -> the delta is
                    what convergence-checked doubling actually costs
  * chase_only    — ONLY the phase C doubling on the real token stream
                    (tok scatter taken from a prior full decode)
Plus a host-side (numpy) chain-depth measurement of the corpus: the number
of doubling rounds needed is ceil(log2(max depth)).
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


SHARD = 1 << 18
N_SHARDS = 8


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.format.deflate import encode_shard
    from deflate_compression_tpu.decode.tpu_inflate import decode_blocks
    from bench import build_corpus

    n = SHARD * N_SHARDS
    corpus = build_corpus(n)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)
    try:
        with _alarm(240):
            _ = int(np.asarray(jnp.sum(dbatch.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize wedged; continuing", file=sys.stderr)
    print("# uploaded", file=sys.stderr)

    @jax.jit
    def enc_keep(batch):
        def one(row, fin):
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return (r["words"], r["block_bit_base"], r["block_out_start"],
                    r["btype"], r["n_blocks"], r["sub_bit"], r["sub_out"],
                    r["sub_blk"])
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.vmap(one)(batch, fins)

    enc_out = None
    for attempt in range(3):
        try:
            with _alarm(400):
                enc_out = enc_keep(dbatch)
                jax.block_until_ready(enc_out)
            break
        except TimeoutError:
            print(f"# encode attempt {attempt} wedged; re-uploading",
                  file=sys.stderr)
            try:
                with _alarm(120):
                    dbatch = jax.device_put(jnp.asarray(shards), dev)
                    jax.block_until_ready(dbatch)
            except TimeoutError:
                pass
    if enc_out is None:
        print("# encode unrecoverable; aborting", file=sys.stderr)
        return
    print("# encoded", file=sys.stderr)

    from deflate_compression_tpu.decode.tpu_inflate import decode_blocks_batch

    def dec_flat(args, salt):
        # ONE flat dispatch over all shards (the bench path)
        words, bb, bo, bt, nb, sb, so, sk = args
        words = words.at[:, -1].add(salt.astype(jnp.uint32))
        valid = jnp.full((words.shape[0],), SHARD, jnp.int32)
        r = decode_blocks_batch(words, bb, bo, bt, nb, sb, so, sk, valid,
                                SHARD, lut_bits=11)
        return r["ok"], jnp.sum(r["out"].astype(jnp.uint32), axis=1,
                                dtype=jnp.uint32)

    def dec_flat_t4(args, salt):
        # the bench's exact shape: TILE_DEC=4 on-device corpus copies in one
        # flat dispatch (B=32 shards, S=8M) — divide the printed ms by 4
        words, bb, bo, bt, nb, sb, so, sk = args

        def t(x):
            return jnp.tile(x, (4,) + (1,) * (x.ndim - 1))
        words = t(words)
        words = words.at[:, -1].add(salt
                                    + jnp.arange(words.shape[0],
                                                 dtype=jnp.uint32))
        valid = jnp.full((words.shape[0],), SHARD, jnp.int32)
        r = decode_blocks_batch(words, t(bb), t(bo), t(bt), t(nb), t(sb),
                                t(so), t(sk), valid, SHARD, lut_bits=11)
        return r["ok"], jnp.sum(r["out"].astype(jnp.uint32), axis=1,
                                dtype=jnp.uint32)

    def dec_full(args, salt):
        words, bb, bo, bt, nb, sb, so, sk = args
        words = words.at[:, -1].add(salt.astype(jnp.uint32))

        def one(w, bb1, bo1, bt1, nb1, sb1, so1, sk1):
            r = decode_blocks(w, bb1, bo1, bt1, nb1, sb1, so1, sk1,
                              jnp.int32(sb1.shape[0]), jnp.int32(SHARD),
                              SHARD, lut_bits=11)
            return r["ok"], jnp.sum(r["out"], dtype=jnp.uint32)
        return jax.vmap(one)(words, bb, bo, bt, nb, sb, so, sk)

    def dec_headers(args, salt):
        # dead lanes: phase A (header parse + RLE loop + LUT builds) and the
        # output machinery run; the symbol loop body never fires
        words, bb, bo, bt, nb, sb, so, sk = args
        words = words.at[:, -1].add(salt.astype(jnp.uint32))

        def one(w, bb1, bo1, bt1, nb1, sb1, so1, sk1):
            r = decode_blocks(w, bb1, bo1, bt1, nb1, sb1, so1,
                              jnp.full_like(sk1, -1),
                              jnp.int32(sb1.shape[0]), jnp.int32(SHARD),
                              SHARD, lut_bits=11)
            return r["ok"], jnp.sum(r["out"], dtype=jnp.uint32)
        return jax.vmap(one)(words, bb, bo, bt, nb, sb, so, sk)

    def dec_noblocks(args, salt):
        # n_blocks=0: phase A degenerates too; measures LUT-build + fixed
        # machinery (tables are still built for NB slots)
        words, bb, bo, bt, nb, sb, so, sk = args
        words = words.at[:, -1].add(salt.astype(jnp.uint32))

        def one(w, bb1, bo1, bt1, nb1, sb1, so1, sk1):
            r = decode_blocks(w, bb1, bo1, jnp.full_like(bt1, -1),
                              jnp.int32(0), sb1, so1,
                              jnp.full_like(sk1, -1), jnp.int32(0),
                              jnp.int32(SHARD), SHARD, lut_bits=11)
            return r["ok"], jnp.sum(r["out"], dtype=jnp.uint32)
        return jax.vmap(one)(words, bb, bo, bt, nb, sb, so, sk)

    def make_ablate(abl):
        def fn(args, salt):
            words, bb, bo, bt, nb, sb, so, sk = args
            words = words.at[:, -1].add(salt.astype(jnp.uint32))

            def one(w, bb1, bo1, bt1, nb1, sb1, so1, sk1):
                r = decode_blocks(w, bb1, bo1, jnp.full_like(bt1, -1),
                                  jnp.int32(0), sb1, so1,
                                  jnp.full_like(sk1, -1), jnp.int32(0),
                                  jnp.int32(SHARD), SHARD, lut_bits=11,
                                  _ablate=abl)
                return r["ok"], jnp.sum(r["out"], dtype=jnp.uint32)
            return jax.vmap(one)(words, bb, bo, bt, nb, sb, so, sk)
        return fn

    def dec_null(args, salt):
        # measurement floor: touch the inputs, do no decode work
        words, bb, bo, bt, nb, sb, so, sk = args
        words = words.at[:, -1].add(salt.astype(jnp.uint32))
        return (jnp.sum(words, dtype=jnp.uint32),
                jnp.sum(bb, dtype=jnp.int32)
                + jnp.sum(sk, dtype=jnp.int32))

    def make_t4(abl, kill_lanes=False, tiles=4):
        def fn(args, salt):
            words, bb, bo, bt, nb, sb, so, sk = args

            def t(x):
                return jnp.tile(x, (tiles,) + (1,) * (x.ndim - 1))
            words = t(words)
            words = words.at[:, -1].add(salt + jnp.arange(
                words.shape[0], dtype=jnp.uint32))
            sk4 = jnp.full_like(t(sk), -1) if kill_lanes else t(sk)
            valid = jnp.full((words.shape[0],), SHARD, jnp.int32)
            r = decode_blocks_batch(words, t(bb), t(bo), t(bt), t(nb),
                                    t(sb), t(so), sk4, valid, SHARD,
                                    lut_bits=11, _ablate=abl)
            return r["ok"], jnp.sum(r["out"].astype(jnp.uint32), axis=1,
                                    dtype=jnp.uint32)
        return fn

    stages = [("t4_nosto", make_t4("slices")),
              ("t4_nostob", make_t4("slices")),
              ("t8_flat", make_t4("", tiles=8)),
              ("t8_flatb", make_t4("", tiles=8)),
              ("t4_nocmp", make_t4("nocmp")),
              ("t4_nocmpb", make_t4("nocmp")),
              ("dec_null", dec_null), ("dec_null2", dec_null),
              ("t4_hdronly", make_t4("", kill_lanes=True)),
              ("t4_nochase", make_t4("chase")),
              ("dec_flat", dec_flat), ("dec_flat2", dec_flat),
              ("dec_flat_t4", dec_flat_t4), ("dec_flat_t4b", dec_flat_t4),
              ("dec_full", dec_full), ("dec_headers", dec_headers),
              ("dec_noblocks", dec_noblocks),
              ("nb-slices", make_ablate("slices")),
              ("nb-lut", make_ablate("slices,lut")),
              ("nb-canon", make_ablate("slices,lut,canon")),
              ("nb-min", make_ablate("slices,lut,canon,toksc,hw")),
              ("nb-min-scan", make_ablate("slices,lut,canon,toksc,hw,scans"))]
    sel = sys.argv[1:]
    if sel:
        stages = [(n2, f) for n2, f in stages
                  if any(n2.startswith(s) for s in sel)]
    for name, fn in stages:
        try:
            t0 = time.perf_counter()
            ex = jax.jit(fn).lower(
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), enc_out),
                jax.ShapeDtypeStruct((), jnp.uint32)).compile()
            ct = time.perf_counter() - t0
            best = None
            for rep in range(3):
                try:
                    with _alarm(240):
                        t0 = time.perf_counter()
                        out = ex(enc_out, jnp.uint32(rep * 13 + 1))
                        jax.tree_util.tree_map(
                            lambda x: np.asarray(x).sum(), out)
                        dt = time.perf_counter() - t0
                except TimeoutError:
                    print(f"#   rep {rep} wedged", file=sys.stderr)
                    continue
                best = dt if best is None else min(best, dt)
                if rep >= 1 and best is not None:
                    break
            if best is None:
                print(f"{name:12s} WEDGED", file=sys.stderr)
                continue
            print(f"{name:12s} {best*1000:8.1f} ms ({best*1000/N_SHARDS:6.1f}"
                  f" ms/shard, {n/best/1e6:6.2f} MB/s) compile {ct:.0f}s",
                  file=sys.stderr)
        except TimeoutError:
            print(f"{name:12s} WEDGED", file=sys.stderr)
        except Exception as e:  # noqa
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
