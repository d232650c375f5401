"""Back-half micro-profile: trees / histograms / pack, batched 8x on TPU."""
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
NB = SHARD // 32768
T = SHARD + NB


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from deflate_compression_tpu.core import huffman
    from deflate_compression_tpu.core import bits as bits_mod
    from deflate_compression_tpu.format.deflate import encode_shard, out_words
    from bench import build_corpus

    n = SHARD * N_SHARDS
    corpus = build_corpus(n)
    shards = np.frombuffer(corpus, np.uint8).reshape(N_SHARDS, SHARD)
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    t0 = time.perf_counter()
    dbatch = jax.device_put(jnp.asarray(shards), dev)
    jax.block_until_ready(dbatch)
    try:
        with _alarm(200):
            _ = int(np.asarray(jnp.sum(dbatch.astype(jnp.uint32))))
    except TimeoutError:
        print("# materialize wedged; continuing", file=sys.stderr)
    print(f"# upload {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    OW = out_words(SHARD)

    def stage_trees(batch, salt):
        """Package-merge + canonical codes for NBx(286+30+19) per shard,
        from synthetic histograms derived from the data (defeats caching)."""
        batch = batch.at[0, 0].set(salt)

        def one(row):
            key = row.astype(jnp.int32).reshape(NB, -1)
            llf = jax.vmap(lambda r: huffman.histogram(r % 286, 286))(key)
            df = jax.vmap(lambda r: huffman.histogram(r % 30, 30))(key[:, :4096])
            clf = jax.vmap(lambda r: huffman.histogram(r % 19, 19))(key[:, :512])
            b15 = jax.vmap(lambda f: huffman.huffman_code_lengths(f, 15))
            b7 = jax.vmap(lambda f: huffman.huffman_code_lengths(f, 7))
            ll = b15(llf)
            dd = b15(df)
            cc = b7(clf)
            c15 = jax.vmap(lambda l: huffman.canonical_codes(l, 15))
            return (jnp.sum(ll) + jnp.sum(dd) + jnp.sum(cc)
                    + jnp.sum(c15(ll)) + jnp.sum(c15(dd)))
        return jax.vmap(one)(batch)

    def stage_hist(batch, salt):
        """The encoder's tile-histogram scatter: 2S keys into NB*316 bins."""
        batch = batch.at[0, 0].set(salt)

        def one(row):
            pos = jnp.arange(SHARD, dtype=jnp.int32)
            micro = pos // 32768
            k1 = micro * 286 + row.astype(jnp.int32)
            k2 = NB * 286 + micro * 30 + (row.astype(jnp.int32) % 30)
            f = huffman.histogram(jnp.concatenate([k1, k2]), NB * 316)
            return jnp.sum(f)
        return jax.vmap(one)(batch)

    def stage_pack(batch, salt):
        """pack_items64 with a realistic item stream (T + header items)."""
        batch = batch.at[0, 0].set(salt)
        N_ITEMS = NB * 4434 + T + 3

        def one(row):
            r32 = row.astype(jnp.uint32)
            lo = jnp.resize(r32, (N_ITEMS,))
            hi = jnp.zeros((N_ITEMS,), jnp.uint32)
            nbits = (lo % 12).astype(jnp.int32) + 1
            offs = jnp.cumsum(nbits) - nbits
            w = bits_mod.pack_items64_to_words(lo, hi, nbits, offs, OW)
            return jnp.sum(w, dtype=jnp.uint32)
        return jax.vmap(one)(batch)

    def stage_tokitems(batch, salt):
        """Token item assembly: 2 table gathers over T + cumsum."""
        batch = batch.at[0, 0].set(salt)

        def one(row):
            r32 = jnp.resize(row.astype(jnp.int32), (T,))
            tab = jnp.arange(NB * 286, dtype=jnp.uint32)
            tk = tab[(r32 * 7) % (NB * 286)]
            tab2 = jnp.arange(NB * 30, dtype=jnp.uint32)
            tk2 = tab2[(r32 * 11) % (NB * 30)]
            nbs = (tk % 20).astype(jnp.int32)
            c = jnp.cumsum(nbs)
            return jnp.sum(tk + tk2) + c[-1]
        return jax.vmap(one)(batch)

    def stage_encode(batch, salt):
        batch = batch.at[0, 0].set(salt)

        def one(row, fin):
            r = encode_shard(row, jnp.int32(SHARD), fin)
            return r["total_bits"], jnp.sum(r["words"], dtype=jnp.uint32)
        fins = jnp.arange(batch.shape[0]) == batch.shape[0] - 1
        return jax.vmap(one)(batch, fins)

    def stage_blockplan(batch, salt):
        from deflate_compression_tpu.core.cost import block_plan
        batch = batch.at[0, 0].set(salt)

        def one(row):
            key = row.astype(jnp.int32).reshape(NB, -1)
            llf = jax.vmap(lambda r: huffman.histogram(r % 286, 286))(key)
            df = jax.vmap(lambda r: huffman.histogram(r % 30, 30))(key[:, :4096])
            split, nb = block_plan(llf, df, jnp.int32(NB))
            return jnp.sum(split.astype(jnp.int32)) + nb
        return jax.vmap(one)(batch)

    def stage_rle(batch, salt):
        from deflate_compression_tpu.format.deflate import _tree_rle
        batch = batch.at[0, 0].set(salt)

        def one(row):
            comb = row.astype(jnp.int32)[:NB * 316].reshape(NB, 316) % 16
            total = jnp.full((NB,), 300, jnp.int32)
            s, ev, eb = _tree_rle(comb, total)
            return jnp.sum(s) + jnp.sum(ev) + jnp.sum(eb)
        return jax.vmap(one)(batch)

    stages = [
        ("warmup_pack", stage_pack),
        ("pack_items64", stage_pack),
        ("token_items", stage_tokitems),
        ("block_plan", stage_blockplan),
        ("tree_rle", stage_rle),
        ("histograms", stage_hist),
        ("trees(pm-merge)", stage_trees),
        ("encode_shard", stage_encode),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        stages = [s for s in stages if s[0] in want or s[0] == "warmup_pack"]

    for name, fn in stages:
        try:
            t0 = time.perf_counter()
            ex = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(dbatch.shape, jnp.uint8),
                jax.ShapeDtypeStruct((), jnp.uint8)).compile()
            ct = time.perf_counter() - t0
            best = None
            for rep in range(2):
                with _alarm(150):
                    t0 = time.perf_counter()
                    out = ex(dbatch, jnp.uint8(rep * 37 + 1))
                    jax.tree_util.tree_map(lambda x: np.asarray(x).sum(), out)
                    dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{name:20s} {best*1000:8.1f} ms ({best*1000/N_SHARDS:6.1f}"
                  f" ms/shard)  compile {ct:.0f}s", file=sys.stderr)
        except TimeoutError:
            print(f"{name:20s} WEDGED", file=sys.stderr)
        except Exception as e:  # noqa
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
