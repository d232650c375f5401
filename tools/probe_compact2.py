"""Round-5b probe: SCATTER-FREE compact-tail finishing for the chase.

probe_compact.py rejected compact-tail finishing because its extraction
used a full-S mostly-dropped scatter (~280 ms/8M — pathological on this
stack). This probe replaces the extraction with the round-5 dense
small-index mechanism:

  1. local front-compaction inside 64-lane rows via a fused one-hot
     compare-select-reduce (index space = 64 -> dense beats descriptors);
  2. global (row, local) addressing of the k-th tagged element via two
     tiny scatter-max + cummax segment fills over CAP (no searchsorted);
  3. ONE CAP-sized gather pulls the compacted global indices, one more
     pulls their values; compact rounds then hop through the FROZEN full
     array (each tagged entry's pointer is 2^PRE-hop-composed, so each
     linear compact round advances 2^PRE chain hops);
  4. scatter-back is CAP updates, ALL kept (junk lanes rewrite their own
     value at index 0) — not the pathological mostly-dropped form.

Synthetic state mirrors the bench corpus after 3 full rounds: 8% tagged,
pointers 8-hop-composed, remaining depth <= 20 (i.e. <= 3 compact rounds).
Compares against the cost of finishing with plain full-S rounds.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from deflate_compression_tpu.core import scans as _scans  # noqa: E402

S = 1 << 23
CAP = S // 8
_B = 64
_R = S // _B
TAGB = 24
_TAG = np.uint32(1) << np.uint32(TAGB)
_ADDR = np.uint32((1 << TAGB) - 1)


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


def compact_finish(v, n_rounds):
    """The scatter-free compact phase; returns (v_after, unconverged)."""
    m = (v & _TAG) != 0
    mr = m.reshape(_R, _B)
    # rank within row (exclusive), row counts, exclusive row offsets
    ti = mr.astype(jnp.int32)
    rank = jnp.cumsum(ti, axis=1) - ti                      # (R, B)
    cnt = jnp.sum(ti, axis=1)                               # (R,)
    off = _scans.cumsum(cnt)                                # inclusive
    off_x = off - cnt                                       # exclusive
    total = off[-1]

    # 1. local front-compaction of GLOBAL indices (dense one-hot, B = 64)
    gi = jnp.arange(S, dtype=jnp.int32).reshape(_R, _B)
    lane = jnp.arange(_B, dtype=jnp.int32)
    w = mr[:, :, None] & (rank[:, :, None] == lane[None, None, :])
    lci = jnp.sum(jnp.where(w, gi[:, :, None], 0), axis=1)  # (R, B)

    # 2. segment fill over CAP: row id + exclusive offset of the segment
    ks = jnp.arange(CAP, dtype=jnp.int32)
    dst = jnp.where(cnt > 0, jnp.clip(off_x, 0, CAP - 1), CAP)
    rows = jnp.zeros((CAP,), jnp.int32).at[dst].max(
        jnp.arange(_R, dtype=jnp.int32), mode="drop")
    rows = _scans.cummax(rows)
    offs = jnp.zeros((CAP,), jnp.int32).at[dst].max(off_x, mode="drop")
    offs = _scans.cummax(offs)
    live = ks < total

    # 3. gather compacted global indices, then their values
    src = jnp.clip(rows * _B + (ks - offs), 0, S - 1)
    cidx = jnp.where(live, lci.reshape(-1)[src], 0)
    cval = v[cidx]

    def cc_body(st):
        cv, ch, rr = st
        tag = live & ((cv & _TAG) != 0)
        hop = v[jnp.clip((cv & _ADDR).astype(jnp.int32), 0, S - 1)]
        cvn = jnp.where(tag, hop, cv)
        return cvn, jnp.any(live & ((cvn & _TAG) != 0)), rr + 1

    cval, unc, _ = jax.lax.while_loop(
        lambda st: st[1] & (st[2] < n_rounds), cc_body,
        (cval, jnp.any(live & ((cval & _TAG) != 0)), jnp.int32(0)))

    # 4. scatter-back: CAP updates, all kept (junk lanes rewrite v[0])
    vout = v.at[cidx].set(cval)
    return vout, unc


def mkfn(stage):
    @jax.jit
    def fn(v2, salt):
        v2 = v2 ^ (salt & np.uint32(1))
        if stage.startswith("full"):
            n = int(stage[4:])

            def body(st):
                v, ch, rr = st
                tag = (v & _TAG) != 0
                hop = v[(v & _ADDR).astype(jnp.int32)]
                vn = jnp.where(tag, hop, v)
                return vn, jnp.any((vn & _TAG) != 0), rr + 1

            v, _, nr = jax.lax.while_loop(
                lambda st: st[1] & (st[2] < n), body,
                (v2, jnp.any((v2 & _TAG) != 0), jnp.int32(0)))
            return jnp.sum(v, dtype=jnp.uint32)
        n = int(stage[7:]) if len(stage) > 7 else 8
        v, unc = compact_finish(v2, n)
        return (jnp.sum(v, dtype=jnp.uint32)
                + jnp.where(unc, np.uint32(1 << 31), np.uint32(0)))
    return fn


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    # synthetic post-3-rounds state: 8% tagged; 8-hop-composed pointers,
    # remaining linear depth <= 3 compact rounds (75% depth 1, 20% 2, 5% 3)
    v = rng.integers(0, 255, S, dtype=np.uint32)
    tagged_idx = np.sort(rng.choice(np.arange(1, S), S // 12, replace=False))
    tgt = np.maximum(tagged_idx - rng.integers(1, 30000, len(tagged_idx)), 0)
    # make depth-2/3 chains: 25% of tagged point at another tagged entry
    n_t = len(tagged_idx)
    deep = rng.random(n_t) < 0.25
    pos_of = np.searchsorted(tagged_idx, tgt)
    has_prev = pos_of > 0
    redirect = deep & has_prev
    tgt[redirect] = tagged_idx[pos_of[redirect] - 1]
    v[tagged_idx] = _TAG | tgt.astype(np.uint32)
    dv = jax.device_put(jnp.asarray(v), dev)
    jax.block_until_ready(dv)
    print(f"# materialized: {n_t} tagged ({100*n_t/S:.1f}%), CAP {CAP}",
          flush=True)
    for stage in ["full1", "full5", "compact8", "full1b", "full5b",
                  "compact8b"]:
        fn = mkfn(stage.rstrip("b"))
        best = None
        out = None
        for rep in range(2):
            try:
                with _alarm(240):
                    t0 = time.perf_counter()
                    out = int(np.asarray(fn(dv, jnp.uint32(rep))))
                    dt = time.perf_counter() - t0
            except TimeoutError:
                print(f"# {stage} wedged", flush=True)
                break
            best = dt if best is None else min(best, dt)
        if best is not None:
            print(f"{stage:10s} {best*1000:8.1f} ms  ({out:#x})", flush=True)

    # correctness: compact_finish result == full-rounds result. Salt 0 ONLY:
    # a nonzero salt flips bit 0 of every element INCLUDING tagged pointers
    # (fine for timing, but it can create self-loops — addr == own index —
    # that neither loop can converge; values still agree, only the probe's
    # unconverged-flag bit differs). decode correctness is covered by
    # tests/test_tpu_inflate.py::test_compact_tail_chase_256k.
    f5 = mkfn("full5")
    c8 = mkfn("compact8")
    a = int(np.asarray(f5(dv, jnp.uint32(0))))
    b = int(np.asarray(c8(dv, jnp.uint32(0))))
    print(f"# checksum full5={a:#x} compact8={b:#x} "
          f"{'MATCH' if a == b else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
