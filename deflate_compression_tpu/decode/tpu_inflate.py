"""TPU-parallel DEFLATE decoder (indexed two-phase decode).

Huffman decoding is bit-serial, so a TPU-native decoder restructures it
(SURVEY §7.3 item 4; PAPERS.md "Massively-Parallel Lossless Data
Decompression" / rapidgzip):

  Phase A — per-block dynamic header parse + canonical table construction,
    vectorized ACROSS blocks (lanes): a short masked loop over RLE symbols.
  Phase B — symbol decode, lanes = blocks: one `while_loop` whose body
    decodes one symbol in EVERY live block simultaneously. Canonical
    count-based decoding (first_code/limit per length) needs no LUTs: 15
    static shift/compare candidates + one gather into the (len,sym)-sorted
    symbol list. Tokens land in per-block slices of a flat array (block
    output offsets bound token counts, so slices cannot overlap).
  Phase C — LZ copy resolution in log2(S) pointer-doubling rounds over the
    whole output (the reference's byte-serial back-copy loop
    src/deflate_decompress.c:47-57 becomes 20 parallel gathers).

The index (per-block bit offset / output offset / type) comes free from our
encoder (format/deflate.py stats) or from one host pass over a foreign
stream (build_index). This is the deliberate TPU trade: random access +
device-parallel decode in exchange for a sidecar the sequential format
doesn't carry.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..format import constants as C

MAX_BITS = 15


# ---------------------------------------------------------------------------
# bit window reads from a u32-word view of the compressed stream
# ---------------------------------------------------------------------------

def _peek32(words: jnp.ndarray, bit_pos: jnp.ndarray) -> jnp.ndarray:
    """32-bit LSB-first window at arbitrary bit positions (vectorized)."""
    W = words.shape[0]
    wi = jnp.clip(bit_pos >> 5, 0, W - 1)
    sh = (bit_pos & 31).astype(jnp.uint32)
    lo = words[wi]
    hi = words[jnp.clip(wi + 1, 0, W - 1)]
    return (lo >> sh) | jnp.where(sh > 0, hi << (np.uint32(32) - sh),
                                  np.uint32(0))


def _rev15(v: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse the low 15 bits (LSB-first peek -> MSB-first code value)."""
    v = v & np.uint32(0x7FFF)
    r = jnp.zeros_like(v)
    for i in range(15):
        r = r | (((v >> np.uint32(i)) & np.uint32(1)) << np.uint32(14 - i))
    return r


# ---------------------------------------------------------------------------
# canonical decode tables: count-based (no LUT)
# ---------------------------------------------------------------------------

def _canon_tables(lengths: jnp.ndarray, n: int, max_bits: int):
    """From code lengths (NB, n) build count-based decode tables:
    first[l], limit[l], base[l] (NB, max_bits+1) and the (len,sym)-sorted
    symbol list (NB, n). Mirrors form_h_tree (src/deflate_decompress.c:
    146-161) as pure vector math."""
    NB = lengths.shape[0]
    lvl = jnp.arange(max_bits + 1)
    count = jnp.sum((lengths[:, :, None] == lvl[None, None, :])
                    & (lengths[:, :, None] > 0), axis=1).astype(jnp.int32)

    firsts = [jnp.zeros((NB,), jnp.int32)]
    code = jnp.zeros((NB,), jnp.int32)
    for l in range(1, max_bits + 1):
        code = (code + count[:, l - 1]) << 1
        firsts.append(code)
    first = jnp.stack(firsts, axis=1)                    # (NB, max_bits+1)
    limit = first + count
    base = jnp.cumsum(count, axis=1) - count             # symbols before l

    key = jnp.where(lengths > 0, lengths, max_bits + 1) * (2 * n) \
        + jnp.arange(n)[None, :]
    order = jnp.argsort(key, axis=1).astype(jnp.int32)   # (NB, n)
    return first, limit, base, order


def _decode_symbol(rev: jnp.ndarray, first, limit, base, order,
                   lane: jnp.ndarray, max_bits: int):
    """Vectorized canonical decode: returns (symbol, code_len); code_len 0 =>
    invalid code. fori_loop over code lengths keeps the compiled body small
    (the unrolled form exploded TPU compile time)."""
    def body(l, st):
        found_l, sym_idx = st
        c = (rev >> (np.uint32(max_bits) - l.astype(jnp.uint32))
             ).astype(jnp.int32)
        hit = (c < limit[lane, l]) & (found_l == 0)
        found_l = jnp.where(hit, l, found_l)
        sym_idx = jnp.where(hit, base[lane, l] + c - first[lane, l], sym_idx)
        return found_l, sym_idx

    z = jnp.zeros_like(rev, dtype=jnp.int32)
    found_l, sym_idx = jax.lax.fori_loop(1, max_bits + 1, body, (z, z))
    n = order.shape[1]
    sym = order[lane, jnp.clip(sym_idx, 0, n - 1)]
    return sym, found_l


_FIXED_LL_LEN = jnp.asarray(C.FIXED_LITLEN_LENGTHS[:C.NUM_LITLEN])
_FIXED_D_LEN = jnp.asarray(C.FIXED_DIST_LENGTHS[:C.NUM_DIST])


# ---------------------------------------------------------------------------
# the decoder
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_size",))
def decode_shard_indexed(comp_words: jnp.ndarray,
                         bit_base: jnp.ndarray,
                         out_start: jnp.ndarray,
                         btype: jnp.ndarray,
                         n_blocks: jnp.ndarray,
                         valid_out: jnp.ndarray,
                         out_size: int,
                         prefix: jnp.ndarray | None = None,
                         prefix_len: jnp.ndarray | None = None):
    """Decode one shard's DEFLATE substream given its block index.

    Args:
      comp_words: u32[CW] — the shard substream as LSB-first words.
      bit_base: i32[NB] — bit offset of each block's 3-bit header.
      out_start: i32[NB] — output byte offset where each block begins.
      btype: i32[NB] — 0/1/2 per block (-1 for unused slots).
      n_blocks: i32 — number of live blocks.
      valid_out: i32 — total decompressed bytes.
      out_size: static output capacity (>= valid_out).
      prefix/prefix_len: optional u8[W]/i32 — already-decoded window context
        occupying output positions [0, prefix_len): lets match distances
        reach into the previous decode group when the stream's 32 KB window
        crosses the group boundary (out_start entries must be shifted by the
        caller). out[:prefix_len] reproduces the prefix.

    Returns dict(out=u8[out_size], ok=bool, bad_lanes=bool diagnostics).
    """
    NB = bit_base.shape[0]
    S = out_size
    lanes = jnp.arange(NB, dtype=jnp.int32)
    live = (lanes < n_blocks)
    is_dyn = live & (btype == C.BTYPE_DYNAMIC)
    is_fix = live & (btype == C.BTYPE_FIXED)
    is_sto = live & (btype == C.BTYPE_STORED)
    huff = is_dyn | is_fix

    # lane output extents
    out_end = jnp.where(lanes + 1 < n_blocks,
                        out_start[jnp.clip(lanes + 1, 0, NB - 1)], valid_out)
    out_end = jnp.where(live, out_end, out_start)

    # ------------------------------------------------ phase A: block headers
    bp = bit_base + 3                                    # skip BFINAL/BTYPE
    w = _peek32(comp_words, bp)
    hlit = jnp.where(is_dyn, (w & np.uint32(31)).astype(jnp.int32) + 257, 257)
    hdist = jnp.where(is_dyn,
                      ((w >> np.uint32(5)) & np.uint32(31)).astype(jnp.int32) + 1, 1)
    hclen = jnp.where(is_dyn,
                      ((w >> np.uint32(10)) & np.uint32(15)).astype(jnp.int32) + 4, 4)
    bp = jnp.where(is_dyn, bp + 14, bp)

    # 19 x 3-bit code lengths in CLEN_ORDER
    clen_lens = jnp.zeros((NB, C.NUM_CLEN), jnp.int32)
    clen_order = jnp.asarray(C.CLEN_ORDER)
    for j in range(C.NUM_CLEN):
        v = (_peek32(comp_words, bp) & np.uint32(7)).astype(jnp.int32)
        use = is_dyn & (j < hclen)
        clen_lens = clen_lens.at[:, clen_order[j]].set(jnp.where(use, v, 0))
        bp = jnp.where(use, bp + 3, bp)

    cl_first, cl_limit, cl_base, cl_order = _canon_tables(
        clen_lens, C.NUM_CLEN, C.MAX_CLEN_BITS)

    # RLE loop over code-length symbols (masked, <= 316 steps)
    total_lens = hlit + hdist
    t316 = jnp.arange(_RLE_TOTAL := C.NUM_LITLEN + C.NUM_DIST, dtype=jnp.int32)

    def rle_cond(st):
        bp, i, prev, lens, bad = st
        return jnp.any(is_dyn & (i < total_lens) & ~bad)

    def rle_body(st):
        bp, i, prev, lens, bad = st
        act = is_dyn & (i < total_lens) & ~bad
        rev = _rev15(_peek32(comp_words, bp)) >> np.uint32(15 - 7)
        # clen decode uses 7-bit codes: feed 7-bit reversed window
        sym, cl = _decode_symbol(rev, cl_first, cl_limit, cl_base, cl_order,
                                 lanes, C.MAX_CLEN_BITS)
        bad = bad | (act & (cl == 0))
        bp2 = bp + cl
        w2 = _peek32(comp_words, bp2)
        is_lit = sym < 16
        is16 = sym == 16
        is17 = sym == 17
        is18 = sym == 18
        eb = jnp.where(is16, 2, jnp.where(is17, 3, jnp.where(is18, 7, 0)))
        ev = (w2 & ((np.uint32(1) << eb.astype(jnp.uint32)) - np.uint32(1))
              ).astype(jnp.int32)
        rep = jnp.where(is_lit, 1,
                        jnp.where(is16, 3 + ev,
                                  jnp.where(is17, 3 + ev, 11 + ev)))
        fill = jnp.where(is_lit, sym, jnp.where(is16, prev, 0))
        bad = bad | (act & is16 & (prev < 0))
        cover = (t316[None, :] >= i[:, None]) & \
                (t316[None, :] < (i + rep)[:, None]) & act[:, None]
        lens = jnp.where(cover, fill[:, None], lens)
        i = jnp.where(act, i + rep, i)
        bad = bad | (act & (i > total_lens))
        prev = jnp.where(act, jnp.where(is_lit, sym, jnp.where(
            is16, prev, 0)), prev)
        bp = jnp.where(act, bp2 + eb, bp)
        return bp, i, prev, lens, bad

    lens0 = jnp.zeros((NB, C.NUM_LITLEN + C.NUM_DIST), jnp.int32)
    prev0 = jnp.full((NB,), -1, jnp.int32)
    bad0 = jnp.zeros((NB,), jnp.bool_)
    i0 = jnp.zeros((NB,), jnp.int32)
    bp, _, _, lens, bad = jax.lax.while_loop(
        rle_cond, rle_body, (bp, i0, prev0, lens0, bad0))

    # split into litlen / dist lengths
    tl = jnp.arange(C.NUM_LITLEN, dtype=jnp.int32)
    ll_lens = jnp.where(tl[None, :] < hlit[:, None],
                        lens[:, :C.NUM_LITLEN], 0)
    td = jnp.arange(C.NUM_DIST, dtype=jnp.int32)
    d_gather = jnp.clip(hlit[:, None] + td[None, :], 0,
                        C.NUM_LITLEN + C.NUM_DIST - 1)
    d_lens = jnp.take_along_axis(lens, d_gather, axis=1)
    d_lens = jnp.where(td[None, :] < hdist[:, None], d_lens, 0)

    ll_lens = jnp.where(is_fix[:, None], _FIXED_LL_LEN[None, :], ll_lens)
    d_lens = jnp.where(is_fix[:, None], _FIXED_D_LEN[None, :], d_lens)

    ll_first, ll_limit, ll_base, ll_order = _canon_tables(
        ll_lens, C.NUM_LITLEN, MAX_BITS)
    d_first, d_limit, d_base, d_order = _canon_tables(
        d_lens, C.NUM_DIST, MAX_BITS)

    # -------------------------------------------- phase B: symbol decode loop
    len_base = jnp.asarray(C.LENGTH_BASE)
    len_extra = jnp.asarray(C.LENGTH_EXTRA)
    dist_base = jnp.asarray(C.DIST_BASE)
    dist_extra = jnp.asarray(C.DIST_EXTRA)

    TOK = S + NB
    tok_kind = jnp.zeros((TOK,), jnp.int32)     # 0 lit, 1 match
    tok_a = jnp.zeros((TOK,), jnp.int32)        # byte | length
    tok_d = jnp.zeros((TOK,), jnp.int32)        # dist
    tok_valid = jnp.zeros((TOK,), jnp.bool_)

    def dec_cond(st):
        bp, cnt, done, bad, *_ = st
        return jnp.any(~done & huff & ~bad)

    def dec_body(st):
        bp, cnt, done, bad, tok_kind, tok_a, tok_d, tok_valid = st
        act = ~done & huff & ~bad
        w = _peek32(comp_words, bp)
        rev = _rev15(w)
        sym, cl = _decode_symbol(rev, ll_first, ll_limit, ll_base, ll_order,
                                 lanes, MAX_BITS)
        bad = bad | (act & (cl == 0))
        bp1 = bp + cl

        is_eob = sym == C.EOB
        is_lit = sym < 256
        is_len = sym > C.EOB

        li = jnp.clip(sym - 257, 0, 28)
        leb = len_extra[li]
        w1 = _peek32(comp_words, bp1)
        lev = (w1 & ((np.uint32(1) << leb.astype(jnp.uint32)) - np.uint32(1))
               ).astype(jnp.int32)
        mlen = len_base[li] + lev
        bp2 = bp1 + jnp.where(is_len, leb, 0)

        w2 = _peek32(comp_words, bp2)
        drev = _rev15(w2)
        dsym, dcl = _decode_symbol(drev, d_first, d_limit, d_base, d_order,
                                   lanes, MAX_BITS)
        bad = bad | (act & is_len & (dcl == 0))
        bp3 = bp2 + jnp.where(is_len, dcl, 0)
        deb = dist_extra[jnp.clip(dsym, 0, 29)]
        w3 = _peek32(comp_words, bp3)
        dev = (w3 & ((np.uint32(1) << deb.astype(jnp.uint32)) - np.uint32(1))
               ).astype(jnp.int32)
        mdist = dist_base[jnp.clip(dsym, 0, 29)] + dev
        bp4 = bp3 + jnp.where(is_len, deb, 0)

        emit = act & (is_lit | is_len)
        slot = jnp.where(emit, out_start + cnt, TOK)
        tok_kind = tok_kind.at[slot].set(jnp.where(is_len, 1, 0), mode="drop")
        tok_a = tok_a.at[slot].set(jnp.where(is_len, mlen, sym), mode="drop")
        tok_d = tok_d.at[slot].set(jnp.where(is_len, mdist, 0), mode="drop")
        tok_valid = tok_valid.at[slot].set(True, mode="drop")

        cnt = jnp.where(emit, cnt + 1, cnt)
        done = done | (act & is_eob)
        bp = jnp.where(act, bp4, bp)
        # runaway guard: token count cannot exceed lane output size
        bad = bad | (act & (cnt > (out_end - out_start)))
        return bp, cnt, done, bad, tok_kind, tok_a, tok_d, tok_valid

    done0 = ~huff
    cnt0 = jnp.zeros((NB,), jnp.int32)
    st = (bp, cnt0, done0, bad, tok_kind, tok_a, tok_d, tok_valid)
    bp, cnt, done, bad, tok_kind, tok_a, tok_d, tok_valid = \
        jax.lax.while_loop(dec_cond, dec_body, st)

    # ------------------------------------------ phase C: output construction
    # token output positions: per-lane prefix of token lengths
    tok_len = jnp.where(tok_valid, jnp.where(tok_kind == 1, tok_a, 1), 0)
    csum = jnp.cumsum(tok_len) - tok_len
    lane_first = out_start                                # slot base per lane
    # lane of each slot: out_start is sorted ascending over live lanes
    slot_idx = jnp.arange(TOK, dtype=jnp.int32)
    sorted_starts = jnp.where(live, out_start, S + NB)
    lane_of_slot = jnp.clip(
        jnp.searchsorted(sorted_starts, slot_idx, side="right") - 1, 0, NB - 1
    ).astype(jnp.int32)
    base_csum = csum[jnp.clip(lane_first, 0, TOK - 1)]
    out_pos = out_start[lane_of_slot] + (csum - base_csum[lane_of_slot])
    out_pos = jnp.where(tok_valid, out_pos, S)

    # literal values + match coverage via forward-fill
    j_idx = jnp.arange(S, dtype=jnp.int32)
    if prefix is not None:
        plen = prefix_len.astype(jnp.int32)
        W = prefix.shape[0]
        lit_val = jnp.where(j_idx < plen,
                            jnp.concatenate(
                                [prefix.astype(jnp.uint8),
                                 jnp.zeros((max(S - W, 0),), jnp.uint8)])[:S],
                            0)
    else:
        plen = jnp.int32(0)
        lit_val = jnp.zeros((S,), jnp.uint8)
    lit_tgt = jnp.where(tok_valid & (tok_kind == 0), out_pos, S)
    lit_val = lit_val.at[lit_tgt].set(tok_a.astype(jnp.uint8), mode="drop")

    start_mark = jnp.full((S,), -1, jnp.int32)
    start_mark = start_mark.at[jnp.where(tok_valid, out_pos, S)].set(
        jnp.where(tok_valid, out_pos, -1), mode="drop")
    cover_start = jax.lax.cummax(start_mark)
    dist_at = jnp.zeros((S,), jnp.int32)
    dist_at = dist_at.at[jnp.where(tok_valid, out_pos, S)].set(
        jnp.where(tok_kind == 1, tok_d, 0), mode="drop")
    d_j = dist_at[jnp.clip(cover_start, 0, S - 1)]

    # stored blocks: direct byte copy from the aligned payload
    comp_bytes = jax.lax.bitcast_convert_type(
        comp_words, jnp.uint8).reshape(-1)
    sto_pay_byte = ((bit_base + 3 + 7) >> 3) + 4          # after LEN/NLEN
    lane_of_pos = jnp.clip(
        jnp.searchsorted(sorted_starts, j_idx, side="right") - 1, 0, NB - 1
    ).astype(jnp.int32)
    pos_lane_sto = is_sto[lane_of_pos] & (j_idx >= plen)
    sto_src = jnp.clip(sto_pay_byte[lane_of_pos]
                       + (j_idx - out_start[lane_of_pos]), 0,
                       comp_bytes.shape[0] - 1)
    lit_val = jnp.where(pos_lane_sto, comp_bytes[sto_src], lit_val)

    is_match_pos = (d_j > 0) & ~pos_lane_sto
    ptr = jnp.where(is_match_pos, j_idx - d_j, j_idx)
    ptr = jnp.clip(ptr, 0, S - 1)
    rounds = max(1, int(np.ceil(np.log2(max(S, 2)))))
    for _ in range(rounds):
        ptr = ptr[ptr]
    out = lit_val[ptr]
    out = jnp.where(j_idx < valid_out, out, 0)

    ok = ~jnp.any(bad) & jnp.all(done | ~huff)
    return {"out": out, "ok": ok, "bad_lanes": bad}
