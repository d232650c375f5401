"""TPU-parallel DEFLATE decoder (indexed, sub-block-parallel, LUT decode).

Huffman decoding is bit-serial, so a TPU-native decoder restructures it
(SURVEY §7.3 item 4; PAPERS.md "Massively-Parallel Lossless Data
Decompression" / rapidgzip):

  Phase A — per-block header parse + canonical table construction,
    vectorized ACROSS blocks: a short masked loop over RLE symbols, then a
    per-block flat decode LUT (raw 15-bit LSB-first peek -> (symbol index,
    code length)) built with pure elementwise math — the bit reversal and
    the 15 length candidates are folded in at build time, so the symbol
    loop needs neither a bit-reverse nor a length search.
  Phase B — symbol decode, lanes = SUB-BLOCK entry points (the encoder
    emits a (bit, out) checkpoint every SUB_SIZE output bytes inside each
    block — free, because it knows every token's bit offset): one
    `while_loop` whose body decodes one symbol in EVERY live lane
    simultaneously; a lane stops when its output cursor reaches the next
    entry, so EOB is only ever *written*, never required. More lanes, fewer
    steps: the step count is tokens-per-sub-block, not tokens-per-block.
  Phase C — LZ copy resolution: overlapping copies collapse analytically
    (a match at start s, dist d pulls byte j from s - d + ((j-s) mod d) —
    the reference's byte-serial back-copy src/deflate_decompress.c:47-57
    replays this one byte at a time), then convergence-checked pointer
    doubling resolves cross-token chains in log2(chain-depth) gathers.

Strictness (never return silently-wrong data): invalid prefixes (cl == 0),
litlen symbols >= 286 and dist symbols >= 30 (RFC 1951 §3.2.5-3.2.6 "will
never actually occur" — the reference's structure rejects them,
src/deflate_decompress.c:278-279), HLIT > 286 / HDIST > 30, oversubscribed
trees (Kraft sum), premature EOB, lane overrun, negative copy distances,
and a hard bit-budget/step bound all flag the lane bad; `ok=False` whenever
any live lane is bad. The loops are bounded, so corrupt input can't hang.

The index (per-block bit/output offsets + sub-entries) comes free from our
encoder (format/deflate.py stats) or from one host pass over a foreign
stream (decode/index.py build_index). This is the deliberate TPU trade:
random access + device-parallel decode in exchange for a sidecar the
sequential format doesn't carry.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..format import constants as C

MAX_BITS = 15
SUB_SIZE = 1024                  # sub-block entry spacing (output bytes)
_LSZ = 1 << MAX_BITS
_N_LL = 288                      # decode-side litlen alphabet (286/287 bad)
_N_D = 32                        # decode-side dist alphabet (30/31 bad)


def _rev_table(bits: int) -> np.ndarray:
    p = np.arange(1 << bits, dtype=np.uint32)
    r = np.zeros_like(p)
    for i in range(bits):
        r |= ((p >> i) & 1) << (bits - 1 - i)
    return r


_REV_CACHE = {}


def _rev_np(bits: int) -> np.ndarray:
    if bits not in _REV_CACHE:
        _REV_CACHE[bits] = _rev_table(bits)
    return _REV_CACHE[bits]


_REV15 = _rev_np(15)
_REV7 = _rev_np(7)

# fixed trees, full decode-side alphabets (RFC 1951 §3.2.6: lengths are
# DEFINED for 286/287 and dist codes 30/31 — they shape the canonical
# counts even though the symbols themselves must never occur)
_FIXED_LL_LEN_FULL = np.zeros(_N_LL, np.int32)
_FIXED_LL_LEN_FULL[:len(C.FIXED_LITLEN_LENGTHS)] = C.FIXED_LITLEN_LENGTHS
_FIXED_D_LEN_FULL = np.zeros(_N_D, np.int32)
_FIXED_D_LEN_FULL[:len(C.FIXED_DIST_LENGTHS)] = C.FIXED_DIST_LENGTHS
if len(C.FIXED_DIST_LENGTHS) < _N_D:
    _FIXED_D_LEN_FULL[len(C.FIXED_DIST_LENGTHS):] = 5


# ---------------------------------------------------------------------------
# bit windows
# ---------------------------------------------------------------------------

def _peek32(words: jnp.ndarray, bit_pos: jnp.ndarray) -> jnp.ndarray:
    """32-bit LSB-first window at arbitrary bit positions (vectorized)."""
    W = words.shape[0]
    wi = jnp.clip(bit_pos >> 5, 0, W - 1)
    sh = (bit_pos & 31).astype(jnp.uint32)
    lo = words[wi]
    hi = words[jnp.clip(wi + 1, 0, W - 1)]
    return (lo >> sh) | jnp.where(sh > 0, hi << ((np.uint32(32) - sh)
                                                 & np.uint32(31)),
                                  np.uint32(0))


def _peek64(words: jnp.ndarray, bit_pos: jnp.ndarray):
    """64-bit LSB-first window as (lo, hi) u32 pair (3 word gathers)."""
    W = words.shape[0]
    wi = jnp.clip(bit_pos >> 5, 0, W - 1)
    sh = (bit_pos & 31).astype(jnp.uint32)
    w0 = words[wi]
    w1 = words[jnp.clip(wi + 1, 0, W - 1)]
    w2 = words[jnp.clip(wi + 2, 0, W - 1)]
    up = (np.uint32(32) - sh) & np.uint32(31)
    nz = sh > 0
    lo = (w0 >> sh) | jnp.where(nz, w1 << up, np.uint32(0))
    hi = (w1 >> sh) | jnp.where(nz, w2 << up, np.uint32(0))
    return lo, hi


def _halfwords(words: jnp.ndarray) -> jnp.ndarray:
    """u32[W] -> u32[2W, 2] half-word-granularity PAIR table: row i holds
    (bits [16i, 16i+32), bits [16i+32, 16i+64)). Built once, elementwise;
    lets the symbol loop fetch a 64-bit window with ONE row gather
    (descriptor cost is per row, not per element)."""
    w = words.astype(jnp.uint32)
    nxt = jnp.concatenate([w[1:], jnp.zeros((1,), jnp.uint32)])
    nxt2 = jnp.concatenate([w[2:], jnp.zeros((2,), jnp.uint32)])
    odd = (w >> np.uint32(16)) | (nxt << np.uint32(16))
    odd2 = (nxt >> np.uint32(16)) | (nxt2 << np.uint32(16))
    return jnp.stack([jnp.stack([w, nxt], axis=1),
                      jnp.stack([odd, odd2], axis=1)],
                     axis=1).reshape(-1, 2)


def _peek48(hw: jnp.ndarray, bit_pos: jnp.ndarray):
    """48-bit LSB-first window as (lo, hi) u32 pair from the half-word pair
    table (ONE row gather; hi carries >= 16 valid bits, enough for any
    DEFLATE token tail: cl+leb+dcl+deb <= 48)."""
    H = hw.shape[0]
    i = jnp.clip(bit_pos >> 4, 0, H - 1)
    sh = (bit_pos & 15).astype(jnp.uint32)
    row = hw[i]                                   # (..., 2)
    a = row[..., 0]
    b = row[..., 1]
    lo = (a >> sh) | jnp.where(sh > 0,
                               b << ((np.uint32(32) - sh) & np.uint32(31)),
                               np.uint32(0))
    hi = b >> sh
    return lo, hi


def _extract(lo: jnp.ndarray, hi: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """32-bit window at bit offset `off` in [0, 48] of the (lo, hi) pair."""
    o = off.astype(jnp.uint32)
    ol = o & np.uint32(31)
    below = (lo >> ol) | jnp.where(ol > 0,
                                   hi << ((np.uint32(32) - ol) & np.uint32(31)),
                                   np.uint32(0))
    above = hi >> ((o - np.uint32(32)) & np.uint32(31))
    return jnp.where(o < 32, below, above)


def _mask(nb: jnp.ndarray) -> jnp.ndarray:
    """(1 << nb) - 1 for nb in [0, 16]."""
    return (np.uint32(1) << nb.astype(jnp.uint32)) - np.uint32(1)


# ---------------------------------------------------------------------------
# canonical decode tables + flat LUT
# ---------------------------------------------------------------------------

def _canon_tables(lengths: jnp.ndarray, n: int, max_bits: int):
    """From code lengths (NB, n) build count-based decode tables first[l],
    limit[l], base[l] (NB, max_bits+1), the (len,sym)-sorted symbol list
    (NB, n), and the Kraft sum (oversubscription check). Mirrors form_h_tree
    (src/deflate_decompress.c:146-161) as pure vector math."""
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
    kraft = jnp.sum(count[:, 1:] << (max_bits - lvl[1:])[None, :], axis=1)
    over = kraft > (1 << max_bits)
    return first, limit, base, order, over


def _build_lut(first, limit, base, max_bits: int, rev_np: np.ndarray):
    """(NB, 2^max_bits) rank/length decode tables over the RAW LSB-first
    peek value. Returns (rank, code_len), code_len 0 => invalid prefix.
    Pure elementwise build (the bit reversal and all length candidates are
    host constants) — no gathers."""
    found = jnp.zeros((first.shape[0], 1 << max_bits), jnp.int32)
    idx = jnp.zeros_like(found)
    for l in range(1, max_bits + 1):
        c = jnp.asarray((rev_np >> (max_bits - l)).astype(np.int32))[None, :]
        hit = (c >= first[:, l:l + 1]) & (c < limit[:, l:l + 1]) & (found == 0)
        found = jnp.where(hit, l, found)
        idx = jnp.where(hit, base[:, l:l + 1] + c - first[:, l:l + 1], idx)
    return idx, found


def _merge_lut(rank, cl, pay, cl_shift: int):
    """Fold the per-rank payload table INTO the peek LUT so the symbol loop
    needs ONE gather per alphabet instead of rank-LUT + payload: entry =
    pay[rank] | (code_len << cl_shift). One small (NB, 2^lut_bits)
    take_along_axis at table-build time (runs once per decode dispatch)
    kills a per-SYMBOL gather — the classic zlib-ng direct-entry table,
    rebuilt here as batched vector math."""
    return jnp.take_along_axis(pay, rank, axis=1) | (cl << cl_shift)


# ---------------------------------------------------------------------------
# the decoder
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_size", "lut_bits",
                                             "_ablate"))
def decode_blocks(comp_words: jnp.ndarray,
                  blk_bit: jnp.ndarray,
                  blk_out: jnp.ndarray,
                  blk_btype: jnp.ndarray,
                  n_blocks: jnp.ndarray,
                  sub_bit: jnp.ndarray,
                  sub_out: jnp.ndarray,
                  sub_blk: jnp.ndarray,
                  n_subs: jnp.ndarray,
                  valid_out: jnp.ndarray,
                  out_size: int,
                  prefix: jnp.ndarray | None = None,
                  prefix_len: jnp.ndarray | None = None,
                  lut_bits: int = MAX_BITS,
                  max_dist: jnp.ndarray | int = C.WINDOW_SIZE,
                  blk_end: jnp.ndarray | None = None,
                  _ablate: str = ""):
    # _ablate: PROFILING ONLY — comma list of stages to stub out (wrong
    # output, same shapes): "lut", "canon", "slices", "toksc", "hw".
    """Decode a DEFLATE substream given its block index + sub-entries.

    Args:
      comp_words: u32[CW] — the substream as LSB-first words.
      blk_bit/blk_out/blk_btype: i32[NB] per coding block: bit offset of the
        3-bit header, output byte offset, BTYPE (-1 for unused slots).
      n_blocks: i32 — live block count.
      sub_bit/sub_out/sub_blk: i32[NL] sub-entry lanes: bit offset of the
        first token (-1 => "first token of the block": resolved from the
        phase-A header-parse end), output byte offset, owning block id
        (-1 => dead lane). Entries must be sorted by sub_out; each
        Huffman block's start must appear as its first sub-entry. Stored
        blocks need no entries (they decode positionally).
      valid_out: i32 — total decompressed bytes (incl. prefix).
      out_size: static output capacity (>= valid_out).
      prefix/prefix_len: optional u8[W]/i32 window context occupying output
        [0, prefix_len) so match distances may reach into the previous
        decode group (caller shifts all out offsets by prefix_len).

      lut_bits: static decode-LUT width. 15 decodes any RFC stream; 11
        suffices for THIS framework's encoder (format/deflate.TREE_LIMIT)
        and cuts the per-block LUT build 16x. A code longer than lut_bits
        flags the lane bad (strict), never decodes wrong.
      max_dist: declared sliding-window size — any match distance above it
        flags the lane bad (the reference bounds distances by the zlib
        header's CINFO window, src/deflate_decompress.c:360,278-279).

    Returns dict(out=u8[out_size], ok=bool, bad_lanes=bool[NL]).
    """
    max_dist = jnp.asarray(max_dist, jnp.int32)
    NB = blk_bit.shape[0]
    NL = sub_bit.shape[0]
    S = out_size
    CW = comp_words.shape[0]
    comp_words = comp_words.astype(jnp.uint32)

    blanes = jnp.arange(NB, dtype=jnp.int32)
    # dead slots carry btype == -1 (batch mode interleaves them per shard)
    blive = (blanes < n_blocks) & (blk_btype >= 0)
    is_dyn = blive & (blk_btype == C.BTYPE_DYNAMIC)
    is_fix = blive & (blk_btype == C.BTYPE_FIXED)
    is_sto = blive & (blk_btype == C.BTYPE_STORED)
    bbad = blive & (blk_btype == 3)                      # reserved BTYPE
    huff = is_dyn | is_fix

    if blk_end is None:
        blk_end = jnp.where(blanes + 1 < n_blocks,
                            blk_out[jnp.clip(blanes + 1, 0, NB - 1)],
                            valid_out)
        blk_end = jnp.where(blive, blk_end, blk_out)

    # ------------------------------------------------ phase A: block headers
    bp = blk_bit + 3                                     # skip BFINAL/BTYPE
    w = _peek32(comp_words, bp)
    hlit = jnp.where(is_dyn, (w & np.uint32(31)).astype(jnp.int32) + 257, 257)
    hdist = jnp.where(is_dyn,
                      ((w >> np.uint32(5)) & np.uint32(31)).astype(jnp.int32) + 1, 1)
    hclen = jnp.where(is_dyn,
                      ((w >> np.uint32(10)) & np.uint32(15)).astype(jnp.int32) + 4, 4)
    bbad = bbad | (is_dyn & ((hlit > 286) | (hdist > 30)))
    bp = jnp.where(is_dyn, bp + 14, bp)

    clen_lens = jnp.zeros((NB, C.NUM_CLEN), jnp.int32)
    clen_order = jnp.asarray(C.CLEN_ORDER)
    for j in range(C.NUM_CLEN):
        v = (_peek32(comp_words, bp) & np.uint32(7)).astype(jnp.int32)
        use = is_dyn & (j < hclen)
        clen_lens = clen_lens.at[:, clen_order[j]].set(jnp.where(use, v, 0))
        bp = jnp.where(use, bp + 3, bp)

    cl_first, cl_limit, cl_base, cl_order, cl_over = _canon_tables(
        clen_lens, C.NUM_CLEN, C.MAX_CLEN_BITS)
    bbad = bbad | (is_dyn & cl_over)
    cl_rank, cl_cl = _build_lut(cl_first, cl_limit, cl_base,
                                C.MAX_CLEN_BITS, _REV7)
    # merged entry: symbol (5 bits) | code_len << 5 — one gather per RLE step
    cl_lut_f = _merge_lut(cl_rank, cl_cl, cl_order, 5).reshape(-1)

    # RLE loop over code-length symbols (masked, <= 316 effective steps)
    total_lens = hlit + hdist
    _RLE_W = C.NUM_LITLEN + C.NUM_DIST
    t316 = jnp.arange(_RLE_W, dtype=jnp.int32)
    bit_budget = jnp.int32(32 * CW)

    def rle_cond(st):
        bp, i, prev, lens, bad, steps = st
        return jnp.any(is_dyn & (i < total_lens) & ~bad) & (steps < _RLE_W + 4)

    def rle_body(st):
        bp, i, prev, lens, bad, steps = st
        act = is_dyn & (i < total_lens) & ~bad
        lo, hi = _peek64(comp_words, bp)
        e = cl_lut_f[blanes * (1 << C.MAX_CLEN_BITS)
                     + (lo & np.uint32((1 << C.MAX_CLEN_BITS) - 1)
                        ).astype(jnp.int32)]
        cl = e >> 5
        bad = bad | (act & (cl == 0))
        sym = e & 0x1F
        is_lit = sym < 16
        is16 = sym == 16
        is17 = sym == 17
        is18 = sym == 18
        eb = jnp.where(is16, 2, jnp.where(is17, 3, jnp.where(is18, 7, 0)))
        ev = (_extract(lo, hi, cl) & _mask(eb)).astype(jnp.int32)
        rep = jnp.where(is_lit, 1,
                        jnp.where(is16 | is17, 3 + ev, 11 + ev))
        fill = jnp.where(is_lit, sym, jnp.where(is16, prev, 0))
        bad = bad | (act & is16 & (prev < 0))
        cover = (t316[None, :] >= i[:, None]) & \
                (t316[None, :] < (i + rep)[:, None]) & act[:, None]
        lens = jnp.where(cover, fill[:, None], lens)
        i = jnp.where(act, i + rep, i)
        bad = bad | (act & (i > total_lens))
        prev = jnp.where(act, jnp.where(is_lit, sym,
                                        jnp.where(is16, prev, 0)), prev)
        bp = jnp.where(act, bp + cl + eb, bp)
        bad = bad | (act & (bp > bit_budget))
        return bp, i, prev, lens, bad, steps + 1

    def rle_body2(st):
        # 2x unroll: the RLE loop is bound by per-iteration kernel launch
        # overhead, not by its (NB, 316) element work
        return rle_body(rle_body(st))

    lens0 = jnp.zeros((NB, _RLE_W), jnp.int32)
    st0 = (bp, jnp.zeros((NB,), jnp.int32), jnp.full((NB,), -1, jnp.int32),
           lens0, bbad, jnp.int32(0))
    bp, _, _, lens, bbad, _ = jax.lax.while_loop(rle_cond, rle_body2, st0)

    # split into litlen / dist lengths (decode-side widths 288 / 32)
    tl = jnp.arange(_N_LL, dtype=jnp.int32)
    ll_dyn = jnp.concatenate(
        [lens[:, :C.NUM_LITLEN],
         jnp.zeros((NB, _N_LL - C.NUM_LITLEN), jnp.int32)], axis=1)
    ll_lens = jnp.where(tl[None, :] < hlit[:, None], ll_dyn, 0)
    td = jnp.arange(_N_D, dtype=jnp.int32)
    d_gather = jnp.clip(hlit[:, None] + td[None, :], 0, _RLE_W - 1)
    d_lens = jnp.take_along_axis(lens, d_gather, axis=1)
    d_lens = jnp.where(td[None, :] < hdist[:, None], d_lens, 0)

    ll_lens = jnp.where(is_fix[:, None],
                        jnp.asarray(_FIXED_LL_LEN_FULL)[None, :], ll_lens)
    d_lens = jnp.where(is_fix[:, None],
                       jnp.asarray(_FIXED_D_LEN_FULL)[None, :], d_lens)

    if "canon" in _ablate:                               # profiling stub
        z = jnp.zeros((NB, MAX_BITS + 1), jnp.int32)
        ll_first = ll_limit = ll_base = z
        d_first = d_limit = d_base = z
        ll_order = jnp.zeros((NB, _N_LL), jnp.int32)
        d_order = jnp.zeros((NB, _N_D), jnp.int32)
    else:
        ll_first, ll_limit, ll_base, ll_order, ll_over = _canon_tables(
            ll_lens, _N_LL, MAX_BITS)
        d_first, d_limit, d_base, d_order, d_over = _canon_tables(
            d_lens, _N_D, MAX_BITS)
        bbad = bbad | (huff & (ll_over | d_over))

    lsz = 1 << lut_bits
    if "lut" in _ablate:                                 # profiling stub
        ll_rank = ll_cl = jnp.zeros((NB, lsz), jnp.int32)
        d_rank = d_cl = jnp.zeros((NB, lsz), jnp.int32)
    else:
        ll_rank, ll_cl = _build_lut(ll_first, ll_limit, ll_base, lut_bits,
                                    _rev_np(lut_bits))
        d_rank, d_cl = _build_lut(d_first, d_limit, d_base, lut_bits,
                                  _rev_np(lut_bits))

    # Rank -> payload tables (tiny NB×288 math), then folded INTO the peek
    # LUTs (_merge_lut) so the symbol loop needs exactly ONE gather per
    # alphabet. Merged litlen entry layout:
    #   val(9: literal byte or len_base) | leb(3)<<9 | kind(2)<<12
    #   (0=lit, 1=eob, 2=len, 3=bad) | cl(4)<<14  — cl 0 => invalid prefix
    #   | val2(8)<<18 | cl2(4)<<26 | pair(1)<<30  — two-literal fast entry
    # Merged dist entry: dbase(15) | deb(4)<<15 | bad(1)<<19 | dcl(4)<<20.
    len_base = jnp.asarray(C.LENGTH_BASE)
    len_extra = jnp.asarray(C.LENGTH_EXTRA)
    lsym = ll_order                                     # (NB, 288)
    li_t = jnp.clip(lsym - 257, 0, 28)
    l_kind = jnp.where(lsym < 256, 0,
                       jnp.where(lsym == C.EOB, 1,
                                 jnp.where(lsym < 286, 2, 3)))
    l_val = jnp.where(l_kind == 0, lsym,
                      jnp.where(l_kind == 2, len_base[li_t], 0))
    l_eb = jnp.where(l_kind == 2, len_extra[li_t], 0)
    ll_pay = l_val | (l_eb << 9) | (l_kind << 12)
    ll_ent = _merge_lut(ll_rank, ll_cl, ll_pay, 14)     # (NB, lsz)

    # Two-literal entries (when both codes fit in one lut_bits peek, ONE
    # loop step decodes BOTH): the continuation entry at peek >> cl1 is
    # trustworthy iff its code length fits the remaining peeked bits.
    pk = jnp.arange(lsz, dtype=jnp.int32)[None, :]
    cl1 = jnp.clip(ll_ent >> 14, 0, lut_bits)           # avoid >>32 UB paths
    e2 = jnp.take_along_axis(ll_ent, pk >> cl1, axis=1)
    cl2 = (e2 >> 14) & 0xF
    pair_ok = (((ll_ent >> 12) & 3) == 0) & (((ll_ent >> 14) & 0xF) > 0) \
        & (((e2 >> 12) & 3) == 0) & (cl2 > 0) \
        & (((ll_ent >> 14) & 0xF) + cl2 <= lut_bits)
    ll_ent = ll_ent | jnp.where(
        pair_ok, ((e2 & 0xFF) << 18) | (cl2 << 26) | (1 << 30), 0)
    ll_lut_f = ll_ent.reshape(-1)

    dist_base = jnp.asarray(C.DIST_BASE)
    dist_extra = jnp.asarray(C.DIST_EXTRA)
    dsym_t = d_order                                    # (NB, 32)
    di_t = jnp.clip(dsym_t, 0, 29)
    d_bad_t = (dsym_t >= 30).astype(jnp.int32)
    d_pay = (jnp.where(d_bad_t == 0, dist_base[di_t], 0)
             | (jnp.where(d_bad_t == 0, dist_extra[di_t], 0) << 15)
             | (d_bad_t << 19))
    d_lut_f = _merge_lut(d_rank, d_cl, d_pay, 20).reshape(-1)

    # -------------------------------------------- phase B: sub-entry lanes
    if "hw" in _ablate:                                  # profiling stub
        hw = jnp.zeros((2 * CW, 2), jnp.uint32)
    else:
        hw = _halfwords(comp_words)

    llanes = jnp.arange(NL, dtype=jnp.int32)
    lblk = jnp.clip(sub_blk, 0, NB - 1)
    llive = (llanes < n_subs) & (sub_blk >= 0) & huff[lblk]
    next_sub = jnp.where(llanes + 1 < n_subs,
                         sub_out[jnp.clip(llanes + 1, 0, NL - 1)],
                         jnp.int32(1 << 30))
    lane_end = jnp.minimum(next_sub, blk_end[lblk])
    lbad0 = llive & bbad[lblk]

    bp0 = jnp.where(sub_bit >= 0, sub_bit, bp[lblk])
    ocur0 = sub_out
    done0 = ~llive | (ocur0 >= lane_end)

    tok0 = jnp.zeros((S + 1,), jnp.int32)

    def one_sym(bp, ocur, done, lbad):
        """Decode one symbol (or one two-literal pair) in every live lane:
        3 descriptor ops (1-row-gather peek48, 1 merged-LUT gather per
        alphabet) + 1/UNROLL of the batched token scatter."""
        act = ~done & ~lbad
        lo, hi = _peek48(hw, bp)
        e = ll_lut_f[lblk * lsz + (lo & np.uint32(lsz - 1)
                                   ).astype(jnp.int32)]
        cl = (e >> 14) & 0xF
        lbad = lbad | (act & (cl == 0))
        kind = (e >> 12) & 3                             # 0 lit/1 eob/2 len/3 bad
        is_lit = kind == 0
        is_eob = kind == 1
        is_len = kind == 2
        lbad = lbad | (act & (kind == 3))                # RFC: never occurs
        # two-literal fast entry, demoted to single at the lane boundary
        # (the second literal is the NEXT lane's first token there)
        use_pair = ((e >> 30) & 1 == 1) & (ocur + 2 <= lane_end)
        cl2 = jnp.where(use_pair, (e >> 26) & 0xF, 0)

        leb = (e >> 9) & 0x7
        lev = (_extract(lo, hi, cl) & _mask(leb)).astype(jnp.int32)
        mlen = (e & 0x1FF) + lev
        off2 = cl + jnp.where(is_len, leb, 0)

        de = d_lut_f[lblk * lsz
                     + (_extract(lo, hi, off2)
                        & np.uint32(lsz - 1)).astype(jnp.int32)]
        dcl = (de >> 20) & 0xF
        lbad = lbad | (act & is_len & ((dcl == 0) | ((de >> 19) & 1 != 0)))
        deb = (de >> 15) & 0xF
        off3 = off2 + dcl
        dev = (_extract(lo, hi, off3) & _mask(deb)).astype(jnp.int32)
        mdist = (de & 0x7FFF) + dev
        lbad = lbad | (act & is_len & (mdist > max_dist))  # declared window

        emit = act & (is_lit | is_len)
        adv = jnp.where(is_len, mlen, jnp.where(use_pair, 2, 1))
        pack = (jnp.where(is_lit, e & 0x1FF, mlen)
                | (jnp.where(is_len, mdist,
                             jnp.where(use_pair, (e >> 18) & 0xFF, 0)) << 9)
                | (1 << 25)
                | (jnp.where(is_len, 1, 0) << 26)
                | (jnp.where(use_pair, 1, 0) << 27))
        # non-emitting lanes park at sink row S (garbage there is sliced
        # off); the scatter itself is BATCHED across the unrolled symbols
        # in dec_body (one descriptor op per UNROLL symbols, not per
        # symbol — slots within an unroll window are distinct per lane
        # since ocur strictly advances on emit)
        slot = jnp.where(emit, jnp.clip(ocur, 0, S), S)
        ocur2 = jnp.where(emit, ocur + adv, ocur)
        lbad = lbad | (act & (ocur2 > lane_end))         # token overran lane
        lbad = lbad | (act & is_eob)                     # EOB before lane end
        done = done | (act & (ocur2 >= lane_end) & ~lbad)
        bp2 = bp + cl + cl2 + jnp.where(is_len, leb + dcl + deb, 0)
        lbad = lbad | (act & (bp2 > bit_budget))
        bp = jnp.where(act, bp2, bp)
        return bp, ocur2, done, lbad, slot, pack

    UNROLL = 8
    max_steps = S + 64

    def dec_cond(st):
        bp, ocur, done, lbad, tok, steps = st
        return jnp.any(~done & ~lbad) & (steps < max_steps)

    def dec_body(st):
        bp, ocur, done, lbad, tok, steps = st
        slots, packs = [], []
        for _ in range(UNROLL):                  # amortize loop overhead
            bp, ocur, done, lbad, slot, pack = one_sym(bp, ocur, done, lbad)
            slots.append(slot)
            packs.append(pack)
        # ONE batched scatter for all UNROLL symbols (distinct slots per
        # lane; sink-row collisions are sliced off)
        tok = tok.at[jnp.stack(slots)].set(jnp.stack(packs), mode="drop")
        return bp, ocur, done, lbad, tok, steps + UNROLL

    st = (bp0, ocur0, done0, lbad0, tok0, jnp.int32(0))
    _, ocur, done, lbad, tok, _ = jax.lax.while_loop(dec_cond, dec_body, st)
    lbad = lbad | (llive & ~done)                        # unconverged lanes

    # ------------------------------------------ phase C: output construction
    j_idx = jnp.arange(S, dtype=jnp.int32)
    t_valid = ((tok[:S] >> 25) & 1) == 1
    t_match = ((tok[:S] >> 26) & 1) == 1
    t_a = tok[:S] & 0x1FF

    # Everything phase C gathers is u32/i32 and batched into as few
    # descriptor streams as possible: sub-word (u8) gathers measured ~10x
    # slower than word gathers on this stack, and each full-S gather is
    # ~1.3 ms/shard — this section used to spend 7 S-sized gathers (two of
    # them u8); it now spends 4, all word-typed.
    if prefix is not None:
        plen = prefix_len.astype(jnp.int32)
        W = prefix.shape[0]
        pref_pad = jnp.concatenate(
            [prefix.astype(jnp.uint32),
             jnp.zeros((max(S - W, 0),), jnp.uint32)])[:S]
        lit_val = jnp.where(j_idx < plen, pref_pad, 0)
    else:
        plen = jnp.int32(0)
        lit_val = jnp.zeros((S,), jnp.uint32)
    lit_val = jnp.where(t_valid & ~t_match, t_a.astype(jnp.uint32), lit_val)

    sto_pay_byte = ((blk_bit + 3 + 7) >> 3) + 4           # after LEN/NLEN
    # Covering-block fields per position WITHOUT an S-sized gather: scatter a
    # PACKED per-block word at each block's start and forward-fill with one
    # cummax — valid because the block id rides the high bits (monotone in
    # position, so cummax is exactly segment-fill). Packs (b+1)<<23 |
    # is_sto<<22 | biased(sto_pay_byte - blk_out); falls back to the
    # (NB, 3)-row gather when the static ranges don't fit 31 bits.
    # Out-of-range starts are DROPPED, not clamped (a degenerate empty
    # trailing block at blk_out == S must not alias onto position S-1).
    start_slot = jnp.where(blive & (blk_out >= 0) & (blk_out < S), blk_out, S)
    # exact per-position coverage: blk_end is nondecreasing over live blocks,
    # so a start-scatter + cummax yields "this position is inside some live
    # block" — the precise domain for match/strictness checks (in batch
    # mode the flat layout has dead gaps between shards' valid ends)
    from ..core import scans as _scans
    _scan_max = ((lambda x: x) if "scans" in _ablate     # profiling stub
                 else _scans.cummax)                     # blocked two-level
    cend = _scan_max(jnp.zeros((S,), jnp.int32).at[start_slot].max(
        jnp.where(blive, blk_end, 0), mode="drop"))
    pos_live = j_idx < cend
    use_packed = NB <= 64 and S < (1 << 22) and 4 * CW < (1 << 22)
    if use_packed:
        _BIAS = 1 << 22
        markv = (((blanes + 1) << 24)
                 | (is_sto.astype(jnp.int32) << 23)
                 | jnp.clip(sto_pay_byte - blk_out + _BIAS, 0,
                            (1 << 23) - 1))
        pc = _scan_max(jnp.zeros((S,), jnp.int32).at[start_slot].max(
            jnp.where(blive, markv, 0), mode="drop"))
        pos_sto = (((pc >> 23) & 1) == 1) & (j_idx >= plen) & ((pc >> 24) > 0)
        # stored payloads are CONTIGUOUS byte ranges: copy each live stored
        # block with one fixed-width dynamic slice pair (2 contiguous ops
        # per block) instead of an S-sized random gather — stored DEFLATE
        # blocks are <= 65535 output bytes (16-bit LEN), so a 64 KB window
        # covers any block
        _WSTO = 1 << 16
        if "slices" not in _ablate:
            cbytes = ((comp_words[:, None]
                       >> (jnp.arange(4, dtype=jnp.uint32)[None, :]
                           * np.uint32(8))) & np.uint32(0xFF)).reshape(-1)
            cpad = jnp.concatenate([cbytes,
                                    jnp.zeros((_WSTO,), jnp.uint32)])
            lv_pad = jnp.concatenate([lit_val,
                                      jnp.zeros((_WSTO,), jnp.uint32)])
            t65 = jnp.arange(_WSTO, dtype=jnp.int32)
            for b in range(NB):
                live_sto = is_sto[b]
                src0 = jnp.clip(sto_pay_byte[b], 0, 4 * CW)
                dst0 = jnp.clip(blk_out[b], 0, S)
                pay = jax.lax.dynamic_slice(cpad, (src0,), (_WSTO,))
                cur = jax.lax.dynamic_slice(lv_pad, (dst0,), (_WSTO,))
                ln = jnp.clip(blk_end[b] - blk_out[b], 0, _WSTO)
                new = jnp.where(live_sto & (t65 < ln), pay, cur)
                lv_pad = jax.lax.dynamic_update_slice(lv_pad, new, (dst0,))
            lit_val = lv_pad[:S]
    else:
        bstart_mark = jnp.zeros((S,), jnp.int32).at[start_slot].max(
            blanes + 1, mode="drop")
        blk_of_pos = jnp.clip(_scan_max(bstart_mark) - 1, 0, NB - 1)
        blocktab = jnp.stack([is_sto.astype(jnp.int32), sto_pay_byte,
                              blk_out], axis=1)
        btrow = blocktab[blk_of_pos]                      # (S, 3)-row gather
        pos_sto = (btrow[:, 0] == 1) & (j_idx >= plen)
        sto_src = jnp.clip(btrow[:, 1] + (j_idx - btrow[:, 2]),
                           0, 4 * CW - 1)
        # stored byte via a WORD gather + shift (not a u8 gather)
        sto_w = comp_words[jnp.clip(sto_src >> 2, 0, CW - 1)]
        sto_b = (sto_w >> ((sto_src.astype(jnp.uint32) & np.uint32(3))
                           << np.uint32(3))) & np.uint32(0xFF)
        lit_val = jnp.where(pos_sto, sto_b, lit_val)

    # covering token per position, then SAME-DISTANCE RUN collapse: the
    # byte-level source of any match-covered position is exactly j - d
    # (RFC 1951 §3.2.3 back-copy; the reference replays it byte-serially,
    # src/deflate_decompress.c:47-57). Over a maximal run [r, j] of
    # positions all covered at the SAME d, the iterated chain lands at
    # r - d + ((j - (r-d)) mod d) in ONE elementwise step — this collapses
    # both intra-token overlap AND the arbitrarily deep cross-token chains
    # of periodic data (d-periodic tilings previously cost log2(run/d)
    # doubling rounds, each an S-sized gather). Only chains that hop
    # between DIFFERENT distances remain for the pointer doubling below.
    start_mark = jnp.where(t_valid, j_idx, -1)
    s_j = _scan_max(start_mark)
    s_c = jnp.clip(s_j, 0, S - 1)
    if "toksc" in _ablate:                               # profiling stub
        tok_sc = tok[:S]
    else:
        tok_sc = tok[s_c]               # ONE gather replaces t_match/t_d[s_c]
    d_j = jnp.where((s_j >= 0) & (((tok_sc >> 26) & 1) == 1),
                    (tok_sc >> 9) & 0xFFFF, 0)
    # second byte of a two-literal token (phase B pair entries): covered by
    # the pair token one position back — its value rides in tok_sc, free
    pair2 = ((s_j >= 0) & (((tok_sc >> 27) & 1) == 1)
             & (j_idx == s_j + 1) & ~pos_sto & (j_idx >= plen))
    lit_val = jnp.where(pair2, ((tok_sc >> 9) & 0xFF).astype(jnp.uint32),
                        lit_val)
    mpos = (d_j > 0) & ~pos_sto & (j_idx >= plen) & pos_live
    rd = jnp.where(mpos, d_j, 0)
    prev_rd = jnp.concatenate([jnp.full((1,), -1, jnp.int32), rd[:-1]])
    r = _scan_max(jnp.where(rd != prev_rd, j_idx, -1))   # run start >= 0
    base = r - rd
    g = base + jnp.where(mpos, (j_idx - base) % jnp.maximum(rd, 1), 0)
    bad_dist = jnp.any(mpos & (g < 0))

    # TAGGED-VALUE pointer doubling: v holds either a resolved byte or
    # TAG | source-index; each round jumps tagged entries through one
    # doubling gather v[v & addr]. Chains strictly decrease (g < j), so
    # either all tags clear or the round bound flags unconverged. Compared
    # with index-space doubling + a final value gather this saves one full
    # S-sized gather (the last round lands on values directly).
    _tag_bit = max(24, int(S - 1).bit_length())          # above any index
    _TAG = np.uint32(1) << np.uint32(_tag_bit)
    _ADDR = np.uint32((1 << _tag_bit) - 1)
    v0 = jnp.where(mpos & (g >= 0),
                   _TAG | jnp.clip(g, 0, S - 1).astype(jnp.uint32), lit_val)

    max_rounds = int(np.ceil(np.log2(max(S, 2)))) + 2

    def c_cond(st):
        v, ch, rr = st
        return ch & (rr < max_rounds)

    def c_body(st):
        v, ch, rr = st
        tag = (v & _TAG) != 0
        hop = v[jnp.clip((v & _ADDR).astype(jnp.int32), 0, S - 1)]
        vn = jnp.where(tag, hop, v)
        return vn, jnp.any((vn & _TAG) != 0), rr + 1

    v, unconverged, _ = jax.lax.while_loop(
        c_cond, c_body, (v0, jnp.any((v0 & _TAG) != 0), jnp.int32(0)))

    out = (v & np.uint32(0xFF)).astype(jnp.uint8)
    out = jnp.where(j_idx < valid_out, out, jnp.uint8(0))

    ok = (~jnp.any(lbad & llive) & ~jnp.any(bbad & blive)
          & ~bad_dist & ~unconverged)
    return {"out": out, "ok": ok, "bad_lanes": lbad}


@functools.partial(jax.jit, static_argnames=("out_size", "lut_bits"))
def decode_blocks_batch(comp_words, blk_bit, blk_out, blk_btype, n_blocks,
                        sub_bit, sub_out, sub_blk, valid_out,
                        out_size: int, lut_bits: int = MAX_BITS,
                        max_dist: jnp.ndarray | int = C.WINDOW_SIZE):
    """Decode B independent shard substreams in ONE flat dispatch.

    All leading arguments carry a batch dimension B (as produced by a
    vmapped encode_shard): comp_words u32[B, CW]; blk_* [B, NB] (dead slots
    btype == -1); n_blocks i32[B]; sub_* [B, NL] (dead lanes sub_blk == -1);
    valid_out i32[B] — decoded byte count per shard (shards may be ragged).
    Returns dict(out=u8[B, out_size], ok, bad_lanes).

    Rationale: vmapping decode_blocks gives every gather/scatter in the
    symbol loop a batch dimension, which lowers to far slower batched
    gathers than the flat 1-D form (ROADMAP r4). Folding the shard id into
    the index arithmetic — word offsets s*CW*32 bits, output offsets s*S,
    block ids s*NB — makes every descriptor op flat while keeping shards
    logically independent: tokens cannot cross shard ends (lane_end clamps
    at block ends) and back-copies cannot reach before a shard's first
    token for well-formed streams (malformed ones fail verification)."""
    B, CW = comp_words.shape
    NBs = blk_bit.shape[1]
    S = out_size
    sidx = jnp.arange(B, dtype=jnp.int32)
    word_bits = CW * 32

    blive = (jnp.arange(NBs, dtype=jnp.int32)[None, :] < n_blocks[:, None]) \
        & (blk_btype >= 0)
    fb = jnp.where(blive, blk_bit + sidx[:, None] * word_bits, 0)
    fo = jnp.where(blive, blk_out + sidx[:, None] * S, -1)
    ft = jnp.where(blive, blk_btype, -1)
    # per-block end: next live block in the SAME shard (live blocks are a
    # prefix of each row) else the shard's valid end
    nxt = jnp.concatenate([blk_out[:, 1:], jnp.zeros((B, 1), jnp.int32)],
                          axis=1)
    lastb = jnp.arange(NBs, dtype=jnp.int32)[None, :] + 1 >= n_blocks[:, None]
    valid_s = jnp.asarray(valid_out, jnp.int32).reshape(B)
    fe = jnp.where(blive,
                   jnp.where(lastb, valid_s[:, None], nxt)
                   + sidx[:, None] * S, -1)

    slive = sub_blk >= 0
    fsb = jnp.where(slive, sub_bit + sidx[:, None] * word_bits, -1)
    fso = jnp.where(slive, sub_out + sidx[:, None] * S, jnp.int32(1 << 30))
    fsk = jnp.where(slive, sub_blk + sidx[:, None] * NBs, -1)

    r = decode_blocks(comp_words.reshape(-1), fb.reshape(-1),
                      fo.reshape(-1), ft.reshape(-1), jnp.int32(B * NBs),
                      fsb.reshape(-1), fso.reshape(-1), fsk.reshape(-1),
                      jnp.int32(fsb.size), jnp.int32(B * S), B * S,
                      lut_bits=lut_bits, max_dist=max_dist,
                      blk_end=fe.reshape(-1))
    out = r["out"].reshape(B, S)
    out = jnp.where(jnp.arange(S, dtype=jnp.int32)[None, :]
                    < valid_s[:, None], out, jnp.uint8(0))
    return {"out": out, "ok": r["ok"],
            "bad_lanes": r["bad_lanes"].reshape(B, -1)}


def decode_shard_indexed(comp_words, bit_base, out_start, btype, n_blocks,
                         valid_out, out_size, prefix=None, prefix_len=None):
    """Back-compat wrapper: one lane per block (no sub-entries). Prefer
    decode_blocks with encoder-emitted sub-entries for throughput."""
    NB = bit_base.shape[0]
    lanes = jnp.arange(NB, dtype=jnp.int32)
    hufflane = (btype == C.BTYPE_DYNAMIC) | (btype == C.BTYPE_FIXED)
    sub_blk = jnp.where(hufflane, lanes, -1)
    return decode_blocks(comp_words, bit_base, out_start, btype, n_blocks,
                         jnp.full((NB,), -1, jnp.int32), out_start, sub_blk,
                         n_blocks, valid_out, out_size,
                         prefix=prefix, prefix_len=prefix_len)
