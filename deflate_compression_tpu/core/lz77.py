"""LZ77 match finding + parse, TPU-native (fixed-shape JAX, jittable).

Reference analogue: the 32 KB sliding-window hash-chain match finder
(src/deflate_compress.c:14-62 design comment; dup_hash :115-135; chain walk +
check_dup_str :164-180,:249-263; greedy decision :243-339). The reference
processes one byte at a time, appending each position to a per-bucket chain
and walking it sequentially.

TPU design (no chains, no sequential byte loop):
  1. hash every 3-byte prefix (one multiply-shift hash over a u32 gather);
  2. find the K nearest previous positions with the same hash via ONE stable
     sort of (hash, position) — in sorted order, a position's same-hash
     predecessors are exactly its nearest previous chain entries;
  3. score all K candidates per position with a vectorized prefix compare,
     pick the best, then extend only the winner to MAX_MATCH with a cumprod
     over a gathered (tile, 258) equality matrix;
  4. one-step lazy heuristic (emit literal if the next position matches
     longer), mirroring zlib's lazy evaluation;
  5. greedy parse selection: next[i] = i + tokenlen[i]; the chosen set is the
     orbit of 0 under `next`, extracted with pointer doubling in log2(S)
     scatter rounds instead of a sequential walk.

All shapes static; matches are found across the whole shard so the 32 KB
window crosses DEFLATE block boundaries exactly as RFC 1951 allows, while
shards themselves stay independent (fresh window per shard — SURVEY §2.2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format import constants as C

HASH_BITS = 16
HASH_MUL = np.uint32(2654435761)   # Knuth multiplicative hash


def _hash3(data_u32: jnp.ndarray) -> jnp.ndarray:
    """Multiplicative hash of the 3-byte value at each position."""
    return ((data_u32 * HASH_MUL) >> np.uint32(32 - HASH_BITS)).astype(jnp.uint32)


def find_candidates(data: jnp.ndarray, num_candidates: int) -> jnp.ndarray:
    """For each position i, the K nearest previous positions with the same
    3-byte hash (or -1). data: u8[S]. Returns i32[S, K]."""
    S = data.shape[0]
    d = data.astype(jnp.uint32)
    b0 = d
    b1 = jnp.concatenate([d[1:], jnp.zeros((1,), jnp.uint32)])
    b2 = jnp.concatenate([d[2:], jnp.zeros((2,), jnp.uint32)])
    tri = b0 | (b1 << np.uint32(8)) | (b2 << np.uint32(16))
    h = _hash3(tri)

    # Stable sort by hash keeps position order within each bucket.
    order = jnp.argsort(h, stable=True)          # i32[S] positions, bucket-major
    h_sorted = h[order]

    cands = []
    for k in range(1, num_candidates + 1):
        prev_pos = jnp.concatenate([jnp.full((k,), -1, jnp.int32),
                                    order[:-k].astype(jnp.int32)])
        prev_h = jnp.concatenate([jnp.zeros((k,), jnp.uint32), h_sorted[:-k]])
        same = prev_h == h_sorted
        cands.append(jnp.where(same, prev_pos, -1))
    cand_sorted = jnp.stack(cands, axis=1)       # [S, K] in sorted order

    out = jnp.zeros((S, num_candidates), jnp.int32)
    out = out.at[order].set(cand_sorted)
    return out


def _gather_window(data: jnp.ndarray, starts: jnp.ndarray, width: int,
                   stride: int = 1) -> jnp.ndarray:
    """data[starts[i] + stride*t] for t in [0, width); out-of-range reads
    clamp (the caller masks validity separately). starts: i32[...]."""
    S = data.shape[0]
    idx = starts[..., None] + stride * jnp.arange(width, dtype=jnp.int32)
    idx = jnp.clip(idx, 0, S - 1)
    return jnp.take(data, idx, axis=0)


def match_lengths(data: jnp.ndarray, cands: jnp.ndarray,
                  prefix: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the best of K candidates per position and compute its full match
    length (<= MAX_MATCH, <= bytes to shard end).

    Returns (length i32[S], dist i32[S]); length 0 where no usable match.
    """
    S, K = cands.shape
    pos = jnp.arange(S, dtype=jnp.int32)

    valid = (cands >= 0) & ((pos[:, None] - cands) <= C.WINDOW_SIZE)

    # Word view: w4[i] = data[i..i+3] as LSB-first u32 (tail zero-padded).
    # Comparing 4 bytes per gathered element cuts gather volume and cumprod
    # width 4x vs byte-at-a-time — the dominant HBM cost of this stage.
    d32 = data.astype(jnp.uint32)
    pad = jnp.zeros((3,), jnp.uint32)
    b0 = jnp.concatenate([d32, pad])
    w4 = (b0[:-3] | (b0[1:-2] << np.uint32(8)) | (b0[2:-1] << np.uint32(16))
          | (b0[3:] << np.uint32(24)))                           # u32[S]

    # Phase A: score candidates by leading-equal count over a short prefix
    # (two 4-byte words).
    PW = max(1, prefix // 4)
    win_i = _gather_window(w4, pos, PW, stride=4)                # [S, PW] u32
    win_j = _gather_window(w4, jnp.maximum(cands, 0).reshape(-1),
                           PW, stride=4).reshape(S, K, PW)
    eq = (win_j == win_i[:, None, :])
    lpre = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=-1), axis=-1)
    lpre = jnp.where(valid, lpre, -1)                            # in words

    # Best candidate: max prefix score; stable argmax prefers smaller k =
    # nearer candidate = smaller distance (cheaper dist code) on ties.
    best_k = jnp.argmax(lpre, axis=1)
    best_cand = jnp.take_along_axis(cands, best_k[:, None], axis=1)[:, 0]
    best_valid = jnp.take_along_axis(valid, best_k[:, None], axis=1)[:, 0]
    best_lpre = jnp.take_along_axis(lpre, best_k[:, None], axis=1)[:, 0]

    # Phase B: extend the winner to MAX_MATCH in 4-byte strides + byte tail.
    NW = C.MAX_MATCH // 4 + 1                                    # 65 words
    src = _gather_window(w4, jnp.maximum(best_cand, 0), NW, stride=4)
    dst = _gather_window(w4, pos, NW, stride=4)
    eq_full = src == dst
    nwords = jnp.sum(jnp.cumprod(eq_full.astype(jnp.int32), axis=-1), axis=-1)
    nwords = jnp.minimum(nwords, NW - 1)
    # tail: first differing byte inside the next word (0..3)
    sx = jnp.take_along_axis(src, nwords[:, None], axis=1)[:, 0]
    dx = jnp.take_along_axis(dst, nwords[:, None], axis=1)[:, 0]
    diff = sx ^ dx
    tail = jnp.where((diff & np.uint32(0xFF)) != 0, 0,
                     jnp.where((diff & np.uint32(0xFFFF)) != 0, 1,
                               jnp.where((diff & np.uint32(0xFFFFFF)) != 0,
                                         2, 3)))
    length = jnp.minimum(4 * nwords + tail, C.MAX_MATCH)
    # trailing zero-padding can fake equality past the end; clamp to S - pos
    length = jnp.minimum(length, S - pos)

    # MIN_MATCH filtering happens on the exact byte length (3-byte matches
    # have word-score 0 but are still valid)
    length = jnp.where(best_valid, length, 0)
    length = jnp.where(length >= C.MIN_MATCH, length, 0)
    dist = jnp.where(length > 0, pos - best_cand, 0)
    return length.astype(jnp.int32), dist.astype(jnp.int32)


def greedy_parse(token_len: jnp.ndarray) -> jnp.ndarray:
    """Mark the positions chosen by a greedy left-to-right parse.

    token_len[i] >= 1 is the number of bytes a token starting at i consumes.
    Returns bool[S] chosen mask. Pointer doubling: the chosen set is the orbit
    of position 0 under next[i] = i + token_len[i].
    """
    S = token_len.shape[0]
    nxt = jnp.minimum(jnp.arange(S, dtype=jnp.int32) + token_len, S)
    jump = jnp.concatenate([nxt, jnp.array([S], jnp.int32)])  # S is absorbing
    # `| (jump < 0)` is always False but ties the carry to the data so its
    # varying-axis type matches inside shard_map (scan-vma rule).
    chosen = jnp.zeros((S + 1,), jnp.bool_).at[0].set(True) | (jump < 0)

    rounds = max(1, int(np.ceil(np.log2(max(S, 2)))))
    def body(carry, _):
        chosen, jump = carry
        tgt = jnp.where(chosen, jump, S)
        chosen = chosen.at[tgt].set(True)
        jump = jump[jump]
        return (chosen, jump), None
    (chosen, _), _ = jax.lax.scan(body, (chosen, jump), None, length=rounds)
    return chosen[:S]


@functools.partial(jax.jit, static_argnames=("num_candidates", "lazy",
                                             "boundary"))
def tokenize(data: jnp.ndarray, valid_len: jnp.ndarray,
             num_candidates: int = 4, lazy: bool = True,
             boundary: int = C.WINDOW_SIZE):
    """Full LZ77 stage for one shard.

    Args:
      data: u8[S] shard bytes (S static; tail beyond valid_len is padding).
      valid_len: i32 scalar, number of real bytes.

    Returns dict with, per position (fixed shape S):
      chosen:  bool — a token starts here
      length:  i32 — match length (0 => literal)
      dist:    i32 — match distance (0 => literal)
    Padding positions (>= valid_len) are never chosen.
    """
    S = data.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)

    cands = find_candidates(data, num_candidates)
    length, dist = match_lengths(data, cands)

    # Constant runs (period-1): exact dist-1 matches without any gathers.
    # For position i inside a run of equal bytes, a match of
    # min(258, run_end - i) at distance 1 is available; this keeps long runs
    # (zeros, padding) optimal even when general extension is capped.
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                            data[:-1].astype(jnp.int32)])
    neq = data.astype(jnp.int32) != prev
    nxt_start = jnp.where(neq, pos, S)
    run_end = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([nxt_start[1:], jnp.array([S], jnp.int32)]))))
    run_len = jnp.where(~neq, jnp.minimum(run_end - pos, C.MAX_MATCH), 0)
    better = run_len > length
    length = jnp.where(better, run_len, length)
    dist = jnp.where(better, 1, dist)

    # Clamp matches to the valid region and to coding-block (tile)
    # boundaries: a token must not EXTEND past a boundary so every block's
    # output starts exactly at its tile (stored-block payload correctness +
    # exact decode index); matches may still look BACK across boundaries
    # (RFC window semantics).
    length = jnp.minimum(length, jnp.maximum(valid_len - pos, 0))
    if boundary:
        length = jnp.minimum(length, boundary - (pos % boundary))
    length = jnp.where(length >= C.MIN_MATCH, length, 0)
    dist = jnp.where(length > 0, dist, 0)

    if lazy:
        # One-step lazy: defer to i+1 if it has a strictly longer match
        # (zlib-style lazy evaluation; reference's greedy has no deferral).
        nxt_len = jnp.concatenate([length[1:], jnp.zeros((1,), jnp.int32)])
        demote = (length > 0) & (nxt_len > length)
        length = jnp.where(demote, 0, length)
        dist = jnp.where(demote, 0, dist)

    token_len = jnp.where(length >= C.MIN_MATCH, length, 1)
    chosen = greedy_parse(token_len)
    chosen = chosen & (pos < valid_len)

    return {"chosen": chosen, "length": length, "dist": dist}
