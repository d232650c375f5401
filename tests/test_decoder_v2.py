"""Property tests for the round-5 decoder internals: dense symbol-space
tables vs the host LUT oracle, wide peek windows, row scans, and the
tile-reset parse equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deflate_compression_tpu.core import scans
from deflate_compression_tpu.core.huffman import decode_lut_np
from deflate_compression_tpu.decode import tpu_inflate as TI


def _random_lengths(rng, n, max_bits=15):
    """Random COMPLETE canonical code-length set over n symbols (Kraft
    sum exactly 2^max_bits), built by splitting leaves."""
    # start from {0: len 1, 1: len 1} and randomly deepen
    lens = {0: 1, 1: 1}
    syms = [0, 1]
    next_sym = 2
    for _ in range(rng.integers(0, n - 2)):
        if next_sym >= n:
            break
        s = syms[rng.integers(0, len(syms))]
        if lens[s] >= max_bits:
            continue
        lens[s] += 1
        lens[next_sym] = lens[s]
        syms.append(next_sym)
        next_sym += 1
    out = np.zeros(n, np.int64)
    for s, l in lens.items():
        out[s] = l
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sym_tables_match_host_lut(seed):
    rng = np.random.default_rng(seed)
    n = 288
    lens = _random_lengths(rng, n)
    sym_lut, len_lut = decode_lut_np(lens[:286], 15)   # host oracle

    lengths = jnp.asarray(lens, jnp.int32)[None, :]
    first, over = TI._canon_first(lengths, 15)
    assert not bool(over[0])
    pay_static = np.arange(n, dtype=np.int32)          # payload = symbol id
    rcode, mask, pay = TI._sym_tables(lengths, first, 15, pay_static, 20)
    rcode, mask, pay = (np.asarray(x)[0] for x in (rcode, mask, pay))

    peeks = rng.integers(0, 1 << 15, 300)
    for pk in peeks:
        hits = [s for s in range(n)
                if lens[s] > 0 and (pk & mask[s]) == rcode[s]]
        assert len(hits) <= 1
        if len_lut[pk] > 0 and int(sym_lut[pk]) < 286:
            assert hits == [int(sym_lut[pk])]
            assert (pay[hits[0]] & 0xFFFFF) == hits[0]
            assert (pay[hits[0]] >> 20) == lens[hits[0]]


def test_dense_sym_resolves_groups():
    rng = np.random.default_rng(7)
    n = 32
    Gn, Lg = 4, 64
    lens = np.stack([_random_lengths(rng, n) for _ in range(Gn)])
    lengths = jnp.asarray(lens, jnp.int32)
    first, _ = TI._canon_first(lengths, 15)
    pay_static = np.arange(n, dtype=np.int32) + 1      # 0 => invalid
    rcode, mask, pay = TI._sym_tables(lengths, first, 15, pay_static, 20)
    pk = jnp.asarray(rng.integers(0, 1 << 15, Gn * Lg, dtype=np.int64),
                     jnp.int32)
    out = np.asarray(TI._dense_sym(pk, rcode, mask, pay, Gn, Lg))
    rc, mk, py = np.asarray(rcode), np.asarray(mask), np.asarray(pay)
    pkh = np.asarray(pk).reshape(Gn, Lg)
    for g in range(Gn):
        for l in range(Lg):
            hits = [py[g, s] for s in range(n)
                    if lens[g, s] > 0 and (pkh[g, l] & mk[g, s]) == rc[g, s]]
            want = hits[0] if hits else 0
            assert out[g * Lg + l] == want


def test_peekwin_extractw_bits():
    rng = np.random.default_rng(3)
    nbytes = 256
    data = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    bits = int.from_bytes(data, "little")
    words = np.frombuffer(data, np.uint32)
    hw = TI._winwords(jnp.asarray(words))
    for bp in [0, 1, 13, 16, 31, 32, 100, 555, 1000]:
        win = TI._peekwin(hw, jnp.asarray([bp], jnp.int32))
        valid = 32 * TI._NWIN - 15
        for off in [0, 5, 31, 32, 63, 64, 95, 96, 120]:
            got = int(np.asarray(
                TI._extractw(win, jnp.asarray([off], jnp.int32)))[0])
            nvalid = min(32, max(0, valid - off),
                         8 * nbytes - bp - off)    # bits actually defined
            if nvalid <= 0:
                continue
            want = (bits >> (bp + off)) & ((1 << nvalid) - 1)
            assert got & ((1 << nvalid) - 1) == want, (bp, off)


def test_cummax_rows_matches_lax():
    rng = np.random.default_rng(11)
    for B, S in [(3, 256), (2, 4096), (1, 64), (4, 100)]:
        x = jnp.asarray(rng.integers(0, 1 << 30, (B, S), dtype=np.int64),
                        jnp.int32)
        got = np.asarray(scans.cummax_rows(x))
        want = np.maximum.accumulate(np.asarray(x), axis=1)
        assert (got == want).all()
    # u32 with zero sentinel (the decoder's covering-d pack dtype)
    xu = jnp.asarray(rng.integers(0, 1 << 31, (2, 4096), dtype=np.int64)
                     .astype(np.uint32))
    got = np.asarray(scans.cummax_rows(xu))
    want = np.maximum.accumulate(np.asarray(xu), axis=1)
    assert (got == want).all()


def test_greedy_parse_reset_equals_flat():
    from deflate_compression_tpu.core.lz77 import (greedy_parse,
                                                   greedy_parse_flat)
    rng = np.random.default_rng(5)
    S = 1 << 16
    reset = 1 << 13
    for trial in range(3):
        # random token lengths, clamped at `reset` boundaries exactly like
        # tokenize's boundary clamp (the precondition for the reset trick)
        tl = rng.integers(1, 40, S).astype(np.int32)
        mask_long = rng.random(S) < 0.9
        tl[mask_long] = 1
        pos = np.arange(S)
        tl = np.minimum(tl, reset - (pos % reset))
        tlj = jnp.asarray(tl)
        a = np.asarray(greedy_parse(tlj, reset=reset))
        b = np.asarray(greedy_parse_flat(tlj))
        assert (a == b).all()
        # every reset boundary must be a token start (precondition holds)
        assert a[::reset].all()


def test_decoder_handles_foreign_15bit_codes():
    # a zlib level-9 stream (can contain up to 15-bit codes) through the
    # dense symbol-space decoder via a foreign-built index
    import zlib
    from deflate_compression_tpu.decode.index import (build_index,
                                                      decompress_indexed)
    rng = np.random.default_rng(9)
    # skewed data drives deep trees
    raw = (rng.choice(np.frombuffer(b"abcdefgh" * 4 + b"\x00" * 200, np.uint8),
                      1 << 16).tobytes()
           + open("/root/reference/docs/rfc1951.txt", "rb").read())
    z = zlib.compress(raw, 9)
    body = z[2:-4]
    idx = build_index(body, prefer_native=False)
    out = decompress_indexed(body, idx,
                             expected_adler=int.from_bytes(z[-4:], "big"))
    assert out == raw
