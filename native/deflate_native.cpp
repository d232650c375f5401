// Native host runtime: fast DEFLATE/zlib inflater + checksums.
//
// This is the C++ counterpart of the framework's host decode path — the
// performance mirror of decode/inflate.py (and of the C reference's
// src/deflate_decompress.c): zlib header parse (ref :347-368), block loop
// (ref :291-345), stored/fixed/dynamic paths (ref :303-336), canonical
// code construction (ref form_h_tree :146-161), RLE 16/17/18 with the
// litlen->dist carry-over (ref form_d2 :180-235), LZ back-copy (ref
// decompr_write_str :47-57) and adler32 verify (ref :402-404). Decoding
// uses flat 2^15 LUTs instead of the reference's pointer-tree walk
// (src/h_tree.c:24-40) and a 64-bit bit buffer instead of the
// byte-at-a-time cursor (src/include/globals.h:52-64).
//
// Exposed as a C ABI for the ctypes bridge (python: native_bridge.py).

#include <cstdint>
#include <cstring>

namespace {

// ---------------------------------------------------------------- errors
enum Err : int64_t {
  E_OK = 0,
  E_TRUNC = -1,
  E_BTYPE = -2,
  E_STORED = -3,
  E_TREE = -4,
  E_BADCODE = -5,
  E_SYM = -6,
  E_DIST = -7,
  E_SIZE = -8,        // output capacity exhausted (caller: grow + retry)
  E_HDR = -9,
  E_ADLER = -10,
};

// ------------------------------------------------------------- bit input
struct BitIn {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos;        // bit position

  inline uint64_t peek64() const {
    int64_t byte0 = pos >> 3;
    uint64_t v = 0;
    int64_t avail = nbytes - byte0;
    if (avail >= 8) {
      std::memcpy(&v, data + byte0, 8);
    } else if (avail > 0) {
      std::memcpy(&v, data + byte0, (size_t)avail);
    }
    return v >> (pos & 7);
  }
  inline uint32_t read(int n) {
    uint32_t v = (uint32_t)(peek64() & ((1u << n) - 1));
    pos += n;
    return v;
  }
  inline bool ok() const { return pos <= nbytes * 8; }
  inline void align() { pos = (pos + 7) & ~7LL; }
};

// ----------------------------------------- canonical two-level decode LUTs
// L1-resident 10-bit root table + overflow subtables (zlib-inflate style).
// Root entry (int32): positive  -> len (low 8) | symbol << 8
//                     negative  -> subtable: bits 0-7 = sub_bits,
//                                  bits 8-30 = pool offset
constexpr int ROOT_BITS = 10;
constexpr int ROOT_SIZE = 1 << ROOT_BITS;
constexpr int SUB_POOL = 4096;   // >= worst-case overflow pool (ENOUGH-like)
constexpr int MAX_BITS_C = 15;

struct Lut {
  int32_t root[ROOT_SIZE];
  int32_t sub[SUB_POOL];
};

static inline int rev_bits(int c, int l) {
  int r = 0;
  for (int b = 0; b < l; b++) { r = (r << 1) | (c & 1); c >>= 1; }
  return r;
}

// Build from code lengths (RFC 1951 §3.2.2 counting).
// Returns E_OK or E_TREE on over-subscription / pool overflow.
static int64_t build_lut(const uint8_t* lens, int n, Lut* t) {
  int bl_count[16] = {0};
  for (int i = 0; i < n; i++) bl_count[lens[i]]++;
  bl_count[0] = 0;
  long kraft = 0;
  for (int l = 1; l <= MAX_BITS_C; l++)
    kraft += (long)bl_count[l] << (MAX_BITS_C - l);
  if (kraft > (1 << MAX_BITS_C)) return E_TREE;
  int next_code[16] = {0};
  int code = 0;
  for (int l = 1; l <= MAX_BITS_C; l++) {
    code = (code + bl_count[l - 1]) << 1;
    next_code[l] = code;
  }
  std::memset(t->root, 0, sizeof(t->root));

  // pass 1: per root slot, the max overflow code length
  uint8_t need[ROOT_SIZE];
  std::memset(need, 0, sizeof(need));
  {
    int nc[16];
    std::memcpy(nc, next_code, sizeof(nc));
    for (int s = 0; s < n; s++) {
      int l = lens[s];
      if (l == 0) continue;
      int c = nc[l]++;
      if (l <= ROOT_BITS) continue;
      int r = rev_bits(c, l);
      int slot = r & (ROOT_SIZE - 1);
      uint8_t nb = (uint8_t)(l - ROOT_BITS);
      if (nb > need[slot]) need[slot] = nb;
    }
  }
  // allocate subtables
  int pool = 0;
  int sub_off[ROOT_SIZE];
  for (int slot = 0; slot < ROOT_SIZE; slot++) {
    if (need[slot]) {
      sub_off[slot] = pool;
      pool += 1 << need[slot];
      if (pool > SUB_POOL) return E_TREE;
      t->root[slot] = -(int32_t)((sub_off[slot] << 8) | need[slot]) - 1;
    }
  }
  std::memset(t->sub, 0, (size_t)pool * sizeof(int32_t));

  // pass 2: fill
  for (int s = 0; s < n; s++) {
    int l = lens[s];
    if (l == 0) continue;
    int c = next_code[l]++;
    int r = rev_bits(c, l);
    int32_t entry = l | (s << 8);
    if (l <= ROOT_BITS) {
      for (int idx = r; idx < ROOT_SIZE; idx += 1 << l) t->root[idx] = entry;
    } else {
      int slot = r & (ROOT_SIZE - 1);
      int nb = need[slot];
      int hi = r >> ROOT_BITS;              // l - ROOT_BITS significant bits
      int32_t* subt = t->sub + sub_off[slot];
      for (int idx = hi; idx < (1 << nb); idx += 1 << (l - ROOT_BITS))
        subt[idx] = entry;
    }
  }
  return E_OK;
}

// decode one symbol; returns packed entry (len | sym<<8) or 0 on bad code
static inline int32_t lut_decode(const Lut* t, uint64_t peek) {
  int32_t e = t->root[(uint32_t)peek & (ROOT_SIZE - 1)];
  if (e < 0) {
    int32_t v = -(e + 1);
    int nb = v & 0xFF;
    const int32_t* subt = t->sub + (v >> 8);
    e = subt[((uint32_t)peek >> ROOT_BITS) & ((1u << nb) - 1)];
  }
  return e;
}

static const uint8_t CLEN_ORDER[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                       11, 4, 12, 3, 13, 2, 14, 1, 15};

static const uint16_t LEN_BASE[29] = {
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258};
static const uint8_t LEN_EXTRA[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
                                      2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
                                      5, 5, 5, 5, 0};
static const uint16_t DIST_BASE[30] = {
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
    12289, 16385, 24577};
static const uint8_t DIST_EXTRA[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
                                       4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
                                       9, 9, 10, 10, 11, 11, 12, 12, 13, 13};

static Lut g_fixed_ll, g_fixed_d;
static bool g_fixed_ready = false;

static void init_fixed() {
  if (g_fixed_ready) return;
  uint8_t lens[288];
  for (int i = 0; i < 144; i++) lens[i] = 8;
  for (int i = 144; i < 256; i++) lens[i] = 9;
  for (int i = 256; i < 280; i++) lens[i] = 7;
  for (int i = 280; i < 288; i++) lens[i] = 8;
  build_lut(lens, 288, &g_fixed_ll);
  uint8_t dl[32];
  for (int i = 0; i < 32; i++) dl[i] = 5;
  build_lut(dl, 32, &g_fixed_d);
  g_fixed_ready = true;
}

// Parse the dynamic-block header into luts (ref form_d1/form_d2 :164-235).
static int64_t read_dynamic(BitIn& in, Lut* ll, Lut* dd) {
  int hlit = (int)in.read(5) + 257;
  int hdist = (int)in.read(5) + 1;
  int hclen = (int)in.read(4) + 4;
  if (hlit > 286 || hdist > 30) return E_HDR;
  uint8_t clen_lens[19] = {0};
  for (int j = 0; j < hclen; j++) clen_lens[CLEN_ORDER[j]] = (uint8_t)in.read(3);
  if (!in.ok()) return E_TRUNC;
  Lut cl;
  int64_t e = build_lut(clen_lens, 19, &cl);
  if (e) return e;

  int total = hlit + hdist;
  uint8_t lens[286 + 30] = {0};
  int i = 0, prev = -1;
  while (i < total) {
    int32_t ent = lut_decode(&cl, in.peek64());
    int l = ent & 0xFF;
    if (l == 0) return E_BADCODE;
    in.pos += l;
    int s = ent >> 8;
    if (s < 16) {
      lens[i++] = (uint8_t)s;
      prev = s;
    } else if (s == 16) {
      if (prev < 0) return E_TREE;
      int rep = 3 + (int)in.read(2);
      if (i + rep > total) return E_TREE;
      for (int k = 0; k < rep; k++) lens[i++] = (uint8_t)prev;
    } else if (s == 17) {
      int rep = 3 + (int)in.read(3);
      if (i + rep > total) return E_TREE;
      i += rep;
      prev = 0;
    } else {
      int rep = 11 + (int)in.read(7);
      if (i + rep > total) return E_TREE;
      i += rep;
      prev = 0;
    }
    if (!in.ok()) return E_TRUNC;
  }
  if (lens[256] == 0) return E_TREE;            // need EOB
  uint8_t llens[286] = {0}, dlens[30] = {0};
  std::memcpy(llens, lens, (size_t)hlit);
  std::memcpy(dlens, lens + hlit, (size_t)hdist);
  e = build_lut(llens, 286, ll);
  if (e) return e;
  e = build_lut(dlens, 30, dd);
  return e;
}

}  // namespace

extern "C" {

// CRC-32 (reflected 0xEDB88320), slice-by-8.
uint32_t dct_crc32(const uint8_t* p, int64_t n, uint32_t crc) {
  static uint32_t table[8][256];
  static bool ready = false;
  if (!ready) {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++) c = (c >> 1) ^ (0xEDB88320u & (~(c & 1) + 1));
      table[0][i] = c;
    }
    for (int s = 1; s < 8; s++)
      for (uint32_t i = 0; i < 256; i++)
        table[s][i] = table[s - 1][i] >> 8 ^ table[0][table[s - 1][i] & 0xFF];
    ready = true;
  }
  uint32_t c = ~crc;
  while (n >= 8) {
    uint32_t lo, hi;
    std::memcpy(&lo, p, 4);
    std::memcpy(&hi, p + 4, 4);
    c ^= lo;
    c = table[7][c & 0xFF] ^ table[6][(c >> 8) & 0xFF] ^
        table[5][(c >> 16) & 0xFF] ^ table[4][c >> 24] ^
        table[3][hi & 0xFF] ^ table[2][(hi >> 8) & 0xFF] ^
        table[1][(hi >> 16) & 0xFF] ^ table[0][hi >> 24];
    p += 8;
    n -= 8;
  }
  while (n-- > 0) c = table[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
  return ~c;
}

// Adler-32 with deferred modulo (NMAX batching).
uint32_t dct_adler32(const uint8_t* p, int64_t n, uint32_t adler) {
  uint32_t a = adler & 0xFFFF, b = (adler >> 16) & 0xFFFF;
  const int64_t NMAX = 5552;
  while (n > 0) {
    int64_t m = n < NMAX ? n : NMAX;
    n -= m;
    for (int64_t i = 0; i < m; i++) {
      a += *p++;
      b += a;
    }
    a %= 65521;
    b %= 65521;
  }
  return (b << 16) | a;
}

// Inflate a raw DEFLATE stream starting at bit `bit_pos`, rejecting match
// distances above `max_dist` (the declared sliding window — the reference
// derives it from the zlib header, src/deflate_decompress.c:360, and bounds
// back-copies :278-279).
// On success: returns output length, *end_bit_pos = next bit after BFINAL
// block. Errors return Err (< 0). E_SIZE => retry with larger out_cap.
int64_t dct_inflate2(const uint8_t* inp, int64_t in_len, int64_t bit_pos,
                     uint8_t* out, int64_t out_cap, int64_t* end_bit_pos,
                     int64_t max_dist) {
  init_fixed();
  BitIn in{inp, in_len, bit_pos};
  int64_t opos = 0;
  Lut* dyn_ll = nullptr;
  // allocate dynamic tables on stack once (large: 2*96KB ok for threads)
  static thread_local Lut tl_ll, tl_d;

  for (;;) {
    uint32_t bfinal = in.read(1);
    uint32_t btype = in.read(2);
    if (!in.ok()) return E_TRUNC;
    if (btype == 3) return E_BTYPE;
    if (btype == 0) {
      in.align();
      uint32_t len = in.read(16);
      uint32_t nlen = in.read(16);
      if (!in.ok()) return E_TRUNC;
      if (len != (~nlen & 0xFFFF)) return E_STORED;
      int64_t byte0 = in.pos >> 3;
      if (byte0 + len > in_len) return E_TRUNC;
      if (opos + len > out_cap) return E_SIZE;
      std::memcpy(out + opos, inp + byte0, len);
      opos += len;
      in.pos += (int64_t)len * 8;
    } else {
      Lut *ll, *dd;
      if (btype == 1) {
        ll = &g_fixed_ll;
        dd = &g_fixed_d;
      } else {
        int64_t e = read_dynamic(in, &tl_ll, &tl_d);
        if (e) return e;
        ll = &tl_ll;
        dd = &tl_d;
      }
      (void)dyn_ll;
      for (;;) {
        int32_t ent = lut_decode(ll, in.peek64());
        int l = ent & 0xFF;
        if (l == 0) return E_BADCODE;
        in.pos += l;
        if (!in.ok()) return E_TRUNC;
        int s = ent >> 8;
        if (s < 256) {
          if (opos >= out_cap) return E_SIZE;
          out[opos++] = (uint8_t)s;
        } else if (s == 256) {
          break;
        } else {
          if (s > 285) return E_SYM;
          int li = s - 257;
          int64_t length = LEN_BASE[li] + in.read(LEN_EXTRA[li]);
          int32_t dent = lut_decode(dd, in.peek64());
          int dl = dent & 0xFF;
          if (dl == 0) return E_BADCODE;
          in.pos += dl;
          int ds = dent >> 8;
          if (ds > 29) return E_SYM;
          int64_t dist = DIST_BASE[ds] + in.read(DIST_EXTRA[ds]);
          if (!in.ok()) return E_TRUNC;
          if (dist > opos || dist > max_dist) return E_DIST;
          if (opos + length > out_cap) return E_SIZE;
          const uint8_t* src = out + opos - dist;
          uint8_t* dst = out + opos;
          if (dist >= 8) {
            // non-overlapping-enough: chunked copy
            int64_t k = 0;
            for (; k + 8 <= length; k += 8) std::memcpy(dst + k, src + k, 8);
            for (; k < length; k++) dst[k] = src[k];
          } else {
            for (int64_t k = 0; k < length; k++) dst[k] = src[k];
          }
          opos += length;
        }
      }
    }
    if (bfinal) break;
  }
  if (end_bit_pos) *end_bit_pos = in.pos;
  return opos;
}

int64_t dct_inflate(const uint8_t* inp, int64_t in_len, int64_t bit_pos,
                    uint8_t* out, int64_t out_cap, int64_t* end_bit_pos) {
  return dct_inflate2(inp, in_len, bit_pos, out, out_cap, end_bit_pos, 32768);
}

// zlib container (ref :347-409). verify!=0 checks adler32. Distances are
// bounded by the header's declared window 1 << (CINFO+8) (ref :360).
int64_t dct_zlib_decompress(const uint8_t* inp, int64_t n, uint8_t* out,
                            int64_t out_cap, int verify) {
  if (n < 6) return E_HDR;
  uint8_t cmf = inp[0], flg = inp[1];
  if ((cmf & 0x0F) != 8) return E_HDR;
  if ((cmf >> 4) > 7) return E_HDR;  // CINFO
  if ((((uint32_t)cmf << 8) | flg) % 31 != 0) return E_HDR;
  if (flg & 0x20) return E_HDR;  // FDICT
  int64_t window = (int64_t)1 << ((cmf >> 4) + 8);
  int64_t end_bits = 0;
  int64_t len = dct_inflate2(inp, n, 16, out, out_cap, &end_bits, window);
  if (len < 0) return len;
  if (verify) {
    int64_t off = (end_bits + 7) / 8;
    if (off + 4 > n) return E_ADLER;
    uint32_t want = ((uint32_t)inp[off] << 24) | ((uint32_t)inp[off + 1] << 16)
                    | ((uint32_t)inp[off + 2] << 8) | inp[off + 3];
    if (dct_adler32(out, len, 1) != want) return E_ADLER;
  }
  return len;
}

// Build a decode index (decode/index.py .dcx sidecar) over a raw DEFLATE
// stream in one pass: per coding block (bit offset, output offset, btype),
// plus a sub-entry at the first token on/after every `sub_size` output
// bytes. Symbols are decoded but output is only COUNTED — no window buffer
// (the block loop being replayed is the reference's
// src/deflate_decompress.c:291-345). Returns total output length; E_SIZE if
// blk_cap/sub_cap are too small (caller grows + retries).
int64_t dct_build_index(const uint8_t* inp, int64_t in_len, int64_t bit_pos,
                        int64_t sub_size, int64_t* blk_bits,
                        int64_t* blk_outs, uint8_t* blk_types,
                        int64_t blk_cap, int64_t* sub_bits,
                        int64_t* sub_outs, int32_t* sub_blks,
                        int64_t sub_cap, int64_t* n_blocks, int64_t* n_subs,
                        int64_t* end_bit_pos) {
  init_fixed();
  BitIn in{inp, in_len, bit_pos};
  int64_t opos = 0, nb = 0, ns = 0;
  static thread_local Lut tl_ll, tl_d;

  for (;;) {
    if (nb >= blk_cap) return E_SIZE;
    blk_bits[nb] = in.pos;
    blk_outs[nb] = opos;
    uint32_t bfinal = in.read(1);
    uint32_t btype = in.read(2);
    if (!in.ok()) return E_TRUNC;
    if (btype == 3) return E_BTYPE;
    blk_types[nb] = (uint8_t)btype;
    int64_t blk_i = nb++;
    if (btype == 0) {
      in.align();
      uint32_t len = in.read(16);
      uint32_t nlen = in.read(16);
      if (!in.ok()) return E_TRUNC;
      if (len != (~nlen & 0xFFFF)) return E_STORED;
      if ((in.pos >> 3) + len > in_len) return E_TRUNC;
      opos += len;
      in.pos += (int64_t)len * 8;
    } else {
      Lut *ll, *dd;
      if (btype == 1) {
        ll = &g_fixed_ll;
        dd = &g_fixed_d;
      } else {
        int64_t e = read_dynamic(in, &tl_ll, &tl_d);
        if (e) return e;
        ll = &tl_ll;
        dd = &tl_d;
      }
      int64_t next_mark = opos;      // block start always gets a sub-entry
      for (;;) {
        if (opos >= next_mark) {
          if (ns >= sub_cap) return E_SIZE;
          sub_bits[ns] = in.pos;
          sub_outs[ns] = opos;
          sub_blks[ns] = (int32_t)blk_i;
          ns++;
          next_mark = (opos / sub_size + 1) * sub_size;
        }
        int32_t ent = lut_decode(ll, in.peek64());
        int l = ent & 0xFF;
        if (l == 0) return E_BADCODE;
        in.pos += l;
        if (!in.ok()) return E_TRUNC;
        int s = ent >> 8;
        if (s < 256) {
          opos++;
        } else if (s == 256) {
          break;
        } else {
          if (s > 285) return E_SYM;
          int li = s - 257;
          int64_t length = LEN_BASE[li] + in.read(LEN_EXTRA[li]);
          int32_t dent = lut_decode(dd, in.peek64());
          int dl = dent & 0xFF;
          if (dl == 0) return E_BADCODE;
          in.pos += dl;
          int ds = dent >> 8;
          if (ds > 29) return E_SYM;
          int64_t dist = DIST_BASE[ds] + in.read(DIST_EXTRA[ds]);
          if (!in.ok()) return E_TRUNC;
          if (dist > opos) return E_DIST;
          opos += length;
        }
      }
    }
    if (bfinal) break;
  }
  *n_blocks = nb;
  *n_subs = ns;
  if (end_bit_pos) *end_bit_pos = in.pos;
  return opos;
}

// PNG scanline defilter, in place over (H, rb) filtered rows (reference
// defilter src/png/png_decoder.c:819-857 and the Paeth predictor :803-817 —
// implementing the SPEC behavior, not the reference's pa/pa/pa bug). The
// left-neighbor recurrence makes Average/Paeth byte-serial along x; this is
// the native fast path for it (the Python implementation in png/decoder.py
// is the oracle). Returns 0 or E_HDR on an unknown filter type.
int64_t dct_png_defilter(uint8_t* rows, const uint8_t* filters, int64_t H,
                         int64_t rb, int64_t bpp) {
  const uint8_t* prev = nullptr;
  for (int64_t y = 0; y < H; y++) {
    uint8_t* r = rows + y * rb;
    switch (filters[y]) {
      case 0:
        break;
      case 1:  // Sub
        for (int64_t x = bpp; x < rb; x++) r[x] = (uint8_t)(r[x] + r[x - bpp]);
        break;
      case 2:  // Up
        if (prev)
          for (int64_t x = 0; x < rb; x++) r[x] = (uint8_t)(r[x] + prev[x]);
        break;
      case 3:  // Average
        if (prev) {
          for (int64_t x = 0; x < bpp; x++)
            r[x] = (uint8_t)(r[x] + (prev[x] >> 1));
          for (int64_t x = bpp; x < rb; x++)
            r[x] = (uint8_t)(r[x] + ((r[x - bpp] + prev[x]) >> 1));
        } else {
          for (int64_t x = bpp; x < rb; x++)
            r[x] = (uint8_t)(r[x] + (r[x - bpp] >> 1));
        }
        break;
      case 4:  // Paeth
        for (int64_t x = 0; x < rb; x++) {
          int a = x >= bpp ? r[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
          int p = a + b - c;
          int pa = p > a ? p - a : a - p;
          int pb = p > b ? p - b : b - p;
          int pc = p > c ? p - c : c - p;
          int pr = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          r[x] = (uint8_t)(r[x] + pr);
        }
        break;
      default:
        return E_HDR;
    }
    prev = r;
  }
  return E_OK;
}

int dct_abi_version() { return 2; }

}  // extern "C"
