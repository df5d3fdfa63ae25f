// Native decode core: host-side sequential hot loops of the TPU HEVC
// decoder.  The TPU owns the batched math (thevc_tpu/ops/jx.py); these are
// the serial, branchy parts the reference keeps on the CPU as well —
// CABAC coefficient parsing and per-TU intra reconstruction.
//
// Behavioral references: TDecBinCoderCABAC.cpp (decodeBin :106, EP
// :152/:171), TDecSbac.cpp (parseCoeffNxN :1133, parseLastSignificantXY
// :1074, xReadCoefRemainExGolomb), TComTrQuant.cpp sig-ctx helpers
// (:2315, :2350, :2707), TComPattern.cpp fillReferenceSamples (:368),
// TComPrediction.cpp (xPredIntraAng :190, planar :689, DC filter :1010),
// TComTrQuant dequant (:1272) + partial-butterfly inverse DCT/DST.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>

extern "C" {

#include "tables_gen.h"

// ---------------------------------------------------------------------------
// Bitstream + bin decoder state (mirrors bitstream.InputBitstream +
// cabac.engine.BinDecoder; synced from/to Python around each call)
// ---------------------------------------------------------------------------
struct BsEngine {
  const uint8_t* buf;
  int64_t buf_len;
  int64_t idx;        // next byte index
  uint64_t held;      // pending sub-byte bits (MSB-first remainder)
  int32_t num_held;
  int64_t num_bits_read;
  // arithmetic engine
  int32_t range;
  int64_t value;
  int32_t bits_needed;
  int32_t overflow;   // set on EOF instead of raising
};

static inline uint32_t bs_read(BsEngine* st, int n) {
  if (n == 0) return 0;
  st->num_bits_read += n;
  if (n <= st->num_held) {
    uint32_t ret = (uint32_t)((st->held >> (st->num_held - n)) &
                              ((1u << n) - 1));
    st->num_held -= n;
    return ret;
  }
  int need = n - st->num_held;
  uint64_t ret = st->num_held ? (st->held & ((1ull << st->num_held) - 1)) : 0;
  int nbytes = (need + 7) >> 3;
  if (st->idx + nbytes > st->buf_len) { st->overflow = 1; return 0; }
  uint64_t word = 0;
  for (int i = 0; i < nbytes; i++) word = (word << 8) | st->buf[st->idx + i];
  st->idx += nbytes;
  int rem = nbytes * 8 - need;
  ret = (ret << need) | (word >> rem);
  st->num_held = rem;
  st->held = rem ? (word & ((1ull << rem) - 1)) : 0;
  return (uint32_t)ret;
}

static inline int dec_bin(BsEngine* st, uint8_t* ctx, int idx) {
  uint8_t state = ctx[idx];
  int lps = kLPS[state >> 1][(st->range >> 6) - 4];
  st->range -= lps;
  int64_t scaled = (int64_t)st->range << 7;
  int bin;
  if (st->value < scaled) {
    bin = state & 1;
    ctx[idx] = kNextMPS[state];
    if (scaled >= (256 << 7)) return bin;
    st->range = scaled >> 6;
    st->value += st->value;
    if (++st->bits_needed == 0) {
      st->bits_needed = -8;
      st->value += (int32_t)bs_read(st, 8);
    }
    return bin;
  }
  int num_bits = kRenorm[lps >> 3];
  st->value = (st->value - scaled) << num_bits;
  st->range = lps << num_bits;
  bin = 1 - (state & 1);
  ctx[idx] = kNextLPS[state];
  st->bits_needed += num_bits;
  if (st->bits_needed >= 0) {
    st->value += (int32_t)bs_read(st, 8) << st->bits_needed;
    st->bits_needed -= 8;
  }
  return bin;
}

static inline int dec_bin_ep(BsEngine* st) {
  st->value += st->value;
  if (++st->bits_needed >= 0) {
    st->bits_needed = -8;
    st->value += (int32_t)bs_read(st, 8);
  }
  int64_t scaled = (int64_t)st->range << 7;
  if (st->value >= scaled) { st->value -= scaled; return 1; }
  return 0;
}

static inline uint32_t dec_bins_ep(BsEngine* st, int num_bins) {
  uint32_t bins = 0;
  while (num_bins > 8) {
    st->value = (st->value << 8) +
                ((int32_t)bs_read(st, 8) << (8 + st->bits_needed));
    int64_t scaled = (int64_t)st->range << 15;
    for (int i = 0; i < 8; i++) {
      bins += bins;
      scaled >>= 1;
      if (st->value >= scaled) { bins++; st->value -= scaled; }
    }
    num_bins -= 8;
  }
  st->bits_needed += num_bins;
  st->value <<= num_bins;
  if (st->bits_needed >= 0) {
    st->value += (int32_t)bs_read(st, 8) << st->bits_needed;
    st->bits_needed -= 8;
  }
  int64_t scaled = (int64_t)st->range << (num_bins + 7);
  for (int i = 0; i < num_bins; i++) {
    bins += bins;
    scaled >>= 1;
    if (st->value >= scaled) { bins++; st->value -= scaled; }
  }
  return bins;
}

static inline int coef_remain_exgolomb(BsEngine* st, int rparam) {
  int prefix = 0, codeword = 1;
  while (codeword) { prefix++; codeword = dec_bin_ep(st); }
  prefix--;
  const int kRed = 3;  // COEF_REMAIN_BIN_REDUCTION
  if (prefix < kRed) {
    codeword = rparam ? (int)dec_bins_ep(st, rparam) : 0;
    return (prefix << rparam) + codeword;
  }
  int n = prefix - kRed + rparam;
  codeword = n ? (int)dec_bins_ep(st, n) : 0;
  return (((1 << (prefix - kRed)) + kRed - 1) << rparam) + codeword;
}

// ---------------------------------------------------------------------------
// Significance context helpers (TComTrQuant.cpp:2315/2350/2707)
// ---------------------------------------------------------------------------
static inline int sig_cg_ctx(const int32_t* sig_cg, int cg_x, int cg_y,
                             int width) {
  int n = width >> 2;
  int right = (cg_x < n - 1) ? (sig_cg[cg_y * n + cg_x + 1] != 0) : 0;
  int lower = (cg_y < n - 1) ? (sig_cg[(cg_y + 1) * n + cg_x] != 0) : 0;
  return (right || lower) ? 1 : 0;
}

static inline int calc_pattern(const int32_t* sig_cg, int cg_x, int cg_y,
                               int width) {
  if (width == 4) return -1;
  int n = width >> 2;
  int right = (cg_x < n - 1) ? (sig_cg[cg_y * n + cg_x + 1] != 0) : 0;
  int lower = (cg_y < n - 1) ? (sig_cg[(cg_y + 1) * n + cg_x] != 0) : 0;
  return right + (lower << 1);
}

static const int kCtxIndMap[16] = {0,1,4,5,2,3,4,5,6,6,8,8,7,7,8,8};

static inline int sig_ctx_inc(int pattern, int scan_idx, int pos_x, int pos_y,
                              int block_type, int comp) {
  if (pos_x + pos_y == 0) return 0;
  if (block_type == 2) return kCtxIndMap[4 * pos_y + pos_x];
  int offset;
  if (block_type == 3) offset = (scan_idx == 3 /*SCAN_DIAG*/) ? 9 : 15;
  else offset = (comp == 0) ? 21 : 12;
  int pxs = pos_x & 3, pys = pos_y & 3;
  int cnt;
  if (pattern == 0) { int s = pxs + pys; cnt = (s >= 3) ? 0 : (s == 0 ? 2 : 1); }
  else if (pattern == 1) cnt = (pys >= 2) ? 0 : (pys == 0 ? 2 : 1);
  else if (pattern == 2) cnt = (pxs >= 2) ? 0 : (pxs == 0 ? 2 : 1);
  else cnt = 2;
  int luma_extra = (comp == 0 && ((pos_x >> 2) + (pos_y >> 2)) > 0) ? 3 : 0;
  return luma_extra + offset + cnt;
}

// group-index / min-in-group tables (TComRom)
static const int kGroupIdx[32] = {0,1,2,3,4,4,5,5,6,6,6,6,7,7,7,7,
                                  8,8,8,8,8,8,8,8,9,9,9,9,9,9,9,9};
static const int kMinInGroup[10] = {0,1,2,3,4,6,8,12,16,24};

// ---------------------------------------------------------------------------
// parseCoeffNxN (TDecSbac.cpp:1133) — the decoder's hottest host loop
// ---------------------------------------------------------------------------
// ctx offsets passed from Python (single source of truth: cabac/contexts.py)
struct CoeffCtxOffsets {
  int32_t o_last_x, o_last_y, o_sig, o_sig_cg, o_one, o_abs;
  int32_t num_sig_luma;   // NUM_SIG_FLAG_CTX_LUMA
};

int parse_coeff_nxn(BsEngine* st, uint8_t* ctx, const CoeffCtxOffsets* off,
                    int width, int scan_idx_orig, int is_luma, int be_valid,
                    const int32_t* scan, const int32_t* scan_cg,
                    int32_t* coeff /* width*width row-major, zeroed */) {
  const int kSBH = 4, kC1Num = 8;
  int log2 = 0; while ((1 << log2) < width) log2++;
  int block_type = log2;

  // parseLastSignificantXY
  int blk_off, shift, base_x, base_y;
  int lg = log2 - 2;
  if (!is_luma) {
    blk_off = 0; shift = lg;
    base_x = off->o_last_x + 15; base_y = off->o_last_y + 15;
  } else {
    blk_off = lg * 3 + ((lg + 1) >> 2);
    shift = (lg + 3) >> 2;
    base_x = off->o_last_x; base_y = off->o_last_y;
  }
  int group_max = kGroupIdx[width - 1];
  int pos_x = 0, pos_y = 0;
  while (pos_x < group_max &&
         dec_bin(st, ctx, base_x + blk_off + (pos_x >> shift))) pos_x++;
  while (pos_y < group_max &&
         dec_bin(st, ctx, base_y + blk_off + (pos_y >> shift))) pos_y++;
  if (pos_x > 3) {
    int count = (pos_x - 2) >> 1;
    pos_x = kMinInGroup[pos_x] + (int)dec_bins_ep(st, count);
  }
  if (pos_y > 3) {
    int count = (pos_y - 2) >> 1;
    pos_y = kMinInGroup[pos_y] + (int)dec_bins_ep(st, count);
  }
  int scan_idx = scan_idx_orig;
  if (scan_idx == 2 /*SCAN_VER*/) {
    int t = pos_x; pos_x = pos_y; pos_y = t;
  }
  if (scan_idx == 0 /*SCAN_ZIGZAG -> SCAN_DIAG*/) scan_idx = 3;
  int blk_pos_last = pos_x + (pos_y << log2);
  coeff[blk_pos_last] = 1;

  int max_coeff = width * width;
  int scan_pos_last = 0;
  for (int i = 0; i < max_coeff; i++) {
    if (scan[i] == blk_pos_last) { scan_pos_last = i; break; }
  }

  int sig_base = off->o_sig + (is_luma ? 0 : off->num_sig_luma);
  int cg_base = off->o_sig_cg + (is_luma ? 0 : 2);
  int last_scan_set = scan_pos_last >> 4;
  int c1 = 1, go_rice = 0;
  int num_blk_side = width >> 2;
  int32_t sig_cg_flags[64];
  memset(sig_cg_flags, 0, sizeof(sig_cg_flags));

  int i_scan_pos_sig = scan_pos_last;
  int pos[16];
  int abs_coeff[16];

  for (int subset = last_scan_set; subset >= 0; subset--) {
    int sub_pos = subset << 4;
    go_rice = 0;
    int num_nonzero = 0;
    int last_nz = -1, first_nz = 16;
    if (i_scan_pos_sig == scan_pos_last) {
      last_nz = i_scan_pos_sig; first_nz = i_scan_pos_sig;
      i_scan_pos_sig--;
      pos[num_nonzero++] = blk_pos_last;
    }
    int cg_blk_pos = scan_cg[subset];
    int cg_pos_y = num_blk_side ? cg_blk_pos / num_blk_side : 0;
    int cg_pos_x = cg_blk_pos - cg_pos_y * num_blk_side;

    if (subset == last_scan_set || subset == 0) {
      sig_cg_flags[cg_blk_pos] = 1;
    } else {
      int c = sig_cg_ctx(sig_cg_flags, cg_pos_x, cg_pos_y, width);
      sig_cg_flags[cg_blk_pos] = dec_bin(st, ctx, cg_base + c);
    }

    int pattern = calc_pattern(sig_cg_flags, cg_pos_x, cg_pos_y, width);
    while (i_scan_pos_sig >= sub_pos) {
      int blk = scan[i_scan_pos_sig];
      int yy = blk >> log2;
      int xx = blk - (yy << log2);
      int sig = 0;
      if (sig_cg_flags[cg_blk_pos]) {
        if (i_scan_pos_sig > sub_pos || subset == 0 || num_nonzero) {
          int c = sig_ctx_inc(pattern, scan_idx, xx, yy, block_type,
                              is_luma ? 0 : 1);
          sig = dec_bin(st, ctx, sig_base + c);
        } else {
          sig = 1;
        }
      }
      coeff[blk] = sig;
      if (sig) {
        pos[num_nonzero++] = blk;
        if (last_nz == -1) last_nz = i_scan_pos_sig;
        first_nz = i_scan_pos_sig;
      }
      i_scan_pos_sig--;
    }

    if (num_nonzero) {
      int sign_hidden = (last_nz - first_nz) >= kSBH;
      int ctx_set = (subset > 0 && is_luma) ? 2 : 0;
      if (c1 == 0) ctx_set++;
      c1 = 1;
      int one_base = off->o_one + (is_luma ? 0 : 16) + 4 * ctx_set;
      for (int i = 0; i < num_nonzero; i++) abs_coeff[i] = 1;
      int num_c1 = num_nonzero < kC1Num ? num_nonzero : kC1Num;
      int first_c2_idx = -1;
      for (int i = 0; i < num_c1; i++) {
        int bin = dec_bin(st, ctx, one_base + c1);
        if (bin == 1) {
          c1 = 0;
          if (first_c2_idx == -1) first_c2_idx = i;
        } else if (c1 > 0 && c1 < 3) {
          c1++;
        }
        abs_coeff[i] = bin + 1;
      }
      if (c1 == 0) {
        int abs_base = off->o_abs + (is_luma ? 0 : 4) + ctx_set;
        if (first_c2_idx != -1) {
          int bin = dec_bin(st, ctx, abs_base);
          abs_coeff[first_c2_idx] = bin + 2;
        }
      }
      int nsign = (sign_hidden && be_valid) ? num_nonzero - 1 : num_nonzero;
      uint32_t signs = nsign ? dec_bins_ep(st, nsign) : 0;

      int first_coeff2 = 1;
      if (c1 == 0 || num_nonzero > kC1Num) {
        for (int i = 0; i < num_nonzero; i++) {
          int base_level = (i < kC1Num) ? (2 + first_coeff2) : 1;
          if (abs_coeff[i] == base_level) {
            int level = coef_remain_exgolomb(st, go_rice);
            abs_coeff[i] = level + base_level;
            if (abs_coeff[i] > 3 * (1 << go_rice))
              go_rice = go_rice < 4 ? go_rice + 1 : 4;
          }
          if (abs_coeff[i] >= 2) first_coeff2 = 0;
        }
      }
      int64_t abs_sum = 0;
      for (int i = 0; i < num_nonzero; i++) {
        int blk = pos[i];
        coeff[blk] = abs_coeff[i];
        abs_sum += abs_coeff[i];
        if (i == num_nonzero - 1 && sign_hidden && be_valid) {
          if (abs_sum & 1) coeff[blk] = -coeff[blk];
        } else {
          if ((signs >> (nsign - 1 - i)) & 1) coeff[blk] = -coeff[blk];
        }
      }
    }
  }
  return st->overflow ? -1 : 0;
}


// ---------------------------------------------------------------------------
// Intra TU reconstruction (stage 2 of the decode hot path)
// TComPattern::fillReferenceSamples + TComPrediction::predIntra*Ang +
// TComTrQuant dequant/inverse transform + TComYuv::addClip.
// ---------------------------------------------------------------------------

struct AvailMaps {
  const int64_t* order;    // padded (H+2P)x(W+2P)
  const uint8_t* in_pic;   // padded
  const int64_t* ctu;      // padded
  const int64_t* tile;     // padded
  const int64_t* sstart;   // unpadded per-unit slice start
  int32_t pad;             // P
  int32_t w;               // padded row stride
  int32_t uw;              // unpadded row stride
};

// one row per TU: x, y, size, mode, qp_scaled, cbf, use_dst, ts, bypass, pcm
enum { TU_X, TU_Y, TU_SIZE, TU_MODE, TU_QPS, TU_CBF, TU_DST, TU_TS,
       TU_BYP, TU_PCM, TU_FIELDS };

static const int kAngTable[9] = {0,2,5,9,13,17,21,26,32};
static const int kInvAngTable[9] = {0,4096,1638,910,630,482,390,315,256};
static const int kFilterThresh[7] = {0,0,10,7,1,0,10};  // index log2

static inline int use_filtered_c(int mode, int log2, int is_luma) {
  if (!is_luma || mode == 1 /*DC*/) return 0;
  int dh = mode - 10; if (dh < 0) dh = -dh;
  int dv = mode - 26; if (dv < 0) dv = -dv;
  int diff = dh < dv ? dh : dv;
  return diff > kFilterThresh[log2];
}

static void tu_avail_flags(const AvailMaps* m, int ux, int uy, int nu,
                           uint8_t* flags /* 4*nu+1 */) {
  int P = m->pad, W = m->w;
  int x = ux + P, y = uy + P;
  int64_t cur_o = m->order[(int64_t)y * W + x];
  int64_t ss = m->sstart[(int64_t)uy * m->uw + ux];
  int64_t cctu = m->ctu[(int64_t)y * W + x];
  int64_t ctile = m->tile[(int64_t)y * W + x];
  // column x-1, rows y-1 .. y+2nu-1 : corner then left+below-left downwards
  for (int j = -1; j < 2 * nu; j++) {
    int64_t p = (int64_t)(y + j) * W + (x - 1);
    int ok = m->in_pic[p] && m->order[p] < cur_o && m->order[p] >= ss &&
             (m->ctu[p] == cctu || m->tile[p] == ctile);
    if (j < 0) flags[2 * nu] = (uint8_t)ok;
    else flags[2 * nu - 1 - j] = (uint8_t)ok;
  }
  // row y-1, cols x .. x+2nu-1 : above + above-right
  for (int j = 0; j < 2 * nu; j++) {
    int64_t p = (int64_t)(y - 1) * W + (x + j);
    int ok = m->in_pic[p] && m->order[p] < cur_o && m->order[p] >= ss &&
             (m->ctu[p] == cctu || m->tile[p] == ctile);
    flags[2 * nu + 1 + j] = (uint8_t)ok;
  }
}

static void fill_reference_line_c(const int16_t* rec, int stride,
                                  int x0, int y0, int size, int unit,
                                  const uint8_t* flags, int dc_val,
                                  int32_t* line /* 4*size+unit */) {
  int nu = size / unit;
  int total_units = 4 * nu + 1;
  int line_len = 4 * size + unit;
  int corner = 2 * size;
  int n_avail = 0;
  for (int i = 0; i < total_units; i++) n_avail += flags[i];
  for (int i = 0; i < line_len; i++) line[i] = dc_val;
  if (n_avail == 0) return;
  if (flags[2 * nu]) {
    int32_t v = rec[(int64_t)(y0 - 1) * stride + (x0 - 1)];
    for (int i = 0; i < unit; i++) line[corner + i] = v;
  }
  for (int j = 0; j < 2 * nu; j++) {
    if (flags[2 * nu - 1 - j]) {
      int ys = y0 + j * unit;
      int dst = corner - 1 - j * unit;
      for (int i = 0; i < unit; i++)
        line[dst - i] = rec[(int64_t)(ys + i) * stride + (x0 - 1)];
    }
  }
  for (int j = 0; j < 2 * nu; j++) {
    if (flags[2 * nu + 1 + j]) {
      int xs = x0 + j * unit;
      int dst = corner + unit + j * unit;
      for (int i = 0; i < unit; i++)
        line[dst + i] = rec[(int64_t)(y0 - 1) * stride + (xs + i)];
    }
  }
  if (n_avail == total_units) return;
  // substitution pass (TComPattern.cpp:495-534)
  int curr = 0;
  while (curr < total_units) {
    if (!flags[curr]) {
      if (curr == 0) {
        int nxt = 1;
        while (nxt < total_units && !flags[nxt]) nxt++;
        int32_t ref = (nxt < total_units) ? line[nxt * unit] : dc_val;
        for (int i = 0; i < nxt * unit; i++) line[i] = ref;
        curr = nxt;
      } else {
        int32_t ref = line[curr * unit - 1];
        for (int i = 0; i < unit; i++) line[curr * unit + i] = ref;
        curr++;
      }
    } else {
      curr++;
    }
  }
}

static void smooth_line_c(int32_t* line, int size, int unit) {
  // [1 2 1] over the logical sequence (left bottom->top, corner, top)
  int corner = 2 * size;
  int seq_len = 4 * size + 1;
  int32_t seq[4 * 64 + 1];
  for (int i = 0; i < corner; i++) seq[i] = line[i];
  seq[corner] = line[corner];
  for (int i = 0; i < 2 * size; i++) seq[corner + 1 + i] = line[corner + unit + i];
  int32_t out[4 * 64 + 1];
  out[0] = seq[0];
  out[seq_len - 1] = seq[seq_len - 1];
  for (int i = 1; i < seq_len - 1; i++)
    out[i] = (seq[i - 1] + 2 * seq[i] + seq[i + 1] + 2) >> 2;
  for (int i = 0; i < corner; i++) line[i] = out[i];
  for (int i = 0; i < unit; i++) line[corner + i] = out[corner];
  for (int i = 0; i < 2 * size; i++) line[corner + unit + i] = out[corner + 1 + i];
}

static void predict_c(const int32_t* line, int size, int unit, int mode,
                      int is_luma, int max_val, int32_t* pred) {
  int32_t ref_above[129], ref_left[129];
  int corner = 2 * size;
  ref_above[0] = line[corner];
  for (int i = 0; i < 2 * size; i++) ref_above[1 + i] = line[corner + unit + i];
  ref_left[0] = line[corner];
  for (int i = 0; i < 2 * size; i++) ref_left[1 + i] = line[corner - 1 - i];

  if (mode == 0) {  // planar
    int log2 = 0; while ((1 << log2) < size) log2++;
    int64_t bottom_left = ref_left[size + 1];
    int64_t top_right = ref_above[size + 1];
    for (int k = 0; k < size; k++) {
      int64_t left = ref_left[1 + k];
      int64_t right_col = top_right - left;
      for (int l = 0; l < size; l++) {
        int64_t top = ref_above[1 + l];
        int64_t hor = (left << log2) + size + (int64_t)(l + 1) * right_col;
        int64_t ver = (top << log2) + (int64_t)(k + 1) * (bottom_left - top);
        pred[k * size + l] = (int32_t)((hor + ver) >> (log2 + 1));
      }
    }
    return;
  }
  if (mode < 2) return;  // unreachable (mode 1 handled below as angular DC)

  if (mode == 1) return;
  // angular incl. DC
  (void)0;
}

static void angular_c(const int32_t* line, int size, int unit, int mode,
                      int bfilter, int max_val, int32_t* pred) {
  int32_t ref_above[129], ref_left[129];
  int corner = 2 * size;
  ref_above[0] = line[corner];
  for (int i = 0; i < 2 * size; i++) ref_above[1 + i] = line[corner + unit + i];
  ref_left[0] = line[corner];
  for (int i = 0; i < 2 * size; i++) ref_left[1 + i] = line[corner - 1 - i];

  if (mode < 2) {  // DC
    int64_t s = 0;
    for (int i = 1; i <= size; i++) s += ref_above[i] + ref_left[i];
    int32_t dcval = (int32_t)((s + size) / (2 * size));
    for (int i = 0; i < size * size; i++) pred[i] = dcval;
    return;
  }
  int mode_hor = mode < 18;
  int ang = mode_hor ? -(mode - 10) : (mode - 26);
  int abs_ang = kAngTable[ang < 0 ? -ang : ang];
  int inv_angle = kInvAngTable[ang < 0 ? -ang : ang];
  int ipa = (ang < 0) ? -abs_ang : abs_ang;

  const int32_t* main_src = mode_hor ? ref_left : ref_above;
  const int32_t* side_src = mode_hor ? ref_above : ref_left;

  int32_t buf[3 * 64 + 1];
  int off;
  if (ipa < 0) {
    int ext = (size * ipa) >> 5;  // negative
    off = size;
    for (int i = 0; i <= size; i++) buf[off + i] = main_src[i];
    int inv_sum = 128;
    for (int k = -1; k > ext; k--) {
      inv_sum += inv_angle;
      buf[off + k] = side_src[inv_sum >> 8];
    }
  } else {
    off = 0;
    for (int i = 0; i <= 2 * size; i++) buf[i] = main_src[i];
  }

  int32_t tmp[64 * 64];
  if (ipa == 0) {
    for (int k = 0; k < size; k++)
      for (int l = 0; l < size; l++) tmp[k * size + l] = buf[off + 1 + l];
    if (bfilter) {
      for (int k = 0; k < size; k++) {
        int32_t v = tmp[k * size] + ((side_src[1 + k] - side_src[0]) >> 1);
        tmp[k * size] = v < 0 ? 0 : (v > max_val ? max_val : v);
      }
    }
  } else {
    for (int k = 0; k < size; k++) {
      int delta_pos = (k + 1) * ipa;
      int delta_int = delta_pos >> 5;
      int delta_frac = delta_pos & 31;
      const int32_t* row = buf + off + delta_int + 1;
      if (delta_frac) {
        for (int l = 0; l < size; l++)
          tmp[k * size + l] =
              ((32 - delta_frac) * row[l] + delta_frac * row[l + 1] + 16) >> 5;
      } else {
        for (int l = 0; l < size; l++) tmp[k * size + l] = row[l];
      }
    }
  }
  if (mode_hor) {
    for (int k = 0; k < size; k++)
      for (int l = 0; l < size; l++) pred[l * size + k] = tmp[k * size + l];
  } else {
    memcpy(pred, tmp, sizeof(int32_t) * size * size);
  }
  if (mode == 1 && bfilter) { /* handled by caller */ }
}

static void dc_filter_c(const int32_t* line, int size, int unit,
                        int32_t* pred) {
  int corner = 2 * size;
  int32_t top1 = line[corner + unit];       // ref_above[1]
  int32_t left1 = line[corner - 1];         // ref_left[1]
  pred[0] = (top1 + left1 + 2 * pred[0] + 2) >> 2;
  for (int l = 1; l < size; l++)
    pred[l] = (line[corner + unit + l] + 3 * pred[l] + 2) >> 2;
  for (int k = 1; k < size; k++)
    pred[k * size] = (line[corner - 1 - k] + 3 * pred[k * size] + 2) >> 2;
}

// inverse quant + inverse transform (TComTrQuant.cpp:1272, :417-802)
static void residual_c(const int32_t* coeff, int cstride, int x, int y,
                       int size, int qp_scaled, int use_dst, int ts, int byp,
                       int bit_inc, const int32_t* basis, int32_t* resi) {
  static const int kInvQuantScales[6] = {40, 45, 51, 57, 64, 72};
  int log2 = 0; while ((1 << log2) < size) log2++;
  if (byp) {
    for (int r = 0; r < size; r++)
      for (int c = 0; c < size; c++)
        resi[r * size + c] = coeff[(int64_t)(y + r) * cstride + (x + c)];
    return;
  }
  // dequant
  int per = qp_scaled / 6, rem = qp_scaled % 6;
  int tshift = 15 - (8 + bit_inc) - log2;
  int shift = 20 - 14 - tshift;
  int64_t add = 1ll << (shift - 1);
  int64_t scale = (int64_t)kInvQuantScales[rem] << per;
  int32_t deq[64 * 64];
  for (int r = 0; r < size; r++) {
    for (int c = 0; c < size; c++) {
      int64_t q = coeff[(int64_t)(y + r) * cstride + (x + c)];
      if (q < -32768) q = -32768; else if (q > 32767) q = 32767;
      int64_t v = (q * scale + add) >> shift;
      if (v < -32768) v = -32768; else if (v > 32767) v = 32767;
      deq[r * size + c] = (int32_t)v;
    }
  }
  if (ts) {
    int s = 15 - (8 + bit_inc) - log2;
    if (s > 0) {
      int off = 1 << (s - 1);
      for (int i = 0; i < size * size; i++)
        resi[i] = (int16_t)((deq[i] + off) >> s);
    } else {
      for (int i = 0; i < size * size; i++)
        resi[i] = (int16_t)(deq[i] << (-s));
    }
    return;
  }
  // pass 1: y1[j][k] = clip16((sum_n T[n][k] * deq[n][j] + 64) >> 7)
  int32_t tmp[64 * 64];
  for (int j = 0; j < size; j++) {
    for (int k = 0; k < size; k++) {
      int64_t acc = 0;
      for (int n = 0; n < size; n++)
        acc += (int64_t)basis[n * size + k] * deq[n * size + j];
      int64_t v = (acc + 64) >> 7;
      if (v < -32768) v = -32768; else if (v > 32767) v = 32767;
      tmp[j * size + k] = (int32_t)v;
    }
  }
  int shift2 = 12 - bit_inc;
  int64_t add2 = 1ll << (shift2 - 1);
  for (int j = 0; j < size; j++) {
    for (int k = 0; k < size; k++) {
      int64_t acc = 0;
      for (int n = 0; n < size; n++)
        acc += (int64_t)basis[n * size + k] * tmp[n * size + j];
      int64_t v = (acc + add2) >> shift2;
      if (v < -32768) v = -32768; else if (v > 32767) v = 32767;
      resi[j * size + k] = (int32_t)v;
    }
  }
}

struct IntraParams {
  int32_t stride;       // rec plane stride (samples)
  int32_t cstride;      // coeff plane stride
  int32_t unit;         // 4 luma, 2 chroma (reference-line unit)
  int32_t avail_div;    // sample->luma-unit divisor (4 luma, 2 chroma)
  int32_t is_luma;
  int32_t dc_val;
  int32_t max_val;
  int32_t bit_inc;
  const int32_t* dct4;
  const int32_t* dct8;
  const int32_t* dct16;
  const int32_t* dct32;
  const int32_t* dst4;
  const int16_t* pcm_plane;  // may be null
  int32_t pcm_stride;
};

void intra_recon_tus(int16_t* rec, const int32_t* coeff,
                     const int32_t* tus, int n_tus,
                     const AvailMaps* maps, const IntraParams* p) {
  uint8_t flags[4 * 32 + 1];
  int32_t line[4 * 64 + 8];
  int32_t pred[64 * 64];
  int32_t resi[64 * 64];
  for (int t = 0; t < n_tus; t++) {
    const int32_t* tu = tus + (int64_t)t * TU_FIELDS;
    int x = tu[TU_X], y = tu[TU_Y], size = tu[TU_SIZE];
    if (tu[TU_PCM]) {
      for (int r = 0; r < size; r++)
        memcpy(rec + (int64_t)(y + r) * p->stride + x,
               p->pcm_plane + (int64_t)(y + r) * p->pcm_stride + x,
               sizeof(int16_t) * size);
      continue;
    }
    int mode = tu[TU_MODE];
    int ux = x / p->avail_div, uy = y / p->avail_div;
    int nu = size / p->avail_div;
    tu_avail_flags(maps, ux, uy, nu, flags);
    fill_reference_line_c(rec, p->stride, x, y, size, p->unit, flags,
                          p->dc_val, line);
    int log2 = 0; while ((1 << log2) < size) log2++;
    if (p->is_luma && use_filtered_c(mode, log2, 1))
      smooth_line_c(line, size, p->unit);
    if (mode == 0) {
      predict_c(line, size, p->unit, 0, p->is_luma, p->max_val, pred);
    } else {
      angular_c(line, size, p->unit, mode, p->is_luma, p->max_val, pred);
      if (mode == 1 && p->is_luma) dc_filter_c(line, size, p->unit, pred);
    }
    if (tu[TU_CBF]) {
      const int32_t* basis =
          tu[TU_DST] ? p->dst4 :
          (size == 4 ? p->dct4 : size == 8 ? p->dct8 :
           size == 16 ? p->dct16 : p->dct32);
      residual_c(coeff, p->cstride, x, y, size, tu[TU_QPS], tu[TU_DST],
                 tu[TU_TS], tu[TU_BYP], p->bit_inc, basis, resi);
      for (int r = 0; r < size; r++) {
        for (int c = 0; c < size; c++) {
          int v = pred[r * size + c] + resi[r * size + c];
          rec[(int64_t)(y + r) * p->stride + (x + c)] =
              (int16_t)(v < 0 ? 0 : (v > p->max_val ? p->max_val : v));
        }
      }
    } else {
      for (int r = 0; r < size; r++) {
        for (int c = 0; c < size; c++) {
          int v = pred[r * size + c];
          rec[(int64_t)(y + r) * p->stride + (x + c)] =
              (int16_t)(v < 0 ? 0 : (v > p->max_val ? p->max_val : v));
        }
      }
    }
  }
}


// ---------------------------------------------------------------------------
// Deblocking filter (TComLoopFilter.cpp xPelFilterLuma :799 /
// xPelFilterChroma :870), per-direction over the precomputed edge maps.
// ---------------------------------------------------------------------------
static const int kTcTable[54] = {
  0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1,1,2,2,2,2,3,3,3,3,
  4,4,4,5,5,6,6,7,8,9,10,11,13,14,16,18,20,22,24};
static const int kBetaTable[52] = {
  0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,6,7,8,9,10,11,12,13,14,15,16,17,18,20,
  22,24,26,28,30,32,34,36,38,40,42,44,46,48,50,52,54,56,58,60,62,64};

static inline int clip3i(int lo, int hi, int v) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// filter one 4-line luma edge segment; pel(line,k) = base[line*ls + k*ks],
// k in 0..7 with the edge between k=3 and k=4
static void luma_segment(int16_t* base, int64_t ls, int64_t ks,
                         int tc, int beta, int no_p, int no_q, int max_val) {
  int m[4][8];
  for (int l = 0; l < 4; l++)
    for (int k = 0; k < 8; k++) m[l][k] = base[l * ls + k * ks];

  int dp0 = m[0][1] - 2*m[0][2] + m[0][3]; if (dp0 < 0) dp0 = -dp0;
  int dq0 = m[0][4] - 2*m[0][5] + m[0][6]; if (dq0 < 0) dq0 = -dq0;
  int dp3 = m[3][1] - 2*m[3][2] + m[3][3]; if (dp3 < 0) dp3 = -dp3;
  int dq3 = m[3][4] - 2*m[3][5] + m[3][6]; if (dq3 < 0) dq3 = -dq3;
  int d0 = dp0 + dq0, d3 = dp3 + dq3;
  int dpp = dp0 + dp3, dqq = dq0 + dq3;
  int d = d0 + d3;
  if (d >= beta) return;
  int filter_p = dpp < ((beta + (beta >> 1)) >> 3);
  int filter_q = dqq < ((beta + (beta >> 1)) >> 3);

  int sw = 1;
  for (int l = 0; l < 4; l += 3) {
    int ds = (m[l][0] - m[l][3] < 0 ? m[l][3]-m[l][0] : m[l][0]-m[l][3])
           + (m[l][7] - m[l][4] < 0 ? m[l][4]-m[l][7] : m[l][7]-m[l][4]);
    int dd = (l == 0) ? d0 : d3;
    int ab = m[l][3] - m[l][4]; if (ab < 0) ab = -ab;
    if (!(ds < (beta >> 3) && 2*dd < (beta >> 2) && ab < ((tc*5+1) >> 1)))
      sw = 0;
  }

  for (int l = 0; l < 4; l++) {
    int* q = m[l];
    int o1=q[1],o2=q[2],o3=q[3],o4=q[4],o5=q[5],o6=q[6];
    if (sw) {
      o3 = clip3i(q[3]-2*tc, q[3]+2*tc, (q[1]+2*q[2]+2*q[3]+2*q[4]+q[5]+4)>>3);
      o4 = clip3i(q[4]-2*tc, q[4]+2*tc, (q[2]+2*q[3]+2*q[4]+2*q[5]+q[6]+4)>>3);
      o2 = clip3i(q[2]-2*tc, q[2]+2*tc, (q[1]+q[2]+q[3]+q[4]+2)>>2);
      o5 = clip3i(q[5]-2*tc, q[5]+2*tc, (q[3]+q[4]+q[5]+q[6]+2)>>2);
      o1 = clip3i(q[1]-2*tc, q[1]+2*tc, (2*q[0]+3*q[1]+q[2]+q[3]+q[4]+4)>>3);
      o6 = clip3i(q[6]-2*tc, q[6]+2*tc, (q[3]+q[4]+q[5]+3*q[6]+2*q[7]+4)>>3);
    } else {
      int delta = (9*(q[4]-q[3]) - 3*(q[5]-q[2]) + 8) >> 4;
      int ad = delta < 0 ? -delta : delta;
      if (ad < tc*10) {
        int dc = clip3i(-tc, tc, delta);
        o3 = clip3i(0, max_val, q[3] + dc);
        o4 = clip3i(0, max_val, q[4] - dc);
        int tc2 = tc >> 1;
        if (filter_p) {
          int d1 = clip3i(-tc2, tc2, (((q[1]+q[3]+1)>>1) - q[2] + dc) >> 1);
          o2 = clip3i(0, max_val, q[2] + d1);
        }
        if (filter_q) {
          int d2 = clip3i(-tc2, tc2, (((q[6]+q[4]+1)>>1) - q[5] - dc) >> 1);
          o5 = clip3i(0, max_val, q[5] + d2);
        }
      }
    }
    if (!no_p) {
      base[l*ls + 1*ks] = (int16_t)o1;
      base[l*ls + 2*ks] = (int16_t)o2;
      base[l*ls + 3*ks] = (int16_t)o3;
    }
    if (!no_q) {
      base[l*ls + 4*ks] = (int16_t)o4;
      base[l*ls + 5*ks] = (int16_t)o5;
      base[l*ls + 6*ks] = (int16_t)o6;
    }
  }
}

void deblock_luma(int16_t* plane, int h, int w,
                  const uint8_t* flags, const uint8_t* bs,
                  const int32_t* qp_p, const int32_t* qp_q,
                  const uint8_t* no_p, const uint8_t* no_q,
                  int uh, int uw, int dir, int beta_off, int tc_off,
                  int bit_depth) {
  int scale = 1 << (bit_depth - 8);
  int max_val = (1 << bit_depth) - 1;
  // dir 0: vertical edges at columns ucol*4 (ucol even >= 2)
  // dir 1: horizontal edges at rows urow*4 — same maps, transposed roles
  int a_max = dir == 0 ? uw : uh;   // edge-normal axis (units)
  int b_max = dir == 0 ? uh : uw;   // along-edge axis (units)
  for (int a = 2; a < a_max; a += 2) {
    for (int b = 0; b < b_max; b++) {
      int uy = dir == 0 ? b : a;
      int ux = dir == 0 ? a : b;
      int64_t mi = (int64_t)uy * uw + ux;
      if (!flags[mi] || bs[mi] == 0) continue;
      int qp = (qp_p[mi] + qp_q[mi] + 1) >> 1;
      int idx_tc = clip3i(0, 53, qp + 2 * (bs[mi] - 1) + (tc_off << 1));
      int idx_b = clip3i(0, 51, qp + (beta_off << 1));
      int tc = kTcTable[idx_tc] * scale;
      int beta = kBetaTable[idx_b] * scale;
      int x = ux * 4, y = uy * 4;
      int16_t* base;
      int64_t ls, ks;
      if (dir == 0) { base = plane + (int64_t)y * w + (x - 4); ls = w; ks = 1; }
      else { base = plane + (int64_t)(y - 4) * w + x; ls = 1; ks = w; }
      luma_segment(base, ls, ks, tc, beta, no_p[mi], no_q[mi], max_val);
    }
  }
}

void deblock_chroma(int16_t* cb, int16_t* cr, int h, int w,
                    const uint8_t* flags, const uint8_t* bs,
                    const int32_t* qp_p, const int32_t* qp_q,
                    const uint8_t* no_p, const uint8_t* no_q,
                    const uint8_t* chroma_scale,
                    int uh, int uw, int dir, int tc_off, int bit_depth) {
  int scale = 1 << (bit_depth - 8);
  int max_val = (1 << bit_depth) - 1;
  int a_max = dir == 0 ? uw : uh;
  int b_max = dir == 0 ? uh : uw;
  for (int a = 4; a < a_max; a += 4) {
    for (int b = 0; b < b_max; b++) {
      int uy = dir == 0 ? b : a;
      int ux = dir == 0 ? a : b;
      int64_t mi = (int64_t)uy * uw + ux;
      if (!flags[mi] || bs[mi] <= 1) continue;
      int qp_avg = (qp_p[mi] + qp_q[mi] + 1) >> 1;
      int qp = chroma_scale[clip3i(0, 51, qp_avg)];
      int idx_tc = clip3i(0, 53, qp + 2 * (bs[mi] - 1) + (tc_off << 1));
      int tc = kTcTable[idx_tc] * scale;
      int xc = dir == 0 ? ux * 2 : ux * 2;
      int yc = uy * 2;
      for (int pi = 0; pi < 2; pi++) {
        int16_t* plane = pi == 0 ? cb : cr;
        int16_t* base;
        int64_t ls, ks;
        if (dir == 0) { base = plane + (int64_t)yc * w + (xc - 2); ls = w; ks = 1; }
        else { base = plane + (int64_t)(yc - 2) * w + xc; ls = 1; ks = w; }
        for (int l = 0; l < 2; l++) {
          int m2 = base[l*ls + 0*ks], m3 = base[l*ls + 1*ks];
          int m4 = base[l*ls + 2*ks], m5 = base[l*ls + 3*ks];
          int delta = clip3i(-tc, tc, ((((m4 - m3) << 2) + m2 - m5 + 4) >> 3));
          if (!no_p[mi]) base[l*ls + 1*ks] =
              (int16_t)clip3i(0, max_val, m3 + delta);
          if (!no_q[mi]) base[l*ls + 2*ks] =
              (int16_t)clip3i(0, max_val, m4 - delta);
        }
      }
    }
  }
}

}  // extern "C"
