// Native banded pair-HMM forward-backward with posterior extraction.
//
// Parity: getPosteriorProbsWithBanding (pairwiseAligner.c:706-844) +
// diagonalCalculationPosteriorProbs (:637-681), with the same f32
// arithmetic and operation order as the JAX scan/Pallas kernels in
// margin_tpu/ops/banded.py.
//
// Role: 'monster' alignments — anchor-poor or non-colinear pairs whose
// exact band approaches the full DP matrix — cannot fit accelerator HBM
// at any tiling and are latency-bound on the vectorized host scan (it
// pays dense (D, W) storage for a ragged band). This kernel walks the
// exact ragged band with flat per-diagonal storage (sum of real widths,
// no padding), the way the reference's C does. Neighbor indices within a
// diagonal differ by a constant offset, hoisted out of the inner loops.
// The GIL is released for the whole call, so a Python thread pool
// overlaps monster items with accelerator batches.
//
// Build: make -C native  (libmarginfb.so)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <vector>

#ifdef __AVX512F__
#include <immintrin.h>
#endif

namespace {

constexpr float kLogZero = -INFINITY;

// transition vector layout (ops/pairhmm.py:45)
enum {
  T_MM = 0, T_M_FROM_GX, T_M_FROM_GY,
  T_OPEN_X, T_OPEN_Y, T_EXT_X, T_EXT_Y, T_SW_X, T_SW_Y
};

struct LutLogAdd {
  // piecewise-cubic logAdd (pairwiseAligner.c:279-299); coefficients are
  // passed in from logmath so there is a single source of truth
  float breaks[3];
  float cubic[4][4];
  float underflow;
};

static inline float lut_log_add(const LutLogAdd& t, float x, float y) {
  // branchless: the range split is arithmetic (the data-dependent chained
  // compares mispredict badly in the DP inner loop), and the underflow /
  // NaN (both -inf) case folds into one final select
  float hi = x > y ? x : y;
  float lo = x > y ? y : x;
  float d = hi - lo;
  int idx = (d > t.breaks[0]) + (d > t.breaks[1]) + (d > t.breaks[2]);
  const float* c = t.cubic[idx];
  float approx = ((c[0] * d + c[1]) * d + c[2]) * d + c[3] + lo;
  return (d < t.underflow) ? approx : hi;
}

static inline float exact_log_add(float x, float y) {
  float hi = x > y ? x : y;
  float lo = x > y ? y : x;
  if (hi == kLogZero) return kLogZero;
  return hi + log1pf(expf(lo - hi));
}

struct Diag {
  int64_t lo;      // xmy lower bound (inclusive)
  int64_t n;       // number of cells
  int64_t off;     // offset into the flat cell arrays
};

struct Ctx {
  const int32_t* x_sym;
  const int32_t* y_sym;
  int64_t lx, ly, n_diag;
  const Diag* diags;
  const float* match25;
  const float* gapx5;
  const float* gapy5;
  const float* rep_tab;
  const int32_t* rep_x;
  const int32_t* rep_y;
  float trans[9];
  float ew[3];
  LutLogAdd lut;
  int ragged_left;
  float* fm;
  float* fx;
  float* fy;
};

template <bool USE_LUT>
static inline float ladd(const Ctx& c, float a, float b) {
  return USE_LUT ? lut_log_add(c.lut, a, b) : exact_log_add(a, b);
}

template <bool USE_LUT>
static inline float ladd3(const Ctx& c, float a, float b, float d) {
  return ladd<USE_LUT>(c, ladd<USE_LUT>(c, a, b), d);
}

static inline int32_t sym_at(const int32_t* s, int64_t i, int64_t n) {
  return (i >= 0 && i < n) ? s[i] : 4;
}

static inline int32_t rep_at(const int32_t* r, int64_t i, int64_t n) {
  if (r == nullptr || i < 0 || i >= n) return 0;
  int32_t v = r[i];
  return v > 50 ? 50 : v;
}

// emission for the MATCH into cell (x, y): consumes chars x-1, y-1
static inline float e_match(const Ctx& c, int64_t x, int64_t y) {
  int32_t cx = sym_at(c.x_sym, x - 1, c.lx);
  int32_t cy = sym_at(c.y_sym, y - 1, c.ly);
  float e = c.match25[cx * 5 + cy];
  if (c.rep_tab != nullptr) {
    int32_t base = cx >= 4 ? 0 : cx;
    e += c.rep_tab[base * (51 * 51) + rep_at(c.rep_x, x - 1, c.lx) * 51 +
                   rep_at(c.rep_y, y - 1, c.ly)];
  }
  return e;
}

#ifdef __AVX512F__
// ---- AVX-512 interior (LUT flavor only) ----------------------------------
// 16 cells per step with the EXACT scalar op order per lane: separate
// mul/add (no fmadd — the scalar build uses -ffp-contract=off and the
// JAX kernels are unfused), ordered compares (NaN-false like the scalar
// ternaries), and the same final d<underflow select. Bit-identical to the
// scalar loop by construction; tests/test_native_fb.py pins it.

struct VLut {
  __m512 b0, b1, b2, underflow;
  __m512 cubic;  // all 16 coefficients: row-major 4x4, lane = idx*4+j
  __m512i j0, j1, j2, j3;
};

static inline VLut vlut_make(const LutLogAdd& t) {
  VLut v;
  v.b0 = _mm512_set1_ps(t.breaks[0]);
  v.b1 = _mm512_set1_ps(t.breaks[1]);
  v.b2 = _mm512_set1_ps(t.breaks[2]);
  v.underflow = _mm512_set1_ps(t.underflow);
  v.cubic = _mm512_loadu_ps(&t.cubic[0][0]);
  v.j0 = _mm512_set1_epi32(0);
  v.j1 = _mm512_set1_epi32(1);
  v.j2 = _mm512_set1_epi32(2);
  v.j3 = _mm512_set1_epi32(3);
  return v;
}

static inline __m512 vlut_log_add(const VLut& t, __m512 x, __m512 y) {
  __m512 hi = _mm512_max_ps(x, y);
  __m512 lo = _mm512_min_ps(x, y);
  __m512 d = _mm512_sub_ps(hi, lo);
  // idx = (d > b0) + (d > b1) + (d > b2), NaN -> 0 (ordered compares)
  __mmask16 g0 = _mm512_cmp_ps_mask(d, t.b0, _CMP_GT_OQ);
  __mmask16 g1 = _mm512_cmp_ps_mask(d, t.b1, _CMP_GT_OQ);
  __mmask16 g2 = _mm512_cmp_ps_mask(d, t.b2, _CMP_GT_OQ);
  __m512i one = _mm512_set1_epi32(1);
  __m512i idx = _mm512_maskz_mov_epi32(g0, one);
  idx = _mm512_mask_add_epi32(idx, g1, idx, one);
  idx = _mm512_mask_add_epi32(idx, g2, idx, one);
  __m512i base = _mm512_slli_epi32(idx, 2);
  __m512 c0 = _mm512_permutexvar_ps(_mm512_add_epi32(base, t.j0), t.cubic);
  __m512 c1 = _mm512_permutexvar_ps(_mm512_add_epi32(base, t.j1), t.cubic);
  __m512 c2 = _mm512_permutexvar_ps(_mm512_add_epi32(base, t.j2), t.cubic);
  __m512 c3 = _mm512_permutexvar_ps(_mm512_add_epi32(base, t.j3), t.cubic);
  // ((c0*d + c1)*d + c2)*d + c3 + lo — separate mul/add, scalar order
  __m512 a = _mm512_add_ps(_mm512_mul_ps(c0, d), c1);
  a = _mm512_add_ps(_mm512_mul_ps(a, d), c2);
  a = _mm512_add_ps(_mm512_mul_ps(a, d), c3);
  a = _mm512_add_ps(a, lo);
  __mmask16 lt = _mm512_cmp_ps_mask(d, t.underflow, _CMP_LT_OQ);
  return _mm512_mask_mov_ps(hi, lt, a);
}

static inline __m512 vladd3(const VLut& t, __m512 a, __m512 b, __m512 d) {
  return vlut_log_add(t, vlut_log_add(t, a, b), d);
}

// y_sym/rep_y walk DESCENDING with k: load 16 ascending from y-15 and
// reverse lanes
static inline __m512i vload_rev_i32(const int32_t* p) {
  const __m512i rev = _mm512_set_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                       11, 12, 13, 14, 15);
  return _mm512_permutexvar_epi32(rev, _mm512_loadu_si512(p));
}
#endif  // __AVX512F__

template <bool USE_LUT>
static void forward_pass(Ctx& c) {
  const float t_mm = c.trans[T_MM], t_mgx = c.trans[T_M_FROM_GX],
              t_mgy = c.trans[T_M_FROM_GY], t_ox = c.trans[T_OPEN_X],
              t_ex = c.trans[T_EXT_X], t_sx = c.trans[T_SW_X],
              t_oy = c.trans[T_OPEN_Y], t_ey = c.trans[T_EXT_Y],
              t_sy = c.trans[T_SW_Y];
  // diagonal 0: the start cell (cells self-initialize: the flat arrays
  // are NOT pre-filled — a monster band pre-fill wrote 1.7 GB of -inf
  // per array per call)
  {
    const Diag& dg = c.diags[0];
    for (int64_t k = 0; k < dg.n; k++) {
      int64_t i = dg.off + k;
      c.fm[i] = c.fx[i] = c.fy[i] = kLogZero;
      if (dg.lo + 2 * k != 0) continue;
      if (c.ragged_left) { c.fx[i] = 0.0f; c.fy[i] = 0.0f; }
      else c.fm[i] = 0.0f;
    }
  }
  for (int64_t d = 1; d < c.n_diag; d++) {
    const Diag& dg = c.diags[d];
    const Diag& d1 = c.diags[d - 1];
    const Diag d2v = d >= 2 ? c.diags[d - 2] : Diag{0, 0, 0};
    // neighbor index = base + k (constant per diagonal)
    const int64_t b_low = (dg.lo - 1 - d1.lo) / 2;   // (x-1, y) on d-1
    const int64_t b_mid = d >= 2 ? (dg.lo - d2v.lo) / 2 : 0;

    auto cell = [&](int64_t k) {
      const int64_t xmy = dg.lo + 2 * k;
      const int64_t x = (d + xmy) / 2, y = (d - xmy) / 2;
      const int64_t i = dg.off + k;
      c.fm[i] = c.fx[i] = c.fy[i] = kLogZero;  // self-init (no pre-fill)
      if (x < 0 || x > c.lx || y < 0 || y > c.ly) return;
      const int64_t kl = b_low + k;        // low; up = kl + 1
      const int64_t km = b_mid + k;
      const bool okl = kl >= 0 && kl < d1.n;
      const bool oku = kl + 1 >= 0 && kl + 1 < d1.n;
      const bool okm = d >= 2 && km >= 0 && km < d2v.n;
      const int64_t il = d1.off + kl, iu = d1.off + kl + 1,
                    im = d2v.off + km;
      const float lm = okl ? c.fm[il] : kLogZero;
      const float lgx = okl ? c.fx[il] : kLogZero;
      const float lgy = okl ? c.fy[il] : kLogZero;
      const float um = oku ? c.fm[iu] : kLogZero;
      const float ugx = oku ? c.fx[iu] : kLogZero;
      const float ugy = oku ? c.fy[iu] : kLogZero;
      const float mm = okm ? c.fm[im] : kLogZero;
      const float mgx = okm ? c.fx[im] : kLogZero;
      const float mgy = okm ? c.fy[im] : kLogZero;
      if (x >= 1)
        c.fx[i] = c.gapx5[sym_at(c.x_sym, x - 1, c.lx)] +
                  ladd3<USE_LUT>(c, lm + t_ox, lgx + t_ex, lgy + t_sx);
      if (x >= 1 && y >= 1)
        c.fm[i] = e_match(c, x, y) +
                  ladd3<USE_LUT>(c, mm + t_mm, mgx + t_mgx, mgy + t_mgy);
      if (y >= 1)
        c.fy[i] = c.gapy5[sym_at(c.y_sym, y - 1, c.ly)] +
                  ladd3<USE_LUT>(c, um + t_oy, ugy + t_ey, ugx + t_sy);
    };

    // interior k-range: all neighbor/boundary predicates hold, so the
    // loop body is branch-free (the compiler vectorizes the LUT selects)
    int64_t kA = 0, kB = dg.n;
    auto clamp_lo = [&](int64_t v) { if (v > kA) kA = v; };
    auto clamp_hi = [&](int64_t v) { if (v < kB) kB = v; };
    // x = (d + dg.lo)/2 + k  =>  k >= 1 - x0 etc., with x0 at k=0
    {
      const int64_t x0 = (d + dg.lo) / 2, y0 = (d - dg.lo) / 2;
      clamp_lo(1 - x0);             // x >= 1
      clamp_hi(c.lx - x0 + 1);      // x <= lx
      clamp_lo(y0 - c.ly);          // y <= ly  (y = y0 - k)
      clamp_hi(y0 - 1 + 1);         // y >= 1
      clamp_lo(-b_low);             // okl
      clamp_hi(d1.n - b_low);
      clamp_lo(-b_low - 1);         // oku
      clamp_hi(d1.n - b_low - 1);
      if (d >= 2) {
        clamp_lo(-b_mid);           // okm
        clamp_hi(d2v.n - b_mid);
      } else {
        kB = kA;                    // no interior on diagonal 1
      }
    }
    if (kB < kA) kB = kA;
    for (int64_t k = 0; k < kA; k++) cell(k);
    {
      const int64_t x0 = (d + dg.lo) / 2, y0 = (d - dg.lo) / 2;
      const float* fm1 = c.fm + d1.off + b_low;
      const float* fx1 = c.fx + d1.off + b_low;
      const float* fy1 = c.fy + d1.off + b_low;
      const float* fm2 = c.fm + d2v.off + b_mid;
      const float* fx2 = c.fx + d2v.off + b_mid;
      const float* fy2 = c.fy + d2v.off + b_mid;
      float* om = c.fm + dg.off;
      float* ox = c.fx + dg.off;
      float* oy = c.fy + dg.off;
      const bool rle = c.rep_tab != nullptr;
      int64_t k = kA;
#ifdef __AVX512F__
      if (USE_LUT) {
        // 16-wide interior: the scalar loop's table lookups defeat
        // auto-vectorization; this is the monster-band hot loop (a 100 kb
        // polish chunk is ~24G band cells, mostly here)
        const VLut vt = vlut_make(c.lut);
        const __m512 v_ox = _mm512_set1_ps(t_ox), v_ex = _mm512_set1_ps(t_ex),
                     v_sx = _mm512_set1_ps(t_sx), v_mm = _mm512_set1_ps(t_mm),
                     v_mgx = _mm512_set1_ps(t_mgx),
                     v_mgy = _mm512_set1_ps(t_mgy),
                     v_oy = _mm512_set1_ps(t_oy), v_ey = _mm512_set1_ps(t_ey),
                     v_sy = _mm512_set1_ps(t_sy);
        const __m512i v5 = _mm512_set1_epi32(5);
        const __m512i v50 = _mm512_set1_epi32(50);
        const __m512i v51 = _mm512_set1_epi32(51);
        const __m512i v2601 = _mm512_set1_epi32(51 * 51);
        const __m512i v4 = _mm512_set1_epi32(4);
        for (; k + 16 <= kB; k += 16) {
          const int64_t x = x0 + k, y = y0 - k;
          __m512i cx = _mm512_loadu_si512(c.x_sym + x - 1);
          __m512i cy = vload_rev_i32(c.y_sym + y - 16);
          __m512i eidx = _mm512_add_epi32(_mm512_mullo_epi32(cx, v5), cy);
          __m512 em = _mm512_i32gather_ps(eidx, c.match25, 4);
          if (rle) {
            __m512i rx = _mm512_min_epi32(
                _mm512_loadu_si512(c.rep_x + x - 1), v50);
            __m512i ry = _mm512_min_epi32(vload_rev_i32(c.rep_y + y - 16),
                                          v50);
            __mmask16 isn = _mm512_cmp_epi32_mask(cx, v4, _MM_CMPINT_NLT);
            __m512i base = _mm512_maskz_mov_epi32(~isn, cx);
            __m512i ridx = _mm512_add_epi32(
                _mm512_mullo_epi32(base, v2601),
                _mm512_add_epi32(_mm512_mullo_epi32(rx, v51), ry));
            em = _mm512_add_ps(em, _mm512_i32gather_ps(ridx, c.rep_tab, 4));
          }
          __m512 gx_e = _mm512_i32gather_ps(cx, c.gapx5, 4);
          __m512 gy_e = _mm512_i32gather_ps(cy, c.gapy5, 4);
          __m512 r_ox = _mm512_add_ps(gx_e, vladd3(
              vt,
              _mm512_add_ps(_mm512_loadu_ps(fm1 + k), v_ox),
              _mm512_add_ps(_mm512_loadu_ps(fx1 + k), v_ex),
              _mm512_add_ps(_mm512_loadu_ps(fy1 + k), v_sx)));
          __m512 r_om = _mm512_add_ps(em, vladd3(
              vt,
              _mm512_add_ps(_mm512_loadu_ps(fm2 + k), v_mm),
              _mm512_add_ps(_mm512_loadu_ps(fx2 + k), v_mgx),
              _mm512_add_ps(_mm512_loadu_ps(fy2 + k), v_mgy)));
          __m512 r_oy = _mm512_add_ps(gy_e, vladd3(
              vt,
              _mm512_add_ps(_mm512_loadu_ps(fm1 + k + 1), v_oy),
              _mm512_add_ps(_mm512_loadu_ps(fy1 + k + 1), v_ey),
              _mm512_add_ps(_mm512_loadu_ps(fx1 + k + 1), v_sy)));
          _mm512_storeu_ps(ox + k, r_ox);
          _mm512_storeu_ps(om + k, r_om);
          _mm512_storeu_ps(oy + k, r_oy);
        }
      }
#endif
      for (; k < kB; k++) {
        const int64_t x = x0 + k, y = y0 - k;
        const int32_t cx = c.x_sym[x - 1], cy = c.y_sym[y - 1];
        float em = c.match25[cx * 5 + cy];
        if (rle) {
          int32_t rxv = c.rep_x[x - 1]; if (rxv > 50) rxv = 50;
          int32_t ryv = c.rep_y[y - 1]; if (ryv > 50) ryv = 50;
          em += c.rep_tab[(cx >= 4 ? 0 : cx) * (51 * 51) + rxv * 51 + ryv];
        }
        ox[k] = c.gapx5[cx] +
                ladd3<USE_LUT>(c, fm1[k] + t_ox, fx1[k] + t_ex,
                               fy1[k] + t_sx);
        om[k] = em + ladd3<USE_LUT>(c, fm2[k] + t_mm, fx2[k] + t_mgx,
                                    fy2[k] + t_mgy);
        oy[k] = c.gapy5[cy] +
                ladd3<USE_LUT>(c, fm1[k + 1] + t_oy, fy1[k + 1] + t_ey,
                               fx1[k + 1] + t_sy);
      }
    }
    for (int64_t k = kB; k < dg.n; k++) cell(k);
  }
}

template <bool USE_LUT>
static int64_t backward_extract(Ctx& c, float total, float threshold,
                                int32_t* out, int64_t out_cap) {
  const float t_mm = c.trans[T_MM], t_mgx = c.trans[T_M_FROM_GX],
              t_mgy = c.trans[T_M_FROM_GY], t_ox = c.trans[T_OPEN_X],
              t_ex = c.trans[T_EXT_X], t_sx = c.trans[T_SW_X],
              t_oy = c.trans[T_OPEN_Y], t_ey = c.trans[T_EXT_Y],
              t_sy = c.trans[T_SW_Y];
  const int64_t cells = c.diags[c.n_diag - 1].off + c.diags[c.n_diag - 1].n;
  // uninitialized: every cell self-initializes at its diagonal's pass
  std::unique_ptr<float[]> bm_a(new float[cells]), bx_a(new float[cells]),
      by_a(new float[cells]);
  float* bm = bm_a.get();
  float* bx = bx_a.get();
  float* by = by_a.get();
  int64_t n_out = 0;
  const bool have_total = total != kLogZero;
  const float log_thresh = logf(threshold);
  for (int64_t d = c.n_diag - 1; d >= 0; d--) {
    const Diag& dg = c.diags[d];
    const Diag d1 = d + 1 < c.n_diag ? c.diags[d + 1] : Diag{0, 0, 0};
    const Diag d2v = d + 2 < c.n_diag ? c.diags[d + 2] : Diag{0, 0, 0};
    const int64_t b_gx = d + 1 < c.n_diag ? (dg.lo + 1 - d1.lo) / 2 : 0;
    const int64_t b_m = d + 2 < c.n_diag ? (dg.lo - d2v.lo) / 2 : 0;

    bool overflow = false;
    auto cell_bwd = [&](int64_t k) {
      const int64_t xmy = dg.lo + 2 * k;
      const int64_t x = (d + xmy) / 2, y = (d - xmy) / 2;
      const int64_t i = dg.off + k;
      bm[i] = bx[i] = by[i] = kLogZero;  // self-init (no pre-fill)
      if (x < 0 || x > c.lx || y < 0 || y > c.ly) return;
      if (d == c.n_diag - 1 && x == c.lx && y == c.ly) {
        bm[i] = c.ew[0]; bx[i] = c.ew[1]; by[i] = c.ew[2];
      } else {
        const int64_t kg = b_gx + k;       // (x+1, y) on d+1; gy = kg - 1
        const int64_t km = b_m + k;
        const bool okg = d + 1 < c.n_diag && kg >= 0 && kg < d1.n
                         && x + 1 <= c.lx;
        const bool oky = d + 1 < c.n_diag && kg - 1 >= 0 && kg - 1 < d1.n
                         && y + 1 <= c.ly;
        const bool okm = d + 2 < c.n_diag && km >= 0 && km < d2v.n
                         && x + 1 <= c.lx && y + 1 <= c.ly;
        const float gx_n = okg ? bx[d1.off + kg] : kLogZero;
        const float gy_n = oky ? by[d1.off + kg - 1] : kLogZero;
        const float m_n = okm ? bm[d2v.off + km] : kLogZero;
        const float egx = c.gapx5[sym_at(c.x_sym, x, c.lx)];
        const float egy = c.gapy5[sym_at(c.y_sym, y, c.ly)];
        const float em = e_match(c, x + 1, y + 1);
        bm[i] = ladd3<USE_LUT>(c, gx_n + egx + t_ox, m_n + em + t_mm,
                               gy_n + egy + t_oy);
        bx[i] = ladd3<USE_LUT>(c, gx_n + egx + t_ex, m_n + em + t_mgx,
                               gy_n + egy + t_sy);
        by[i] = ladd3<USE_LUT>(c, gx_n + egx + t_sx, m_n + em + t_mgy,
                               gy_n + egy + t_ey);
      }
      // posteriors (diagonalCalculationPosteriorProbs); threshold in log
      // space so expf only runs for the rare passing cells
      if (!have_total) return;
      const float fs[3] = {c.fm[i], c.fx[i], c.fy[i]};
      const float bs[3] = {bm[i], bx[i], by[i]};
      const bool ok[3] = {x >= 1 && y >= 1, x >= 1, y >= 1};
      for (int s = 0; s < 3; s++) {
        if (!ok[s]) continue;
        float lp = fs[s] + bs[s] - total;
        if (!(lp >= log_thresh)) continue;
        float p = expf(lp > 0.0f ? 0.0f : lp);
        if (p >= threshold) {
          if (n_out >= out_cap) { overflow = true; return; }
          int32_t* row = out + 4 * n_out;
          row[0] = s;
          row[1] = (int32_t)(x - 1);
          row[2] = (int32_t)(y - 1);
          float pc = p > 1.0f ? 1.0f : p;
          row[3] = (int32_t)floorf(pc * 10000000.0f);
          n_out++;
        }
      }
    };

    // branch-free interior (see forward_pass): all predicates statically
    // true inside [kA, kB)
    int64_t kA = 0, kB = dg.n;
    if (d + 2 < c.n_diag) {
      const int64_t x0 = (d + dg.lo) / 2, y0 = (d - dg.lo) / 2;
      auto clamp_lo = [&](int64_t v) { if (v > kA) kA = v; };
      auto clamp_hi = [&](int64_t v) { if (v < kB) kB = v; };
      clamp_lo(1 - x0);                 // x >= 1 (extraction needs x-1)
      clamp_hi(c.lx - 1 - x0 + 1);      // x + 1 <= lx
      clamp_lo(y0 - (c.ly - 1));        // y + 1 <= ly
      clamp_hi(y0 - 1 + 1);             // y >= 1
      clamp_lo(-b_gx);                  // gx neighbor in band
      clamp_hi(d1.n - b_gx);
      clamp_lo(-b_gx + 1);              // gy neighbor (kg - 1)
      clamp_hi(d1.n - b_gx + 1);
      clamp_lo(-b_m);                   // match neighbor
      clamp_hi(d2v.n - b_m);
      if (kB < kA) kB = kA;
    } else {
      kB = kA;  // last two diagonals: general path only
    }
    for (int64_t k = dg.n - 1; k >= kB; k--) cell_bwd(k);
    if (kB > kA && !overflow) {
      const int64_t x0 = (d + dg.lo) / 2, y0 = (d - dg.lo) / 2;
      const float* bx1 = bx + d1.off + b_gx;
      const float* by1 = by + d1.off + b_gx;
      const float* bm2 = bm + d2v.off + b_m;
      float* obm = bm + dg.off;
      float* obx = bx + dg.off;
      float* oby = by + dg.off;
      const float* ofm = c.fm + dg.off;
      const float* ofx = c.fx + dg.off;
      const float* ofy = c.fy + dg.off;
      const bool rle = c.rep_tab != nullptr;
      // no same-diagonal dependencies in the backward body and extraction
      // rows are lexsorted downstream, so ascending vector blocks are
      // equivalent to the original descending walk
      int64_t k = kA;
#ifdef __AVX512F__
      if (USE_LUT) {
        const VLut vt = vlut_make(c.lut);
        const __m512 v_ox = _mm512_set1_ps(t_ox), v_ex = _mm512_set1_ps(t_ex),
                     v_sx = _mm512_set1_ps(t_sx), v_mm = _mm512_set1_ps(t_mm),
                     v_mgx = _mm512_set1_ps(t_mgx),
                     v_mgy = _mm512_set1_ps(t_mgy),
                     v_oy = _mm512_set1_ps(t_oy), v_ey = _mm512_set1_ps(t_ey),
                     v_sy = _mm512_set1_ps(t_sy);
        const __m512i v5 = _mm512_set1_epi32(5);
        const __m512i v50 = _mm512_set1_epi32(50);
        const __m512i v51 = _mm512_set1_epi32(51);
        const __m512i v2601 = _mm512_set1_epi32(51 * 51);
        const __m512i v4 = _mm512_set1_epi32(4);
        const __m512 v_total = _mm512_set1_ps(total);
        const __m512 v_lth = _mm512_set1_ps(log_thresh);
        for (; k + 16 <= kB; k += 16) {
          const int64_t x = x0 + k, y = y0 - k;
          __m512i cx = _mm512_loadu_si512(c.x_sym + x);
          __m512i cy = vload_rev_i32(c.y_sym + y - 15);
          __m512i eidx = _mm512_add_epi32(_mm512_mullo_epi32(cx, v5), cy);
          __m512 em = _mm512_i32gather_ps(eidx, c.match25, 4);
          if (rle) {
            __m512i rx = _mm512_min_epi32(_mm512_loadu_si512(c.rep_x + x),
                                          v50);
            __m512i ry = _mm512_min_epi32(vload_rev_i32(c.rep_y + y - 15),
                                          v50);
            __mmask16 isn = _mm512_cmp_epi32_mask(cx, v4, _MM_CMPINT_NLT);
            __m512i base = _mm512_maskz_mov_epi32(~isn, cx);
            __m512i ridx = _mm512_add_epi32(
                _mm512_mullo_epi32(base, v2601),
                _mm512_add_epi32(_mm512_mullo_epi32(rx, v51), ry));
            em = _mm512_add_ps(em, _mm512_i32gather_ps(ridx, c.rep_tab, 4));
          }
          __m512 egx = _mm512_i32gather_ps(cx, c.gapx5, 4);
          __m512 egy = _mm512_i32gather_ps(cy, c.gapy5, 4);
          __m512 a_gx = _mm512_add_ps(_mm512_loadu_ps(bx1 + k), egx);
          __m512 a_m = _mm512_add_ps(_mm512_loadu_ps(bm2 + k), em);
          __m512 a_gy = _mm512_add_ps(_mm512_loadu_ps(by1 + k - 1), egy);
          __m512 r_m = vladd3(vt, _mm512_add_ps(a_gx, v_ox),
                              _mm512_add_ps(a_m, v_mm),
                              _mm512_add_ps(a_gy, v_oy));
          __m512 r_x = vladd3(vt, _mm512_add_ps(a_gx, v_ex),
                              _mm512_add_ps(a_m, v_mgx),
                              _mm512_add_ps(a_gy, v_sy));
          __m512 r_y = vladd3(vt, _mm512_add_ps(a_gx, v_sx),
                              _mm512_add_ps(a_m, v_mgy),
                              _mm512_add_ps(a_gy, v_ey));
          _mm512_storeu_ps(obm + k, r_m);
          _mm512_storeu_ps(obx + k, r_x);
          _mm512_storeu_ps(oby + k, r_y);
          if (!have_total) continue;
          // threshold pre-screen: extraction fires on a tiny fraction of
          // cells, so only lanes passing the log-space test go scalar
          __mmask16 any =
              _mm512_cmp_ps_mask(
                  _mm512_sub_ps(_mm512_add_ps(_mm512_loadu_ps(ofm + k), r_m),
                                v_total), v_lth, _CMP_GE_OQ) |
              _mm512_cmp_ps_mask(
                  _mm512_sub_ps(_mm512_add_ps(_mm512_loadu_ps(ofx + k), r_x),
                                v_total), v_lth, _CMP_GE_OQ) |
              _mm512_cmp_ps_mask(
                  _mm512_sub_ps(_mm512_add_ps(_mm512_loadu_ps(ofy + k), r_y),
                                v_total), v_lth, _CMP_GE_OQ);
          if (!any) continue;
          for (int j = 0; j < 16; j++) {
            if (!(any & (1u << j))) continue;
            const int64_t kk = k + j;
            const int64_t xx = x0 + kk, yy = y0 - kk;
            const float fs[3] = {ofm[kk], ofx[kk], ofy[kk]};
            const float bs[3] = {obm[kk], obx[kk], oby[kk]};
            for (int s = 0; s < 3; s++) {
              float lp = fs[s] + bs[s] - total;
              if (!(lp >= log_thresh)) continue;
              float p = expf(lp > 0.0f ? 0.0f : lp);
              if (p >= threshold) {
                if (n_out >= out_cap) return -1;
                int32_t* row = out + 4 * n_out;
                row[0] = s;
                row[1] = (int32_t)(xx - 1);
                row[2] = (int32_t)(yy - 1);
                float pc = p > 1.0f ? 1.0f : p;
                row[3] = (int32_t)floorf(pc * 10000000.0f);
                n_out++;
              }
            }
          }
        }
      }
#endif
      for (; k < kB; k++) {
        const int64_t x = x0 + k, y = y0 - k;
        const int32_t cx = c.x_sym[x], cy = c.y_sym[y];
        const float egx = c.gapx5[cx];
        const float egy = c.gapy5[cy];
        float em = c.match25[cx * 5 + cy];
        if (rle) {
          int32_t rxv = c.rep_x[x]; if (rxv > 50) rxv = 50;
          int32_t ryv = c.rep_y[y]; if (ryv > 50) ryv = 50;
          em += c.rep_tab[(cx >= 4 ? 0 : cx) * (51 * 51) + rxv * 51 + ryv];
        }
        const float a_gx = bx1[k] + egx;
        const float a_m = bm2[k] + em;
        const float a_gy = by1[k - 1] + egy;
        obm[k] = ladd3<USE_LUT>(c, a_gx + t_ox, a_m + t_mm, a_gy + t_oy);
        obx[k] = ladd3<USE_LUT>(c, a_gx + t_ex, a_m + t_mgx, a_gy + t_sy);
        oby[k] = ladd3<USE_LUT>(c, a_gx + t_sx, a_m + t_mgy, a_gy + t_ey);
        if (!have_total) continue;
        const float fs[3] = {ofm[k], ofx[k], ofy[k]};
        const float bs[3] = {obm[k], obx[k], oby[k]};
        for (int s = 0; s < 3; s++) {
          float lp = fs[s] + bs[s] - total;
          if (!(lp >= log_thresh)) continue;
          float p = expf(lp > 0.0f ? 0.0f : lp);
          if (p >= threshold) {
            if (n_out >= out_cap) return -1;
            int32_t* row = out + 4 * n_out;
            row[0] = s;
            row[1] = (int32_t)(x - 1);
            row[2] = (int32_t)(y - 1);
            float pc = p > 1.0f ? 1.0f : p;
            row[3] = (int32_t)floorf(pc * 10000000.0f);
            n_out++;
          }
        }
      }
    }
    for (int64_t k = kA - 1; k >= 0; k--) cell_bwd(k);
    if (overflow) return -1;
  }
  return n_out;
}

}  // namespace

extern "C" {

// Returns the number of extracted pairs (or -1 if out_cap was too small;
// call again with a bigger buffer). Outputs:
//   out:   (n, 4) int32 rows [state(0=M,1=GX,2=GY), x-1, y-1, prob_int]
//   total: the forward log probability (double)
int64_t mfb_posteriors(
    const int32_t* x_sym, int64_t lx, const int32_t* y_sym, int64_t ly,
    const int64_t* band_lo, const int64_t* band_hi,  // (lx+ly+1,) xmy bounds
    const float* match25, const float* gapx5, const float* gapy5,
    const float* trans9,
    const float* rep_tab,  // (3*51*51,) or null
    const int32_t* rep_x, const int32_t* rep_y,
    int ragged_left, int ragged_right, int use_lut,
    const double* lut_breaks,  // (3,)
    const double* lut_cubic,   // (16,) row-major 4x4
    double lut_underflow,
    float threshold,
    int32_t* out, int64_t out_cap, double* total_out) {
  const int64_t n_diag = lx + ly + 1;

  Ctx c;
  c.x_sym = x_sym; c.y_sym = y_sym; c.lx = lx; c.ly = ly; c.n_diag = n_diag;
  c.match25 = match25; c.gapx5 = gapx5; c.gapy5 = gapy5;
  c.rep_tab = rep_tab; c.rep_x = rep_x; c.rep_y = rep_y;
  memcpy(c.trans, trans9, sizeof c.trans);
  c.ragged_left = ragged_left;
  if (use_lut) {
    for (int i = 0; i < 3; i++) c.lut.breaks[i] = (float)lut_breaks[i];
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 4; j++)
        c.lut.cubic[i][j] = (float)lut_cubic[4 * i + j];
    c.lut.underflow = (float)lut_underflow;
  }

  // band layout: flat storage, one Diag per anti-diagonal
  std::vector<Diag> diags(n_diag);
  int64_t cells = 0;
  for (int64_t d = 0; d < n_diag; d++) {
    int64_t lo = band_lo[d], hi = band_hi[d];
    diags[d].lo = lo;
    diags[d].n = hi >= lo ? (hi - lo) / 2 + 1 : 0;
    diags[d].off = cells;
    cells += diags[d].n;
  }
  c.diags = diags.data();

  std::unique_ptr<float[]> fm(new float[cells]), fx(new float[cells]),
      fy(new float[cells]);
  c.fm = fm.get(); c.fx = fx.get(); c.fy = fy.get();

  if (use_lut) forward_pass<true>(c);
  else forward_pass<false>(c);

  // end-state weights (stateMachine.c:531-560)
  if (ragged_right) {
    c.ew[0] = (c.trans[T_OPEN_X] + c.trans[T_OPEN_Y]) / 2.0f;
    c.ew[1] = c.trans[T_EXT_X];
    c.ew[2] = c.trans[T_EXT_Y];
  } else {
    c.ew[0] = c.trans[T_MM];
    c.ew[1] = c.trans[T_M_FROM_GX];
    c.ew[2] = c.trans[T_M_FROM_GY];
  }
  float total = kLogZero;
  {
    const Diag& dg = diags[n_diag - 1];
    int64_t kf = (lx - ly - dg.lo);
    if (kf >= 0 && (kf & 1) == 0 && kf / 2 < dg.n) {
      int64_t i_fin = dg.off + kf / 2;
      if (use_lut)
        total = ladd3<true>(c, fm[i_fin] + c.ew[0], fx[i_fin] + c.ew[1],
                            fy[i_fin] + c.ew[2]);
      else
        total = ladd3<false>(c, fm[i_fin] + c.ew[0], fx[i_fin] + c.ew[1],
                             fy[i_fin] + c.ew[2]);
    }
  }
  *total_out = (double)total;

  return use_lut
      ? backward_extract<true>(c, total, threshold, out, out_cap)
      : backward_extract<false>(c, total, threshold, out, out_cap);
}

}  // extern "C"
