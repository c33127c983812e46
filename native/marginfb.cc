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
// no padding), the way the reference's C does, at C speed. The GIL is
// released for the whole call, so a Python thread pool overlaps monster
// items with accelerator batches.
//
// Build: make -C native  (libmarginfb.so)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

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
  double breaks[3];
  double cubic[4][4];
  double underflow;
};

static inline float lut_log_add(const LutLogAdd& t, float x, float y) {
  float hi = x > y ? x : y;
  float lo = x > y ? y : x;
  float d = hi - lo;
  if (!(d < t.underflow)) return hi;  // also handles NaN/inf gaps
  double ds = d < 0.0 ? 0.0 : (d > t.underflow ? t.underflow : (double)d);
  const double* c;
  if (ds <= t.breaks[0]) c = t.cubic[0];
  else if (ds <= t.breaks[1]) c = t.cubic[1];
  else if (ds <= t.breaks[2]) c = t.cubic[2];
  else c = t.cubic[3];
  float approx = (float)(((c[0] * ds + c[1]) * ds + c[2]) * ds + c[3]) + lo;
  return approx;
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
  LutLogAdd lut;
  if (use_lut) {
    memcpy(lut.breaks, lut_breaks, sizeof lut.breaks);
    memcpy(lut.cubic, lut_cubic, sizeof lut.cubic);
    lut.underflow = lut_underflow;
  }
  auto ladd = [&](float a, float b) -> float {
    return use_lut ? lut_log_add(lut, a, b) : exact_log_add(a, b);
  };
  auto ladd3 = [&](float a, float b, float c) -> float {
    return ladd(ladd(a, b), c);
  };

  // band layout: flat storage, one Diag per anti-diagonal
  std::vector<Diag> diags(n_diag);
  int64_t cells = 0;
  for (int64_t d = 0; d < n_diag; d++) {
    int64_t lo = band_lo[d], hi = band_hi[d];
    // clip to the valid cell parallelogram
    if (lo < -ly + (d > ly ? d - ly : 0)) {}
    diags[d].lo = lo;
    diags[d].n = hi >= lo ? (hi - lo) / 2 + 1 : 0;
    diags[d].off = cells;
    cells += diags[d].n;
  }
  std::vector<float> fm(cells, kLogZero), fx(cells, kLogZero),
      fy(cells, kLogZero);

  const float t_mm = trans9[T_MM], t_mgx = trans9[T_M_FROM_GX],
              t_mgy = trans9[T_M_FROM_GY], t_ox = trans9[T_OPEN_X],
              t_ex = trans9[T_EXT_X], t_sx = trans9[T_SW_X],
              t_oy = trans9[T_OPEN_Y], t_ey = trans9[T_EXT_Y],
              t_sy = trans9[T_SW_Y];

  auto sym_x = [&](int64_t x) -> int32_t {
    return (x >= 0 && x < lx) ? x_sym[x] : 4;
  };
  auto sym_y = [&](int64_t y) -> int32_t {
    return (y >= 0 && y < ly) ? y_sym[y] : 4;
  };
  auto rep_at = [&](const int32_t* r, int64_t i, int64_t n) -> int32_t {
    if (r == nullptr || i < 0 || i >= n) return 0;
    int32_t v = r[i];
    return v > 50 ? 50 : v;
  };
  auto e_match = [&](int64_t x, int64_t y) -> float {
    // emission for the MATCH into cell (x, y): consumes chars x-1, y-1
    int32_t cx = sym_x(x - 1), cy = sym_y(y - 1);
    float e = match25[cx * 5 + cy];
    if (rep_tab != nullptr) {
      int32_t base = cx >= 4 ? 0 : cx;
      e += rep_tab[base * (51 * 51) + rep_at(rep_x, x - 1, lx) * 51 +
                   rep_at(rep_y, y - 1, ly)];
    }
    return e;
  };
  auto e_gapx = [&](int64_t x) -> float { return gapx5[sym_x(x - 1)]; };
  auto e_gapy = [&](int64_t y) -> float { return gapy5[sym_y(y - 1)]; };

  // cell lookup on diagonal d at xmy (kLogZero if outside band)
  auto idx_of = [&](int64_t d, int64_t xmy) -> int64_t {
    if (d < 0 || d >= n_diag) return -1;
    const Diag& dg = diags[d];
    int64_t k = (xmy - dg.lo);
    if (k < 0 || (k & 1) || k / 2 >= dg.n) return -1;
    return dg.off + k / 2;
  };

  // ---- forward ----
  for (int64_t d = 0; d < n_diag; d++) {
    const Diag& dg = diags[d];
    for (int64_t k = 0; k < dg.n; k++) {
      int64_t xmy = dg.lo + 2 * k;
      int64_t x = (d + xmy) / 2, y = (d - xmy) / 2;
      if (x < 0 || x > lx || y < 0 || y > ly) continue;
      int64_t i = dg.off + k;
      if (d == 0) {
        if (ragged_left) {
          fm[i] = kLogZero; fx[i] = 0.0f; fy[i] = 0.0f;
        } else {
          fm[i] = 0.0f; fx[i] = kLogZero; fy[i] = kLogZero;
        }
        continue;
      }
      int64_t i_low = idx_of(d - 1, xmy - 1);   // (x-1, y)
      int64_t i_up = idx_of(d - 1, xmy + 1);    // (x, y-1)
      int64_t i_mid = idx_of(d - 2, xmy);       // (x-1, y-1)
      float lm = i_low >= 0 ? fm[i_low] : kLogZero;
      float lgx = i_low >= 0 ? fx[i_low] : kLogZero;
      float lgy = i_low >= 0 ? fy[i_low] : kLogZero;
      float um = i_up >= 0 ? fm[i_up] : kLogZero;
      float ugx = i_up >= 0 ? fx[i_up] : kLogZero;
      float ugy = i_up >= 0 ? fy[i_up] : kLogZero;
      float mm = i_mid >= 0 ? fm[i_mid] : kLogZero;
      float mgx = i_mid >= 0 ? fx[i_mid] : kLogZero;
      float mgy = i_mid >= 0 ? fy[i_mid] : kLogZero;
      if (x >= 1)
        fx[i] = e_gapx(x) + ladd3(lm + t_ox, lgx + t_ex, lgy + t_sx);
      if (x >= 1 && y >= 1)
        fm[i] = e_match(x, y) + ladd3(mm + t_mm, mgx + t_mgx, mgy + t_mgy);
      if (y >= 1)
        fy[i] = e_gapy(y) + ladd3(um + t_oy, ugy + t_ey, ugx + t_sy);
    }
  }

  // end-state weights (stateMachine.c:531-560)
  float ew[3];
  if (ragged_right) {
    ew[0] = (t_ox + t_oy) / 2.0f; ew[1] = t_ex; ew[2] = t_ey;
  } else {
    ew[0] = t_mm; ew[1] = t_mgx; ew[2] = t_mgy;
  }
  int64_t i_fin = idx_of(lx + ly, lx - ly);
  float total = kLogZero;
  if (i_fin >= 0)
    total = ladd3(fm[i_fin] + ew[0], fx[i_fin] + ew[1], fy[i_fin] + ew[2]);
  *total_out = (double)total;

  // ---- backward + posterior extraction ----
  // two live backward diagonals (d+1, d+2) suffice
  std::vector<float> bm(cells, kLogZero), bx(cells, kLogZero),
      by(cells, kLogZero);
  int64_t n_out = 0;
  for (int64_t d = n_diag - 1; d >= 0; d--) {
    const Diag& dg = diags[d];
    for (int64_t k = dg.n - 1; k >= 0; k--) {
      int64_t xmy = dg.lo + 2 * k;
      int64_t x = (d + xmy) / 2, y = (d - xmy) / 2;
      if (x < 0 || x > lx || y < 0 || y > ly) continue;
      int64_t i = dg.off + k;
      if (d == lx + ly && x == lx && y == ly) {
        bm[i] = ew[0]; bx[i] = ew[1]; by[i] = ew[2];
      } else {
        int64_t i_gx = idx_of(d + 1, xmy + 1);  // (x+1, y)
        int64_t i_gy = idx_of(d + 1, xmy - 1);  // (x, y+1)
        int64_t i_m = idx_of(d + 2, xmy);       // (x+1, y+1)
        float gx_n = (i_gx >= 0 && x + 1 <= lx) ? bx[i_gx] : kLogZero;
        float gy_n = (i_gy >= 0 && y + 1 <= ly) ? by[i_gy] : kLogZero;
        float m_n = (i_m >= 0 && x + 1 <= lx && y + 1 <= ly) ? bm[i_m]
                                                             : kLogZero;
        float egx = e_gapx(x + 1);
        float egy = e_gapy(y + 1);
        float em = e_match(x + 1, y + 1);
        bm[i] = ladd3(gx_n + egx + t_ox, m_n + em + t_mm,
                      gy_n + egy + t_oy);
        bx[i] = ladd3(gx_n + egx + t_ex, m_n + em + t_mgx,
                      gy_n + egy + t_sy);
        by[i] = ladd3(gx_n + egx + t_sx, m_n + em + t_mgy,
                      gy_n + egy + t_ey);
      }
      // posteriors (diagonalCalculationPosteriorProbs)
      if (total != kLogZero) {
        const float fs[3] = {fm[i], fx[i], fy[i]};
        const float bs[3] = {bm[i], bx[i], by[i]};
        const bool ok[3] = {x >= 1 && y >= 1, x >= 1, y >= 1};
        for (int s = 0; s < 3; s++) {
          if (!ok[s]) continue;
          float lp = fs[s] + bs[s] - total;
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
  }
  return n_out;
}

}  // extern "C"
