"""Pallas TPU wavefront kernel for the banded pair-HMM forward-backward.

Parity: getPosteriorProbsWithBanding (pairwiseAligner.c:706-844). The
lax.scan implementation in `ops.banded` pays a fixed per-step cost per
anti-diagonal (~1 ms on a v5e via the dev tunnel — 30+ s for one 32k-diagonal
FB); this module fuses the whole sweep into two Pallas programs (forward,
then backward+posterior) so the per-diagonal cost is a handful of VPU
instructions.

Layout
------
A batch of B banded problems is solved per launch:

  * lanes (last dim, padded to 128) = problem index b
  * sublanes (second-to-last, padded to 8) = band storage offset k (width W)
  * the grid walks blocks of BLOCK_D anti-diagonals sequentially; the DP
    carry (the previous two diagonals, (3, W, B)) lives in VMEM scratch that
    persists across sequential grid steps.

Band storage uses the smoothed (always +-1 step) track from
`BandGeometry.build(smooth=True)`: every inter-diagonal dependency is then a
sublane shift in {-1, 0, +1}, selected per problem from three statically
shifted copies — no gathers anywhere in the hot loop.

Emissions (symbol-table lookups, including the RLE repeat-count overlay of
stateMachine.c:733-738) are precomputed outside the kernel by XLA as
(D, W, B) arrays: they are data-parallel gathers with no sequential
dependency, exactly what XLA is good at. The kernel body is pure
shift/select/log-add arithmetic, numerically identical to the scan path
(same operation order), for both the exact `logaddexp` and the reference's
piecewise-cubic LUT logAdd (pairwiseAligner.c:279-299 — implemented with
coefficient selects instead of a table gather).

Forward and reverse strands mix freely within one batch: the transition
vector, emission tables and repeat tables are gathered per problem during
prep, so the kernel itself is strand-agnostic.
"""

from __future__ import annotations

import functools
import os

from margin_tpu.utils.lazyjax import jax, jnp, lazy_jit
import numpy as np

from margin_tpu.ops import logmath
from margin_tpu.ops.pairhmm import (GAPX, GAPY, LOG_ZERO, MATCH,
                                    T_EXT_X, T_EXT_Y, T_MM, T_M_FROM_GX,
                                    T_M_FROM_GY, T_OPEN_X, T_OPEN_Y, T_SW_X,
                                    T_SW_Y)

try:  # pallas import kept optional so stripped environments still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# meta rows (per diagonal, per problem)
M_S1, M_S2, M_KLO, M_WIDTH, M_XBASE, M_YBASE, M_T1, M_T2 = range(8)
N_META = 8

_LANES = 128


def _interpret_mode() -> bool:
    return os.environ.get("MARGIN_TPU_PALLAS", "") == "interpret"


def use_pallas() -> bool:
    """Policy: pallas FB on accelerators; interpret-mode opt-in for tests."""
    if not _HAVE_PALLAS:
        return False
    mode = os.environ.get("MARGIN_TPU_PALLAS", "")
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _lut_log_add(x, y):
    """Reference LUT logAdd (pairwiseAligner.c:279-299) with the cubic
    coefficients chosen by selects (gather-free; same arithmetic as
    logmath.log_add_lut)."""
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = hi - lo
    d_safe = jnp.clip(d, 0.0, logmath._LOG_UNDERFLOW_THRESHOLD)
    C = logmath._CUBIC
    B_ = logmath._BREAKS

    def coef(col):
        c = jnp.where(
            d_safe <= B_[0], C[0][col],
            jnp.where(d_safe <= B_[1], C[1][col],
                      jnp.where(d_safe <= B_[2], C[2][col], C[3][col])))
        return c.astype(x.dtype)

    approx = (((coef(0) * d_safe + coef(1)) * d_safe + coef(2)) * d_safe
              + coef(3) + lo)
    return jnp.where(d >= logmath._LOG_UNDERFLOW_THRESHOLD, hi, approx)


def _log_add3(a, b, c, log_add):
    return log_add(log_add(a, b), c)


def _shift_k(arr, sel, neg):
    """arr: (..., W, B); returns arr indexed at k+sel along the W axis where
    sel is a per-problem (1, B)-broadcastable selector in {-1, 0, +1}."""
    pad = jnp.full(arr.shape[:-2] + (1, arr.shape[-1]), neg, arr.dtype)
    up = jnp.concatenate([arr[..., 1:, :], pad], axis=-2)    # k+1
    dn = jnp.concatenate([pad, arr[..., :-1, :]], axis=-2)   # k-1
    return jnp.where(sel == 0, arr, jnp.where(sel > 0, up, dn))


def _block_d(w_pad: int, b_pad: int) -> int:
    """Largest diagonal block size keeping the working set well under VMEM:
    ~14 (BLOCK_D, W, B) f32 buffers live at once (3 emission inputs +
    4-deep fwd/post blocks, double-buffered, plus carries). VMEM tiles pad
    the lane dim to 128, so size by the physical lane count."""
    b_phys = max(b_pad, _LANES)
    for bd in (64, 32, 16, 8):
        if 14 * bd * w_pad * b_phys * 4 <= 10 * 1024 * 1024:
            return bd
    return 8


def _emit_in_kernel() -> bool:
    """Emission construction site: "window" (default) computes the
    emission values inside the Pallas kernels from packed symbol windows
    (prep = 2-3 gathers, no (D, W, B) f32 grid materialization);
    MARGIN_TPU_PALLAS_EMIT=grids restores the XLA-precomputed grids."""
    return os.environ.get("MARGIN_TPU_PALLAS_EMIT", "window") != "grids"


def _kernel_emissions(px, py, tabs_ref, rep, xs_, ys_, use_rle):
    """e_m/e_gx/e_gy for one diagonal from packed symbol windows.

    px/py: (W2, B) int32 packed windows (symbol bits 0-2, repeat 3+);
    tabs_ref: (35, B) per-problem tables (match 25 rows, gapX 5, gapY 5);
    rep: (W, B) repeat-matrix values already summed into e_m when not None.
    The select-sum arithmetic is identical to `_emission_grids.sel_sum`
    (exactly one term is nonzero per cell, so float equality holds)."""
    sx = px[xs_, :]
    sy = py[ys_, :]
    if use_rle:
        sx = sx & 7
        sy = sy & 7
    code = sx * 5 + sy
    zero = jnp.zeros(sx.shape, tabs_ref.dtype)
    e_m = zero
    for s in range(25):
        e_m = e_m + jnp.where(code == s, tabs_ref[s, :][None, :], 0)
    if rep is not None:
        e_m = e_m + rep
    e_gx = zero
    e_gy = zero
    for s in range(5):
        e_gx = e_gx + jnp.where(sx == s, tabs_ref[25 + s, :][None, :], 0)
        e_gy = e_gy + jnp.where(sy == s, tabs_ref[30 + s, :][None, :], 0)
    return e_m, e_gx, e_gy


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _fwd_kernel(use_lut: bool, emit_window: bool, use_rle: bool, *refs):
    """One grid step: BLOCK_D diagonals of the banded forward recurrence."""
    if emit_window:
        if use_rle:
            (meta_ref, px_ref, py_ref, rep_ref, tabs_ref,
             lxy_ref, trans_ref, init_ref,
             out_ref, prev1_ref, prev2_ref) = refs
        else:
            (meta_ref, px_ref, py_ref, tabs_ref,
             lxy_ref, trans_ref, init_ref,
             out_ref, prev1_ref, prev2_ref) = refs
            rep_ref = None
        bd, _, W, B = out_ref.shape
        dtype = tabs_ref.dtype
    else:
        (meta_ref, e_m_ref, e_gx_ref, e_gy_ref,
         lxy_ref, trans_ref, init_ref,
         out_ref, prev1_ref, prev2_ref) = refs
        bd, W, B = e_m_ref.shape
        dtype = e_m_ref.dtype
    log_add = _lut_log_add if use_lut else jnp.logaddexp
    neg = jnp.asarray(LOG_ZERO, dtype)
    i = pl.program_id(0)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    lx = lxy_ref[0, :][None, :]
    ly = lxy_ref[1, :][None, :]
    trc = {t: trans_ref[t, :][None, :] for t in range(9)}

    def row(j, r):
        return meta_ref[j, r, :][None, :]

    def body(j, _):
        g = i * bd + j  # global diagonal index
        prev1 = prev1_ref[...]
        prev2 = prev2_ref[...]
        low = _shift_k(prev1, row(j, M_S1), neg)       # (x-1, y)
        up = _shift_k(prev1, row(j, M_S1) + 1, neg)    # (x, y-1)
        mid = _shift_k(prev2, row(j, M_S2), neg)       # (x-1, y-1)
        if emit_window:
            # fwd diagonal pairs: cx = px[1:W+1], cy = py[1:W+1]
            e_m, e_gx, e_gy = _kernel_emissions(
                px_ref[j], py_ref[j], tabs_ref,
                None if rep_ref is None else rep_ref[j],
                slice(1, W + 1), slice(1, W + 1), use_rle)
        else:
            e_m = e_m_ref[j]
            e_gx = e_gx_ref[j]
            e_gy = e_gy_ref[j]
        new_gx = e_gx + _log_add3(low[MATCH] + trc[T_OPEN_X],
                                  low[GAPX] + trc[T_EXT_X],
                                  low[GAPY] + trc[T_SW_X], log_add)
        new_m = e_m + _log_add3(mid[MATCH] + trc[T_MM],
                                mid[GAPX] + trc[T_M_FROM_GX],
                                mid[GAPY] + trc[T_M_FROM_GY], log_add)
        new_gy = e_gy + _log_add3(up[MATCH] + trc[T_OPEN_Y],
                                  up[GAPY] + trc[T_EXT_Y],
                                  up[GAPX] + trc[T_SW_Y], log_add)
        cur = jnp.stack([new_m, new_gx, new_gy])  # (3, W, B)
        x_pos = row(j, M_XBASE) + 1 + k_iota
        y_pos = row(j, M_YBASE) + 1 - k_iota
        vm = ((k_iota >= row(j, M_KLO)) & (k_iota < row(j, M_WIDTH))
              & (x_pos >= 0) & (x_pos <= lx)
              & (y_pos >= 0) & (y_pos <= ly) & (g <= lx + ly))
        cur = jnp.where(vm[None], cur, neg)
        cur = jnp.maximum(cur, neg)
        # diagonal 0 carries the start-state weights at k = 0
        # (stateMachine.c:521-530; |xmy| <= d pins the smoothed storage
        # base to 0 at diagonal 0, so k_lo[0] == 0 always)
        diag0 = jnp.where(k_iota[None] == 0, init_ref[...][:, None, :], neg)
        cur = jnp.where(g == 0, diag0, cur)
        out_ref[j] = cur
        prev2_ref[...] = jnp.where(g == 0, jnp.full_like(prev1, neg), prev1)
        prev1_ref[...] = cur
        return 0

    jax.lax.fori_loop(0, bd, body, 0)


def _bwd_kernel(use_lut: bool, emit_window: bool, use_rle: bool, *refs):
    """One reversed grid step: BLOCK_D diagonals of backward + posterior."""
    if emit_window:
        if use_rle:
            (meta_ref, px_ref, py_ref, rep_ref, tabs_ref,
             lxy_ref, trans_ref, end_ref, total_ref, fwd_ref,
             post_ref, next1_ref, next2_ref) = refs
        else:
            (meta_ref, px_ref, py_ref, tabs_ref,
             lxy_ref, trans_ref, end_ref, total_ref, fwd_ref,
             post_ref, next1_ref, next2_ref) = refs
            rep_ref = None
        bd, _, W, B = post_ref.shape
        dtype = tabs_ref.dtype
    else:
        (meta_ref, e_m_ref, e_gx_ref, e_gy_ref,
         lxy_ref, trans_ref, end_ref, total_ref, fwd_ref,
         post_ref, next1_ref, next2_ref) = refs
        bd, W, B = e_m_ref.shape
        dtype = e_m_ref.dtype
    log_add = _lut_log_add if use_lut else jnp.logaddexp
    neg = jnp.asarray(LOG_ZERO, dtype)
    i = pl.program_id(0)
    nblk = pl.num_programs(0)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    lx = lxy_ref[0, :][None, :]
    ly = lxy_ref[1, :][None, :]
    d_final = lx + ly
    k_final = lxy_ref[2, :][None, :]
    trc = {t: trans_ref[t, :][None, :] for t in range(9)}
    total = total_ref[0, :][None, None, :]

    def row(j, r):
        return meta_ref[j, r, :][None, :]

    @pl.when(i == 0)
    def _():
        next1_ref[...] = jnp.full((3, W, B), neg, dtype)
        next2_ref[...] = jnp.full((3, W, B), neg, dtype)

    def body(jj, _):
        j = bd - 1 - jj
        g = (nblk - 1 - i) * bd + j
        next1 = next1_ref[...]
        next2 = next2_ref[...]
        t1 = row(j, M_T1)
        t2 = row(j, M_T2)
        gx_n = _shift_k(next1, t1, neg)[GAPX]      # (x+1, y)
        gy_n = _shift_k(next1, t1 - 1, neg)[GAPY]  # (x, y+1)
        m_n = _shift_k(next2, t2, neg)[MATCH]      # (x+1, y+1)
        if emit_window:
            # bwd diagonal pairs: cx = px[2:W+2], cy = py[0:W]
            e_m, e_gx, e_gy = _kernel_emissions(
                px_ref[j], py_ref[j], tabs_ref,
                None if rep_ref is None else rep_ref[j],
                slice(2, W + 2), slice(0, W), use_rle)
        else:
            e_m = e_m_ref[j]
            e_gx = e_gx_ref[j]
            e_gy = e_gy_ref[j]
        b_m = _log_add3(gx_n + e_gx + trc[T_OPEN_X],
                        m_n + e_m + trc[T_MM],
                        gy_n + e_gy + trc[T_OPEN_Y], log_add)
        b_gx = _log_add3(gx_n + e_gx + trc[T_EXT_X],
                         m_n + e_m + trc[T_M_FROM_GX],
                         gy_n + e_gy + trc[T_SW_Y], log_add)
        b_gy = _log_add3(gx_n + e_gx + trc[T_SW_X],
                         m_n + e_m + trc[T_M_FROM_GY],
                         gy_n + e_gy + trc[T_EXT_Y], log_add)
        x_pos = row(j, M_XBASE) + 1 + k_iota
        y_pos = row(j, M_YBASE) + 1 - k_iota
        vm = ((k_iota >= row(j, M_KLO)) & (k_iota < row(j, M_WIDTH))
              & (x_pos >= 0) & (x_pos <= lx)
              & (y_pos >= 0) & (y_pos <= ly) & (g <= d_final))
        computed = jnp.maximum(
            jnp.where(vm[None], jnp.stack([b_m, b_gx, b_gy]), neg), neg)
        # the per-problem final diagonal carries the end-state weights at
        # k_final (pairwiseAligner.c:882-892)
        bwd_final = jnp.where(k_iota[None] == k_final[None],
                              end_ref[...][:, None, :], neg)
        cur = jnp.where(g == d_final[None], bwd_final, computed)
        f_d = fwd_ref[j]
        post = jnp.exp(jnp.minimum(f_d + cur - total, 0.0))
        post_ref[j] = jnp.where(vm[None], post, 0.0)
        next2_ref[...] = next1
        next1_ref[...] = cur
        return 0

    jax.lax.fori_loop(0, bd, body, 0)


# --------------------------------------------------------------------------
# host/XLA prep + driver
# --------------------------------------------------------------------------

@lazy_jit(static_argnames=("d_pad", "w_pad", "use_lut",
                                             "block_d", "interpret",
                                             "emit_window", "use_rle"))
def _fb_pallas(e_fwd, e_bwd, meta, lxy, trans, init_cell, end_w,
               d_pad: int, w_pad: int, use_lut: bool, block_d: int,
               interpret: bool, emit_window: bool = False,
               use_rle: bool = False):
    """Run forward then backward+posterior. Returns (post (D, 3, W, B),
    totals (B,)).

    Grid mode (emit_window=False): e_fwd/e_bwd are (e_m, e_gx, e_gy)
    (D, W, B) emission grids. Window mode: e_fwd = (px, py, tabs[, rep_f]),
    e_bwd = ([rep_b]) — packed (D, W+2, B) symbol windows plus the (35, B)
    per-problem tables; the kernels build emissions in-VMEM."""
    if emit_window:
        px, py, tabs = e_fwd[:3]
        rep_f = e_fwd[3] if use_rle else None
        rep_b = e_bwd[0] if use_rle else None
        D, W2, B = px.shape
        W = W2 - 2
        dtype = tabs.dtype
    else:
        D, W, B = e_fwd[0].shape
        W2 = W + 2
        dtype = e_fwd[0].dtype
    nblk = D // block_d

    dspec = pl.BlockSpec((block_d, W, B), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((block_d, W2, B), lambda i: (i, 0, 0))
    mspec = pl.BlockSpec((block_d, N_META, B), lambda i: (i, 0, 0))
    full2 = lambda rows: pl.BlockSpec((rows, B), lambda i: (0, 0))
    outspec = pl.BlockSpec((block_d, 3, W, B), lambda i: (i, 0, 0, 0))

    if emit_window:
        fwd_in = [meta, px, py] + ([rep_f] if use_rle else []) + [tabs]
        fwd_specs = ([mspec, wspec, wspec]
                     + ([dspec] if use_rle else []) + [full2(35)])
    else:
        fwd_in = [meta, e_fwd[0], e_fwd[1], e_fwd[2]]
        fwd_specs = [mspec, dspec, dspec, dspec]

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, use_lut, emit_window, use_rle),
        grid=(nblk,),
        in_specs=fwd_specs + [full2(4), full2(9), full2(3)],
        out_specs=outspec,
        out_shape=jax.ShapeDtypeStruct((D, 3, W, B), dtype),
        scratch_shapes=[pltpu.VMEM((3, W, B), dtype),
                        pltpu.VMEM((3, W, B), dtype)],
        interpret=interpret,
    )(*fwd_in, lxy, trans, init_cell)

    # total log prob at the per-problem final corner (lx, ly): gather fwd
    # at (d_final, state, k_final, b) with advanced indexing — vmapping
    # over the lane axis here made XLA materialize a (B, D, 3, W)
    # transposed copy of fwd (25 GB at D=98304/W=16 from tail-dim padding)
    la = _lut_log_add if use_lut else jnp.logaddexp
    b_idx = jnp.arange(B)
    d_fin = lxy[0] + lxy[1]
    f3 = fwd[d_fin[:, None], jnp.arange(3)[None, :],
             lxy[2][:, None], b_idx[:, None]]        # (B, 3)
    t = f3 + end_w.T
    totals = la(la(t[:, 0], t[:, 1]), t[:, 2])

    rspec_d = pl.BlockSpec((block_d, W, B), lambda i: (nblk - 1 - i, 0, 0))
    rspec_w = pl.BlockSpec((block_d, W2, B), lambda i: (nblk - 1 - i, 0, 0))
    rspec_m = pl.BlockSpec((block_d, N_META, B),
                           lambda i: (nblk - 1 - i, 0, 0))
    rspec_o = pl.BlockSpec((block_d, 3, W, B),
                           lambda i: (nblk - 1 - i, 0, 0, 0))
    if emit_window:
        bwd_in = [meta, px, py] + ([rep_b] if use_rle else []) + [tabs]
        bwd_specs = ([rspec_m, rspec_w, rspec_w]
                     + ([rspec_d] if use_rle else []) + [full2(35)])
    else:
        bwd_in = [meta, e_bwd[0], e_bwd[1], e_bwd[2]]
        bwd_specs = [rspec_m, rspec_d, rspec_d, rspec_d]
    post = pl.pallas_call(
        functools.partial(_bwd_kernel, use_lut, emit_window, use_rle),
        grid=(nblk,),
        in_specs=bwd_specs + [full2(4), full2(9),
                              full2(3), full2(1), rspec_o],
        out_specs=rspec_o,
        out_shape=jax.ShapeDtypeStruct((D, 3, W, B), dtype),
        scratch_shapes=[pltpu.VMEM((3, W, B), dtype),
                        pltpu.VMEM((3, W, B), dtype)],
        interpret=interpret,
    )(*bwd_in, lxy, trans, end_w, totals[None, :], fwd)
    return post, totals


@lazy_jit(static_argnames=("w_pad", "use_rle"))
def _emission_grids(m_tab, gx_tab, gy_tab, rep_tab, xs, ys, x_base, y_base,
                    lxs, lys, rep_x, rep_y, w_pad: int, use_rle: bool):
    """(D, W, B) emission stacks for the forward (offset 0,0) and backward
    (offset +1,+1) sweeps. xs/ys: (B, Lp) padded symbols; x_base/y_base:
    (B, D). Matches `_emissions_all` in ops.banded per problem.

    These grids are gather-bound (~0.9 s per 100M-element gather on v5e
    through this lowering), so the construction minimises gather count:
    one WIDE (W+1) window per sequence serves both sweep offsets (the
    backward window is the forward one shifted by one), and the 5/25-entry
    symbol tables are applied with select-sums on the windowed symbols
    instead of per-cell table gathers. Only the symbol/repeat windows (2,
    +2 for RLE) and the 2601-entry repeat-matrix rows (2, RLE only) remain
    as real gathers."""
    B, Lp = xs.shape
    D = x_base.shape[1]
    W = w_pad
    W2 = W + 2
    xs = xs.astype(jnp.int32)
    ys = ys.astype(jnp.int32)
    if use_rle:
        rep_x = rep_x.astype(jnp.int32)
        rep_y = rep_y.astype(jnp.int32)
    # everything is built DIRECTLY in the kernel's (D, W, B) orientation:
    # B=128 rides the lane dim end to end, so no layout-changing
    # transposes exist (XLA's (D,W,B) transpose of a W=16 grid padded the
    # sublane dim 8x and OOM'd HBM at D=98304)
    k = jnp.arange(W2)[None, :, None]
    lx = lxs[None, None, :]
    ly = lys[None, None, :]
    boff = (jnp.arange(B, dtype=jnp.int32) * Lp)[None, None, :]
    xb_t = jnp.transpose(x_base, (1, 0))[:, None, :]   # (D, 1, B)
    yb_t = jnp.transpose(y_base, (1, 0))[:, None, :]

    # packed per-position values: symbol in bits 0-2, repeat count in
    # bits 3+, so ONE gather serves both the symbol and repeat windows
    if use_rle:
        px_tab = xs + 8 * rep_x
        py_tab = ys + 8 * rep_y
    else:
        px_tab, py_tab = xs, ys

    def wide_window(tab, idx, in_range):
        g = jnp.take(tab.reshape(-1),
                     (jnp.clip(idx, 0, Lp - 1) + boff).reshape(-1),
                     mode="clip").reshape(D, W2, B)
        return jnp.where(in_range, g, 4)  # fill: symbol 4, repeat 0

    # W+2-wide paired tracks: px[j] at ix = x_base-1+j, py[j] at
    # iy = y_base+1-j (px[j]/py[j] pair on one anti-diagonal); every
    # fwd/bwd grid is a unit-shifted slice of these
    px_idx = (xb_t - 1) + k
    py_idx = (yb_t + 1) - k
    px = wide_window(px_tab, px_idx, (px_idx >= 0) & (px_idx < lx))
    py = wide_window(py_tab, py_idx, (py_idx >= 0) & (py_idx < ly))
    sx = px & 7 if use_rle else px
    sy = py & 7 if use_rle else py

    def sel_sum(tab, sym, n):
        # tab: (B, n) per-problem values; sym: (D, *, B) windowed symbols
        out = jnp.zeros(sym.shape, tab.dtype)
        for s in range(n):
            out = out + jnp.where(sym == s, tab[None, None, :, s], 0)
        return out

    gxw = sel_sum(gx_tab, sx, 5)
    gyw = sel_sum(gy_tab, sy, 5)
    if use_rle:
        # same-diagonal wide repeat grid; the bwd grid is this one two
        # diagonals down with a per-(problem, diagonal) shift -- no
        # second 2601-entry gather
        n = 51
        base = jnp.where(sx >= 4, 0, sx)
        ridx = base * (n * n) + (px >> 3) * n + (py >> 3)
        rboff = (jnp.arange(B, dtype=jnp.int32)
                 * rep_tab.shape[1])[None, None, :]
        rfw = jnp.take(rep_tab.reshape(-1), (ridx + rboff).reshape(-1),
                       mode="clip").reshape(D, W2, B)
        s2 = jnp.concatenate(
            [x_base[:, 2:] - x_base[:, :-2],
             jnp.zeros((B, 2), x_base.dtype)], axis=1)
        s2 = jnp.transpose(s2, (1, 0))[:, None, :]     # (D, 1, B)
        r2 = jnp.concatenate(
            [rfw[2:], jnp.zeros((2, W2, B), rfw.dtype)], axis=0)
        rep_fwd = rfw[:, 1:W + 1, :]
        # bwd j index = k + 2 - s2 (s2 in {0,1,2}); out-of-range rows are
        # harmless (paired with NEG neighbor values in the kernel)
        rep_bwd = jnp.where(
            s2 == 0, r2[:, 2:W + 2, :],
            jnp.where(s2 == 1, r2[:, 1:W + 1, :], r2[:, 0:W, :]))

    def grids(xo):
        # fwd (xo=0): cx = px[1:W+1], cy = py[1:W+1]
        # bwd (xo=1): cx = px[2:W+2], cy = py[0:W]
        xs_ = slice(1, W + 1) if xo == 0 else slice(2, W + 2)
        ys_ = slice(1, W + 1) if xo == 0 else slice(0, W)
        e_m = sel_sum(m_tab, sx[:, xs_, :] * 5 + sy[:, ys_, :], 25)
        if use_rle:
            e_m = e_m + (rep_fwd if xo == 0 else rep_bwd)
        return e_m, gxw[:, xs_, :], gyw[:, ys_, :]

    return grids(0), grids(1)


@lazy_jit()
def _derive_geom(xmy, widths, klo):
    """Per-diagonal kernel metadata derived ON DEVICE from the compact
    band track. Every meta row is a function of xmy (the smoothed storage
    base, BandGeometry.xmy_l), so the host ships 3 compact arrays instead
    of packing + transferring the full (D, 8, B) meta grid — host->device
    bytes are the pack-launch bottleneck on a tunneled chip.

    xmy: (B, D) int32; widths/klo: (B, D) int16.
    Returns (meta (D, N_META, B) int32, x_base (B, D), y_base (B, D))."""
    B, D = xmy.shape
    d_idx = jnp.arange(D, dtype=jnp.int32)[None, :]
    xb = (d_idx + xmy) // 2 - 1
    yb = (d_idx - xmy) // 2 - 1
    zero = jnp.zeros((B, 1), jnp.int32)
    prev1 = jnp.concatenate([zero, xmy[:, :-1]], axis=1)
    prev2 = jnp.concatenate([zero, zero, xmy[:, :-2]], axis=1)
    next1 = jnp.concatenate([xmy[:, 1:], zero], axis=1)
    next2 = jnp.concatenate([xmy[:, 2:], zero, zero], axis=1)
    s1 = jnp.where(d_idx >= 1, (xmy - 1 - prev1) // 2, 0)
    s2 = jnp.where(d_idx >= 2, (xmy - prev2) // 2, 0)
    t1 = jnp.where(d_idx < D - 1, (xmy + 1 - next1) // 2, 0)
    t2 = jnp.where(d_idx < D - 2, (xmy - next2) // 2, 0)
    rows = [None] * N_META
    rows[M_S1], rows[M_S2] = s1, s2
    rows[M_KLO] = klo.astype(jnp.int32)
    rows[M_WIDTH] = widths.astype(jnp.int32)
    rows[M_XBASE], rows[M_YBASE] = xb, yb
    rows[M_T1], rows[M_T2] = t1, t2
    meta = jnp.stack(rows, axis=1)            # (B, N_META, D)
    return jnp.transpose(meta, (2, 1, 0)), xb, yb


@lazy_jit(static_argnames=("w_pad", "use_rle"))
def _window_grids(rep_tab, xs, ys, x_base, y_base, lxs, lys, rep_x, rep_y,
                  w_pad: int, use_rle: bool):
    """Window-mode prep: the packed (D, W+2, B) symbol windows plus (RLE)
    the (D, W, B) repeat-matrix grids — the irreducible gathers of
    `_emission_grids`, with every select-sum left to the Pallas kernels
    (`_kernel_emissions`). Same windowing/fill semantics as
    `_emission_grids`, so kernel-built emissions are float-identical.
    xs/ys/rep_x/rep_y may arrive int8 (minimal transfer width)."""
    B, Lp = xs.shape
    D = x_base.shape[1]
    W = w_pad
    W2 = W + 2
    xs = xs.astype(jnp.int32)
    ys = ys.astype(jnp.int32)
    k = jnp.arange(W2)[None, :, None]
    lx = lxs[None, None, :]
    ly = lys[None, None, :]
    boff = (jnp.arange(B, dtype=jnp.int32) * Lp)[None, None, :]
    xb_t = jnp.transpose(x_base, (1, 0))[:, None, :]   # (D, 1, B)
    yb_t = jnp.transpose(y_base, (1, 0))[:, None, :]

    if use_rle:
        px_tab = xs + 8 * rep_x.astype(jnp.int32)
        py_tab = ys + 8 * rep_y.astype(jnp.int32)
    else:
        px_tab, py_tab = xs, ys

    def wide_window(tab, idx, in_range):
        g = jnp.take(tab.reshape(-1),
                     (jnp.clip(idx, 0, Lp - 1) + boff).reshape(-1),
                     mode="clip").reshape(D, W2, B)
        return jnp.where(in_range, g, 4)  # fill: symbol 4, repeat 0

    px_idx = (xb_t - 1) + k
    py_idx = (yb_t + 1) - k
    px = wide_window(px_tab, px_idx, (px_idx >= 0) & (px_idx < lx))
    py = wide_window(py_tab, py_idx, (py_idx >= 0) & (py_idx < ly))
    if not use_rle:
        return px, py, None, None

    sx = px & 7
    n = 51
    base = jnp.where(sx >= 4, 0, sx)
    ridx = base * (n * n) + (px >> 3) * n + (py >> 3)
    rboff = (jnp.arange(B, dtype=jnp.int32)
             * rep_tab.shape[1])[None, None, :]
    rfw = jnp.take(rep_tab.reshape(-1), (ridx + rboff).reshape(-1),
                   mode="clip").reshape(D, W2, B)
    s2 = jnp.concatenate(
        [x_base[:, 2:] - x_base[:, :-2],
         jnp.zeros((B, 2), x_base.dtype)], axis=1)
    s2 = jnp.transpose(s2, (1, 0))[:, None, :]         # (D, 1, B)
    r2 = jnp.concatenate(
        [rfw[2:], jnp.zeros((2, W2, B), rfw.dtype)], axis=0)
    rep_fwd = rfw[:, 1:W + 1, :]
    rep_bwd = jnp.where(
        s2 == 0, r2[:, 2:W + 2, :],
        jnp.where(s2 == 1, r2[:, 1:W + 1, :], r2[:, 0:W, :]))
    return px, py, rep_fwd, rep_bwd


class _HostPack:
    """Host-side arrays for one pack launch (shared by the monolithic and
    segmented drivers)."""
    __slots__ = ("b_pad", "d_use", "xs", "ys", "lxs", "lys", "xmy_b",
                 "widths_b", "klo_b", "rx", "ry", "geoms", "m_tab", "gx_tab",
                 "gy_tab", "tr_np", "rep_tab", "init_cell", "end_w", "lxy",
                 "dtype", "t_start")


def _pack_host(tables, items, d_use: int, w_pad: int, expansion: int,
               dynamic: bool, use_rle: bool, geoms_in=None) -> _HostPack:
    """Compact host-side pack: symbols/repeats in int8, band widths/k_lo
    in int16, one int32 xmy track — every per-diagonal kernel meta row is
    derived from xmy on device (`_derive_geom`), so host packing is a few
    contiguous row writes and the transfer is ~4x smaller than shipping
    the (D, N_META, B) grid. geoms_in (optional): per-item UNPADDED
    BandGeometry from the caller's classify pass — repadded here instead
    of re-walking the anchors."""
    from margin_tpu.ops import banded as _banded
    import time as _time0

    p = _HostPack()
    p.t_start = _time0.perf_counter()
    B_real = len(items)
    # lane quantum 64: a half-full group (the common realign shape, ~40-50
    # reads per pass) then pays half the emission-gather and extraction
    # element count; Mosaic pads the physical lane dim internally, so the
    # kernel cost is unchanged (and sub-64 quanta buy NOTHING in HBM —
    # tiling pads lanes back to 128 physically)
    b_pad = p.b_pad = max(64, int(np.ceil(B_real / 64)) * 64)
    p.d_use = d_use
    xs = p.xs = np.full((b_pad, d_use), 4, dtype=np.int8)
    ys = p.ys = np.full((b_pad, d_use), 4, dtype=np.int8)
    lxs = p.lxs = np.zeros(b_pad, dtype=np.int32)
    lys = p.lys = np.zeros(b_pad, dtype=np.int32)
    xmy_b = p.xmy_b = np.zeros((b_pad, d_use), dtype=np.int32)
    widths_b = p.widths_b = np.zeros((b_pad, d_use), dtype=np.int16)
    klo_b = p.klo_b = np.zeros((b_pad, d_use), dtype=np.int16)
    strands = np.zeros(b_pad, dtype=np.int32)
    rx = p.rx = np.zeros((b_pad, d_use), dtype=np.int8) if use_rle else None
    ry = p.ry = np.zeros((b_pad, d_use), dtype=np.int8) if use_rle else None
    k_final = np.zeros(b_pad, dtype=np.int32)
    geoms = p.geoms = []
    pad_idx = list(range(B_real)) + [B_real - 1] * (b_pad - B_real)
    for col, idx in enumerate(pad_idx):
        it = items[idx]
        lx, ly = len(it["x_sym"]), len(it["y_sym"])
        if col < B_real:
            if geoms_in is not None and geoms_in[idx] is not None:
                geom = geoms_in[idx].repad(d_use, w_pad)
            else:
                geom = _banded.BandGeometry.build(it["anchors"], lx, ly,
                                                  expansion, d_use, w_pad,
                                                  dynamic=dynamic,
                                                  smooth=True)
            geoms.append(geom)
        else:
            geom = geoms[B_real - 1]  # pad lanes replicate the last item
        xs[col, :lx] = it["x_sym"]
        ys[col, :ly] = it["y_sym"]
        lxs[col], lys[col] = lx, ly
        strands[col] = int(it["strand"])
        xmy_b[col] = geom.xmy_l
        widths_b[col] = geom.widths
        if geom.k_lo is not None:
            klo_b[col] = geom.k_lo
        k_final[col] = (lx - ly - int(geom.xmy_l[lx + ly])) // 2
        if use_rle:
            rx[col, :lx] = np.minimum(it["rep_x"], 50)
            ry[col, :ly] = np.minimum(it["rep_y"], 50)

    # per-problem tables gathered by strand host-side (tiny; avoids extra
    # device gather programs), one batch mixing both strands
    p.m_tab = jnp.asarray(np.asarray(tables.match)[strands])     # (B, 25)
    p.gx_tab = jnp.asarray(np.asarray(tables.gap_x)[strands])
    p.gy_tab = jnp.asarray(np.asarray(tables.gap_y)[strands])
    tr_np = p.tr_np = np.asarray(tables.trans)[strands]  # (B, 9) host-side
    p.rep_tab = (jnp.asarray(np.asarray(tables.repeat)[strands])
                 if (use_rle and tables.repeat is not None) else None)

    p.dtype = tables.match.dtype
    neg = float(LOG_ZERO)
    init_cell = p.init_cell = np.tile(np.array([[0.0], [neg], [neg]]),
                                      (1, b_pad))
    end_w = p.end_w = np.stack([tr_np[:, T_MM], tr_np[:, T_M_FROM_GX],
                                tr_np[:, T_M_FROM_GY]], axis=0)  # (3, B)
    for col, idx in enumerate(pad_idx):
        it = items[idx]
        if it.get("ragged_left"):
            init_cell[:, col] = (neg, 0.0, 0.0)
        if it.get("ragged_right"):
            t = tr_np[col]
            end_w[:, col] = ((t[T_OPEN_X] + t[T_OPEN_Y]) / 2.0,
                             t[T_EXT_X], t[T_EXT_Y])
    p.lxy = np.stack([lxs, lys, k_final, np.zeros_like(lxs)], axis=0)
    return p


def fb_posteriors_group(tables, items, d_pad: int, w_pad: int,
                        expansion: int, use_lut: bool, dynamic: bool,
                        use_rle: bool, geoms_in=None):
    """Solve a group of same-bucket banded problems with the Pallas FB.

    items: list of dicts (x_sym, y_sym, anchors, strand, optional
    rep_x/rep_y); all are padded to (d_pad, w_pad). geoms_in (optional):
    per-item UNPADDED BandGeometry from the caller's classify pass —
    repadded here instead of re-walking the anchors (half the geometry
    cost of a pack launch). Returns (post (D, 3, W, B) device array,
    totals (b_pad,) device array, geoms, xb, yb). Optional per-item
    "ragged_left"/"ragged_right" flags select the ragged start/end state
    weights (stateMachine.c:521-560).
    """
    B_real = len(items)
    b_guess = max(64, int(np.ceil(B_real / 64)) * 64)
    block_d = _block_d(w_pad, b_guess)
    d_use = int(np.ceil(d_pad / block_d)) * block_d
    p = _pack_host(tables, items, d_use, w_pad, expansion, dynamic,
                   use_rle, geoms_in)
    t_start = p.t_start
    b_pad = p.b_pad
    xs, ys, lxs, lys = p.xs, p.ys, p.lxs, p.lys
    xmy_b, widths_b, klo_b = p.xmy_b, p.widths_b, p.klo_b
    rx, ry, geoms = p.rx, p.ry, p.geoms
    m_tab, gx_tab, gy_tab = p.m_tab, p.gx_tab, p.gy_tab
    tr_np, rep_tab = p.tr_np, p.rep_tab
    init_cell, end_w, lxy, dtype = p.init_cell, p.end_w, p.lxy, p.dtype

    import time as _time
    dbg = os.environ.get("MARGIN_TPU_PALLAS_DEBUG") in ("1", "2")
    dbg2 = os.environ.get("MARGIN_TPU_PALLAS_DEBUG") == "2"
    emit_window = _emit_in_kernel()
    t0 = _time.perf_counter()
    xfer = [jnp.asarray(xmy_b), jnp.asarray(widths_b), jnp.asarray(klo_b),
            jnp.asarray(xs), jnp.asarray(ys)]
    if rx is not None:
        xfer += [jnp.asarray(rx), jnp.asarray(ry)]
    tx = _time.perf_counter()
    meta_dev, xb_dev, yb_dev = _derive_geom(*xfer[:3])
    td = _time.perf_counter()
    prep_args = (
        xfer[3], xfer[4], xb_dev, yb_dev,
        jnp.asarray(lxs), jnp.asarray(lys),
        xfer[5] if rx is not None else None,
        xfer[6] if rx is not None else None)
    if emit_window:
        px, py, rep_f, rep_b = _window_grids(
            rep_tab, *prep_args, w_pad=w_pad, use_rle=use_rle)
        tabs = jnp.concatenate([m_tab.T, gx_tab.T, gy_tab.T]).astype(dtype)
        e_fwd = (px, py, tabs) + ((rep_f,) if use_rle else ())
        e_bwd = (rep_b,) if use_rle else ()
    else:
        e_fwd, e_bwd = _emission_grids(
            m_tab, gx_tab, gy_tab, rep_tab, *prep_args,
            w_pad=w_pad, use_rle=use_rle)
    if dbg:
        jax.block_until_ready(e_fwd)
        t1 = _time.perf_counter()
    if dbg2:
        tw = _time.perf_counter()
        print(f"  [fb2] D={d_use} W={w_pad} B={b_pad} pack {t0-t_start:.2f}s "
              f"xfer {tx-t0:.2f}s derive {td-tx:.2f}s window {tw-td:.2f}s",
              flush=True)

    post, totals = _fb_pallas(
        e_fwd, e_bwd, meta_dev,
        jnp.asarray(lxy), jnp.asarray(tr_np.T, dtype=dtype),
        jnp.asarray(init_cell, dtype=dtype), jnp.asarray(end_w, dtype=dtype),
        d_pad=d_use, w_pad=w_pad, use_lut=use_lut, block_d=block_d,
        interpret=_interpret_mode(), emit_window=emit_window,
        use_rle=use_rle)
    if dbg:
        jax.block_until_ready(post)
        print(f"  [fb] prep+emissions {t1-t0:.2f}s pallas "
              f"{_time.perf_counter()-t1:.2f}s (D={d_use} blk={block_d} "
              f"B={b_pad} emit={'window' if emit_window else 'grids'})",
              flush=True)
    # post stays in the kernel's native (D, 3, W, B) layout — transposing
    # to problem-major pads the (3, W) tail dims up to 8x in HBM; the
    # extraction kernels consume this layout directly with a lane mask.
    # totals stays a DEVICE array (full b_pad length — the caller fuses it
    # into the single packed readback, and a B_real-dependent slice would
    # fragment the packed shape): reading it back here would synchronize
    # on the FB and defeat the caller's launch/finish pipelining. xb/yb
    # (the device band bases) ride along so extraction reuses them without
    # a second transfer.
    return post, totals, geoms, xb_dev, yb_dev


# ==========================================================================
# Segmented (checkpointed) FB: production read lengths in one device program
# ==========================================================================
#
# The monolithic FB above stores every forward diagonal for the backward
# pass: a D ~2e5-diagonal band (one 100 kb read) would need a ~15 GB
# program (TPU tiling pads the lane dim to 128 physically), so no single
# launch fits production reads. This section implements the classic
# checkpoint/rematerialization trade — the on-chip analogue of the
# reference's periodic traceback that bounds DP memory on CPU
# (pairwiseAligner.c:706-844):
#
#   * FORWARD: a lax.scan over fixed-size segments of SEG_D anti-diagonals.
#     Each segment runs a Pallas kernel that carries the previous two
#     diagonals in/out and stores NOTHING else; the scan stacks each
#     segment's *input* carry as its checkpoint ((n_seg, 2, 3, W, B) —
#     kilobytes per segment). Per-problem final-corner values (the total
#     log-prob terms) are max-accumulated inside the kernel, so no stored
#     forward grid is ever consulted.
#   * BACKWARD: a reversed lax.scan. Each segment re-runs the forward
#     kernel from its checkpoint (now storing the (SEG_D, 3, W, B) block),
#     runs the backward kernel with its own carry, and immediately compacts
#     the above-threshold posterior cells into a single flat (K,) packed
#     buffer at a running offset — the block buffers are reused across
#     segments, so peak memory is O(SEG_D), not O(D).
#
# 2x forward compute buys a D/SEG_D memory bound. One fixed segment shape
# per band-width bucket kills compile diversity (deep-D monolithic
# variants cost 30-90 s of axon compile EACH). Bit-parity with the
# monolithic kernel holds exactly: identical op order per cell, identical
# masks, absolute diagonal index g fed via an SMEM scalar.

_INVALID_WORD = 0x7FFFFFFF


def _seg_d(w_pad: int) -> int:
    """Fixed segment depth per band-width bucket: keeps each segment's
    fwd/post blocks ~50 MB at the 128-lane physical width (double-buffered
    by the scan). MARGIN_TPU_SEG_D overrides (tests use tiny segments)."""
    v = os.environ.get("MARGIN_TPU_SEG_D")
    if v:
        return int(v)
    return {16: 2048, 32: 2048, 64: 1024}.get(w_pad, 512)


def _fwd_seg_kernel(use_lut: bool, use_rle: bool, store_fwd: bool, *refs):
    """One grid step: block_d diagonals of the banded forward recurrence
    over ONE segment, with explicit carry in/out. Identical cell
    arithmetic to `_fwd_kernel` (absolute diagonal g = d0 + i*bd + j).
    Also max-accumulates each problem's final-corner (d_final, k_final)
    state values into fin (3, B) — the total-log-prob terms — so the
    caller never needs a stored forward grid."""
    if use_rle:
        (d0_ref, meta_ref, px_ref, py_ref, rep_ref, tabs_ref,
         lxy_ref, trans_ref, init_ref, cin_ref, fin_in_ref, *rest) = refs
    else:
        (d0_ref, meta_ref, px_ref, py_ref, tabs_ref,
         lxy_ref, trans_ref, init_ref, cin_ref, fin_in_ref, *rest) = refs
        rep_ref = None
    if store_fwd:
        (cout_ref, fin_out_ref, fwd_ref,
         prev1_ref, prev2_ref, fin_s) = rest
    else:
        cout_ref, fin_out_ref, prev1_ref, prev2_ref, fin_s = rest
        fwd_ref = None
    bd = meta_ref.shape[0]
    _, _, W, B = cin_ref.shape
    dtype = tabs_ref.dtype
    log_add = _lut_log_add if use_lut else jnp.logaddexp
    neg = jnp.asarray(LOG_ZERO, dtype)
    i = pl.program_id(0)
    d0 = d0_ref[0, 0]

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    lx = lxy_ref[0, :][None, :]
    ly = lxy_ref[1, :][None, :]
    kf = lxy_ref[2, :][None, :]
    d_fin = lx + ly
    trc = {t: trans_ref[t, :][None, :] for t in range(9)}

    @pl.when(i == 0)
    def _():
        prev1_ref[...] = cin_ref[0]
        prev2_ref[...] = cin_ref[1]
        fin_s[...] = fin_in_ref[...]

    def row(j, r):
        return meta_ref[j, r, :][None, :]

    def body(j, _):
        g = d0 + i * bd + j  # absolute diagonal index
        prev1 = prev1_ref[...]
        prev2 = prev2_ref[...]
        low = _shift_k(prev1, row(j, M_S1), neg)       # (x-1, y)
        up = _shift_k(prev1, row(j, M_S1) + 1, neg)    # (x, y-1)
        mid = _shift_k(prev2, row(j, M_S2), neg)       # (x-1, y-1)
        e_m, e_gx, e_gy = _kernel_emissions(
            px_ref[j], py_ref[j], tabs_ref,
            None if rep_ref is None else rep_ref[j],
            slice(1, W + 1), slice(1, W + 1), use_rle)
        new_gx = e_gx + _log_add3(low[MATCH] + trc[T_OPEN_X],
                                  low[GAPX] + trc[T_EXT_X],
                                  low[GAPY] + trc[T_SW_X], log_add)
        new_m = e_m + _log_add3(mid[MATCH] + trc[T_MM],
                                mid[GAPX] + trc[T_M_FROM_GX],
                                mid[GAPY] + trc[T_M_FROM_GY], log_add)
        new_gy = e_gy + _log_add3(up[MATCH] + trc[T_OPEN_Y],
                                  up[GAPY] + trc[T_EXT_Y],
                                  up[GAPX] + trc[T_SW_Y], log_add)
        cur = jnp.stack([new_m, new_gx, new_gy])  # (3, W, B)
        x_pos = row(j, M_XBASE) + 1 + k_iota
        y_pos = row(j, M_YBASE) + 1 - k_iota
        vm = ((k_iota >= row(j, M_KLO)) & (k_iota < row(j, M_WIDTH))
              & (x_pos >= 0) & (x_pos <= lx)
              & (y_pos >= 0) & (y_pos <= ly) & (g <= d_fin))
        cur = jnp.where(vm[None], cur, neg)
        cur = jnp.maximum(cur, neg)
        diag0 = jnp.where(k_iota[None] == 0, init_ref[...][:, None, :], neg)
        cur = jnp.where(g == 0, diag0, cur)
        if store_fwd:
            fwd_ref[j] = cur
        # total-prob capture: exactly one (g, k) matches per problem, so a
        # max-accumulate over the LOG_ZERO floor is a select
        selc = (k_iota == kf) & (g == d_fin)
        fin_s[...] = jnp.maximum(
            fin_s[...], jnp.max(jnp.where(selc[None], cur, neg), axis=1))
        prev2_ref[...] = jnp.where(g == 0, jnp.full_like(prev1, neg), prev1)
        prev1_ref[...] = cur
        return 0

    jax.lax.fori_loop(0, bd, body, 0)
    cout_ref[0] = prev1_ref[...]
    cout_ref[1] = prev2_ref[...]
    fin_out_ref[...] = fin_s[...]


def _bwd_seg_kernel(use_lut: bool, use_rle: bool, *refs):
    """One reversed grid step: block_d diagonals of backward + posterior
    over one segment, with explicit carry in/out. Identical arithmetic to
    `_bwd_kernel`."""
    if use_rle:
        (d0_ref, meta_ref, px_ref, py_ref, rep_ref, tabs_ref,
         lxy_ref, trans_ref, end_ref, total_ref, fwd_ref, cin_ref,
         post_ref, cout_ref, next1_ref, next2_ref) = refs
    else:
        (d0_ref, meta_ref, px_ref, py_ref, tabs_ref,
         lxy_ref, trans_ref, end_ref, total_ref, fwd_ref, cin_ref,
         post_ref, cout_ref, next1_ref, next2_ref) = refs
        rep_ref = None
    bd, _, W, B = post_ref.shape
    dtype = tabs_ref.dtype
    log_add = _lut_log_add if use_lut else jnp.logaddexp
    neg = jnp.asarray(LOG_ZERO, dtype)
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    d0 = d0_ref[0, 0]

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    lx = lxy_ref[0, :][None, :]
    ly = lxy_ref[1, :][None, :]
    d_final = lx + ly
    k_final = lxy_ref[2, :][None, :]
    trc = {t: trans_ref[t, :][None, :] for t in range(9)}
    total = total_ref[0, :][None, None, :]

    @pl.when(i == 0)
    def _():
        next1_ref[...] = cin_ref[0]
        next2_ref[...] = cin_ref[1]

    def row(j, r):
        return meta_ref[j, r, :][None, :]

    def body(jj, _):
        j = bd - 1 - jj
        g = d0 + (nblk - 1 - i) * bd + j
        next1 = next1_ref[...]
        next2 = next2_ref[...]
        t1 = row(j, M_T1)
        t2 = row(j, M_T2)
        gx_n = _shift_k(next1, t1, neg)[GAPX]      # (x+1, y)
        gy_n = _shift_k(next1, t1 - 1, neg)[GAPY]  # (x, y+1)
        m_n = _shift_k(next2, t2, neg)[MATCH]      # (x+1, y+1)
        e_m, e_gx, e_gy = _kernel_emissions(
            px_ref[j], py_ref[j], tabs_ref,
            None if rep_ref is None else rep_ref[j],
            slice(2, W + 2), slice(0, W), use_rle)
        b_m = _log_add3(gx_n + e_gx + trc[T_OPEN_X],
                        m_n + e_m + trc[T_MM],
                        gy_n + e_gy + trc[T_OPEN_Y], log_add)
        b_gx = _log_add3(gx_n + e_gx + trc[T_EXT_X],
                         m_n + e_m + trc[T_M_FROM_GX],
                         gy_n + e_gy + trc[T_SW_Y], log_add)
        b_gy = _log_add3(gx_n + e_gx + trc[T_SW_X],
                         m_n + e_m + trc[T_M_FROM_GY],
                         gy_n + e_gy + trc[T_EXT_Y], log_add)
        x_pos = row(j, M_XBASE) + 1 + k_iota
        y_pos = row(j, M_YBASE) + 1 - k_iota
        vm = ((k_iota >= row(j, M_KLO)) & (k_iota < row(j, M_WIDTH))
              & (x_pos >= 0) & (x_pos <= lx)
              & (y_pos >= 0) & (y_pos <= ly) & (g <= d_final))
        computed = jnp.maximum(
            jnp.where(vm[None], jnp.stack([b_m, b_gx, b_gy]), neg), neg)
        bwd_final = jnp.where(k_iota[None] == k_final[None],
                              end_ref[...][:, None, :], neg)
        cur = jnp.where(g == d_final[None], bwd_final, computed)
        f_d = fwd_ref[j]
        post = jnp.exp(jnp.minimum(f_d + cur - total, 0.0))
        post_ref[j] = jnp.where(vm[None], post, 0.0)
        next2_ref[...] = next1
        next1_ref[...] = cur
        return 0

    jax.lax.fori_loop(0, bd, body, 0)
    cout_ref[0] = next1_ref[...]
    cout_ref[1] = next2_ref[...]


def _seg_prep(xmy_p, widths_a, klo_a, px_tab, py_tab, rep_tab, lxs, lys,
              d0, S: int, W: int, d_use: int, use_rle: bool):
    """Per-segment kernel metadata + packed symbol windows, derived ON
    DEVICE inside the segment scan body. Arithmetic matches `_derive_geom`
    + `_window_grids` exactly (same gathers, same fills), restricted to
    diagonals [d0, d0+S) with a 2-diagonal lookahead so the backward
    repeat-matrix grid sees across the segment boundary.

    xmy_p: (B, d_use+4) int32, 2 zero columns padded on BOTH sides.
    Returns (meta (S, 8, B), px/py (S, W+2, B), rep_f/rep_b (S, W, B) or
    None, xb (B, S), yb (B, S))."""
    B = xmy_p.shape[0]
    W2 = W + 2
    z0 = jnp.zeros((), d0.dtype)
    xp = jax.lax.dynamic_slice(xmy_p, (z0, d0), (B, S + 4))
    xm2 = xp[:, 2:]                       # (B, S+2): xmy[d0 .. d0+S+1]
    xm = xm2[:, :S]
    prev1 = xp[:, 1:S + 1]
    prev2 = xp[:, 0:S]
    next1 = xp[:, 3:S + 3]
    next2 = xp[:, 4:S + 4]
    d_loc = jnp.arange(S, dtype=jnp.int32)[None, :]
    d_abs = d0 + d_loc
    d_abs2 = d0 + jnp.arange(S + 2, dtype=jnp.int32)[None, :]
    xb2 = (d_abs2 + xm2) // 2 - 1         # (B, S+2)
    yb2 = (d_abs2 - xm2) // 2 - 1
    s1 = jnp.where(d_abs >= 1, (xm - 1 - prev1) // 2, 0)
    s2 = jnp.where(d_abs >= 2, (xm - prev2) // 2, 0)
    t1 = jnp.where(d_abs < d_use - 1, (xm + 1 - next1) // 2, 0)
    t2 = jnp.where(d_abs < d_use - 2, (xm - next2) // 2, 0)
    w_s = jax.lax.dynamic_slice(widths_a, (z0, d0),
                                (B, S)).astype(jnp.int32)
    k_s = jax.lax.dynamic_slice(klo_a, (z0, d0), (B, S)).astype(jnp.int32)
    rows = [None] * N_META
    rows[M_S1], rows[M_S2] = s1, s2
    rows[M_KLO], rows[M_WIDTH] = k_s, w_s
    rows[M_XBASE], rows[M_YBASE] = xb2[:, :S], yb2[:, :S]
    rows[M_T1], rows[M_T2] = t1, t2
    meta = jnp.transpose(jnp.stack(rows, axis=1), (2, 1, 0))  # (S, 8, B)

    # packed symbol windows over S+2 diagonals (lookahead serves rep_bwd)
    Lp = px_tab.shape[1]
    k = jnp.arange(W2)[None, :, None]
    lx = lxs[None, None, :]
    ly = lys[None, None, :]
    boff = (jnp.arange(B, dtype=jnp.int32) * Lp)[None, None, :]
    xb_t = jnp.transpose(xb2, (1, 0))[:, None, :]   # (S+2, 1, B)
    yb_t = jnp.transpose(yb2, (1, 0))[:, None, :]

    def wide_window(tab, idx, in_range):
        g = jnp.take(tab.reshape(-1),
                     (jnp.clip(idx, 0, Lp - 1) + boff).reshape(-1),
                     mode="clip").reshape(S + 2, W2, B)
        return jnp.where(in_range, g, 4)  # fill: symbol 4, repeat 0

    px_idx = (xb_t - 1) + k
    py_idx = (yb_t + 1) - k
    px2 = wide_window(px_tab, px_idx, (px_idx >= 0) & (px_idx < lx))
    py2 = wide_window(py_tab, py_idx, (py_idx >= 0) & (py_idx < ly))
    if not use_rle:
        return meta, px2[:S], py2[:S], None, None, xb2[:, :S], yb2[:, :S]

    sx = px2 & 7
    n = 51
    base = jnp.where(sx >= 4, 0, sx)
    ridx = base * (n * n) + (px2 >> 3) * n + (py2 >> 3)
    rboff = (jnp.arange(B, dtype=jnp.int32)
             * rep_tab.shape[1])[None, None, :]
    rfw = jnp.take(rep_tab.reshape(-1), (ridx + rboff).reshape(-1),
                   mode="clip").reshape(S + 2, W2, B)
    rep_f = rfw[:S, 1:W + 1, :]
    # bwd repeat grid: row j reads rfw[j+2] with a column shift selected by
    # s2w = x_base[j+2] - x_base[j] in {0, 1, 2} — the lookahead rows make
    # this exact across the segment seam (the full-grid `_window_grids`
    # zero-pads instead, which only ever feeds masked/NEG-absorbed cells)
    s2w = jnp.transpose(xb2[:, 2:] - xb2[:, :S], (1, 0))[:, None, :]
    r2 = rfw[2:]
    rep_b = jnp.where(
        s2w == 0, r2[:, 2:W + 2, :],
        jnp.where(s2w == 1, r2[:, 1:W + 1, :], r2[:, 0:W, :]))
    return meta, px2[:S], py2[:S], rep_f, rep_b, xb2[:, :S], yb2[:, :S]


def _seg_specs(block_d: int, S: int, W: int, B: int, use_rle: bool):
    """BlockSpecs for one segment call: (common input specs, carry spec,
    forward-store/posterior spec, reversed variants)."""
    W2 = W + 2
    mspec = pl.BlockSpec((block_d, N_META, B), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((block_d, W2, B), lambda i: (i, 0, 0))
    dspec = pl.BlockSpec((block_d, W, B), lambda i: (i, 0, 0))
    ospec = pl.BlockSpec((block_d, 3, W, B), lambda i: (i, 0, 0, 0))
    nblk = S // block_d
    r_mspec = pl.BlockSpec((block_d, N_META, B),
                           lambda i: (nblk - 1 - i, 0, 0))
    r_wspec = pl.BlockSpec((block_d, W2, B), lambda i: (nblk - 1 - i, 0, 0))
    r_dspec = pl.BlockSpec((block_d, W, B), lambda i: (nblk - 1 - i, 0, 0))
    r_ospec = pl.BlockSpec((block_d, 3, W, B),
                           lambda i: (nblk - 1 - i, 0, 0, 0))
    full2 = lambda rows: pl.BlockSpec((rows, B), lambda i: (0, 0))
    cspec = pl.BlockSpec((2, 3, W, B), lambda i: (0, 0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return (mspec, wspec, dspec, ospec, r_mspec, r_wspec, r_dspec, r_ospec,
            full2, cspec, smem)


def _seg_fwd_call(meta, px, py, rep_f, tabs, lxy, trans, init_cell,
                  cin, fin_in, d0, S: int, W: int, B: int, block_d: int,
                  use_lut: bool, use_rle: bool, store_fwd: bool,
                  interpret: bool, dtype):
    (mspec, wspec, dspec, ospec, _, _, _, _,
     full2, cspec, smem) = _seg_specs(block_d, S, W, B, use_rle)
    nblk = S // block_d
    ins = [jnp.full((1, 1), d0, jnp.int32), meta, px, py]
    in_specs = [smem, mspec, wspec, wspec]
    if use_rle:
        ins.append(rep_f)
        in_specs.append(dspec)
    ins += [tabs, lxy, trans, init_cell, cin, fin_in]
    in_specs += [full2(35), full2(4), full2(9), full2(3), cspec, full2(3)]
    out_shape = [jax.ShapeDtypeStruct((2, 3, W, B), dtype),
                 jax.ShapeDtypeStruct((3, B), dtype)]
    out_specs = [cspec, full2(3)]
    if store_fwd:
        out_shape.append(jax.ShapeDtypeStruct((S, 3, W, B), dtype))
        out_specs.append(ospec)
    return pl.pallas_call(
        functools.partial(_fwd_seg_kernel, use_lut, use_rle, store_fwd),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((3, W, B), dtype),
                        pltpu.VMEM((3, W, B), dtype),
                        pltpu.VMEM((3, B), dtype)],
        interpret=interpret,
    )(*ins)


@lazy_jit(static_argnames=("d_use", "w_pad", "seg_d", "block_d",
                           "use_lut", "use_rle", "interpret"))
def _fb_seg_forward(xs, ys, rep_x, rep_y, xmy, widths, klo, tabs, rep_tab,
                    lxy, trans, init_cell,
                    d_use: int, w_pad: int, seg_d: int, block_d: int,
                    use_lut: bool, use_rle: bool, interpret: bool):
    """Checkpointing forward sweep: scan segments, stack each segment's
    input carry. Returns (ckpts (n_seg, 2, 3, W, B), fin (3, B))."""
    B = xs.shape[0]
    W = w_pad
    S = seg_d
    n_seg = d_use // S
    dtype = tabs.dtype
    neg = float(LOG_ZERO)
    xs32 = xs.astype(jnp.int32)
    ys32 = ys.astype(jnp.int32)
    if use_rle:
        px_tab = xs32 + 8 * rep_x.astype(jnp.int32)
        py_tab = ys32 + 8 * rep_y.astype(jnp.int32)
    else:
        px_tab, py_tab = xs32, ys32
    xmy_p = jnp.pad(xmy, ((0, 0), (2, 2)))
    lxs, lys = lxy[0], lxy[1]

    def body(carry, s):
        cin, fin = carry
        d0 = s * S
        meta, px, py, rep_f, _, _, _ = _seg_prep(
            xmy_p, widths, klo, px_tab, py_tab, rep_tab, lxs, lys,
            d0, S, W, d_use, use_rle)
        cout, fout = _seg_fwd_call(
            meta, px, py, rep_f, tabs, lxy, trans, init_cell, cin, fin,
            d0, S, W, B, block_d, use_lut, use_rle, False, interpret,
            dtype)
        return (cout, fout), cin

    cin0 = jnp.full((2, 3, W, B), neg, dtype)
    fin0 = jnp.full((3, B), neg, dtype)
    (_, fin), ckpts = jax.lax.scan(
        body, (cin0, fin0), jnp.arange(n_seg, dtype=jnp.int32))
    return ckpts, fin


@lazy_jit(static_argnames=("use_lut",))
def _seg_totals(fin, end_w, use_lut: bool):
    """Total log prob per problem from the captured final-corner values
    (same log-add order as the monolithic `_fb_pallas`)."""
    la = _lut_log_add if use_lut else jnp.logaddexp
    t = fin + end_w                           # (3, B)
    return la(la(t[0], t[1]), t[2])


@lazy_jit(static_argnames=("d_use", "w_pad", "seg_d", "block_d", "use_lut",
                           "use_rle", "interpret", "K", "K_seg"))
def _fb_seg_backward(xs, ys, rep_x, rep_y, xmy, widths, klo, tabs, rep_tab,
                     lxy, trans, init_cell, end_w, totals, ckpts, valid_b,
                     threshold,
                     d_use: int, w_pad: int, seg_d: int, block_d: int,
                     use_lut: bool, use_rle: bool, interpret: bool,
                     K: int, K_seg: int):
    """Rematerializing backward sweep + streaming extraction. Per segment
    (deepest first): re-run forward from the checkpoint storing the block,
    run backward with its carry, compact above-threshold posterior cells
    into the running (K + K_seg,) packed buffers. Returns one int32 array
    [count, max_seg_count, totals (bitcast), lo words, hi words] — a
    single readback, like `_device_extract_packed`. Data is valid iff
    count <= K AND max_seg_count <= K_seg (caller retries bigger
    otherwise)."""
    B = xs.shape[0]
    W = w_pad
    S = seg_d
    n_seg = d_use // S
    dtype = tabs.dtype
    neg = float(LOG_ZERO)
    xs32 = xs.astype(jnp.int32)
    ys32 = ys.astype(jnp.int32)
    if use_rle:
        px_tab = xs32 + 8 * rep_x.astype(jnp.int32)
        py_tab = ys32 + 8 * rep_y.astype(jnp.int32)
    else:
        px_tab, py_tab = xs32, ys32
    xmy_p = jnp.pad(xmy, ((0, 0), (2, 2)))
    lxs, lys = lxy[0], lxy[1]
    (_, _, dspec, ospec, r_mspec, r_wspec, r_dspec, r_ospec,
     full2, cspec, smem) = _seg_specs(block_d, S, W, B, use_rle)
    nblk = S // block_d
    KB = K + K_seg
    inval = jnp.int32(_INVALID_WORD)

    def body(carry, inp):
        cin, cnt, mx, lo_buf, hi_buf = carry
        s, ckpt = inp
        d0 = s * S
        meta, px, py, rep_f, rep_b, xb_s, yb_s = _seg_prep(
            xmy_p, widths, klo, px_tab, py_tab, rep_tab, lxs, lys,
            d0, S, W, d_use, use_rle)
        # recompute the segment's forward block from its checkpoint
        _, _, fwd_blk = _seg_fwd_call(
            meta, px, py, rep_f, tabs, lxy, trans, init_cell, ckpt,
            jnp.full((3, B), neg, dtype), d0, S, W, B, block_d,
            use_lut, use_rle, True, interpret, dtype)
        d0a = jnp.full((1, 1), d0, jnp.int32)
        ins = [d0a, meta, px, py]
        in_specs = [smem, r_mspec, r_wspec, r_wspec]
        if use_rle:
            ins.append(rep_b)
            in_specs.append(r_dspec)
        ins += [tabs, lxy, trans, end_w, totals[None, :], fwd_blk, cin]
        in_specs += [full2(35), full2(4), full2(9), full2(3), full2(1),
                     r_ospec, cspec]
        post_blk, cout = pl.pallas_call(
            functools.partial(_bwd_seg_kernel, use_lut, use_rle),
            grid=(nblk,),
            in_specs=in_specs,
            out_specs=(r_ospec, cspec),
            out_shape=(jax.ShapeDtypeStruct((S, 3, W, B), dtype),
                       jax.ShapeDtypeStruct((2, 3, W, B), dtype)),
            scratch_shapes=[pltpu.VMEM((3, W, B), dtype),
                            pltpu.VMEM((3, W, B), dtype)],
            interpret=interpret,
        )(*ins)
        # streaming flat extraction (same packing as _device_extract_flat,
        # with the absolute diagonal in the hi word)
        k_iota = jnp.arange(W)[None, :, None]
        xb = jnp.transpose(xb_s, (1, 0))[:, None, :]
        yb = jnp.transpose(yb_s, (1, 0))[:, None, :]
        x_pos = xb + 1 + k_iota
        y_pos = yb + 1 - k_iota
        vb = valid_b[None, None, :]
        sel_m = ((post_blk[:, MATCH] >= threshold)
                 & (x_pos > 0) & (y_pos > 0) & vb)
        sel_gx = (post_blk[:, GAPX] >= threshold) & (x_pos > 0) & vb
        sel_gy = (post_blk[:, GAPY] >= threshold) & (y_pos > 0) & vb
        sel = jnp.stack([sel_m, sel_gx, sel_gy], axis=1)
        cnt_s = jnp.sum(sel).astype(jnp.int32)
        d_i, s_i, k_i, b_i = jnp.nonzero(sel, size=K_seg, fill_value=0)
        probs = jnp.floor(jnp.minimum(post_blk[d_i, s_i, k_i, b_i], 1.0)
                          * 10_000_000).astype(jnp.int32)
        valid = jnp.arange(K_seg) < cnt_s
        tag = (b_i * 3 + s_i).astype(jnp.int32)
        lo_s = jnp.where(valid, probs | (k_i.astype(jnp.int32) << 24),
                         inval)
        hi_s = jnp.where(valid,
                         (d0 + d_i).astype(jnp.int32) | (tag << 22), inval)
        off = jnp.minimum(cnt, K)  # overflow clamps; detected by count
        lo_buf = jax.lax.dynamic_update_slice(lo_buf, lo_s, (off,))
        hi_buf = jax.lax.dynamic_update_slice(hi_buf, hi_s, (off,))
        return ((cout, cnt + cnt_s, jnp.maximum(mx, cnt_s),
                 lo_buf, hi_buf), None)

    cin0 = jnp.full((2, 3, W, B), neg, dtype)
    init = (cin0, jnp.int32(0), jnp.int32(0),
            jnp.full((KB,), inval, jnp.int32),
            jnp.full((KB,), inval, jnp.int32))
    (_, cnt, mx, lo_buf, hi_buf), _ = jax.lax.scan(
        body, init,
        (jnp.arange(n_seg - 1, -1, -1, dtype=jnp.int32),
         jnp.flip(ckpts, axis=0)))
    tb = jax.lax.bitcast_convert_type(totals, jnp.int32).reshape(-1)
    return jnp.concatenate([cnt[None], mx[None], tb, lo_buf, hi_buf])


def fb_posteriors_group_seg(tables, items, d_pad: int, w_pad: int,
                            expansion: int, use_lut: bool, dynamic: bool,
                            use_rle: bool, threshold: float,
                            K: int, K_seg: int, geoms_in=None):
    """Solve a deep pack with the segmented (checkpointed) FB: one
    forward-checkpoint program, one backward-remat program, ONE readback.

    Returns (packed device array, geoms, retry) where retry(K2, K2_seg)
    re-runs ONLY the backward/extraction with bigger capacities (the
    checkpoints stay on device)."""
    S = _seg_d(w_pad)
    B_real = len(items)
    b_guess = max(64, int(np.ceil(B_real / 64)) * 64)
    block_d = _block_d(w_pad, b_guess)
    while S % block_d:
        block_d //= 2
    d_use = int(np.ceil(d_pad / S)) * S
    assert d_use < (1 << 22), d_use  # hi-word diagonal bit budget
    p = _pack_host(tables, items, d_use, w_pad, expansion, dynamic,
                   use_rle, geoms_in)
    interpret = _interpret_mode()
    dev = dict(
        xs=jnp.asarray(p.xs), ys=jnp.asarray(p.ys),
        rep_x=None if p.rx is None else jnp.asarray(p.rx),
        rep_y=None if p.ry is None else jnp.asarray(p.ry),
        xmy=jnp.asarray(p.xmy_b), widths=jnp.asarray(p.widths_b),
        klo=jnp.asarray(p.klo_b),
        tabs=jnp.concatenate([p.m_tab.T, p.gx_tab.T,
                              p.gy_tab.T]).astype(p.dtype),
        rep_tab=p.rep_tab,
        lxy=jnp.asarray(p.lxy),
        trans=jnp.asarray(p.tr_np.T, dtype=p.dtype),
        init_cell=jnp.asarray(p.init_cell, dtype=p.dtype))
    stat = dict(d_use=d_use, w_pad=w_pad, seg_d=S, block_d=block_d,
                use_lut=use_lut, use_rle=use_rle, interpret=interpret)
    ckpts, fin = _fb_seg_forward(
        dev["xs"], dev["ys"], dev["rep_x"], dev["rep_y"], dev["xmy"],
        dev["widths"], dev["klo"], dev["tabs"], dev["rep_tab"], dev["lxy"],
        dev["trans"], dev["init_cell"], **stat)
    end_w = jnp.asarray(p.end_w, dtype=p.dtype)
    totals = _seg_totals(fin, end_w, use_lut)
    valid_b = jnp.asarray(np.arange(p.b_pad) < B_real)

    def run_bwd(K2: int, K2_seg: int):
        return _fb_seg_backward(
            dev["xs"], dev["ys"], dev["rep_x"], dev["rep_y"], dev["xmy"],
            dev["widths"], dev["klo"], dev["tabs"], dev["rep_tab"],
            dev["lxy"], dev["trans"], dev["init_cell"], end_w, totals,
            ckpts, valid_b, threshold, K=K2, K_seg=K2_seg, **stat)

    packed = run_bwd(K, K_seg)
    return packed, p.geoms, run_bwd
