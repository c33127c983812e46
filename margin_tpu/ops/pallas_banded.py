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
    from margin_tpu.ops import banded as _banded
    import time as _time0
    t_start = _time0.perf_counter()

    B_real = len(items)
    # lane quantum 64: a half-full group (the common realign shape, ~40-50
    # reads per pass) then pays half the emission-gather and extraction
    # element count; Mosaic pads the physical lane dim internally, so the
    # kernel cost is unchanged (and sub-64 quanta buy NOTHING in HBM —
    # tiling pads lanes back to 128 physically)
    b_pad = max(64, int(np.ceil(B_real / 64)) * 64)
    block_d = _block_d(w_pad, b_pad)
    d_use = int(np.ceil(d_pad / block_d)) * block_d

    # compact host-side pack: symbols/repeats in int8, band widths/k_lo in
    # int16, one int32 xmy track — every per-diagonal kernel meta row is
    # derived from xmy on device (`_derive_geom`), so host packing is a few
    # contiguous row writes and the transfer is ~4x smaller than shipping
    # the (D, N_META, B) grid
    xs = np.full((b_pad, d_use), 4, dtype=np.int8)
    ys = np.full((b_pad, d_use), 4, dtype=np.int8)
    lxs = np.zeros(b_pad, dtype=np.int32)
    lys = np.zeros(b_pad, dtype=np.int32)
    xmy_b = np.zeros((b_pad, d_use), dtype=np.int32)
    widths_b = np.zeros((b_pad, d_use), dtype=np.int16)
    klo_b = np.zeros((b_pad, d_use), dtype=np.int16)
    strands = np.zeros(b_pad, dtype=np.int32)
    rx = np.zeros((b_pad, d_use), dtype=np.int8) if use_rle else None
    ry = np.zeros((b_pad, d_use), dtype=np.int8) if use_rle else None
    k_final = np.zeros(b_pad, dtype=np.int32)
    geoms = []
    pad_idx = list(range(B_real)) + [B_real - 1] * (b_pad - B_real)
    for col, idx in enumerate(pad_idx):
        it = items[idx]
        lx, ly = len(it["x_sym"]), len(it["y_sym"])
        if col < B_real:
            if geoms_in is not None:
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
    m_tab = jnp.asarray(np.asarray(tables.match)[strands])     # (B, 25)
    gx_tab = jnp.asarray(np.asarray(tables.gap_x)[strands])
    gy_tab = jnp.asarray(np.asarray(tables.gap_y)[strands])
    tr_np = np.asarray(tables.trans)[strands]  # (B, 9) host-side
    rep_tab = (jnp.asarray(np.asarray(tables.repeat)[strands])
               if (use_rle and tables.repeat is not None) else None)

    dtype = tables.match.dtype
    neg = float(LOG_ZERO)
    init_cell = np.tile(np.array([[0.0], [neg], [neg]]), (1, b_pad))
    end_w = np.stack([tr_np[:, T_MM], tr_np[:, T_M_FROM_GX],
                      tr_np[:, T_M_FROM_GY]], axis=0)  # (3, B)
    for col, idx in enumerate(pad_idx):
        it = items[idx]
        if it.get("ragged_left"):
            init_cell[:, col] = (neg, 0.0, 0.0)
        if it.get("ragged_right"):
            t = tr_np[col]
            end_w[:, col] = ((t[T_OPEN_X] + t[T_OPEN_Y]) / 2.0,
                             t[T_EXT_X], t[T_EXT_Y])
    lxy = np.stack([lxs, lys, k_final, np.zeros_like(lxs)], axis=0)

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
