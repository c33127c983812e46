"""Segmented (checkpointed) Pallas banded FB vs scan + monolithic paths.

The segmented FB (ops/pallas_banded.py, `fb_posteriors_group_seg`) is the
production-read-length device path: forward saves only per-segment
carries, backward rematerializes each segment's forwards before emitting
posteriors — the on-chip analogue of the reference's periodic-traceback
memory bound (pairwiseAligner.c:706-844). These tests pin bit-parity of
its pair sets, probs and totals against BOTH the lax.scan path and the
monolithic Pallas kernel, across strands, anchors, RLE, ragged flags and
mixed depths, in interpret mode on CPU with tiny segments."""

import os

import numpy as np
import pytest

from margin_tpu.ops import banded, pairhmm
from margin_tpu.params import Params, StateMachineParams

pytestmark = pytest.mark.slow  # interpret-mode pallas is emulation-slow

SEG_ENV = {"MARGIN_TPU_PALLAS": "interpret",
           "MARGIN_TPU_SEG_D": "64",
           "MARGIN_TPU_SEG_MIN_D": "64"}


@pytest.fixture(scope="module")
def tables():
    return pairhmm.PairHmmTables.from_params(
        StateMachineParams.default_nucleotide())


@pytest.fixture(scope="module")
def tables_rle():
    params = Params.load(
        "/root/reference/params/polish/ont/r9.4/allParams.np.human.r94-g344.json")
    pp = params.polish
    return pairhmm.PairHmmTables.from_params(pp.sm_forward, pp.sm_reverse,
                                             repeat=pp.repeat_sub_matrix)


def _mk_item(rng, lx, ly, n_anchor, strand, rle=False, ragged=(False, False)):
    it = {"x_sym": rng.integers(0, 4, lx).astype(np.int32),
          "y_sym": rng.integers(0, 4, ly).astype(np.int32),
          "anchors": [], "strand": strand}
    if n_anchor:
        axs = np.sort(rng.choice(lx, n_anchor, replace=False))
        ays = np.sort(rng.choice(ly, n_anchor, replace=False))
        it["anchors"] = [(int(a), int(b), 4) for a, b in zip(axs, ays)]
    if rle:
        it["rep_x"] = rng.integers(1, 8, lx).astype(np.int32)
        it["rep_y"] = rng.integers(1, 8, ly).astype(np.int32)
    if ragged[0]:
        it["ragged_left"] = True
    if ragged[1]:
        it["ragged_right"] = True
    return it


def _with_env(env, fn):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return fn()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _solve_seg(tables, items, use_lut, monkeypatch=None, expansion=6):
    """Solve via banded_posteriors_many with the segmented path forced on
    (tiny segments, low seg threshold); assert the seg launcher ran."""
    calls = []
    orig = banded._launch_pack_seg

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    banded._launch_pack_seg = spy
    try:
        res = _with_env(SEG_ENV, lambda: banded.banded_posteriors_many(
            tables, items, expansion=expansion, use_lut=use_lut))
    finally:
        banded._launch_pack_seg = orig
    assert calls, "segmented launch path was not exercised"
    return res


def _solve_scan(tables, items, use_lut, expansion=6):
    return _with_env({"MARGIN_TPU_PALLAS": "0"},
                     lambda: banded.banded_posteriors_many(
                         tables, items, expansion=expansion,
                         use_lut=use_lut))


def _solve_mono(tables, items, use_lut, expansion=6):
    """Monolithic Pallas path (segmentation disabled)."""
    return _with_env({"MARGIN_TPU_PALLAS": "interpret",
                      "MARGIN_TPU_SEG_FB": "0"},
                     lambda: banded.banded_posteriors_many(
                         tables, items, expansion=expansion,
                         use_lut=use_lut))


def _assert_close(res_a, res_b, exact=False, tol=1):
    """tol=1: same-backend floor-rounding ulp. Cross-backend comparisons
    (native C++ vs Pallas) accumulate in different op orders and agree to
    ~2e-5 of the 1e7-scaled prob (measured; totals still match to 1e-3)."""
    for i, ((pa, ta), (pb, tb)) in enumerate(zip(res_a, res_b)):
        if exact:
            assert ta == tb, i
        else:
            assert ta == pytest.approx(tb, abs=1e-3), i
        for a, b in zip(pa, pb):
            assert a.shape == b.shape, (i, a.shape, b.shape)
            if len(a):
                if exact:
                    assert np.array_equal(a, b), i
                else:
                    assert np.array_equal(a[:, 1:], b[:, 1:]), i
                    assert np.abs(a[:, 0] - b[:, 0]).max() <= tol, i


@pytest.mark.parametrize("use_lut", [False, True])
def test_seg_matches_scan(tables, use_lut):
    rng = np.random.default_rng(42)
    items = [_mk_item(rng, 120, 118, 10, 0),
             _mk_item(rng, 80, 95, 0, 1),
             _mk_item(rng, 140, 130, 14, 0),
             _mk_item(rng, 60, 64, 5, 1)]  # final diag in segment 1 of 5
    _assert_close(_solve_seg(tables, items, use_lut),
                  _solve_scan(tables, items, use_lut))


def test_seg_matches_monolithic_bitexact(tables):
    """Segmented vs monolithic Pallas: the SAME kernel arithmetic in both,
    so pair sets, probs and totals must be bit-identical."""
    rng = np.random.default_rng(9)
    items = [_mk_item(rng, 100, 104, 8, 0),
             _mk_item(rng, 90, 85, 6, 1, ragged=(True, False)),
             _mk_item(rng, 70, 130, 0, 0, ragged=(False, True))]
    _assert_close(_solve_seg(tables, items, use_lut=True),
                  _solve_mono(tables, items, use_lut=True), exact=True)


@pytest.mark.parametrize("use_lut", [False, True])
def test_seg_matches_scan_rle(tables_rle, use_lut):
    rng = np.random.default_rng(7)
    items = [_mk_item(rng, 110, 105, 9, 0, rle=True),
             _mk_item(rng, 95, 90, 7, 1, rle=True),
             # 3 anchors keep w_pad <= 128 (a zero-anchor 128x128 band is
             # width 129 and routes to the native fallback, not the seg FB)
             _mk_item(rng, 128, 128, 3, 1, rle=True)]
    _assert_close(_solve_seg(tables_rle, items, use_lut),
                  _solve_scan(tables_rle, items, use_lut))


def test_seg_rle_matches_monolithic_bitexact(tables_rle):
    """RLE repeat-matrix overlay incl. the cross-segment-seam backward
    grid lookahead: bit-identical to the monolithic kernel."""
    rng = np.random.default_rng(17)
    items = [_mk_item(rng, 100, 96, 8, 0, rle=True),
             _mk_item(rng, 88, 112, 6, 1, rle=True)]
    _assert_close(_solve_seg(tables_rle, items, use_lut=True),
                  _solve_mono(tables_rle, items, use_lut=True), exact=True)


def test_device_routing_regime_parity(tables):
    """The all-device routing regime (MARGIN_TPU_DEVICE_BAND_CELLS=0 —
    every band rides the funnel) vs the latency-split regime (a high
    threshold sends small bands to the host native kernel, the rest to the
    funnel): results must agree within the documented 1-ulp floor-rounding
    tolerance between the native and Pallas backends, with identical pair
    sets."""
    from margin_tpu.ops import native_fb
    if native_fb.lib() is None:
        pytest.skip("native fb unavailable")
    rng = np.random.default_rng(31)
    items = [_mk_item(rng, 60, 64, 4, 0), _mk_item(rng, 110, 105, 9, 1),
             _mk_item(rng, 40, 40, 0, 0), _mk_item(rng, 90, 88, 6, 1)]

    def solve(threshold_cells):
        import margin_tpu.ops.banded as B
        env = dict(SEG_ENV)
        env["MARGIN_TPU_DEVICE_BAND_CELLS"] = str(threshold_cells)
        old = B._DEVICE_MIN_CELLS
        B._DEVICE_MIN_CELLS = threshold_cells
        try:
            return _with_env(env, lambda: banded.banded_posteriors_many(
                tables, [dict(it) for it in items], expansion=6,
                use_lut=True))
        finally:
            B._DEVICE_MIN_CELLS = old

    all_device = solve(0)
    # threshold between the items' band sizes: some solve native locally,
    # the rest ride the funnel (the split branch in banded_posteriors_many)
    cells = [banded._true_band_cells(banded._item_geom(dict(it), 6, False))
             for it in items]
    mid = int(np.median(cells))
    assert min(cells) < mid <= max(cells)
    split = solve(mid)
    _assert_close(all_device, split, tol=200)  # cross-backend (see above)


def test_seg_overflow_retry(tables):
    """Capacity overflow (count > K or a segment > K_seg) must be detected
    from the packed header and retried with exact sizes — results still
    bit-identical."""
    rng = np.random.default_rng(5)
    items = [_mk_item(rng, 100, 100, 8, 0), _mk_item(rng, 90, 95, 6, 1)]
    want = _solve_scan(tables, items, use_lut=True)

    def run():
        results = [None] * len(items)
        refs = [banded._FbItemRef(it, results, i)
                for i, it in enumerate(items)]
        for r in refs:
            r.geom = banded._item_geom(r.item, 6, False)
        h = banded._launch_pack_seg(tables, refs, d_pad=256, w_pad=64,
                                    use_rle=False, expansion=6,
                                    use_lut=True, dynamic=False,
                                    threshold=0.01)
        # shrink capacities below the true pair count: the finisher must
        # notice (header words) and re-run the backward with bigger K
        h.packed = h.retry(16, 16)
        h.K, h.K_seg = 16, 16
        banded._finish_pack_seg(h)
        return results

    got = _with_env(SEG_ENV, run)
    _assert_close(got, want)
