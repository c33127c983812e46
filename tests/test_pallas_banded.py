"""Pallas wavefront banded FB vs the lax.scan path (interpret mode on CPU).

The Pallas kernel (ops/pallas_banded.py) must reproduce the scan-path
posteriors and totals for mixed strands, anchored bands, RLE emissions and
both logAdd flavors; on hardware it is the accelerator compute path for
poa_realign's batched alignments (getPosteriorProbsWithBanding,
pairwiseAligner.c:706-844)."""

import os

import numpy as np
import pytest

from margin_tpu.ops import banded, pairhmm
from margin_tpu.params import Params, StateMachineParams

pytestmark = pytest.mark.slow  # interpret-mode pallas is emulation-slow


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


def _mk_item(rng, lx, ly, n_anchor, strand, rle=False):
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
    return it


def _run_both(tables, items, use_lut, expansion=6):
    os.environ["MARGIN_TPU_PALLAS"] = "interpret"
    try:
        res_p = banded.banded_posteriors_many(tables, items,
                                              expansion=expansion,
                                              use_lut=use_lut)
    finally:
        os.environ["MARGIN_TPU_PALLAS"] = "0"
    res_s = banded.banded_posteriors_many(tables, items, expansion=expansion,
                                          use_lut=use_lut)
    os.environ.pop("MARGIN_TPU_PALLAS", None)
    return res_p, res_s


def _assert_equal(res_p, res_s):
    for i, ((pp, tp), (ps, ts)) in enumerate(zip(res_p, res_s)):
        assert tp == pytest.approx(ts, abs=1e-3), i
        for a, b in zip(pp, ps):
            assert a.shape == b.shape, i
            if len(a):
                # integer-scaled probs may differ by 1 ulp of the floor
                assert np.abs(a - b).max() <= 1, i


@pytest.mark.parametrize("use_lut", [False, True])
def test_pallas_matches_scan(tables, use_lut):
    rng = np.random.default_rng(42)
    items = [_mk_item(rng, 40, 45, 5, 0), _mk_item(rng, 30, 30, 0, 1),
             _mk_item(rng, 55, 50, 8, 0), _mk_item(rng, 20, 60, 3, 1)]
    _assert_equal(*_run_both(tables, items, use_lut))


@pytest.mark.parametrize("use_lut", [False, True])
def test_pallas_matches_scan_rle(tables_rle, use_lut):
    rng = np.random.default_rng(7)
    items = [_mk_item(rng, 40, 45, 5, 0, rle=True),
             _mk_item(rng, 33, 30, 4, 1, rle=True),
             _mk_item(rng, 60, 55, 9, 1, rle=True)]
    _assert_equal(*_run_both(tables_rle, items, use_lut))


def test_pallas_empty_and_mixed(tables):
    rng = np.random.default_rng(3)
    items = [_mk_item(rng, 30, 28, 4, 0),
             {"x_sym": np.zeros(0, np.int32), "y_sym": np.zeros(0, np.int32),
              "anchors": [], "strand": 0},
             _mk_item(rng, 25, 31, 0, 1)]
    res_p, res_s = _run_both(tables, items, use_lut=False)
    _assert_equal(res_p, res_s)
    assert res_p[1][1] == 0.0 and len(res_p[1][0][0]) == 0


def test_fb_funnel_concurrent_matches_direct(tables):
    """Concurrent banded_posteriors_many calls ride the cross-chunk funnel
    (_FbFunnel): per-request results must be bit-identical to direct
    unfunneled solves, regardless of how requests merge into packs."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(23)
    reqs = []
    for r in range(6):
        n = int(rng.integers(2, 7))
        reqs.append([_mk_item(rng, int(rng.integers(20, 60)),
                              int(rng.integers(20, 60)),
                              int(rng.integers(0, 6)),
                              int(rng.integers(0, 2)))
                     for _ in range(n)])

    os.environ["MARGIN_TPU_PALLAS"] = "interpret"
    try:
        assert banded._fb_funnel_enabled()
        with ThreadPoolExecutor(max_workers=4) as ex:
            funneled = list(ex.map(
                lambda items: banded.banded_posteriors_many(
                    tables, items, expansion=6, use_lut=True), reqs))
        os.environ["MARGIN_TPU_FB_FUNNEL"] = "0"
        direct = [banded.banded_posteriors_many(tables, items, expansion=6,
                                                use_lut=True)
                  for items in reqs]
    finally:
        os.environ.pop("MARGIN_TPU_PALLAS", None)
        os.environ.pop("MARGIN_TPU_FB_FUNNEL", None)
    for got, want in zip(funneled, direct):
        for ((pm, pgx, pgy), pt), ((sm, sgx, sgy), st) in zip(got, want):
            assert pt == st
            assert np.array_equal(pm, sm)
            assert np.array_equal(pgx, sgx)
            assert np.array_equal(pgy, sgy)


def test_pallas_oracle_total(tables):
    """Pallas totals agree with the float64 LUT oracle on a small pair."""
    from margin_tpu.testing import oracle
    rng = np.random.default_rng(11)
    x = rng.integers(0, 4, 18).astype(np.int32)
    y = rng.integers(0, 4, 20).astype(np.int32)
    items = [{"x_sym": x, "y_sym": y, "anchors": [], "strand": 0}]
    os.environ["MARGIN_TPU_PALLAS"] = "interpret"
    try:
        (pairs, total), = banded.banded_posteriors_many(
            tables, items, expansion=6, use_lut=True)
    finally:
        os.environ.pop("MARGIN_TPU_PALLAS", None)
    osm = oracle.OracleStateMachine(StateMachineParams.default_nucleotide())
    want = oracle.oracle_forward_probability(osm, x, y)
    assert total == pytest.approx(want, abs=1e-3)
