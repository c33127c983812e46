"""Banded FB posterior kernel vs the numpy oracle."""

import numpy as np
import pytest

from margin_tpu.ops import banded, pairhmm
from margin_tpu.params import Params, StateMachineParams
from margin_tpu.testing import oracle

from conftest import reference_path

import jax.numpy as jnp


def _mutate(rng, x, rate=0.15):
    y = []
    for s in x:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            y.append(int(rng.integers(0, 4)))
        else:
            y.append(int(s))
        if rng.random() < rate / 3:
            y.append(int(rng.integers(0, 4)))
    return np.array(y or [0], dtype=np.uint8)


def _compare_pairs(got, expected, atol_prob=2e-4):
    exp_map = {(int(x), int(y)): p for p, x, y in expected}
    got_map = {(int(x), int(y)): int(w) / 1e7 for w, x, y in got}
    # every confidently-above-threshold pair must match in probability
    for key, p in exp_map.items():
        if p > 0.02:
            assert key in got_map, (key, p)
    for key in set(exp_map) & set(got_map):
        assert abs(exp_map[key] - got_map[key]) < atol_prob, (
            key, exp_map[key], got_map[key])


@pytest.mark.parametrize("expansion,use_anchors", [(6, False), (4, True), (20, False)])
def test_banded_posteriors_match_oracle(expansion, use_anchors):
    rng = np.random.default_rng(17 + expansion)
    smp = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(smp, dtype=jnp.float64)
    osm = oracle.OracleStateMachine(smp)
    for trial in range(4):
        x = rng.integers(0, 4, int(rng.integers(20, 60))).astype(np.uint8)
        y = _mutate(rng, x)
        anchors = []
        if use_anchors:
            # anchor roughly every 12 bases along the main diagonal
            m = min(len(x), len(y))
            anchors = [(i, i) for i in range(8, m - 4, 12)]
        em, egx, egy, etot = oracle.oracle_posteriors(
            osm, x, y, anchors=anchors, expansion=expansion)
        (gm, ggx, ggy), total = banded.banded_posteriors(
            tables, x, y, anchors, expansion, strand=0, use_lut=True)
        assert abs(total - etot) < 1e-6
        _compare_pairs(gm, em)
        _compare_pairs(ggx, egx)
        _compare_pairs(ggy, egy)


def test_banded_total_matches_dense_forward():
    """With a full-width band the banded total equals the dense kernel's."""
    rng = np.random.default_rng(3)
    smp = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(smp, dtype=jnp.float64)
    x = rng.integers(0, 4, 25).astype(np.uint8)
    y = _mutate(rng, x)
    _, total = banded.banded_posteriors(tables, x, y, [], 0, strand=0,
                                        use_lut=True)
    batch = pairhmm.make_batch([(x, y)])
    dense = float(pairhmm.forward_total(tables, batch, use_lut=True)[0])
    assert abs(total - dense) < 1e-9


def test_banded_posteriors_many_matches_single():
    """banded_posteriors_many must be numerically identical to per-item
    banded_posteriors (it backs the accelerator polish path)."""
    import numpy as np
    from margin_tpu.alphabet import seq_to_symbols
    from margin_tpu.ops import banded, pairhmm
    from margin_tpu.params import StateMachineParams

    rng = np.random.default_rng(9)
    sm = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(sm)
    items = []
    for i in range(7):
        n = int(rng.integers(5, 40))
        x = "".join("ACGT"[v] for v in rng.integers(0, 4, n))
        y = list(x)
        for j in range(len(y)):
            if rng.random() < 0.15:
                y[j] = "ACGT"[rng.integers(0, 4)]
        items.append({"x_sym": seq_to_symbols(x),
                      "y_sym": seq_to_symbols("".join(y)),
                      "anchors": [], "strand": int(rng.integers(0, 2))})
    many = banded.banded_posteriors_many(tables, items, 10, threshold=0.01)
    for it, ((m, gx, gy), total) in zip(items, many):
        (m1, gx1, gy1), total1 = banded.banded_posteriors(
            tables, it["x_sym"], it["y_sym"], it["anchors"], 10,
            it["strand"], threshold=0.01)
        assert total == pytest.approx(total1, abs=1e-9)
        assert np.array_equal(m, m1)
        assert np.array_equal(gx, gx1)
        assert np.array_equal(gy, gy1)


def test_split_points_and_split_posteriors():
    """getSplitPoints (pairwiseAligner.c:913-966) + the splitting aligner:
    huge anchor gaps split the DP; pairs in the anchored regions survive."""
    import numpy as np
    from margin_tpu.alphabet import seq_to_symbols
    from margin_tpu.ops import banded, pairhmm
    from margin_tpu.params import StateMachineParams

    # split-point geometry truth: no anchors, 5000x5000, threshold 1M
    pts = banded.get_split_points([], 5000, 5000, 1_000_000, False, False)
    # maxSequenceLength = 1000: [0,0,1000,1000] then [4000,4000,5000,5000]
    assert pts == [(0, 0, 1000, 1000), (4000, 4000, 5000, 5000)]
    # ragged right drops the trailing region after a split
    pts = banded.get_split_points([], 5000, 5000, 1_000_000, False, True)
    assert pts == [(0, 0, 1000, 1000)]
    # no split when under threshold
    pts = banded.get_split_points([], 100, 100, 1_000_000, False, False)
    assert pts == [(0, 0, 100, 100)]

    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[v] for v in rng.integers(0, 4, 4000))
    x = seq_to_symbols(seq)
    sm = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(sm)
    anchors = [(100, 100, 20), (3900, 3900, 20)]
    (m_full, _, _), _t = banded.banded_posteriors(
        tables, x, x, anchors, 20, 0, threshold=0.5)
    (m_split, _, _), _t2 = banded.banded_posteriors_split(
        tables, x, x, anchors, 20, 0, split_bigger_than=1_000_000,
        threshold=0.5)
    full_pairs = {(int(a), int(b)) for _, a, b in m_full}
    split_pairs = {(int(a), int(b)) for _, a, b in m_split}
    # the anchored head and tail regions keep their diagonal matches
    for lo, hi in ((1, 500), (3600, 3999)):
        want = {(i, i) for i in range(lo, hi)}
        assert want <= full_pairs
        assert want <= split_pairs
    # the unanchored middle is dropped by the split (the point of it)
    assert not any(1500 < a < 2500 for a, _ in split_pairs)


def test_smoothed_band_bit_identical():
    """The smoothed (always-pm1) storage track must reproduce the exact
    reference band's posteriors bit-for-bit: validity is masked to the true
    band while only the storage layout changes (see BandGeometry.build)."""
    import margin_tpu.ops.banded as B
    rng = np.random.default_rng(5)
    smp = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(smp, dtype=jnp.float64)
    for trial in range(6):
        lx = int(rng.integers(30, 120))
        ly = lx + int(rng.integers(-8, 9))
        x = rng.integers(0, 4, lx).astype(np.int32)
        y = rng.integers(0, 4, ly).astype(np.int32)
        if trial % 3 == 0:
            anchors = []
        elif trial % 3 == 1:
            anchors = [(i, min(i, ly - 1), 4)
                       for i in range(5, min(lx, ly) - 1, 12)]
        else:  # sparse anchors create band jumps > 1
            anchors = [(6, 6, 3), (min(lx, ly) - 6, min(lx, ly) - 6, 3)]

        def run(smooth):
            g0 = B.BandGeometry.build(anchors, lx, ly, 4, smooth=smooth)
            d_pad = B._bucket_dpad(g0.d_pad)
            w_pad = int(np.ceil(g0.w_pad / 8)) * 8
            g = B.BandGeometry.build(anchors, lx, ly, 4, d_pad, w_pad,
                                     smooth=smooth)
            assert not smooth or g.pm1
            xs = np.full(d_pad, 4, np.int32)
            xs[:lx] = x
            ys = np.full(d_pad, 4, np.int32)
            ys[:ly] = y
            post, tot = B._banded_fb(
                tables.match[0], tables.gap_x[0], tables.gap_y[0],
                tables.trans[0], jnp.asarray(xs), jnp.asarray(ys), lx, ly,
                jnp.asarray(g.xmy_l), jnp.asarray(g.widths),
                jnp.asarray(g.x_base), jnp.asarray(g.y_base), False, False,
                d_pad=d_pad, w_pad=w_pad, use_lut=False, pm1=g.pm1,
                k_lo=None if g.k_lo is None else jnp.asarray(g.k_lo))
            return B.extract_pairs_from_grid(np.asarray(post), g,
                                             0.01), float(tot)
        pa, ta = run(False)
        pb, tb = run(True)
        assert abs(ta - tb) < 1e-9
        for s in range(3):
            assert {(int(x1), int(y1)): int(w) for w, x1, y1 in pa[s]} == \
                {(int(x1), int(y1)): int(w) for w, x1, y1 in pb[s]}


def test_split_sub_items_match_split_path():
    """split_sub_items + banded_posteriors_many must reproduce
    banded_posteriors_split (pairwiseAligner.c:984-1040) including ragged
    sub-rectangle weights and coordinate offsets."""
    import numpy as np
    from margin_tpu.ops import banded, pairhmm
    from margin_tpu.params import StateMachineParams

    tables = pairhmm.PairHmmTables.from_params(
        StateMachineParams.default_nucleotide())
    rng = np.random.default_rng(21)
    lx = ly = 120
    x = rng.integers(0, 4, lx).astype(np.int32)
    y = rng.integers(0, 4, ly).astype(np.int32)
    # two anchor clusters with a big gap between them -> forced split
    anchors = [(int(a), int(a) + 1, 4) for a in range(5, 30, 5)] + \
              [(int(a), int(a) - 2, 4) for a in range(95, 115, 5)]
    split_at = 900  # gap rectangle ~65x65 >> 900
    item = {"x_sym": x, "y_sym": y, "anchors": anchors, "strand": 0}

    (wm, wgx, wgy), wt = banded.banded_posteriors_split(
        tables, x, y, anchors, 6, 0, split_at, threshold=0.01)

    subs, offs = banded.split_sub_items(item, split_at)
    assert len(subs) > 1
    res = banded.banded_posteriors_many(tables, subs, 6, threshold=0.01)
    parts = [[], [], []]
    total = 0.0
    for (x1, y1), ((m, gx, gy), t) in zip(offs, res):
        total += t
        for acc, arr in zip(parts, (m, gx, gy)):
            if len(arr):
                arr = arr.copy()
                arr[:, 1] += x1
                arr[:, 2] += y1
                acc.append(arr)
    got = [np.concatenate(p) if p else np.zeros((0, 3), np.int64)
           for p in parts]
    assert total == pytest.approx(wt, abs=1e-3)
    for a, b in zip(got, (wm, wgx, wgy)):
        np.testing.assert_array_equal(np.sort(a, axis=0),
                                      np.sort(b, axis=0))
