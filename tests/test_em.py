"""Pair-HMM EM: transition expectations + Baum-Welch iteration
(tests/pairwiseAlignerTest.c test_em / test_hmm analogue)."""

import numpy as np
import pytest

from margin_tpu.alphabet import seq_to_symbols
from margin_tpu.ops import banded, em, pairhmm
from margin_tpu.params import StateMachineParams


def _mutate(rng, seq, sub=0.1, indel=0.05):
    out = []
    for ch in seq:
        r = rng.random()
        if r < indel / 2:
            continue  # delete
        if r < indel:
            out.append("ACGT"[rng.integers(0, 4)])  # insert
        if rng.random() < sub:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def test_expectations_sum_to_transition_count():
    # the total expected transition count equals the expected path length
    # minus 1 (every path step is one transition); for two identical
    # sequences under a match-heavy model it approaches 2*L-1... but at
    # minimum the expectations must be finite, nonnegative and total > 0
    sm = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(sm)
    x = seq_to_symbols("ACGTACGTACGTACGT")
    E, total = banded.banded_expectations(tables, x, x, None, 10, 0)
    assert np.all(E >= 0) and np.isfinite(E).all()
    assert total < 0  # a log probability
    # identical sequences, match-heavy model: match->match dominates
    assert E[0, 0] > 0.8 * E.sum()
    # expected number of transitions ~ path length - 1 = 2 matches per
    # step... for a pure match path: L stays, L-1 transitions + start
    assert abs(E.sum() - (len(x) - 1)) < 2.0


def test_expectations_match_posterior_marginals():
    # sum of expectations INTO a state == sum of posterior mass of that
    # state over all cells except the start cell (every non-initial state
    # occupancy is entered by exactly one transition)
    sm = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(sm)
    x = seq_to_symbols("ACGTTGCAAC")
    y = seq_to_symbols("ACGTGCTAAC")
    E, total = banded.banded_expectations(tables, x, y, None, 10, 0)
    (matches, gapx, gapy), total2 = banded.banded_posteriors(
        tables, x, y, None, 10, 0, threshold=0.0)
    assert total == pytest.approx(total2)
    post_match = matches[:, 0].sum() / 1e7
    # start cell is the match state at (0,0) with mass 1 and no incoming
    # transition; the (0,0) cell is excluded from pair extraction already
    assert E[:, 0].sum() == pytest.approx(post_match, abs=2e-2)


def test_em_improves_likelihood():
    """test_em (pairwiseAlignerTest.c:1085-1137): iterate expectation +
    normalise from the default model; likelihood must climb."""
    rng = np.random.default_rng(7)
    pairs = []
    for _ in range(5):
        sx = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
        sy = _mutate(rng, sx)
        pairs.append((seq_to_symbols(sx), seq_to_symbols(sy)))

    sm = StateMachineParams.default_nucleotide()
    likes = []
    for _ in range(6):
        sm, like = em.em_iteration(sm, pairs, expansion=20)
        likes.append(like)
    # Baum-Welch guarantee: monotone non-decreasing likelihood (allow tiny
    # numerical slack)
    for a, b in zip(likes, likes[1:]):
        assert b >= a - 1e-6
    assert likes[-1] > likes[0]


def test_normalise_rows():
    h = em.HmmExpectations(0.0)
    h.trans = np.array([[2.0, 1.0, 1.0], [0.5, 0.5, 0.0], [1.0, 0.0, 3.0]])
    h.normalise()
    assert np.allclose(h.trans.sum(axis=1), 1.0)
    assert h.trans[0, 0] == pytest.approx(0.5)
