"""polisherTest.c parity: poa_augment truth table, tiny realign numeric
parity, and getShift left-shift invariants."""

import numpy as np
import pytest

from margin_tpu.ops import pairhmm
from margin_tpu.params import Params
from margin_tpu.polish.poa import Poa, PoaRead, poa_realign, _get_shift
from margin_tpu.rle import RleString

from conftest import reference_path


@pytest.fixture(scope="module")
def params():
    return Params.load(reference_path("params", "polish", "ont", "r9.4",
                                      "allParams.np.human.r94-g344.json"))


def _node_weights(node):
    return node.base_weights.tolist()


def test_poa_augment_example(params):
    """test_poa_augment_example (polisherTest.c:163-244): exact node
    weights, insert strings and delete lengths for a hand-built
    alignment of GATACGGT against GATTACA."""
    reference = RleString.identity("GATTACA")
    poa = Poa(reference, params.polish.repeat_sub_matrix.max_repeat)
    read = RleString.identity("GATACGGT")

    matches = np.array([
        [100, 0, 0], [100, 1, 1], [50, 2, 2], [50, 3, 2], [100, 4, 3],
        [100, 5, 4], [50, 6, 5], [25, 6, 6], [25, 6, 7]])
    inserts = np.array([[50, 5, 5], [25, 5, 6], [50, 6, 6], [75, 6, 7]])
    deletes = np.array([[50, 2, 1], [50, 3, 2]])

    poa.augment(read, True, 0, matches, inserts, deletes, params.polish)

    assert len(poa.nodes) == 8  # length + prefix node
    # (base, baseWeights[A,C,G,T,N], inserts [(seq, w)], deletes [(len, w)])
    truth = [
        ("N", [0, 0, 0, 0, 0], [], []),
        ("G", [0, 0, 100, 0, 0], [], []),
        ("A", [100, 0, 0, 0, 0], [], [(1, 100.0)]),
        ("T", [0, 0, 0, 50, 0], [], []),
        ("T", [0, 0, 0, 50, 0], [], []),
        ("A", [100, 0, 0, 0, 0], [], []),
        ("C", [0, 100, 0, 0, 0], [("G", 50.0), ("GG", 25.0)], []),
        ("A", [0, 0, 75, 25, 0], [("GT", 50.0), ("T", 75.0)], []),
    ]
    for node, (base, bw, ins, dels) in zip(poa.nodes, truth):
        assert node.base == base
        assert _node_weights(node) == bw
        assert [(i.insert.bases, i.weight) for i in node.inserts] == ins
        assert [(d.length, d.weight) for d in node.deletes] == dels


def test_poa_realign_tiny_example1(params):
    """test_poa_realign_tiny_example1 (polisherTest.c:246-331): exact
    insert/delete weights (LUT logAdd) for GATTACAGCG vs GATACAGCGGG."""
    reference = RleString.identity("GATACAGCGGG")
    reads = [PoaRead("read", True, RleString.identity("GATTACAGCG"), None, 10)]
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)
    poa = poa_realign(reads, None, reference, pp, tables, use_lut=True)

    PAIR1 = 10_000_000
    assert len(poa.nodes) == 12
    # single insert "T" at node 2 with weight ~0.990160
    for i, node in enumerate(poa.nodes):
        if i == 2:
            assert len(node.inserts) == 1
            assert node.inserts[0].insert.bases == "T"
            assert node.inserts[0].weight / PAIR1 == pytest.approx(0.990160,
                                                                   abs=1e-3)
        else:
            assert len(node.inserts) == 0
    # deletes of length 1 and 2 at node 8
    for i, node in enumerate(poa.nodes):
        if i == 8:
            assert [d.length for d in node.deletes] == [1, 2]
            assert node.deletes[0].weight / PAIR1 == pytest.approx(1.045831,
                                                                   abs=1e-3)
            assert node.deletes[1].weight / PAIR1 == pytest.approx(0.929195,
                                                                   abs=1e-3)
        else:
            assert len(node.deletes) == 0


def test_get_shift_invariant():
    """test_getShift (polisherTest.c:58-113): transplanting the insert at
    the shifted position reproduces str+insert."""
    rng = np.random.default_rng(11)
    for _ in range(2000):
        length = int(rng.integers(1, 20))
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, length))
        m = int(rng.integers(1, 4))
        ins = "".join("ACGT"[i] for i in rng.integers(0, 4, m))
        s_rle = RleString.encode(s)
        ins_rle = RleString.encode(ins)
        i = _get_shift(s_rle, s_rle.length, ins_rle, True)
        k = int(s_rle.counts[:i].sum())
        shifted = s[:k] + ins + s[k:]
        assert shifted == s + ins
