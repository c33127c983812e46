"""MEA alignment, left shift, read-to-consensus alignments, MSA view, and
the runLengthMatrix tool."""

import numpy as np
import pytest

from margin_tpu.alphabet import seq_to_symbols
from margin_tpu.ops import pairhmm
from margin_tpu.params import Params, StateMachineParams
from margin_tpu.polish.alignment import (MsaView, left_shift_alignment,
                                         mea_alignment,
                                         poa_get_read_alignments_to_consensus)
from margin_tpu.polish.poa import PoaRead, poa_realign
from margin_tpu.rle import RleString

from conftest import reference_path


def test_mea_alignment_orders_pairs():
    # pairs with a crossing: MEA must pick an ordered subset
    pairs = np.array([
        [9_000_000, 0, 0],
        [9_000_000, 1, 2],
        [8_000_000, 2, 1],  # crosses the previous: cannot co-exist
        [9_000_000, 3, 3],
    ])
    empty = np.zeros((0, 3), dtype=np.int64)
    aln, score = mea_alignment(pairs, empty, empty, 5, 5, 0.5)
    xs = aln[:, 1].tolist()
    ys = aln[:, 2].tolist()
    assert xs == sorted(xs) and ys == sorted(ys)
    assert [0, 1, 3] == xs


def test_left_shift_pulls_indels_left():
    # X: AAAT, Y: AAAAT (insert of A) - aligned pairs skipping one A should
    # shift left maximally
    x = seq_to_symbols("AAAT")
    y = seq_to_symbols("AAAAT")
    aln = np.array([[1, 0, 0], [1, 1, 1], [1, 2, 3], [1, 3, 4]])
    shifted = left_shift_alignment(aln, x, y)
    # all pairs remain ordered and the gap sits at the leftmost position
    xs, ys = shifted[:, 1], shifted[:, 2]
    assert all(np.diff(xs) >= 1) and all(np.diff(ys) >= 1)


def test_read_alignments_to_consensus_roundtrip():
    rng = np.random.default_rng(5)
    params = Params.load(reference_path("params", "polish", "misc",
                                        "allParams.no_rle.json"))
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(pp.sm_forward, pp.sm_reverse)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads = []
    for i in range(4):
        # identical reads -> alignment should be the identity
        reads.append(PoaRead(f"r{i}", True, RleString.identity(ref), None, 60))
    rle_ref = RleString.identity(ref)
    poa = poa_realign(reads, None, rle_ref, pp, tables)
    alns = poa_get_read_alignments_to_consensus(poa, reads, params, tables)
    for aln in alns:
        assert len(aln) == 60
        assert np.array_equal(aln[:, 1], aln[:, 2])

    view = MsaView(rle_ref.symbols(), [r.rle_read.symbols() for r in reads],
                   alns)
    assert view.coverage(10) == 4
    assert view.max_precursor_insert_length(10) == 0


@pytest.mark.slow
def test_run_length_matrix_tool(tmp_path):
    from margin_tpu.tools.run_length_matrix import main as rlm_main
    rlm_main([
        reference_path("tests", "data", "realData",
                       "HG002.r94g360.chr20_59M_100k.bam"),
        reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa"),
        reference_path("params", "polish", "ont", "r9.4",
                       "allParams.np.human.r94-g360.json"),
        "-r", "chr20:1000-4000",
        "-o", str(tmp_path / "rlm"), "-l", "20"])
    a = (tmp_path / "rlm.run_lengths.A.tsv").read_text().splitlines()
    assert a[0].startswith("#ref_rl\tread_1")
    counts = np.array([[int(v) for v in line.split("\t")[1:]]
                       for line in a[1:]])
    assert counts.sum() > 100
    # diagonal should dominate: observed run lengths mostly match reference
    diag = sum(counts[i, i] for i in range(min(counts.shape)))
    assert diag > 0.5 * counts.sum()


def test_msa_view_truth_table():
    """test_view (viewTest.c:25-99): the GATTACA 3-read example's aligned
    coordinates, preceding inserts, and max insert lengths."""
    ref = seq_to_symbols("GATTACA")
    seqs = [seq_to_symbols(s) for s in ("TT", "GATCCACAA", "GTTACA")]

    def aln(pairs):
        return np.array([[1, x, y] for x, y in pairs], dtype=np.int64)

    alignments = [
        aln([(2, 0), (3, 1)]),
        aln([(0, 0), (1, 1), (2, 2), (4, 5), (5, 6), (6, 7)]),
        aln([(2, 1), (3, 2), (4, 3), (5, 4), (6, 5)]),
    ]
    view = MsaView(ref, seqs, alignments)

    coord_truth = [
        [-1, -1, 0, 1, -1, -1, -1],
        [0, 1, 2, -1, 5, 6, 7],
        [-1, -1, 1, 2, 3, 4, 5],
    ]
    for j in range(3):
        for i in range(7):
            assert view.seq_coordinate(i, j) == coord_truth[j][i]

    ins_len_truth = [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 2, 0, 0, 1],
        [0, 0, 1, 0, 0, 0, 0, 0],
    ]
    ins_start_truth = [
        [-1, -1, -1, -1, -1, -1, -1, -1],
        [-1, -1, -1, -1, 3, -1, -1, 8],
        [-1, -1, 0, -1, -1, -1, -1, -1],
    ]
    for j in range(3):
        for i in range(8):
            assert view.preceding_insert_length(i, j) == ins_len_truth[j][i]
            assert view.preceding_insert_start(i, j) == ins_start_truth[j][i]

    max_indels = [0, 0, 1, 0, 2, 0, 0, 1]
    for i in range(8):
        assert view.max_precursor_insert_length(i) == max_indels[i]
