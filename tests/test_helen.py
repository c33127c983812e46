"""HELEN feature export: index coverage, feature accumulation semantics,
truth labeling, HDF5 window math, and end-to-end HDF5 output
(tests/featureTest.c analogue)."""

import numpy as np
import pytest

from margin_tpu.ops import pairhmm
from margin_tpu.params import Params
from margin_tpu.polish import helen
from margin_tpu.polish.poa import PoaRead, poa_realign
from margin_tpu.rle import RleString

from conftest import reference_path


def test_simple_weight_index_coverage():
    # test_simpleWeightIndex (featureTest.c:127-157): every (symbol, strand)
    # plus gap hits a distinct slot in [0, 10)
    seen = set()
    for sym in range(4):
        for fwd in (True, False):
            idx = helen.simple_char_index(sym, fwd)
            assert 0 <= idx < helen.SIMPLE_WEIGHT_TOTAL_SIZE
            seen.add(idx)
    for fwd in (True, False):
        idx = helen.simple_gap_index(fwd)
        assert 0 <= idx < helen.SIMPLE_WEIGHT_TOTAL_SIZE
        seen.add(idx)
    assert len(seen) == helen.SIMPLE_WEIGHT_TOTAL_SIZE
    # forward strand takes the odd lane (POS_STRAND_IDX == 1, margin.h:126)
    assert helen.simple_char_index(0, True) == 1
    assert helen.simple_char_index(0, False) == 0


def test_split_rle_weight_index_coverage():
    # test_splitRleWeightIndex (featureTest.c:159-194)
    max_rl = 10
    size = helen.split_total_size(max_rl)
    seen = set()
    for sym in range(4):
        for rl in range(max_rl + 1):
            for fwd in (True, False):
                idx = helen.split_char_index(max_rl, sym, rl, fwd)
                assert 0 <= idx < size
                seen.add(idx)
    for fwd in (True, False):
        idx = helen.split_gap_index(max_rl, fwd)
        assert 0 <= idx < size
        seen.add(idx)
    assert len(seen) == size


def test_channel_rle_weight_index_coverage():
    # test_channelRleWeightIndex (featureTest.c:196-230)
    max_rl = 10
    nucl_seen = set()
    for sym in range(4):
        for fwd in (True, False):
            nucl_seen.add(helen.channel_nucl_index(sym, fwd))
    for fwd in (True, False):
        nucl_seen.add(helen.channel_gap_nucl_index(fwd))
    assert len(nucl_seen) == 10
    rl_seen = set()
    for sym in range(4):
        for rl in range(max_rl + 1):
            for fwd in (True, False):
                rl_seen.add(helen.channel_rl_index(max_rl, sym, rl, fwd))
    assert len(rl_seen) == 4 * (max_rl + 1) * 2


@pytest.fixture(scope="module")
def rle_setup():
    params = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                        "allParams.np.human.r94-g360.json"))
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)
    return params, tables


def _identical_read_poa(rle_setup, raw, n_reads=4, forward=True):
    params, tables = rle_setup
    pp = params.polish
    reads = [PoaRead(f"r{i}", forward, RleString.encode(raw), None, len(raw))
             for i in range(n_reads)]
    rle_ref = RleString.encode(raw)
    poa = poa_realign(reads, None, rle_ref, pp, tables)
    return poa, reads


def test_split_features_identical_reads(rle_setup):
    raw = "ACGTTTACGGACTTACA"
    poa, reads = _identical_read_poa(rle_setup, raw)
    max_rl = 10
    features = helen.get_split_rle_weight_features(poa, reads, max_rl)
    assert len(features) == len(poa.nodes) - 1
    rle = RleString.encode(raw)
    from margin_tpu.alphabet import seq_to_symbols
    for i, f in enumerate(features):
        assert f.ref_position == i and f.insert_position == 0
        assert f.next_insert is None  # identical reads: no inserts
        # all weight should be on (ref symbol, ref run length, forward)
        sym = int(seq_to_symbols(rle.bases[i])[0])
        rl = int(rle.counts[i])
        idx = helen.split_char_index(max_rl, sym, rl, True)
        w = f.weights.copy()
        assert w[idx] > 0
        w[idx] = 0
        assert np.all(w == 0)


def test_split_features_long_run_chains_levels(rle_setup):
    # run of 25 T's with maxRL 10 must produce run-length levels 10/10/5
    raw = "ACG" + "T" * 25 + "GCA"
    poa, reads = _identical_read_poa(rle_setup, raw)
    max_rl = 10
    features = helen.get_split_rle_weight_features(poa, reads, max_rl)
    rle = RleString.encode(raw)
    t_idx = [i for i in range(rle.length) if rle.bases[i] == "T"
             and rle.counts[i] == 25]
    assert len(t_idx) == 1
    f0 = features[t_idx[0]]
    f1 = f0.next_run_length
    assert f1 is not None and f1.run_length_position == 1
    f2 = f1.next_run_length
    assert f2 is not None and f2.run_length_position == 2
    assert f2.next_run_length is None
    sym_t = 3
    assert f0.weights[helen.split_char_index(max_rl, sym_t, 10, True)] > 0
    assert f1.weights[helen.split_char_index(max_rl, sym_t, 10, True)] > 0
    assert f2.weights[helen.split_char_index(max_rl, sym_t, 5, True)] > 0


def test_simple_features_strand_split(rle_setup):
    params, tables = rle_setup
    pp = params.polish
    raw = "ACGTACGTACGTACGT"
    # identity (non-RLE) reads: simpleWeight is defined for non-RLE params,
    # but generation itself only needs the POA
    reads = [PoaRead("f0", True, RleString.identity(raw), None, len(raw)),
             PoaRead("r0", False, RleString.identity(raw), None, len(raw))]
    poa = poa_realign(reads, None, RleString.identity(raw), pp, tables)
    features = helen.get_simple_weight_features(poa, reads)
    from margin_tpu.alphabet import seq_to_symbols
    for i, f in enumerate(features):
        sym = int(seq_to_symbols(raw[i])[0])
        assert f.weights[helen.simple_char_index(sym, True)] > 0
        assert f.weights[helen.simple_char_index(sym, False)] > 0


def test_annotate_with_truth_match_insert_delete():
    max_rl = 10
    # 4 consensus positions; truth has an extra base between 1 and 2
    # (truth insert) and consensus position 3 is absent from truth (delete)
    features = [helen.SplitRleWeightFeature(i, 0, 0, max_rl)
                for i in range(4)]
    truth = RleString.from_precomputed("ACGT", np.array([1, 2, 1, 1]))
    # pairs: (consensusPos, truthPos, weight)
    pairs = [(0, 0, 90), (1, 1, 90), (2, 3, 90)]
    first, last = helen.annotate_features_with_truth(features, "split",
                                                     pairs, truth)
    assert (first, last) == (0, 2)
    assert features[0].label_char == "A" and features[0].label_run_length == 1
    assert features[1].label_char == "C" and features[1].label_run_length == 2
    # truth pos 2 ('G') is an insert consumed at feature 2 before the match
    # at truth pos 3; the reference assigns the insert label first, then
    # overwrites on the same feature via the match branch
    assert features[2].label_char == "T"
    # feature 3 has no pair: everything past the last align is gap
    assert features[3].label_char == "_"
    assert features[3].label_run_length == 0


def test_annotate_truth_run_length_spread():
    max_rl = 10
    f = helen.SplitRleWeightFeature(0, 0, 0, max_rl)
    f.next_run_length = helen.SplitRleWeightFeature(0, 0, 1, max_rl)
    truth = RleString.from_precomputed("A", np.array([14]))
    helen.annotate_features_with_truth([f], "split", [(0, 0, 90)], truth)
    assert f.label_run_length == 10
    assert f.next_run_length.label_run_length == 4


def test_h5_window_math():
    # helenFeatures.c:2132-2146: overlapping exactly-1000-row windows
    starts, size = helen._h5_windows(999)
    assert starts == [0] and size == 999
    starts, size = helen._h5_windows(1000)
    assert starts == [0] and size == 1000
    starts, size = helen._h5_windows(2500)
    # files=3, offset=(3000-2500)//2=250 -> starts 0, 750, then last=1500
    assert starts == [0, 750, 1500] and size == 1000
    starts, size = helen._h5_windows(1001)
    # files=2, offset=(2000-1001)//1=999 -> starts 0, then last=1
    assert starts == [0, 1] and size == 1000


def test_weight_normalization():
    # convertTotalWeightToUInt8 (helenFeatures.c:2009-2016)
    from margin_tpu.polish.poa import PAIR1
    assert helen.total_weight_to_uint8(0.0) == 0
    assert helen.total_weight_to_uint8(256.0 * PAIR1) == 254
    assert helen.total_weight_to_uint8(1000.0 * PAIR1) == 254  # capped
    assert helen.total_weight_to_uint8(128.0 * PAIR1) == 127
    assert helen.normalize_weight_to_uint8(100.0, 50.0) == 127
    assert helen.normalize_weight_to_uint8(0.0, 0.0) == 0


@pytest.mark.slow
def test_helen_end_to_end_h5(tmp_path, rle_setup):
    import h5py
    from margin_tpu.polish.driver import run_polish
    params, _tables = rle_setup
    out_base = str(tmp_path / "helen")
    run_polish(
        reference_path("tests", "data", "realData",
                       "HG002.r94g360.chr20_59M_100k.bam"),
        reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa"),
        params, out_base, region="chr20:1000-6000",
        feature_type="splitRleWeight", log=lambda *a: None)
    h5_path = out_base + ".T00.h5"
    with h5py.File(h5_path, "r") as fh:
        assert "images" in fh
        groups = list(fh["images"].keys())
        assert len(groups) > 0
        g = fh["images"][groups[0]]
        for key in ("contig", "contig_start", "contig_end",
                    "feature_chunk_idx", "position", "normalization",
                    "image"):
            assert key in g, key
        n = g["position"].shape[0]
        assert g["position"].shape == (n, 3)
        assert g["image"].shape == (n, helen.split_total_size(10))
        assert g["image"].dtype == np.uint8
        assert g["normalization"].shape == (n, 1)
        assert g["contig"][0].decode().startswith("chr20")
        # image rows are normalized: max value <= 254, most rows nonzero
        img = g["image"][:]
        assert img.max() <= 254
        assert (img.sum(axis=1) > 0).mean() > 0.9
        # positions are sorted by (ref, insert, rl-level)
        pos = g["position"][:]
        assert np.all(np.diff(pos[:, 0].astype(np.int64)) >= 0)
