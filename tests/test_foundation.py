"""Unit tests: alphabet, RLE strings, logAdd, params loading."""

import math

import numpy as np
import pytest

from margin_tpu.alphabet import (reverse_complement, seq_to_symbols,
                                 symbols_to_seq)
from margin_tpu.ops.logmath import log_add_lut, np_log_add_lut
from margin_tpu.params import Params
from margin_tpu.rle import RleString

from conftest import reference_path


def test_alphabet_roundtrip():
    s = "ACGTNacgtnX"
    syms = seq_to_symbols(s)
    assert list(syms) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]
    assert symbols_to_seq(syms) == "ACGTNACGTNN"


def test_reverse_complement():
    assert reverse_complement("ACGTN") == "NACGT"
    assert reverse_complement("GATTACA") == "TGTAATC"


def test_rle_encode_expand():
    # parity with rleString_construct (rle.c:7-38)
    r = RleString.encode("AAACCGTTTT")
    assert r.bases == "ACGT"
    assert list(r.counts) == [3, 2, 1, 4]
    assert r.non_rle_length == 10
    assert r.expand() == "AAACCGTTTT"
    r2 = RleString.identity("AAB")
    assert r2.bases == "AAB" and list(r2.counts) == [1, 1, 1]


def test_rle_maps_and_substring():
    r = RleString.encode("AAACCGTTTT")
    assert list(r.non_rle_to_rle_map()) == [0, 0, 0, 1, 1, 2, 3, 3, 3, 3]
    assert list(r.rle_to_non_rle_map()) == [0, 3, 5, 6]
    sub = r.substring(1, 2)
    assert sub.bases == "CG" and sub.non_rle_length == 3


def test_rle_rotate():
    # rle.c:157-176 semantics
    r = RleString.encode("AACCG")
    r.rotate(1, merge_ends=False)
    assert r.bases == "GAC" and list(r.counts) == [1, 2, 2]


def test_rle_qualities():
    r = RleString.encode("AAT")
    q = r.rle_qualities(np.array([10, 20, 30]))
    assert list(q) == [15, 30]


def test_log_add_lut_accuracy():
    xs = np.linspace(-50, 0, 101)
    for x in xs:
        for y in (-3.0, -10.0, x):
            exact = np.logaddexp(x, y)
            approx = float(np_log_add_lut(x, y))
            assert abs(exact - approx) < 2e-3
    # saturation + LOG_ZERO handling
    assert np_log_add_lut(-np.inf, -5.0) == -5.0
    assert np_log_add_lut(-np.inf, -np.inf) == -np.inf
    assert np_log_add_lut(0.0, -100.0) == 0.0


def test_log_add_lut_jax_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-30, 0, 256)
    y = rng.uniform(-30, 0, 256)
    jv = np.asarray(log_add_lut(x, y))
    nv = np_log_add_lut(x, y)
    np.testing.assert_allclose(jv, nv, rtol=0, atol=1e-12)


def test_load_base_params():
    p = Params.load(reference_path("params", "base_params.json"))
    # polish block (params/base_params.json)
    assert p.polish.chunkSize == 100000
    assert p.polish.chunkBoundary == 10000
    assert p.polish.maxDepth == 64
    assert not p.polish.useRunLengthEncoding
    assert p.polish.p.diagonalExpansion == 4
    assert p.polish.p.dynamicAnchorExpansion
    sm = p.polish.sm_forward
    assert sm is not None
    assert math.isclose(sm.t_match_continue, math.log(0.8))
    assert math.isclose(sm.t_gap_open_x, math.log(0.1))
    assert math.isclose(sm.t_gap_extend_x, math.log(0.5))
    assert sm.t_gap_switch_to_x == -np.inf
    assert math.isclose(sm.match_probs[0, 0], math.log(0.969))
    assert math.isclose(sm.gap_x_probs[2], math.log(1.0))
    assert math.isclose(sm.gap_y_probs[1], math.log(0.25))
    # reverse strand machine: complement-permuted
    rev = p.polish.sm_reverse
    assert math.isclose(rev.match_probs[3, 3], math.log(0.969))
    assert math.isclose(rev.match_probs[0, 1],
                        p.polish.sm_forward.match_probs[3, 2])
    # phase block
    assert p.phase.maxPartitionsInAColumn == 100
    assert p.phase.maxNotSumTransitions
    assert p.phase.referenceExpansionForSmallVariants == 12


def test_load_haplotag_params_include_chain():
    p = Params.load(reference_path("params", "phase",
                                   "allParams.haplotag.ont-r94g507.json"))
    # overrides applied on top of base
    assert p.polish.maxDepth == 32
    assert p.phase.onlyUseSNPVCFEntries
    assert p.phase.useVariantSelectionAdaptiveSampling
    assert p.phase.variantSelectionAdaptiveSamplingPrimaryThreshold == 15
    assert p.phase.minSnpVariantQuality == 10
    # base values preserved
    assert p.polish.chunkSize == 100000


def test_load_trained_polish_params_with_repeat_matrix():
    p = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                   "allParams.np.human.r94-g360.json"))
    assert p.polish.useRunLengthEncoding
    assert p.polish.useRepeatCountsInAlignment
    rm = p.polish.repeat_sub_matrix
    assert rm is not None
    assert rm.log_probs.shape == (4, 51, 51)
    # forward strand base A slot is filled
    assert np.any(rm.log_probs[0] != 0)
    # strand resolution: reverse-strand A reads the T matrix (repeatSubMatrix.c:28-31)
    assert rm.get(0, False, 5, 5) == rm.log_probs[3, 5, 5]
    # priors came from base_params include
    assert rm.base_log_probs_at.shape == (51,)
    assert rm.base_log_probs_at[1] != 0


def test_unknown_key_rejected(tmp_path):
    f = tmp_path / "bad.json"
    f.write_text('{"polish": {"noSuchKey": 1}}')
    with pytest.raises(ValueError):
        Params.load(str(f))


def test_rle_fuzz_roundtrip_and_maps():
    """Randomized RleString invariants: encode/expand roundtrip, coordinate
    maps are inverse-consistent, substrings compose."""
    import numpy as np
    from margin_tpu.rle import RleString
    rng = np.random.default_rng(31)
    for _ in range(300):
        n = int(rng.integers(1, 120))
        raw = "".join(rng.choice(list("ACGT"), p=[0.4, 0.1, 0.1, 0.4])
                      for _ in range(n))
        r = RleString.encode(raw)
        assert r.expand() == raw
        assert int(r.counts.sum()) == n
        m = r.non_rle_to_rle_map()
        back = r.rle_to_non_rle_map()
        assert len(m) == n and len(back) == r.length
        for i in range(n):
            j = int(m[i])
            assert int(back[j]) <= i < int(back[j]) + int(r.counts[j])
            assert raw[i] == r.bases[j]
        if r.length >= 2:
            s = int(rng.integers(0, r.length - 1))
            ln = int(rng.integers(1, r.length - s + 1))
            sub = r.substring(s, ln)
            assert sub.bases == r.bases[s:s + ln]
            assert np.array_equal(sub.counts, r.counts[s:s + ln])


def test_bgzf_virtual_offset_fuzz(tmp_path):
    """Random seeks by virtual offset return the bytes written there."""
    import numpy as np
    from margin_tpu.io.bgzf import BgzfReader, BgzfWriter
    rng = np.random.default_rng(37)
    blob = bytes(rng.integers(0, 256, 300_000, dtype=np.uint8))
    path = str(tmp_path / "f.bgzf")
    offsets = []
    with BgzfWriter(path) as w:
        pos = 0
        while pos < len(blob):
            step = int(rng.integers(1, 40_000))
            offsets.append((w.tell_virtual(), pos))
            w.write(blob[pos:pos + step])
            pos += step
    with BgzfReader(path) as r:
        rng.shuffle(offsets)
        for voff, pos in offsets[:40]:
            r.seek_virtual(voff)
            want = blob[pos:pos + 97]
            assert r.read(len(want)) == want
