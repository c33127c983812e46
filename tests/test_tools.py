"""Aux tool tests: LPC metric vs a direct O(n^2) oracle (the strategy of
tests/lpcTest.c), tagFromIds round trip, tagFromPhasedVcf smoke run."""

import random
import struct

import numpy as np
import pytest

from margin_tpu.tools import lpc
from margin_tpu.tools.lpc import PhasedVariant, phasing_correctness

from conftest import reference_path


def _direct_lpc(qs, ts, decay, by_seq_dist, cross_block):
    """directLPC (lpcTest.c:106-175): O(n^2) oracle; assumes identical
    variant sites in both lists."""
    if decay == 0.0:
        n_un = n_poss = 0
        for i in range(1, len(qs)):
            ps_match = (qs[i - 1].phase_set == qs[i].phase_set
                        and ts[i - 1].phase_set == ts[i].phase_set)
            if by_seq_dist:
                continue  # handled separately in the reference; skip here
            if ps_match:
                if ((qs[i - 1].gt1 == ts[i - 1].gt1)
                        == (qs[i].gt1 == ts[i].gt1)):
                    n_un += 1
                n_poss += 1
            elif cross_block:
                n_un += 1
                n_poss += 1
        return n_un / n_poss if n_poss else float("nan"), n_poss
    numer = denom = 0.0
    for i in range(len(qs)):
        for j in range(len(qs)):
            if i == j:
                continue
            ps_match = (qs[i].phase_set == qs[j].phase_set
                        and ts[i].phase_set == ts[j].phase_set)
            if not ps_match and not cross_block:
                continue
            if by_seq_dist:
                summand = decay ** abs(qs[i].ref_pos - qs[j].ref_pos)
            else:
                summand = decay ** abs(i - j)
            denom += summand
            if (not ps_match
                    or (qs[i].gt1 == ts[i].gt1) == (qs[j].gt1 == ts[j].gt1)):
                numer += summand
    return numer / denom if denom else float("nan"), denom


def _make_variants(rng, n, n_phase_sets, error_rate):
    qs, ts = [], []
    pos = 0
    breaks = sorted(rng.sample(range(1, n), n_phase_sets - 1)) if n_phase_sets > 1 else []
    ps_idx = 0
    for i in range(n):
        if breaks and ps_idx < len(breaks) and i == breaks[ps_idx]:
            ps_idx += 1
        pos += rng.randint(1, 40)
        alleles = ["A", "C"]
        t_gt = rng.randint(0, 1)
        q_gt = t_gt if rng.random() > error_rate else 1 - t_gt
        qs.append(PhasedVariant("ref", pos, 60.0, list(alleles), q_gt, 1 - q_gt,
                                f"qps{ps_idx}"))
        ts.append(PhasedVariant("ref", pos, 60.0, list(alleles), t_gt, 1 - t_gt,
                                "tps0"))
    return qs, ts


def test_lpc_perfect_phasing_is_one():
    rng = random.Random(1)
    qs, ts = _make_variants(rng, 12, 1, 0.0)
    for decay in (0.0, 0.3, 0.7, 1.0):
        for by_dist in (False, True):
            for cross in (False, True):
                if decay == 0.0 and by_dist:
                    continue
                c, _eff = phasing_correctness(qs, ts, decay, by_dist, cross)
                assert abs(c - 1.0) < 1e-9, (decay, by_dist, cross, c)


@pytest.mark.parametrize("decay", [0.0, 0.2, 0.5, 0.9, 1.0])
@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.parametrize("by_dist", [False, True])
def test_lpc_matches_direct_oracle(decay, cross, by_dist):
    if decay == 0.0 and by_dist:
        pytest.skip("direct oracle variant not implemented for this combo")
    rng = random.Random(42)
    for trial in range(4):
        qs, ts = _make_variants(rng, 15, rng.randint(1, 4), 0.25)
        c, eff = phasing_correctness(qs, ts, decay, by_dist, cross)
        dc, deff = _direct_lpc(qs, ts, decay, by_dist, cross)
        if np.isnan(dc):
            assert np.isnan(c)
            continue
        assert abs(c - dc) < 1e-6, (trial, c, dc)
        assert abs(eff - deff) < 1e-6, (trial, eff, deff)


def test_tag_from_ids_roundtrip(tmp_path):
    from margin_tpu.io.bam import BamReader, _iter_tags
    from margin_tpu.tools.tag_from_ids import main as tag_main
    bam = reference_path("tests", "data", "realData",
                         "HG002.r94g360.chr20_59M_100k.bam")
    # tag first three read names
    with BamReader(bam) as r:
        names = []
        for rec in r:
            if rec.name not in names:
                names.append(rec.name)
            if len(names) >= 3:
                break
    tsv = tmp_path / "tags.tsv"
    tsv.write_text(f"{names[0]}\tH1\n{names[1]}\tHP:i:2\n{names[2]}\tnone\n")
    tag_main([bam, str(tsv), "-o", str(tmp_path / "tagged")])
    got = {}
    with BamReader(str(tmp_path / "tagged.haplotagged.bam")) as r:
        for rec in r:
            if rec.name in names[:2] and rec.name not in got:
                blob = rec.tags_blob()
                for tag, typ, s, e in _iter_tags(blob):
                    if tag == b"HP":
                        got[rec.name] = struct.unpack("<i", blob[s + 3:s + 7])[0]
    assert got[names[0]] == 1
    assert got[names[1]] == 2


def test_lpc_per_variant_perfect_and_flipped():
    """-p/--per-variant (calcLocalPhasingCorrectness.c:33, 324-357 +
    localPhasingCorrectness.c variantCorrectness plumbing)."""
    rng = random.Random(7)
    qs, ts = _make_variants(rng, 12, 1, 0.0)
    for decay in (0.0, 0.5, 1.0):
        vc = []
        c, _ = phasing_correctness(qs, ts, decay, False, False,
                                   variant_correctness=vc)
        assert len(vc) == len(qs)
        assert [v[0] for v in vc] == [q.ref_pos for q in qs]
        # perfect phasing: every variant fully correct (or unpaired -> 0/0)
        for v in vc:
            if v[2] != 0.0:
                assert abs(v[1] / v[2] - 1.0) < 1e-9, (decay, v)
    # flip one genotype mid-list: its column (and only the columns near it
    # at small decay) drop below 1
    flip = 6
    qs[flip].gt1, qs[flip].gt2 = qs[flip].gt2, qs[flip].gt1
    vc = []
    c, _ = phasing_correctness(qs, ts, 0.5, False, False,
                               variant_correctness=vc)
    assert c < 1.0
    ratios = [v[1] / v[2] if v[2] else float("nan") for v in vc]
    assert ratios[flip] < 1.0
    assert ratios[0] > ratios[flip]  # far-away variant barely affected
    # per-variant decomposition is consistent with the aggregate:
    # sum(correctness)/sum(max) uses post-increment values so it is an
    # upper bound on the aggregate, and both move together
    agg = sum(v[1] for v in vc) / sum(v[2] for v in vc)
    assert agg >= c - 1e-9
