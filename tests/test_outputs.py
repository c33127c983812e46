"""Supplementary polish outputs: POA CSV/DOT, repeat-count CSV, phased CSV,
partition CSV, phasing-state JSON."""

import json

import numpy as np
import pytest

from margin_tpu.ops import pairhmm
from margin_tpu.params import Params
from margin_tpu.polish import outputs
from margin_tpu.polish.poa import PoaRead, poa_realign
from margin_tpu.rle import RleString

from conftest import reference_path


@pytest.fixture(scope="module")
def setup():
    params = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                        "allParams.np.human.r94-g360.json"))
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)
    raw = "ACGTTTACGGACTTACAGGTCCA"
    reads = [PoaRead(f"r{i}", i % 2 == 0, RleString.encode(raw), None,
                     len(raw)) for i in range(4)]
    poa = poa_realign(reads, None, RleString.encode(raw), pp, tables)
    return params, poa, reads


def test_poa_csv(setup, tmp_path):
    params, poa, reads = setup
    path = tmp_path / "poa.csv"
    with open(path, "w") as fh:
        outputs.poa_print_csv(poa, fh, reads,
                              params.polish.repeat_sub_matrix, 5)
    lines = path.read_text().splitlines()
    header = lines[0].split(",")
    assert header[:5] == ["REF_INDEX", "REF_BASE", "REPEAT_COUNT",
                          "TOTAL_WEIGHT", "FRACTION_POS_STRAND"]
    assert "PROB_REPEAT_COUNT_1" in header
    assert header[-2:] == ["INSERTS", "DELETES"]
    assert len(lines) == 1 + len(poa.nodes)
    # node rows: half the reads are forward -> pos strand fraction ~0.5
    row1 = lines[2].split(",")
    assert abs(float(row1[4]) - 0.5) < 0.2
    # repeat-count probability columns are normalized per row
    rc_start = 5 + 10
    n_rc = params.polish.repeat_sub_matrix.max_repeat - 1
    probs = [float(v) for v in row1[rc_start:rc_start + n_rc]]
    assert abs(sum(probs) - 1.0) < 1e-3


def test_repeat_counts_csv(setup, tmp_path):
    _params, poa, reads = setup
    path = tmp_path / "rc.csv"
    with open(path, "w") as fh:
        outputs.poa_print_repeat_counts_csv(poa, fh, reads)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("REF_INDEX,REF_BASE")
    # every row has per-observation (base strand count, weight) pairs
    row = lines[2].split(",")
    assert len(row) >= 2 + 2 * 4  # 4 reads, 2 fields each


def test_poa_dot(setup, tmp_path):
    _params, poa, reads = setup
    path = tmp_path / "poa.dot"
    with open(path, "w") as fh:
        outputs.poa_print_dot(poa, fh, reads)
    text = path.read_text()
    assert text.startswith("digraph poa {")
    assert text.rstrip().endswith("}")
    assert f"B0 -> B1" in text
    assert text.count("[label=") >= len(poa.nodes)


def test_phased_csv(setup, tmp_path):
    params, poa, reads = setup
    hap1_ids = {id(r) for r in reads[:2]}
    hap2_ids = {id(r) for r in reads[2:]}
    path = tmp_path / "phased.csv"
    with open(path, "w") as fh:
        outputs.poa_print_phased_csv(poa, fh, reads, hap1_ids, hap2_ids,
                                     params.polish.repeat_sub_matrix, 5)
    lines = path.read_text().splitlines()
    assert "FRACTION_HAP1_WEIGHT" in lines[0]
    assert "PROB_HAP1_REPEAT_COUNT_1" in lines[0]
    assert "PROB_HAP2_REPEAT_COUNT_1" in lines[0]
    row = lines[2].split(",")
    # haps split the weight roughly evenly
    assert abs(float(row[4]) - 0.5) < 0.2
    assert abs(float(row[5]) - 0.5) < 0.2


def test_partition_csv(tmp_path):
    path = tmp_path / "readIds.csv"
    with open(path, "w") as fh:
        outputs.write_partition_csv(fh, {"readA": 30.0, "readB": 0.5,
                                         "readC": 12.0}, 1.0)
    lines = path.read_text().splitlines()
    assert lines[0] == "READ_NAME,PHRED_SCORE_OF_BEING_IN_PARTITION"
    names = [l.split(",")[0] for l in lines[1:]]
    assert names == ["readA", "readC"]  # readB below min phred


def test_phased_read_info_json(setup, tmp_path):
    _params, poa, reads = setup

    class FakeChunk:
        chunk_overlap_start = 100

    alns = [np.array([[5, 0, 0], [15, 15, 0]]) for _ in reads]
    rle_map = poa.ref_string.rle_to_non_rle_map()
    path = tmp_path / "info.json"
    with open(path, "w") as fh:
        fh.write("{\n \"primary\": []")
        outputs.write_phased_read_info_json(
            FakeChunk(), reads, alns, [], [], {id(reads[0])},
            {id(reads[1])}, rle_map, fh)
        fh.write("\n}\n")
    data = json.loads(path.read_text())
    assert len(data["reads"]) == 4
    assert data["reads"][0]["hap"] == 1
    assert data["reads"][1]["hap"] == 2
    assert data["reads"][2]["hap"] == 0
    assert data["reads"][0]["startPos"] == 100 + int(rle_map[5])


@pytest.mark.slow
def test_diploid_supplemental_outputs(tmp_path):
    from margin_tpu.polish.driver import run_polish
    params = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                        "allParams.np.human.r94-g360.json"))
    out_base = str(tmp_path / "dip")
    run_polish(
        reference_path("tests", "data", "realData",
                       "HG002.r94g360.chr20_59M_100k.bam"),
        reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa"),
        params, out_base, region="chr20:1000-4000", diploid=True,
        output_poa_csv=True, output_repeat_counts=True,
        output_haplotype_reads=True, output_phasing_state=True,
        log=lambda *a: None)
    files = sorted(p.name for p in tmp_path.iterdir())
    assert any(".poa.C00000." in f and f.endswith(".hap1.csv") for f in files)
    assert any(".poa.C00000." in f and f.endswith(".hap2.csv") for f in files)
    assert any(".repeatCount.C00000." in f and ".hap1" in f for f in files)
    assert any(".readIds.C00000." in f and ".hap1" in f for f in files)
    json_files = [f for f in files if f.endswith(".phasingInfo.json")]
    assert json_files
    data = json.loads((tmp_path / json_files[0]).read_text())
    assert "primary" in data and "reads" in data
    assert len(data["reads"]) > 0
    haps = {r["hap"] for r in data["reads"]}
    assert haps <= {0, 1, 2} and len(haps) > 1
    if data["primary"]:
        b = data["primary"][0]
        assert {"refPos", "rleRefPos", "strandSkew", "reads"} <= set(b)
