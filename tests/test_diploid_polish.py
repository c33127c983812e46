"""Diploid polish end-to-end on a small real-data region."""

import json

import pytest

from margin_tpu.params import Params
from margin_tpu.polish.driver import run_polish

from conftest import reference_path

BAM = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.bam")
FASTA = reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa")


@pytest.mark.slow
def test_diploid_polish_small_region(tmp_path):
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "polish", "ont", "r9.4",
                                  "allParams.np.human.r94-g360.json"),
        "polish": {"chunkSize": 3000, "chunkBoundary": 300},
    }))
    params = Params.load(str(pfile))
    out = run_polish(BAM, FASTA, params, str(tmp_path / "dip"),
                     region="chr20:2000-5000", diploid=True,
                     log=lambda *a: None)
    from test_polish import _read_fasta, _identity
    _, h1 = _read_fasta(out.hap1_fasta)
    _, h2 = _read_fasta(out.hap2_fasta)
    assert len(h1) == 1 and len(h2) == 1
    # both haplotype consensi closely match the reference slice
    from margin_tpu.io.fasta import FastaIndex
    truth = FastaIndex(FASTA).fetch("chr20", 2000, 5000).upper()
    assert _identity(h1[0], truth) > 0.95
    assert _identity(h2[0], truth) > 0.95
    # reads split into two nonempty haplotypes
    assert out.hap1_count > 0 and out.hap2_count > 0
