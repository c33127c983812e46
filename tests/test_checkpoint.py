"""Per-chunk checkpoint/resume for the phase and polish drivers."""

import json
import os

import pytest

from margin_tpu.params import Params

from conftest import reference_path

BAM = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.bam")
FASTA = reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa")
VCF = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.vcf")


def _phase_params(tmp_path, chunk_size=40000):
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "phase",
                                  "allParams.haplotag.ont-r94g507.json"),
        "polish": {"chunkSize": chunk_size, "chunkBoundary": 2000},
    }))
    return Params.load(str(pfile))


@pytest.mark.slow
def test_phase_checkpoint_resume_identical(tmp_path, monkeypatch):
    from margin_tpu.phase import driver as phasedriver

    params = _phase_params(tmp_path)

    # reference run without checkpointing
    ref_out = phasedriver.run_phase(BAM, FASTA, VCF, params,
                                    str(tmp_path / "ref"),
                                    log=lambda *a: None)

    # first attempt: die after two chunks
    real = phasedriver.phase_one_chunk
    calls = {"n": 0}

    def dying(chunk, *a, **k):
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real(chunk, *a, **k)

    monkeypatch.setattr(phasedriver, "phase_one_chunk", dying)
    params2 = _phase_params(tmp_path)
    with pytest.raises(RuntimeError, match="simulated crash"):
        phasedriver.run_phase(BAM, FASTA, VCF, params2,
                              str(tmp_path / "ck"), checkpoint=True,
                              log=lambda *a: None)
    ckdir = str(tmp_path / "ck") + ".checkpoint"
    assert os.path.isdir(ckdir)
    assert len([f for f in os.listdir(ckdir) if f.endswith(".pkl")]) == 2

    # resume: must produce byte-identical phasing to the reference run
    monkeypatch.setattr(phasedriver, "phase_one_chunk", real)
    params3 = _phase_params(tmp_path)
    logs = []
    out = phasedriver.run_phase(BAM, FASTA, VCF, params3,
                                str(tmp_path / "ck"), checkpoint=True,
                                log=lambda *a: logs.append(" ".join(map(str, a))))
    assert any("Resumed 2 of" in l for l in logs)
    assert not os.path.isdir(ckdir)  # cleaned up on success
    assert (out.hap1_count, out.hap2_count, out.untagged_count) == \
        (ref_out.hap1_count, ref_out.hap2_count, ref_out.untagged_count)
    assert out.phased_het_count == ref_out.phased_het_count
    ref_vcf = (tmp_path / "ref.phased.vcf").read_text()
    ck_vcf = (tmp_path / "ck.phased.vcf").read_text()
    assert ref_vcf == ck_vcf


@pytest.mark.slow
def test_phase_checkpoint_stale_meta_discarded(tmp_path):
    from margin_tpu.phase import driver as phasedriver
    params = _phase_params(tmp_path)
    out1 = phasedriver.run_phase(BAM, FASTA, VCF, params,
                                 str(tmp_path / "a"),
                                 region="chr20:1000-30000",
                                 checkpoint=True, log=lambda *a: None)
    # completed run cleans up; fake a stale dir with wrong meta
    ckdir = str(tmp_path / "a") + ".checkpoint"
    os.makedirs(ckdir)
    (tmp_path / "a.checkpoint" / "meta.json").write_text('{"bam": "other"}')
    (tmp_path / "a.checkpoint" / "chunk_00000.pkl").write_text("garbage")
    logs = []
    out2 = phasedriver.run_phase(BAM, FASTA, VCF, params,
                                 str(tmp_path / "a"),
                                 region="chr20:1000-30000",
                                 checkpoint=True,
                                 log=lambda *a: logs.append(" ".join(map(str, a))))
    assert any("stale checkpoint" in l for l in logs)
    assert (out1.hap1_count, out1.hap2_count) == (out2.hap1_count,
                                                  out2.hap2_count)


@pytest.mark.slow
def test_polish_checkpoint_resume(tmp_path, monkeypatch):
    from margin_tpu.polish import driver as polishdriver

    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "polish", "ont", "r9.4",
                                  "allParams.np.human.r94-g360.json"),
        "polish": {"chunkSize": 2000, "chunkBoundary": 200},
    }))
    params = Params.load(str(pfile))
    ref_out = polishdriver.run_polish(BAM, FASTA, params,
                                      str(tmp_path / "ref"),
                                      region="chr20:1000-5000",
                                      log=lambda *a: None)

    # crash after the first chunk
    real = polishdriver.poa_realign_all
    calls = {"n": 0}

    def dying(*a, **k):
        if calls["n"] >= 1:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(polishdriver, "poa_realign_all", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "ck"),
                                region="chr20:1000-5000", checkpoint=True,
                                log=lambda *a: None)
    monkeypatch.setattr(polishdriver, "poa_realign_all", real)
    out = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "ck"),
                                  region="chr20:1000-5000", checkpoint=True,
                                  log=lambda *a: None)
    assert (tmp_path / "ref.fa").read_text() == (tmp_path / "ck.fa").read_text()
    assert ref_out.sequences == out.sequences


@pytest.mark.slow
def test_phase_shard_and_merge(tmp_path):
    """--shard I/N + merge: sharded runs into a shared checkpoint dir then
    a merge run must produce EXACTLY what a single merge-mode run (same
    per-chunk RNG scheme) produces."""
    from margin_tpu.phase import driver as phasedriver

    # ground truth: one merge-mode run computing everything itself
    params = _phase_params(tmp_path)
    ref = phasedriver.run_phase(BAM, FASTA, VCF, params,
                                str(tmp_path / "solo"), shard=("merge",),
                                log=lambda *a: None)

    # two shards then merge
    params2 = _phase_params(tmp_path)
    out0 = phasedriver.run_phase(BAM, FASTA, VCF, params2,
                                 str(tmp_path / "sh"), shard=(0, 2),
                                 log=lambda *a: None)
    assert out0.haplotagged_bam is None  # shard runs produce no outputs
    params3 = _phase_params(tmp_path)
    phasedriver.run_phase(BAM, FASTA, VCF, params3, str(tmp_path / "sh"),
                          shard=(1, 2), log=lambda *a: None)
    params4 = _phase_params(tmp_path)
    logs = []
    out = phasedriver.run_phase(BAM, FASTA, VCF, params4,
                                str(tmp_path / "sh"), shard=("merge",),
                                log=lambda *a: logs.append(" ".join(map(str, a))))
    assert any("Resumed" in l for l in logs)
    assert (out.hap1_count, out.hap2_count, out.phased_het_count) == \
        (ref.hap1_count, ref.hap2_count, ref.phased_het_count)
    assert (tmp_path / "solo.phased.vcf").read_text() == \
        (tmp_path / "sh.phased.vcf").read_text()


@pytest.mark.slow
def test_polish_shard_and_merge(tmp_path):
    from margin_tpu.polish import driver as polishdriver
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "polish", "ont", "r9.4",
                                  "allParams.np.human.r94-g360.json"),
        "polish": {"chunkSize": 2000, "chunkBoundary": 200},
    }))
    params = Params.load(str(pfile))
    ref = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "solo"),
                                  region="chr20:1000-5000",
                                  shard=("merge",), log=lambda *a: None)
    for i in range(2):
        out = polishdriver.run_polish(BAM, FASTA, params,
                                      str(tmp_path / "sh"),
                                      region="chr20:1000-5000", shard=(i, 2),
                                      log=lambda *a: None)
        assert out.fasta is None
    out = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "sh"),
                                  region="chr20:1000-5000",
                                  shard=("merge",), log=lambda *a: None)
    assert (tmp_path / "solo.fa").read_text() == \
        (tmp_path / "sh.fa").read_text()
    assert ref.sequences == out.sequences
