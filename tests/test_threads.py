"""In-process thread-pool chunk execution (phase.c:276-279 / polish.c:475-478
`omp parallel for`): a threaded run must produce byte-identical outputs to
the sequential per-chunk-RNG run (shard "merge" mode uses the same
chunk-seeded streams), at any thread count."""

import json

import pytest

from margin_tpu.params import Params

from conftest import reference_path

BAM = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.bam")
FASTA = reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa")
VCF = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.vcf")


def _phase_params(tmp_path, chunk_size=25000):
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "phase",
                                  "allParams.haplotag.ont-r94g507.json"),
        "polish": {"chunkSize": chunk_size, "chunkBoundary": 2000},
    }))
    return Params.load(str(pfile))


@pytest.mark.slow
def test_phase_threads_match_sequential(tmp_path):
    from margin_tpu.phase import driver as phasedriver

    # sequential ground truth with the same per-chunk RNG scheme
    ref = phasedriver.run_phase(BAM, FASTA, VCF, _phase_params(tmp_path),
                                str(tmp_path / "seq"), shard=("merge",),
                                log=lambda *a: None)
    out = phasedriver.run_phase(BAM, FASTA, VCF, _phase_params(tmp_path),
                                str(tmp_path / "thr"), threads=4,
                                log=lambda *a: None)
    assert (out.hap1_count, out.hap2_count, out.phased_het_count) == \
        (ref.hap1_count, ref.hap2_count, ref.phased_het_count)
    assert (tmp_path / "seq.phased.vcf").read_text() == \
        (tmp_path / "thr.phased.vcf").read_text()
    assert (tmp_path / "seq.haplotagged.bam").read_bytes() == \
        (tmp_path / "thr.haplotagged.bam").read_bytes()
    assert out.hap1_count > 0 and out.hap2_count > 0


@pytest.mark.slow
def test_polish_threads_match_sequential(tmp_path):
    from margin_tpu.polish import driver as polishdriver
    pfile = tmp_path / "pparams.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "polish", "ont", "r9.4",
                                  "allParams.np.human.r94-g360.json"),
        "polish": {"chunkSize": 2000, "chunkBoundary": 200},
    }))
    params = Params.load(str(pfile))
    ref = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "seq"),
                                  region="chr20:1000-7000",
                                  shard=("merge",), log=lambda *a: None)
    out = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "thr"),
                                  region="chr20:1000-7000", threads=3,
                                  log=lambda *a: None)
    assert ref.sequences == out.sequences
    assert (tmp_path / "seq.fa").read_text() == (tmp_path / "thr.fa").read_text()


@pytest.mark.slow
def test_polish_diploid_threads_match_sequential(tmp_path):
    from margin_tpu.polish import driver as polishdriver
    pfile = tmp_path / "dparams.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "polish", "ont", "r9.4",
                                  "allParams.np.human.r94-g360.json"),
        "polish": {"chunkSize": 3000, "chunkBoundary": 300},
    }))
    params = Params.load(str(pfile))
    ref = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "seq"),
                                  region="chr20:1000-7000", diploid=True,
                                  shard=("merge",), log=lambda *a: None)
    out = polishdriver.run_polish(BAM, FASTA, params, str(tmp_path / "thr"),
                                  region="chr20:1000-7000", diploid=True,
                                  threads=3, log=lambda *a: None)
    assert (tmp_path / "seq.hap1.fa").read_text() == \
        (tmp_path / "thr.hap1.fa").read_text()
    assert (tmp_path / "seq.hap2.fa").read_text() == \
        (tmp_path / "thr.hap2.fa").read_text()
    assert (ref.hap1_count, ref.hap2_count) == (out.hap1_count, out.hap2_count)


@pytest.mark.slow
def test_phase_process_workers_match_threads(tmp_path):
    """--workers process: CPU worker subprocesses with IPC scoring back to
    the parent must produce byte-identical outputs to -t N thread mode
    (both use the per-chunk-seeded RNG streams)."""
    from margin_tpu.cli import main

    params_json = str(tmp_path / "params.json")
    with open(params_json, "w") as fh:
        json.dump({
            "include": reference_path("params", "phase",
                                      "allParams.haplotag.ont-r94g507.json"),
            "polish": {"chunkSize": 25000, "chunkBoundary": 2000},
        }, fh)
    vcf = reference_path("tests", "data", "realData",
                         "HG002.r94g360.chr20_59M_100k.vcf")
    base_args = ["phase", BAM, FASTA, params_json, vcf,
                 "--logLevel", "CRITICAL"]
    main(base_args + ["-o", str(tmp_path / "thr"), "-t", "2"])
    main(base_args + ["-o", str(tmp_path / "proc"), "-t", "2",
                      "--workers", "process", "--profile"])
    assert (tmp_path / "thr.phased.vcf").read_bytes() == \
        (tmp_path / "proc.phased.vcf").read_bytes()
    assert (tmp_path / "thr.haplotagged.bam").read_bytes() == \
        (tmp_path / "proc.haplotagged.bam").read_bytes()
    assert not (tmp_path / "proc.checkpoint").exists()
    # the worker-side per-chunk stage timings must survive the process
    # boundary into the parent's profile (the round-3 observability hole:
    # chunk_stage_totals_s came back empty under --workers process)
    prof = json.loads((tmp_path / "proc.profile.json").read_text())
    assert prof["chunk_stage_totals_s"], prof
    assert "rphmm" in prof["chunk_stage_totals_s"]
    assert prof["n_chunks"] >= 2
    assert not list(tmp_path.glob("proc.profile.worker*.json"))


@pytest.mark.slow
def test_polish_process_workers_match_threads(tmp_path):
    """polish --workers process (polish.c:475-478's omp-for as CPU worker
    subprocesses) must write byte-identical FASTA vs -t N thread mode."""
    from margin_tpu.cli import main

    params_json = str(tmp_path / "params.json")
    with open(params_json, "w") as fh:
        json.dump({
            "include": reference_path("params", "polish", "ont", "r9.4",
                                      "allParams.np.human.r94-g344.json"),
            "polish": {"chunkSize": 3000, "chunkBoundary": 300},
        }, fh)
    base_args = ["polish", BAM, FASTA, params_json,
                 "-r", "chr20:1000-7000", "--logLevel", "CRITICAL"]
    main(base_args + ["-o", str(tmp_path / "thr"), "-t", "2"])
    main(base_args + ["-o", str(tmp_path / "proc"), "-t", "2",
                      "--workers", "process"])
    assert (tmp_path / "thr.fa").read_bytes() == \
        (tmp_path / "proc.fa").read_bytes()
    assert not (tmp_path / "proc.checkpoint").exists()
