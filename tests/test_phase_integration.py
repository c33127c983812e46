"""End-to-end `phase` golden tests on the miniature real dataset
(HG002 r94g360 chr20:59M-59.1M), mirroring tests/marginTest.c.

Reference expectations (README.md:176-196):
  - haplotag params: 145 reads HP:1, 137 reads HP:2
  - phase_vcf params: ~105 phased het variants (1|0 / 0|1)
  - hap read sets disjoint; each hap > 2/3 the size of the other
    (marginTest.c:111, 173-178)
"""

import collections
import struct

import pytest

from margin_tpu.cli import main
from margin_tpu.io.bam import BamReader, _iter_tags

from conftest import reference_path

DATA = reference_path("tests", "data", "realData")
BAM = f"{DATA}/HG002.r94g360.chr20_59M_100k.bam"
FASTA = f"{DATA}/hg38.chr20_59M_100k.fa"
VCF = f"{DATA}/HG002.r94g360.chr20_59M_100k.vcf"


def _hp_counts(bam_path):
    counts = collections.Counter()
    names = {1: set(), 2: set()}
    with BamReader(bam_path) as r:
        for rec in r:
            blob = rec.tags_blob()
            hp = None
            for tag, typ, s, e in _iter_tags(blob):
                if tag == b"HP":
                    hp = struct.unpack("<i", blob[s + 3:s + 7])[0]
            counts[hp] += 1
            if hp in (1, 2):
                names[hp].add(rec.name)
    return counts, names


@pytest.mark.slow
def test_phase_haplotag_golden(tmp_path):
    out = str(tmp_path / "ht")
    main(["phase", BAM, FASTA,
          reference_path("params", "phase", "allParams.haplotag.ont-r94g507.json"),
          VCF, "-o", out])
    counts, names = _hp_counts(out + ".haplotagged.bam")
    # exact golden counts from README.md:176-186
    assert counts[1] == 145, counts
    assert counts[2] == 137, counts
    # marginTest.c invariants
    assert not (names[1] & names[2])
    assert len(names[1]) > 2 * len(names[2]) / 3
    assert len(names[2]) > 2 * len(names[1]) / 3


@pytest.mark.slow
def test_phase_vcf_golden(tmp_path):
    out = str(tmp_path / "pv")
    main(["phase", BAM, FASTA,
          reference_path("params", "phase", "allParams.phase_vcf.ont.json"),
          VCF, "-o", out])
    phased = 0
    cis = trans = 0
    with open(out + ".phased.vcf") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            parts = line.split("\t")
            gt = parts[9].split(":")[0]
            if gt in ("1|0", "0|1"):
                phased += 1
    # Deterministic under the default rngMode=st (bit-exact glibc rand()
    # replica). The README documents "expect 105" (README.md:188-196), but
    # replaying the reference's exact stream — validated by compiling the
    # VENDORED lp_solve with computeReadProbsByLengthAndSecondMetric
    # (htsIntegration.c:957-1011) on this chunk's 314 (spanned, length)
    # pairs and drawing glibc rand() from the unseeded default — keeps the
    # single fractional-probability read (p=0.72093, draw=0.34712,
    # stream position 252), which yields 106. lp_solve consumes no rand()
    # draws for this LP, so the stream offset is exact; the README count
    # is not reproducible from the documented configuration.
    assert phased == 106, phased
    # phaseset bed exists and has at least one set
    with open(out + ".phaseset.bed") as fh:
        lines = fh.readlines()
    assert len(lines) >= 1
    assert lines[0].startswith("chr20\t")


@pytest.mark.slow
def test_phase_vcf_chunked_cis_trans(tmp_path):
    """test_marginPhaseIntegration (marginTest.c:253-330): a CHUNKED run
    (chunkSize 20000, boundary 500) must preserve every VCF record's
    position, keep each genotype cis or trans to the input, and produce
    balanced haplotags."""
    import json
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "phase",
                                  "allParams.phase_vcf.ont.json"),
        "polish": {"chunkSize": 20000, "chunkBoundary": 500},
    }))
    out_base = str(tmp_path / "out")
    main([
        "phase", BAM, FASTA, str(pfile), VCF, "-o", out_base])

    def records(path):
        out = []
        for line in open(path):
            if line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            gt = parts[9].split(":")[0].replace("|", "/")
            a, _, b = gt.partition("/")
            out.append((parts[0], parts[1], a, b))
        return out

    orig = records(VCF)
    phased = records(out_base + ".phased.vcf")
    assert len(orig) == len(phased)
    for (c1, p1, a1, b1), (c2, p2, a2, b2) in zip(orig, phased):
        assert (c1, p1) == (c2, p2)
        assert {a1, b1} == {a2, b2}  # cis or trans (marginTest.c:230-232)

    counts, names = _hp_counts(out_base + ".haplotagged.bam")
    h1, h2 = counts[1], counts[2]
    assert h1 > 0 and h2 > 0
    assert h1 > h2 * 2 // 3 and h2 > h1 * 2 // 3  # marginTest.c:173-178
    assert not (names[1] & names[2])


@pytest.mark.slow
def test_phase_haplotag_hapdup_sync(tmp_path):
    """hapDup params enable synchronizeSupplementaryAlignments: haplotype
    per ORIGINAL read name by majority mapped length
    (synchronizeReadHaplotags, htsIntegration.c:1219-1308). On this data
    every name has one primary alignment, so counts match the plain run."""
    out_base = str(tmp_path / "hd")
    main(["phase", BAM, FASTA,
          reference_path("params", "phase",
                         "allParams.haplotag.ont-r94g507.hapDup.json"),
          VCF, "-o", out_base, "--skipPhasedVCF"])
    counts, names = _hp_counts(out_base + ".haplotagged.bam")
    assert counts[1] == 145 and counts[2] == 137
    assert not (names[1] & names[2])


@pytest.mark.slow
def test_phase_vcf_reference_byte_golden(tmp_path):
    """Byte-level diff against outputs produced by the REFERENCE binary,
    when someone has checked them in (the reference is unbuildable in this
    sandbox: its htslib/sonLib submodules are empty and there is no
    egress). Drop the reference docker's outputs into
    tests/data/reference_golden/ as phased.vcf (+ optionally
    haplotagged.bam) to activate."""
    import os

    gold_dir = os.path.join(os.path.dirname(__file__), "data",
                            "reference_golden")
    gold_vcf = os.path.join(gold_dir, "phased.vcf")
    if not os.path.exists(gold_vcf):
        pytest.skip("no reference-produced golden checked in")
    out = str(tmp_path / "ref_gold")
    main(["phase", BAM, FASTA,
          reference_path("params", "phase", "allParams.phase_vcf.ont.json"),
          VCF, "-o", out])

    def body(path):
        with open(path) as fh:
            return [ln for ln in fh if not ln.startswith("##")]

    assert body(out + ".phased.vcf") == body(gold_vcf)
    gold_bam = os.path.join(gold_dir, "haplotagged.bam")
    if os.path.exists(gold_bam):
        assert _hp_counts(out + ".haplotagged.bam") == _hp_counts(gold_bam)
