"""BAI index writing and diploid truth-sequence partitioning
(chunkTruthHaplotypes, misc.c:353-473)."""

import shutil
import struct

import pytest

from margin_tpu.io import bam as bamio
from margin_tpu.io.fasta import FastaIndex
from margin_tpu.params import Params

from conftest import reference_path

BAM = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.bam")
FASTA = reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa")

_SEQ_CODE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}


def _make_record(name: str, ref_id: int, pos: int, seq: str,
                 cigar=None) -> bytes:
    """Minimal BAM record builder (flag 0, mapq 60)."""
    cigar = cigar or [(len(seq), 0)]  # [(len, op)] with op 0 = M
    name_b = name.encode() + b"\x00"
    out = bytearray()
    out += struct.pack("<ii", ref_id, pos)
    out += struct.pack("<BBHHH", len(name_b), 60, 0, len(cigar), 0)
    out += struct.pack("<i", len(seq))
    out += struct.pack("<iii", -1, -1, 0)
    out += name_b
    for ln, op in cigar:
        out += struct.pack("<I", (ln << 4) | op)
    nib = bytearray()
    for i in range(0, len(seq), 2):
        hi = _SEQ_CODE.get(seq[i], 15) << 4
        lo = _SEQ_CODE.get(seq[i + 1], 15) if i + 1 < len(seq) else 0
        nib.append(hi | lo)
    out += bytes(nib)
    out += b"\xff" * len(seq)  # qual 255 = unavailable
    return bytes(out)


def test_build_bai_matches_shipped_index(tmp_path):
    """build_bai on the real BAM must yield identical fetch results to the
    samtools-built .bai that ships with the test data."""
    bam_copy = tmp_path / "copy.bam"
    shutil.copy(BAM, bam_copy)
    bamio.build_bai(str(bam_copy))
    for start, end in ((1000, 4000), (0, 200), (50000, 52000), (99000, 100000)):
        with bamio.BamReader(BAM) as orig, bamio.BamReader(str(bam_copy)) as mine:
            a = [(r.name, r.pos) for r in orig.fetch("chr20", start, end)]
            b = [(r.name, r.pos) for r in mine.fetch("chr20", start, end)]
        assert a == b and len(a) > 0 or (start, end) == (0, 200)


def _write_truth_bam(path, ref_name, entries, header):
    with bamio.BamWriter(str(path), header) as w:
        for name, pos, seq in entries:
            w.write_raw(_make_record(name, 0, pos, seq))
    bamio.build_bai(str(path))


@pytest.mark.slow
def test_diploid_truth_partition(tmp_path):
    """polish --diploid -u: truth contigs ride along as CTRID filtered
    reads and their haplotype assignment is written to
    <base>.truthHaplotypesPartition.tsv."""
    from margin_tpu.polish.driver import run_polish
    params = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                        "allParams.np.human.r94-g360.json"))
    # truth "assembly": the reference slice itself, as two contigs
    ref_seq = FastaIndex(FASTA).fetch("chr20", 1000, 4000).upper()
    with bamio.BamReader(BAM) as r:
        header = r.header
    truth_bam = tmp_path / "truth.bam"
    _write_truth_bam(truth_bam, "chr20",
                     [("truthA", 1000, ref_seq), ("truthB", 1000, ref_seq)],
                     header)

    out = run_polish(BAM, FASTA, params, str(tmp_path / "tp"),
                     region="chr20:1000-4000", diploid=True,
                     true_reference_bam=str(truth_bam),
                     log=lambda *a: None)
    tsv = tmp_path / "tp.truthHaplotypesPartition.tsv"
    assert tsv.exists()
    lines = tsv.read_text().splitlines()
    assert lines[0].startswith("#contig\tstartPos")
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) >= 1  # at least one truth contig was partitioned
    for row in rows:
        assert row[0] == "chr20"
        assert row[5] in ("1", "2")
        assert row[6] in ("truthA", "truthB")
    # truth reads must not leak into the haplotagged BAM counts
    assert out.hap1_count + out.hap2_count <= 60
