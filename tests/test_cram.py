"""CRAM 3.0 subsystem (io/cram.py): varints, rANS codec, BAM round-trip.

Parity: the reference accepts CRAM input via htslib sam_open
(htsIntegration.c); here a BAM->CRAM->records round trip must reproduce
every field the pipeline consumes (name/flag/pos/mapq/cigar/seq/quals/
tags), with sequences reconstructed from the reference FASTA."""

import struct

import numpy as np
import pytest

from margin_tpu.io import cram
from margin_tpu.io.bam import BamReader, _iter_tags

from conftest import reference_path

DATA = reference_path("tests", "data", "realData")
BAM = f"{DATA}/HG002.r94g360.chr20_59M_100k.bam"
FASTA = f"{DATA}/hg38.chr20_59M_100k.fa"


def test_itf8_ltf8_roundtrip():
    rng = np.random.default_rng(0)
    vals = [0, 1, 127, 128, 0x3FFF, 0x4000, 0x1FFFFF, 0xFFFFFFF,
            2**31 - 1, -1, -2] + [int(v) for v in
                                  rng.integers(0, 2**31, 50)]
    for v in vals:
        cur = cram.ByteCursor(cram.write_itf8(v))
        assert cur.itf8() == v, v
    lvals = [0, 127, 128, 2**16, 2**31, 2**40, 2**55, 2**63 - 1]
    for v in lvals:
        cur = cram.ByteCursor(cram.write_ltf8(v))
        assert cur.ltf8() == v, v


def _rans0_encode(data: bytes) -> bytes:
    """Tiny order-0 rANS 4x8 encoder (test oracle for the decoder);
    assumes no two used symbols are consecutive byte values (so the freq
    table needs no RLE)."""
    freqs = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    # normalize to 4096 with every used symbol >= 1
    used = np.nonzero(freqs)[0]
    f = np.zeros(256, dtype=np.int64)
    f[used] = np.maximum(1, (freqs[used] * 4096) // max(1, freqs.sum()))
    # fix to exactly 4096
    diff = 4096 - f.sum()
    f[used[np.argmax(freqs[used])]] += diff
    cum = np.zeros(257, dtype=np.int64)
    cum[1:] = np.cumsum(f)
    table = bytearray()
    assert not any(b - a == 1 for a, b in zip(used, used[1:]))
    for s in used:
        table.append(s)
        table += cram.write_itf8(int(f[s]))
    table.append(0)
    states = [cram._RANS_LOW] * 4
    emitted = []
    for i in range(len(data) - 1, -1, -1):
        j = i & 3
        s = data[i]
        x = states[j]
        x_max = ((cram._RANS_LOW >> 12) << 8) * int(f[s])
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[j] = ((x // int(f[s])) << 12) + (x % int(f[s])) + int(cum[s])
    body = bytes(table) + b"".join(struct.pack("<I", st) for st in states) \
        + bytes(reversed(emitted))
    return bytes([0]) + cram.write_itf8(len(body)) \
        + cram.write_itf8(len(data)) + body


def test_rans_order0_roundtrip():
    rng = np.random.default_rng(1)
    data = bytes(bytearray([b"ACGTN"[i] for i in
                            rng.integers(0, 5, 5000)]))
    enc = _rans0_encode(data)
    assert cram.rans_decode(enc, len(data)) == data


def test_freq_table_rle():
    """Consecutive-symbol RLE in the frequency table parser."""
    # symbols 10,11,12 with freqs 100,200,3796
    blob = bytearray([10]) + cram.write_itf8(100)
    blob += bytearray([11, 1]) + cram.write_itf8(200)  # 11 starts run of 1
    blob += cram.write_itf8(3796)                      # 12 implicit
    blob += bytearray([0])
    f, c = cram._read_freq_table0(cram.ByteCursor(bytes(blob)))
    assert f[10] == 100 and f[11] == 200 and f[12] == 3796
    assert c[11] == 100 and c[13] == 4096


@pytest.fixture(scope="module")
def cram_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cram") / "rt.cram")
    cram.bam_to_cram(BAM, p, FASTA)
    return p


def test_bam_cram_roundtrip_records(cram_path):
    with BamReader(BAM) as br:
        bam_recs = list(br)
    crecs = list(cram.CramReader(cram_path, FASTA))
    assert len(crecs) == len(bam_recs)
    for b, c in zip(bam_recs, crecs):
        assert c.name == b.name
        assert c.flag == b.flag
        assert c.ref_id == b.ref_id
        assert c.pos == b.pos
        assert c.mapq == b.mapq
        np.testing.assert_array_equal(c.cigar, b.cigar)
        assert c.seq() == b.seq().upper()
        bq, cq = b.quals(), c.quals()
        if bq is None:
            assert cq is None
        else:
            np.testing.assert_array_equal(cq, bq)
        # tags: same set of (tag, value-bytes)
        def tagset(rec):
            blob = rec.tags_blob()
            return {(bytes(t), bytes(blob[s:e]))
                    for t, ty, s, e in _iter_tags(blob)}
        assert tagset(c) == tagset(b)


def test_cram_header_and_fetch(cram_path):
    r = cram.CramReader(cram_path, FASTA)
    assert r.header.ref_names == BamReader(BAM).header.ref_names
    got = [rec.name for rec in r.fetch("chr20", 0, 10000)]
    want = [rec.name for rec in BamReader(BAM).fetch("chr20", 0, 10000)]
    assert got and set(got) == set(want)


def test_crai_written(cram_path):
    import gzip
    lines = gzip.open(cram_path + ".crai", "rt").read().splitlines()
    assert lines
    for ln in lines:
        parts = ln.split("\t")
        assert len(parts) == 6


@pytest.mark.slow
def test_phase_from_cram_golden(cram_path, tmp_path):
    """`margin phase` on CRAM input must produce the same outputs as BAM
    input (sam_open format transparency, htsIntegration.c)."""
    import filecmp
    from margin_tpu.cli import main
    PARAMS = reference_path("params", "phase",
                            "allParams.haplotag.ont-r94g507.json")
    VCF = f"{DATA}/HG002.r94g360.chr20_59M_100k.vcf"
    out_b = str(tmp_path / "b")
    out_c = str(tmp_path / "c")
    main(["phase", BAM, FASTA, PARAMS, VCF, "-o", out_b,
          "--logLevel", "CRITICAL"])
    main(["phase", cram_path, FASTA, PARAMS, VCF, "-o", out_c,
          "--logLevel", "CRITICAL"])
    assert filecmp.cmp(out_b + ".phased.vcf", out_c + ".phased.vcf",
                       shallow=False)

    # haplotagged BAM: identical read->HP assignment (byte identity can't
    # hold: CRAM-decoded records re-materialize bin/tag order)
    def hp_map(path):
        out = {}
        with BamReader(path) as r:
            for rec in r:
                blob = rec.tags_blob()
                hp = None
                for t, ty, s, e in _iter_tags(blob):
                    if t == b"HP":
                        hp = struct.unpack("<i", blob[s + 3:s + 7])[0]
                out[(rec.name, rec.pos, rec.flag)] = hp
        return out

    assert hp_map(out_b + ".haplotagged.bam") == \
        hp_map(out_c + ".haplotagged.bam")


def test_cram_multicontig_roundtrip(tmp_path):
    """Slices must flush at contig boundaries: a two-contig BAM keeps
    per-record ref assignment through CRAM."""
    from margin_tpu.io.bam import BamHeader, BamWriter
    from margin_tpu.io.cram import build_bam_record

    fa = tmp_path / "two.fa"
    fa.write_text(">c1\n" + "ACGT" * 25 + "\n>c2\n" + "TTGCA" * 20 + "\n")
    header = BamHeader("@SQ\tSN:c1\tLN:100\n@SQ\tSN:c2\tLN:100\n",
                       ["c1", "c2"], [100, 100])
    bam = str(tmp_path / "two.bam")
    with BamWriter(bam, header) as w:
        w.write_raw(build_bam_record("r1", 0, 0, 5, 60, [(0, 8)],
                                     b"ACGTACGT", bytes([30] * 8),
                                     b"").raw)
        w.write_raw(build_bam_record("r2", 0, 1, 10, 60, [(0, 5)],
                                     b"TTGCA", bytes([30] * 5), b"").raw)
    cram_p = str(tmp_path / "two.cram")
    cram.bam_to_cram(bam, cram_p, str(fa))
    recs = list(cram.CramReader(cram_p, str(fa)))
    assert [(r.name, r.ref_id, r.pos) for r in recs] == \
        [("r1", 0, 5), ("r2", 1, 10)]
