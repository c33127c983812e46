"""Reference-test parity: vcfTest.c and chunkingTest.c truth tables on the
reference's own test data."""

import random

import pytest

from margin_tpu.io import bam as bamio
from margin_tpu.io.vcf import parse_vcf
from margin_tpu.params import Params, PolishParams
from margin_tpu.phase import chunker as chunkermod
from margin_tpu.phase import variants
from margin_tpu.polish.reads import convert_to_reads_and_alignments
from margin_tpu.rle import RleString

from conftest import reference_path

VCF1 = reference_path("tests", "data", "vcfTest", "vcfTest1.vcf")
VCF1_GZ = reference_path("tests", "data", "vcfTest", "vcfTest1.vcf.gz")
VCF2 = reference_path("tests", "data", "vcfTest", "vcfTest2.vcf")
VCF2_REF = reference_path("tests", "data", "vcfTest", "vcfTest2.ref.fa")
VCF3 = reference_path("tests", "data", "vcfTest", "vcfTest3.vcf")
CHUNK_BAM = reference_path("tests", "data", "chunkingTest", "chunkingTest.bam")


def _assert_entry(e, ref, pos, a1, a2, rle):
    assert e.ref_name == ref
    assert e.ref_pos == pos
    h1 = e.alleles[e.gt1]
    h2 = e.alleles[e.gt2]
    assert h1.expand() == a1
    assert h2.expand() == a2
    if rle:
        assert h1.length == len(RleString.encode(a1).bases)


# -- vcfTest.c ---------------------------------------------------------------

VCF1_TRUTH = [  # test_vcfParseRLE (vcfTest.c:56-79)
    (1000, "G", "A"), (2000, "T", "CCC"), (3000, "C", "A"), (4000, "T", "C"),
    (5000, "GATTACA", "A"), (6000, "T", "TC"), (250000000, "A", "G")]


@pytest.mark.parametrize("rle", [True, False])
@pytest.mark.parametrize("path", [VCF1, VCF1_GZ])
def test_vcf_parse(path, rle):
    entries = parse_vcf(path, None, use_rle=rle)["chr20"]
    assert len(entries) == 7
    for e, (pos, a1, a2) in zip(entries, VCF1_TRUTH):
        _assert_entry(e, "chr20", pos, a1, a2, rle)


def test_vcf_parse_homozygous():
    """test_vcfParseRLEHOM (vcfTest.c:129-153)."""
    entries = parse_vcf(VCF1, None, use_rle=True,
                        include_homozygous=True)["chr20"]
    assert len(entries) == 9
    _assert_entry(entries[6], "chr20", 7000, "G", "G", True)
    _assert_entry(entries[7], "chr20", 8000, "A", "A", True)


def test_vcf_parse_indel_flags():
    """test_vcfParseRLESNP (vcfTest.c:104-128): indel flags set at parse."""
    entries = parse_vcf(VCF1, None, use_rle=True)["chr20"]
    indels = [e.is_indel for e in entries]
    assert indels == [False, True, False, False, True, True, False]


# getAlleleSubstrings truth (vcfTest.c:200-322), expansion 2, POA space
SUBSTR_TRUTH = [
    (["AAA", "GAA"], 1, 4),
    (["AAAA", "AGAA"], 1, 5),
    (["TTAGA", "TTGGA"], 31, 36),
    (["CGAAC", "CGCAC", "CGGAC", "CGTAC"], 47, 52),
    (["ATGAC", "ATGCCAC"], 63, 68),
    (["CCAGA", "CCACTGGA", "CCCCCGA"], 71, 76),
    (["ACGGGAG", "ACGAG"], 79, 86),
    (["CCAGGGGA", "CCAGA", "CCAGGA"], 87, 95),
    (["CACCCAA", "CAAAA", "CAGGAAA", "CACAGAGAGAAA"], 95, 102),
    (["ATAC", "ATGC"], 125, 128),
    (["TAC", "TAA"], 126, 128),
]


def _substr_params():
    params = Params.load(reference_path("params", "base_params.json"))
    params.polish.useRunLengthEncoding = False
    params.phase.includeHomozygousVCFEntries = True
    params.phase.onlyUseSNPVCFEntries = False
    params.phase.referenceExpansionForSmallVariants = 2
    params.phase.useVariantSelectionAdaptiveSampling = False
    params.phase.minSnpVariantQuality = 0
    params.phase.minIndelVariantQuality = 0
    params.phase.minSvVariantQuality = 0
    return params


def _ref_seq(start, end):
    from margin_tpu.io.fasta import FastaIndex
    return FastaIndex(VCF2_REF).fetch("vcfTest2", start, end)


# region-window truth for [64, 128): entry 4's variant sits at the window
# edge so its context is clipped (vcfTest.c:283-310)
SUBSTR_TRUTH_64 = [
    (["GAC", "GCCAC"], 1, 4),
    (["CCAGA", "CCACTGGA", "CCCCCGA"], 7, 12),
    (["ACGGGAG", "ACGAG"], 15, 22),
    (["CCAGGGGA", "CCAGA", "CCAGGA"], 23, 31),
    (["CACCCAA", "CAAAA", "CAGGAAA", "CACAGAGAGAAA"], 31, 38),
    (["ATAC", "ATGC"], 61, 64),
    (["TAC", "TAA"], 62, 64),
]


@pytest.mark.parametrize("window", [(0, 128), (64, 128)])
def test_vcf_allele_substrings(window):
    """test_vcfAlleleSubstrings (vcfTest.c:200-322)."""
    params = _substr_params()
    vcf_map = parse_vcf(VCF2, None, use_rle=False, include_homozygous=True)
    assert len(vcf_map["vcfTest2"]) == 11
    start, end = window
    primary, _filtered = variants.get_vcf_entries_for_region(
        vcf_map, "vcfTest2", start, end, params, random.Random(0))
    ref = _ref_seq(start, end)
    truth = SUBSTR_TRUTH if start == 0 else SUBSTR_TRUTH_64
    assert len(primary) == len(truth)
    for e, (alleles, t_start, t_end) in zip(primary, truth):
        subs = variants.get_allele_substrings(e, ref, params, True)
        assert [s.expand() for s in subs] == alleles
        assert (e.ref_aln_start, e.ref_aln_stop_incl) == (t_start, t_end)


def _sampling_params(min_qual):
    params = Params.load(reference_path("params", "base_params.json"))
    params.phase.variantSelectionAdaptiveSamplingPrimaryThreshold = 30
    params.phase.minSnpVariantQuality = min_qual
    params.phase.minIndelVariantQuality = min_qual
    params.phase.minSvVariantQuality = min_qual
    params.phase.useVariantSelectionAdaptiveSampling = True
    params.phase.variantSelectionAdaptiveSamplingDesiredBasepairsPerVariant = 1000
    return params


def test_vcf_adaptive_sampling1():
    """test_vcfAdaptiveSampling1 (vcfTest.c:354-397): 8 desired variants,
    backfilled from the filtered pool in quality order (tie at qual 10
    between positions 104/105 broken randomly)."""
    vcf_map = parse_vcf(VCF3, None, use_rle=False)
    primary, _f = variants.get_vcf_entries_for_region(
        vcf_map, "vcfTest3", 0, 8000, _sampling_params(10), random.Random(0))
    poss = [e.ref_pos for e in primary]
    assert len(poss) == 8
    assert poss[:3] == [101, 102, 103]
    assert poss[3] in (104, 105)
    assert poss[4:] == [106, 107, 109, 110]


def test_vcf_adaptive_sampling2():
    """test_vcfAdaptiveSampling2 (vcfTest.c:399-434): min quality 30 keeps
    only the four >= 30."""
    vcf_map = parse_vcf(VCF3, None, use_rle=False)
    primary, _f = variants.get_vcf_entries_for_region(
        vcf_map, "vcfTest3", 0, 8000, _sampling_params(30), random.Random(0))
    assert [e.ref_pos for e in primary] == [101, 103, 106, 107]


# -- chunkingTest.c ----------------------------------------------------------

def _chunk_params(chunk_size, boundary, include_softclip=False):
    pp = PolishParams()
    pp.chunkSize = chunk_size
    pp.chunkBoundary = boundary
    pp.includeSoftClipping = include_softclip
    pp.useRunLengthEncoding = False
    return pp


def test_get_region_chunker():
    """test_getRegionChunker (chunkingTest.c:27-57)."""
    chunkr = chunkermod.construct_chunker(CHUNK_BAM, "contig_1:100000-110000",
                                          None, _chunk_params(0, 0))
    assert len(chunkr.chunks) == 1
    c = chunkr.chunks[0]
    assert (c.ref_name, c.chunk_overlap_start, c.chunk_overlap_end) == \
        ("contig_1", 100000, 100008)

    chunkr = chunkermod.construct_chunker(CHUNK_BAM, "contig_1:0-3000000",
                                          None, _chunk_params(0, 0))
    assert len(chunkr.chunks) == 1
    c = chunkr.chunks[0]
    assert (c.chunk_overlap_start, c.chunk_overlap_end) == (100000, 2100008)

    chunkr = chunkermod.construct_chunker(CHUNK_BAM, "contig_1:100000-300000",
                                          None, _chunk_params(100000, 0))
    assert len(chunkr.chunks) == 2
    assert (chunkr.chunks[0].chunk_overlap_start,
            chunkr.chunks[0].chunk_overlap_end) == (100000, 200000)
    # end pos stops at last aligned pos
    assert (chunkr.chunks[1].chunk_overlap_start,
            chunkr.chunks[1].chunk_overlap_end) == (200000, 210020)


def test_get_chunks_by_chrom():
    """test_getChunksByChrom (chunkingTest.c:59-64)."""
    chunkr = chunkermod.construct_chunker(CHUNK_BAM, None, None,
                                          _chunk_params(0, 0))
    assert len(chunkr.chunks) == 2


def test_get_chunks_by_100kb():
    """test_getChunksBy100kb (chunkingTest.c:66-74): 21 chunks on contig_1
    + 1 on contig_2."""
    chunkr = chunkermod.construct_chunker(CHUNK_BAM, None, None,
                                          _chunk_params(100000, 0))
    assert len(chunkr.chunks) == 22


def _contig2_read_counts(pp):
    chunkr = chunkermod.construct_chunker(CHUNK_BAM, None, None, pp)
    reader = bamio.BamReader(CHUNK_BAM)
    counts = []
    for chunk in chunkr.chunks:
        if chunk.ref_name != "contig_2":
            continue
        reads, _a, _f, _fa = convert_to_reads_and_alignments(
            chunk, None, reader, pp, keep_filtered=False)
        counts.append(len(reads))
    reader.close()
    return counts


def test_get_chunks_with_boundary():
    """test_getChunksWithBoundary (chunkingTest.c:148-196): chunk size 8,
    boundary 4; read membership is [overlapStart, overlapEnd)."""
    assert _contig2_read_counts(_chunk_params(8, 4)) == [3, 5, 5, 5, 3]


def test_get_chunks_without_boundary():
    """test_getChunksWithoutBoundary (chunkingTest.c:196-264)."""
    assert _contig2_read_counts(_chunk_params(8, 0)) == [2, 3, 3, 3, 2]


# assertClippingAlignmentMatchCount (chunkingTest.c:266-289): per-read
# aligned-pair counts for the soft-clip CIGAR zoo
CLIP_MATCH_COUNTS = [8, 8, 8, 4, 8, 6, 8, 8, 8, 8]


@pytest.mark.parametrize("include_softclip", [False, True])
def test_softclip_alignment_match_counts(include_softclip):
    """test_getReadsWith[out]SoftClipping (chunkingTest.c:266-335)."""
    pp = _chunk_params(100000, 0, include_softclip)
    chunkr = chunkermod.construct_chunker(CHUNK_BAM, None, None, pp)
    reader = bamio.BamReader(CHUNK_BAM)
    found = False
    for chunk in chunkr.chunks:
        if chunk.ref_name != "contig_1" or chunk.chunk_overlap_start != 200000 \
                or chunk.chunk_overlap_end != 300000:
            continue
        assert not found
        found = True
        reads, alignments, _f, _fa = convert_to_reads_and_alignments(
            chunk, None, reader, pp, keep_filtered=False)
        assert len(reads) == 10
        assert [len(a) for a in alignments] == CLIP_MATCH_COUNTS
    reader.close()
    assert found


def test_read_substrings_from_vcf():
    """test_readSubstringsFromVcf (chunkingTest.c:981-1140): per-read
    variant-window substring truth table on the MVVP data (reads ending
    at/into/past variant context boundaries, with and without soft clips)."""
    MVVP_BAM = reference_path("tests", "data", "chunkingTest",
                              "chunkingTestMVVP.bam")
    MVVP_VCF = reference_path("tests", "data", "chunkingTest",
                              "chunkingTestMVVP.vcf")
    MVVP_REF = reference_path("tests", "data", "chunkingTest",
                              "chunkingTestMVVPReference.fa")
    from margin_tpu.io.fasta import FastaIndex
    from margin_tpu.phase.readextract import extract_read_substrings_sv_aware

    params = Params.load(reference_path("params", "polish", "misc",
                                        "allParams.no_rle.json"))
    params.polish.columnAnchorTrim = 4
    params.phase.referenceExpansionForSmallVariants = 4
    params.phase.useVariantSelectionAdaptiveSampling = False
    params.phase.minSnpVariantQuality = 0
    params.phase.minIndelVariantQuality = 0

    chunkr = chunkermod.construct_chunker(MVVP_BAM, "contig_1:0-100000",
                                          None, params.polish,
                                          record_filtered_reads=True)
    assert len(chunkr.chunks) == 1
    chunk = chunkr.chunks[0]
    vcf_map = parse_vcf(MVVP_VCF, None, use_rle=False)
    primary, _f = variants.get_vcf_entries_for_region(
        vcf_map, chunk.ref_name, chunk.chunk_overlap_start,
        chunk.chunk_overlap_end, params, random.Random(0))
    chunk_ref = FastaIndex(MVVP_REF).fetch(chunk.ref_name,
                                           chunk.chunk_overlap_start,
                                           chunk.chunk_overlap_end)
    variants.update_vcf_entries_with_substrings(primary, chunk_ref, params)

    reader = bamio.BamReader(MVVP_BAM)
    reads, _filtered = extract_read_substrings_sv_aware(chunk, primary,
                                                        reader, params)
    reader.close()

    # truth: read name -> [(refPos, substring)], [] = no usable windows
    truth = {
        "read_1_extendsPastVariantBoundaries": [(17, "AAACCCGGG"), (32, "ACCCCGGGG")],
        "read_1_extendsToVariantBoundaries": [(17, "AAACCCGGG"), (32, "ACCCCGGGG")],
        "read_1_extendsPastVariantBoundariesSC": [(17, "AAACCCGGG"), (32, "ACCCCGGGG")],
        "read_1_extendsToVariantBoundariesSC": [(17, "AAACCCGGG"), (32, "ACCCCGGGG")],
        "read_1_extendsIntoVariantBoundaries": [(17, "CCCGGG"), (32, "ACCCCG")],
        "read_1_extendsIntoVariantBoundariesSC": [(17, "CCCGGG"), (32, "ACCCCG")],
        "read_1_alignsToVariantPos": [(17, "CCGGG"), (32, "ACCCC")],
        "read_1_alignsToVariantPosSC": [(17, "CCGGG"), (32, "ACCCC")],
        "read_1_onlySpanVariantBoundaries": [],
        "read_1_onlySpanVariantBoundariesSC": [],
        "read_2_extendsPastVariantBoundaries": [(49, "ACCCCCGGG"), (51, "CCCCGGGGG")],
        "read_2_extendsToVariantBoundaries": [(49, "ACCCCCGGG"), (51, "CCCCGGGGG")],
        "read_2_extendsIntoVariantBoundaries": [(49, "CCCCCGGG"), (51, "CCCCGGGG")],
        "read_2_alignsToVariantPos": [(49, "CCG"), (51, "CCG")],
        "read_2_onlySpanVariantBoundaries": [],
    }
    by_name = {r.read_name: r for r in reads}
    checked = 0
    for name, want in truth.items():
        if name not in by_name:
            assert want == [], f"{name} missing but expected substrings"
            continue
        r = by_name[name]
        got = sorted((e.ref_pos, s) for e, s in zip(r.vcf_entries, r.substrings))
        assert got == sorted(want), f"{name}: {got} != {want}"
        checked += 1
        # reads reaching the full window must match the reference allele
        # substring exactly (chunkingTest.c:1016-1022)
        if "extendsPastVariantBoundaries" in name or \
                "extendsToVariantBoundaries" in name:
            for e, s in zip(r.vcf_entries, r.substrings):
                assert s == e.allele_substrings[0].expand()
    assert checked >= 8
