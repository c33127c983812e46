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


@pytest.mark.slow
def test_bubble_finding_iteration_produces_vcf_entries(tmp_path):
    """produceVcfEntriesFromBubbleGraph (misc.c:259-351) + the
    bubbleFindingIterations refinement loop (polish.c:644-714)."""
    import numpy as np
    from margin_tpu.io import bam as bamio
    from margin_tpu.io.fasta import FastaIndex
    from margin_tpu.ops import pairhmm
    from margin_tpu.phase import chunker as chunkermod
    from margin_tpu.polish import diploid as diploidmod
    from margin_tpu.polish.poa import poa_realign
    from margin_tpu.polish.reads import convert_to_reads_and_alignments
    from margin_tpu.rle import RleString

    params = Params.load(reference_path(
        "params", "polish", "ont", "r9.4", "allParams.np.human.r94-g360.json"))
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)
    chunkr = chunkermod.construct_chunker(BAM, "chr20:2000-5000", None, pp,
                                          record_filtered_reads=False)
    chunk = chunkr.chunks[0]
    raw_ref = FastaIndex(FASTA).fetch(chunk.ref_name,
                                      chunk.chunk_overlap_start,
                                      chunk.chunk_overlap_end).upper()
    rle_ref = RleString.encode(raw_ref)
    reader = bamio.BamReader(BAM)
    reads, alignments, _f, _fa = convert_to_reads_and_alignments(
        chunk, rle_ref, reader, pp, keep_filtered=False)
    reader.close()
    poa = poa_realign(reads, alignments, rle_ref, pp, tables)

    bg, ref, gf, pseqs, h1, h2, _ = diploidmod.phase_poa(
        poa, reads, None, params, tables, ref_name=chunk.ref_name)
    entries = diploidmod.produce_vcf_entries_from_bubble_graph(
        chunk.ref_name, bg, gf, pseqs,
        params.phase.bubbleMinBinomialStrandLikelihood,
        params.phase.bubbleMinBinomialReadSplitLikelihood)
    # every entry is a [ref, hap1, hap2] triple phased 1|2 at a node pos
    for e in entries:
        assert len(e.alleles) == 3
        assert (e.gt1, e.gt2) == (1, 2)
        assert 0 <= e.ref_pos < len(poa.nodes)
    poss = [e.ref_pos for e in entries]
    assert poss == sorted(poss)


VCF = reference_path("tests", "data", "realData",
                     "HG002.r94g360.chr20_59M_100k.vcf")


@pytest.mark.slow
def test_diploid_polish_with_vcf(tmp_path):
    """polish --diploid -v: VCF entries drive candidate variant positions
    (polish.c:630-642, bubbleGraph_constructFromPoaAndVCF)."""
    params = Params.load(reference_path(
        "params", "polish", "ont", "r9.4", "allParams.np.human.r94-g360.json"))
    out = run_polish(BAM, FASTA, params, str(tmp_path / "dv"),
                     region="chr20:2000-5000", diploid=True, vcf_file=VCF,
                     log=lambda *a: None)
    assert out.hap1_count > 0 and out.hap2_count > 0
    from test_polish import _read_fasta, _identity
    from margin_tpu.io.fasta import FastaIndex
    _, h1 = _read_fasta(out.hap1_fasta)
    truth = FastaIndex(FASTA).fetch("chr20", 2000, 5000).upper()
    assert _identity(h1[0], truth) > 0.95


@pytest.mark.slow
def test_diploid_only_vcf_alleles(tmp_path):
    """--onlyVcfAlleles --skipOutputFasta: bubbles strictly from VCF
    alleles, haplotag-only output
    (bubbleGraph_constructFromPoaAndVCFOnlyVCFAllele)."""
    params = Params.load(reference_path("params", "polish", "misc",
                                        "allParams.no_rle.json"))
    out = run_polish(BAM, FASTA, params, str(tmp_path / "ov"),
                     region="chr20:2000-5000", diploid=True, vcf_file=VCF,
                     only_use_vcf_alleles=True, skip_output_fasta=True,
                     log=lambda *a: None)
    assert out.hap1_fasta is None and out.hap2_fasta is None
    assert out.hap1_count > 5 and out.hap2_count > 5
    import os
    assert os.path.exists(out.haplotagged_bam)


@pytest.mark.slow
def test_diploid_skip_flags(tmp_path):
    """-S/--skipFilteredReads, -R/--skipRealignment, -M/--skipHaplotypeBAM
    (polish.c:51-52, 81, 260-263, 591-601, 815-817)."""
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps({
        "include": reference_path("params", "polish", "ont", "r9.4",
                                  "allParams.np.human.r94-g360.json"),
        "polish": {"chunkSize": 3000, "chunkBoundary": 300},
    }))
    params = Params.load(str(pfile))
    out = run_polish(BAM, FASTA, params, str(tmp_path / "sk"),
                     region="chr20:2000-5000", diploid=True,
                     skip_filtered_reads=True, skip_realignment=True,
                     skip_haplotype_bam=True, log=lambda *a: None)
    # no BAM written, but both haplotype FASTAs exist and hap counts are real
    assert out.haplotagged_bam is None
    assert out.hap1_count > 0 and out.hap2_count > 0
    from test_polish import _read_fasta, _identity
    from margin_tpu.io.fasta import FastaIndex
    _, h1 = _read_fasta(out.hap1_fasta)
    _, h2 = _read_fasta(out.hap2_fasta)
    truth = FastaIndex(FASTA).fetch("chr20", 2000, 5000).upper()
    # CIGAR-only likelihoods are cruder than DP realignment but the
    # consensus should still track the reference closely
    assert _identity(h1[0], truth) > 0.9
    assert _identity(h2[0], truth) > 0.9
