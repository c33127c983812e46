"""`margin polish` driver (haploid + diploid).

Parity: polish_main (polish.c:87-1014). Haploid: per chunk realign reads to
the reference with the banded device kernel, build the POA, call consensus
iteratively, re-estimate run lengths, then stitch chunk sequences into the
polished FASTA. Diploid adds bubble-graph phasing over the POA, per-hap
consensus and phased outputs.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from margin_tpu.io import bam as bamio
from margin_tpu.io.fasta import FastaIndex, write_fasta
from margin_tpu.ops import pairhmm
from margin_tpu.params import Params
from margin_tpu.phase import chunker as chunkermod
from margin_tpu.polish import bubbles_poa, repeats, stitcher
from margin_tpu.polish.poa import Poa, PoaRead, poa_realign
from margin_tpu.polish.reads import convert_to_reads_and_alignments
from margin_tpu.rle import RleString


@dataclass
class PolishOutputs:
    fasta: Optional[str] = None
    sequences: Optional[list] = None


def poa_realign_iterative(poa: Poa, reads: List[PoaRead], params: Params,
                          tables, hmm_not_realign: bool,
                          min_iterations: int, max_iterations: int,
                          use_lut: bool = False) -> Poa:
    """poa_realignIterative (poa.c:1876-1952)."""
    pp = params.polish
    score = poa.total_match_weight() - poa.total_error_weight()
    i = 0
    while i < max_iterations:
        i += 1
        if hmm_not_realign:
            reference, poa_to_consensus = poa.get_consensus(pp)
        else:
            bg = bubbles_poa.bubble_graph_from_poa(poa, reads, None, params,
                                                   tables, use_lut=use_lut)
            path = bubbles_poa.get_consensus_path(bg)
            reference, poa_to_consensus = bubbles_poa.get_consensus_string(bg, path, pp)
        if reference == poa.ref_string:
            break
        anchor_alignments = poa.get_anchor_alignments(poa_to_consensus,
                                                      len(reads), pp)
        poa2 = poa_realign(reads, anchor_alignments, reference, pp, tables,
                           use_lut=use_lut)
        if pp.useRunLengthEncoding:
            repeats.estimate_repeat_counts(poa2, reads, pp.repeat_sub_matrix)
        score2 = poa2.total_match_weight() - poa2.total_error_weight()
        if score2 <= score and i > min_iterations:
            break
        poa = poa2
        score = score2
    return poa


def poa_realign_all(reads: List[PoaRead], alignments, reference: RleString,
                    params: Params, tables, use_lut: bool = False) -> Poa:
    """poa_realignAll (poa.c:1955-1975)."""
    pp = params.polish
    poa = poa_realign(reads, alignments, reference, pp, tables, use_lut=use_lut)
    if pp.maxPoaConsensusIterations > 0:
        poa = poa_realign_iterative(poa, reads, params, tables, True,
                                    pp.minPoaConsensusIterations,
                                    pp.maxPoaConsensusIterations, use_lut)
    if pp.maxRealignmentPolishIterations > 0:
        poa = poa_realign_iterative(poa, reads, params, tables, False,
                                    pp.minRealignmentPolishIterations,
                                    pp.maxRealignmentPolishIterations, use_lut)
    return poa


def run_polish(bam_file: str, reference_fasta: str, params: Params,
               output_base: str, region: Optional[str] = None,
               diploid: bool = False, seed: int = 0, use_lut: bool = False,
               log=print) -> PolishOutputs:
    """polish_main (polish.c:87-1014), haploid path."""
    if diploid:
        raise NotImplementedError(
            "diploid polish is wired through the phase engine; "
            "see margin_tpu.polish.diploid (next milestone)")
    rng = random.Random(seed)
    t0 = time.time()
    pp = params.polish

    chunkr = chunkermod.construct_chunker(bam_file, region, None, pp,
                                          record_filtered_reads=False)
    log(f"> Built {len(chunkr.chunks)} chunks")
    fasta = FastaIndex(reference_fasta)
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)

    reader = bamio.BamReader(bam_file)
    chunk_seqs = []
    for chunk in chunkr.chunks:
        raw_ref = fasta.fetch(chunk.ref_name, chunk.chunk_overlap_start,
                              chunk.chunk_overlap_end).upper()
        rle_ref = (RleString.encode(raw_ref) if pp.useRunLengthEncoding
                   else RleString.identity(raw_ref))
        reads, alignments, _fr, _fa = convert_to_reads_and_alignments(
            chunk, rle_ref, reader, pp, keep_filtered=False)
        # downsample (polish.c:536-576, haploid uses downsampleViaReadLikelihood)
        if pp.maxDepth > 0 and reads:
            total_nt = sum(r.rle_read.length for r in reads)
            span = chunk.chunk_overlap_end - chunk.chunk_overlap_start
            avg = total_nt / span
            if avg >= pp.maxDepth:
                ratio = pp.maxDepth / avg
                kept_r, kept_a = [], []
                for r, a in zip(reads, alignments):
                    if rng.random() < ratio:
                        kept_r.append(r)
                        kept_a.append(a)
                reads, alignments = kept_r, kept_a
        poa = poa_realign_all(reads, alignments, rle_ref, params, tables, use_lut)
        if pp.useRunLengthEncoding:
            repeats.estimate_repeat_counts(poa, reads, pp.repeat_sub_matrix)
        chunk_seqs.append((chunk.ref_name, chunk.chunk_idx,
                           poa.ref_string.expand()))
        log(f"  chunk {chunk.chunk_idx}: {len(reads)} reads, "
            f"consensus {poa.ref_string.non_rle_length}bp")
    reader.close()

    sequences = stitcher.stitch_sequences(chunk_seqs, params)
    out = PolishOutputs(fasta=f"{output_base}.fa", sequences=sequences)
    write_fasta(out.fasta, sequences)
    log(f"> Wrote polished FASTA {out.fasta} in {time.time() - t0:.1f}s")
    return out
