"""Diploid polish: bubble-graph phasing over the POA, per-haplotype POA
rebuild, phased repeat counts, filtered-read partitioning.

Parity: polish_main diploid branch (polish.c:620-863),
getPaddedHaplotypeString (misc.c:100-111), bubbleGraph_getNewPoa
(bubbleGraph.c:2803-2823), bubbleGraph_partitionFilteredReads
(bubbleGraph.c:1500-...).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from margin_tpu.ops import pairhmm
from margin_tpu.params import Params
from margin_tpu.phase import phasing as phase_engine
from margin_tpu.phase.bubbles import BubbleGraph
from margin_tpu.phase.fragment import GenomeFragment
from margin_tpu.polish import bubbles_poa, repeats
from margin_tpu.polish.poa import Poa, PoaRead, poa_realign
from margin_tpu.rle import RleString


def get_padded_haplotype_string(hap: np.ndarray, gf: GenomeFragment,
                                bg: BubbleGraph) -> np.ndarray:
    """getPaddedHaplotypeString (misc.c:100-111): consensus path with the
    genome fragment's haplotype alleles substituted over its span."""
    padded = bubbles_poa.get_consensus_path(bg)
    padded[gf.ref_start:gf.ref_start + gf.length] = hap
    return padded


def bubble_graph_get_new_poa(bg: BubbleGraph, consensus_path: np.ndarray,
                             poa: Poa, reads: List[PoaRead], params: Params,
                             tables, use_lut: bool = False) -> Poa:
    """bubbleGraph_getNewPoa (bubbleGraph.c:2803-2823)."""
    consensus, poa_to_consensus = bubbles_poa.get_consensus_string(
        bg, consensus_path, params.polish)
    anchor_alignments = poa.get_anchor_alignments(poa_to_consensus, len(reads),
                                                  params.polish)
    return poa_realign(reads, anchor_alignments, consensus, params.polish,
                       tables, use_lut=use_lut)


def phase_poa(poa: Poa, reads: List[PoaRead], chunk_vcf_entries,
              params: Params, tables, ref_name: str = "ref",
              use_lut: bool = False):
    """The diploid bubble-finding + phasing step (polish.c:644-712, single
    iteration). Returns (bg, ref, gf, pseqs, hap1_ids, hap2_ids) where the
    id sets are id(PoaRead)."""
    bg = bubbles_poa.bubble_graph_from_poa(poa, reads, chunk_vcf_entries,
                                           params, tables, phasing=True,
                                           use_lut=use_lut)
    ref = phase_engine.get_reference(bg, ref_name, params)
    gf, pseqs = phase_engine.phase_bubble_graph(bg, ref, reads, params)
    hap1_ids, hap2_ids, phreds = phase_engine.phase_bam_chunk_reads(
        gf, pseqs, reads, params)
    return bg, ref, gf, pseqs, hap1_ids, hap2_ids, phreds


def partition_filtered_reads_poa(filtered_poa: Poa,
                                 filtered_reads: List[PoaRead],
                                 gf: GenomeFragment, bg: BubbleGraph,
                                 hap1_ids: Set[int], hap2_ids: Set[int],
                                 params: Params, tables,
                                 use_lut: bool = False):
    """bubbleGraph_partitionFilteredReads (bubbleGraph.c:1500-...): score
    filtered reads against the phased haplotype alleles at het bubbles."""
    scores1 = {id(r): 0.0 for r in filtered_reads}
    scores2 = {id(r): 0.0 for r in filtered_reads}
    pp = params.polish
    groups = []
    for i in range(gf.length):
        b = bg.bubbles[gf.ref_start + i]
        a1 = int(gf.haplotype_string1[i])
        a2 = int(gf.haplotype_string2[i])
        if a1 == a2:
            continue
        subs = bubbles_poa.get_read_substrings(
            filtered_reads, filtered_poa, b.ref_start,
            b.ref_start + b.bubble_length + 1, pp, should_filter=False)
        if not subs:
            continue
        groups.append((b.alleles[a1], b.alleles[a2], subs))
    for (_, _, subs), supports in zip(
            groups, phase_engine.score_het_groups(groups, params, tables, use_lut)):
        for rs, (sa, sb) in zip(subs, supports.astype(np.float64)):
            tot = np.logaddexp(sa, sb)
            scores1[id(rs.read)] += sa - tot
            scores2[id(rs.read)] += sb - tot
    for r in filtered_reads:
        s1, s2 = scores1[id(r)], scores2[id(r)]
        if s1 > s2:
            hap1_ids.add(id(r))
        elif s2 > s1:
            hap2_ids.add(id(r))


def diploid_chunk(poa: Poa, reads: List[PoaRead],
                  filtered_reads: List[PoaRead],
                  filtered_alignments, rle_reference: RleString,
                  chunk_vcf_entries, params: Params, tables,
                  ref_name: str = "ref", use_lut: bool = False,
                  collect: dict = None):
    """One chunk of the diploid polish path. Returns
    (hap1_consensus, hap2_consensus, hap1_names, hap2_names, gf).
    If `collect` is a dict, internal state needed for supplementary
    outputs (hap POAs, hap id sets, bubble graph) is stashed in it."""
    pp = params.polish
    bg, ref, gf, pseqs, hap1_ids, hap2_ids, phreds = phase_poa(
        poa, reads, chunk_vcf_entries, params, tables, ref_name, use_lut)

    hap1_path = get_padded_haplotype_string(
        gf.haplotype_string1[:gf.length], gf, bg)
    hap2_path = get_padded_haplotype_string(
        gf.haplotype_string2[:gf.length], gf, bg)

    poa_hap1 = bubble_graph_get_new_poa(bg, hap1_path, poa, reads, params,
                                        tables, use_lut)
    poa_hap2 = bubble_graph_get_new_poa(bg, hap2_path, poa, reads, params,
                                        tables, use_lut)

    if pp.useRunLengthEncoding and pp.repeat_sub_matrix is not None:
        repeats.estimate_phased_repeat_counts(poa_hap1, reads,
                                              pp.repeat_sub_matrix, hap1_ids, pp)
        repeats.estimate_phased_repeat_counts(poa_hap2, reads,
                                              pp.repeat_sub_matrix, hap2_ids, pp)

    # unassigned primary reads join the filtered pool (polish.c:762-770)
    extra = [(r, None) for r in reads
             if id(r) not in hap1_ids and id(r) not in hap2_ids]
    all_filtered = list(filtered_reads) + [r for r, _ in extra]
    if all_filtered:
        filtered_poa = poa_realign(all_filtered, None, rle_reference, pp,
                                   tables, use_lut=use_lut)
        partition_filtered_reads_poa(filtered_poa, all_filtered, gf, bg,
                                     hap1_ids, hap2_ids, params, tables, use_lut)

    hap1_names = {r.read_name for r in reads + all_filtered if id(r) in hap1_ids}
    hap2_names = {r.read_name for r in reads + all_filtered if id(r) in hap2_ids}
    if collect is not None:
        collect.update(poa_hap1=poa_hap1, poa_hap2=poa_hap2, bg=bg, gf=gf,
                       hap1_ids=hap1_ids, hap2_ids=hap2_ids,
                       all_filtered=all_filtered)
    return (poa_hap1.ref_string.expand(), poa_hap2.ref_string.expand(),
            hap1_names, hap2_names, gf, phreds,
            {id(r): r.read_name for r in reads})
