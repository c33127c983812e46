"""Read + anchor-alignment extraction for the polish path.

Parity: convertToReadsAndAlignmentsWithFiltered (htsIntegration.c:557-891):
per chunk, crop each read to the chunk window, build (ref, read, expansion)
anchor tuples from the CIGAR matches, optionally include softclips at chunk
borders, optionally RLE the read and re-encode the alignment.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from margin_tpu.io import bam as bamio
from margin_tpu.params import PolishParams
from margin_tpu.phase.chunker import BamChunk, aligned_read_length, get_read_name
from margin_tpu.polish.poa import PoaRead
from margin_tpu.rle import RleString, run_length_encode_alignment


def convert_to_reads_and_alignments(bam_chunk: BamChunk,
                                    reference: Optional[RleString],
                                    reader: bamio.BamReader,
                                    params: PolishParams,
                                    keep_filtered: bool = True):
    """Returns (reads, alignments, filtered_reads, filtered_alignments).
    Alignments are (N, 3) int arrays of (refPos_rel, readPos, expansion) —
    RLE-space when params.useRunLengthEncoding."""
    chunk_start = bam_chunk.chunk_overlap_start
    chunk_end = bam_chunk.chunk_overlap_end
    include_softclip = params.includeSoftClipping
    ref_map = reference.non_rle_to_rle_map() if reference is not None else None

    reads: List[PoaRead] = []
    alignments: List[np.ndarray] = []
    f_reads: List[PoaRead] = []
    f_alignments: List[np.ndarray] = []

    for rec in reader.fetch(bam_chunk.ref_name, max(chunk_start - 1, 0), chunk_end):
        if rec.l_seq <= 0 or len(rec.cigar) == 0 or rec.is_unmapped:
            continue
        if not params.includeSecondaryAlignments and rec.is_secondary:
            continue
        if not params.includeSupplementaryAlignments and rec.is_supplementary:
            continue
        filtered = False
        if rec.mapq < params.filterAlignmentsWithMapQBelowThisThreshold:
            if not keep_filtered:
                continue
            filtered = True

        aln_len, start_sc, end_sc = aligned_read_length(rec)
        if aln_len <= 0:
            continue
        aln_start = rec.pos
        aln_end = aln_start + aln_len
        if aln_start >= chunk_end or aln_end <= chunk_start:
            continue

        ops = rec.cigar_ops()
        # vectorized cigar walk: per M-base ref positions + read positions
        pairs = []
        cigar_idx_seq = 0
        cigar_idx_ref = aln_start
        aligned_read_len = 0
        first_aligned_idx = -1 if aln_start < chunk_start else 0
        for op, num in ops:
            if op in (bamio.CMATCH, bamio.CEQUAL, bamio.CDIFF):
                refs = np.arange(cigar_idx_ref, cigar_idx_ref + num)
                seqs = np.arange(cigar_idx_seq, cigar_idx_seq + num)
                sel = (refs >= chunk_start) & (refs < chunk_end)
                if np.any(sel):
                    pairs.append(np.stack([refs[sel], seqs[sel]], axis=1))
                    aligned_read_len += int(sel.sum())
                if first_aligned_idx < 0 and cigar_idx_ref + num >= chunk_start:
                    # cigarIdxInSeq right after cigarIdxInRef reaches chunkStart
                    first_aligned_idx = cigar_idx_seq + max(chunk_start - cigar_idx_ref, 0)
                cigar_idx_seq += num
                cigar_idx_ref += num
            elif op in (bamio.CDEL, bamio.CREF_SKIP):
                if first_aligned_idx < 0 and cigar_idx_ref + num >= chunk_start:
                    first_aligned_idx = cigar_idx_seq
                cigar_idx_ref += num
            elif op == bamio.CINS:
                if chunk_start <= cigar_idx_ref < chunk_end:
                    aligned_read_len += num
                cigar_idx_seq += num
            # soft/hard clips: no position change in this walk
        if first_aligned_idx < 0:
            first_aligned_idx = cigar_idx_seq

        # seqCigarModification / readStartIdxInChunk (htsIntegration.c:677-802)
        seq_len = aligned_read_len
        if include_softclip:
            if aln_start < chunk_start:
                read_start_idx = first_aligned_idx + start_sc
                seq_mod = -first_aligned_idx
            elif aln_start - start_sc <= chunk_start:
                included = aln_start - chunk_start
                read_start_idx = start_sc - included
                seq_mod = included
                seq_len += included
            else:
                read_start_idx = 0
                seq_mod = start_sc
                seq_len += start_sc
        else:
            read_start_idx = first_aligned_idx + start_sc if aln_start < chunk_start \
                else start_sc
            seq_mod = -first_aligned_idx if aln_start < chunk_start else 0

        read_end_idx = read_start_idx + seq_len
        if aln_end < chunk_end and include_softclip:
            if aln_end + end_sc <= chunk_end:
                read_end_idx += end_sc
                seq_len += end_sc
            else:
                included = chunk_end - aln_end
                seq_len += included
                read_end_idx += included

        if not pairs or seq_len == 0:
            continue
        aln_pairs = np.concatenate(pairs)
        # to chunk-relative ref coords and extracted-seq read coords
        aln_arr = np.zeros((len(aln_pairs), 3), dtype=np.int64)
        aln_arr[:, 0] = aln_pairs[:, 0] - chunk_start
        aln_arr[:, 1] = aln_pairs[:, 1] + (start_sc - read_start_idx)
        aln_arr[:, 2] = params.p.diagonalExpansion

        seq = rec.seq()[read_start_idx:read_end_idx]
        quals = rec.quals()
        q = None if quals is None else quals[read_start_idx:read_end_idx]

        name = get_read_name(rec, bam_chunk.ref_name)
        if params.useRunLengthEncoding:
            rle = RleString.encode(seq)
            rle_q = None if q is None else rle.rle_qualities(q)
            read = PoaRead(name, not rec.is_reverse, rle, rle_q, len(rec.raw))
            if ref_map is not None:
                read_map = rle.non_rle_to_rle_map()
                aln_arr = run_length_encode_alignment(aln_arr, ref_map, read_map)
        else:
            rle = RleString.identity(seq)
            read = PoaRead(name, not rec.is_reverse, rle, q, len(rec.raw))
        (f_reads if filtered else reads).append(read)
        (f_alignments if filtered else alignments).append(aln_arr)

    return reads, alignments, f_reads, f_alignments
