"""Unit tests for phase pipeline components: chunker geometry, downsampling
knapsack, stitching vote, rphmm primitives, BAM/BGZF round trip."""

import numpy as np
import pytest

from margin_tpu.io.bgzf import BgzfReader, BgzfWriter
from margin_tpu.params import Params, PhaseParams
from margin_tpu.phase.bubbles import ProfileSeq, Reference, Site
from margin_tpu.phase.downsample import knapsack_probs
from margin_tpu.phase.rphmm import (RPHmm, get_rp_hmms, get_tiling_paths,
                                    invert_partition, make_accept_mask,
                                    merge_partitions)
from margin_tpu.phase.stitching import ChunkPhaseResult, stitch_phase_results

from conftest import reference_path


def test_bgzf_roundtrip(tmp_path):
    data = bytes(range(256)) * 5000  # > 1 block
    path = str(tmp_path / "t.bgzf")
    with BgzfWriter(path) as w:
        w.write(data)
    with BgzfReader(path) as r:
        assert r.read(len(data) + 10) == data


def test_knapsack_probs_vertex_structure():
    # LP == fractional knapsack: p=1 by metric/length ratio until budget
    lengths = np.array([10, 10, 10, 10])
    metrics = np.array([40, 30, 20, 10])
    # budget = 25 -> 2 full reads + 0.5 of the third
    p = knapsack_probs(lengths, metrics, 2.5, 10)
    np.testing.assert_allclose(p, [1.0, 1.0, 0.5, 0.0])
    # budget beyond total -> all 1
    p = knapsack_probs(lengths, metrics, 10, 10)
    np.testing.assert_allclose(p, [1.0, 1.0, 1.0, 1.0])


def test_partition_primitives():
    # partitions.c semantics
    assert make_accept_mask(3) == 0b111
    assert make_accept_mask(64) == 0xFFFFFFFFFFFFFFFF
    assert merge_partitions(0b01, 0b1, 2, 1) == 0b101
    assert invert_partition(0b101, 3) == 0b010


def _ref_with_sites(n_sites, n_alleles=2):
    sites = []
    off = 0
    for _ in range(n_sites):
        sites.append(Site(n_alleles, off,
                          np.zeros(n_alleles, dtype=np.uint16),
                          np.zeros((n_alleles, n_alleles), dtype=np.uint16)))
        off += n_alleles
    return Reference("test", sites, off)


def _pseq(ref, read_id, start, probs_rows):
    """probs_rows: list of per-site [allele -log probs] lists."""
    probs = np.array([p for row in probs_rows for p in row], dtype=np.uint8)
    return ProfileSeq(None, read_id, start, len(probs_rows),
                      start * ref.sites[0].allele_number, probs)


def test_rphmm_two_reads_clear_phasing():
    """Two reads supporting opposite alleles at 3 het sites: the HMM should
    partition them apart and call the het genotype at each site."""
    ref = _ref_with_sites(3)
    params = PhaseParams(maxNotSumTransitions=True, minPartitionsInAColumn=100,
                         maxPartitionsInAColumn=100,
                         minPosteriorProbabilityForPartition=0.0)
    # read A strongly allele0, read B strongly allele1
    a = _pseq(ref, "A", 0, [[0, 60]] * 3)
    b = _pseq(ref, "B", 0, [[60, 0]] * 3)
    hmms = get_rp_hmms([a, b], ref, params)
    assert len(hmms) == 1
    hmm = hmms[0]
    hmm.forward_backward(include_ancestor=True)
    path = hmm.forward_traceback()
    from margin_tpu.phase.fragment import construct_genome_fragment
    gf = construct_genome_fragment(hmm, path)
    assert set(map(int, gf.haplotype_string1)) != set(map(int, gf.haplotype_string2)) or \
        all(gf.haplotype_string1[i] != gf.haplotype_string2[i] for i in range(3))
    # the two reads are in different partitions
    assert len(gf.reads1) == 1 and len(gf.reads2) == 1


def test_rphmm_tiling_paths_nonoverlap():
    ref = _ref_with_sites(10)
    params = PhaseParams()
    ps = [
        _pseq(ref, "r1", 0, [[0, 30]] * 3),   # sites 0-2
        _pseq(ref, "r2", 4, [[0, 30]] * 3),   # sites 4-6
        _pseq(ref, "r3", 1, [[30, 0]] * 5),   # sites 1-5 overlaps both
    ]
    hmms = [RPHmm.from_profile_seq(p, ref, params) for p in ps]
    paths = get_tiling_paths(hmms)
    # r1+r2 chain into one path; r3 into a second
    assert len(paths) == 2
    assert len(paths[0]) == 2 and len(paths[1]) == 1


def test_rphmm_cross_product_inverted_partitions():
    ref = _ref_with_sites(2)
    params = PhaseParams(includeInvertedPartitions=True)
    a = _pseq(ref, "A", 0, [[0, 60]] * 2)
    b = _pseq(ref, "B", 0, [[60, 0]] * 2)
    h1 = RPHmm.from_profile_seq(a, ref, params)
    h2 = RPHmm.from_profile_seq(b, ref, params)
    RPHmm.align_columns(h1, h2)
    hmm = RPHmm.cross_product(h1, h2)
    # single column; cross product of {1,0}x{1,0} with inversion closure
    assert len(hmm.columns) == 1
    parts = hmm.columns[0].partitions
    assert len(parts) == len(set(parts))
    assert set(parts) == {0b00, 0b01, 0b10, 0b11}


def test_stitch_phase_vote_switch():
    # chunk 1 has hap labels flipped relative to chunk 0 -> must switch
    r0 = ChunkPhaseResult(0, "chr1",
                          {"a": 10.0, "b": 10.0, "c": 10.0},
                          {"x": 10.0, "y": 10.0})
    r1 = ChunkPhaseResult(1, "chr1",
                          {"x": 10.0, "y": 10.0, "z": 10.0},
                          {"a": 10.0, "c": 10.0, "w": 10.0})
    ids1, ids2, switched = stitch_phase_results([r0, r1])
    assert switched == [False, True]
    assert set(ids1) == {"a", "b", "c", "w"}
    assert set(ids2) == {"x", "y", "z"}


def test_stitch_dedup_by_prob():
    # same read in both haps across chunks: higher prob wins
    r0 = ChunkPhaseResult(0, "chr1", {"a": 5.0}, {"b": 5.0})
    r1 = ChunkPhaseResult(1, "chr1", {"a": 9.0, "b": 20.0}, {})
    ids1, ids2, switched = stitch_phase_results([r0, r1])
    # chunk1 vote: cis=1 (a), trans=0 -> no switch; then b moves to hap1
    assert switched == [False, False]
    assert set(ids1) == {"a", "b"}
    assert set(ids2) == set()


def test_chunker_on_real_data():
    from margin_tpu.phase.chunker import construct_chunker
    params = Params.load(reference_path("params", "phase",
                                        "allParams.haplotag.ont-r94g507.json"))
    ch = construct_chunker(
        reference_path("tests", "data", "realData",
                       "HG002.r94g360.chr20_59M_100k.bam"),
        None, {"chr20"}, params.polish)
    assert len(ch.chunks) == 2
    c0, c1 = ch.chunks
    assert (c0.chunk_start, c0.chunk_end) == (0, 100000)
    assert c0.chunk_overlap_start == 0
    assert c0.chunk_overlap_end == 100001
    assert (c1.chunk_start, c1.chunk_end) == (100000, 100001)
    assert c1.chunk_overlap_start == 90000
    assert len(ch.read_enumerator) == 314


def test_split_where_phasing_is_uncertain():
    """stRPHMM_splitWherePhasingIsUncertain (hmm.c:1322-1383): hets with no
    spanning reads between them split the hmm at the midpoint."""
    from margin_tpu.phase.rphmm import split_where_phasing_is_uncertain
    ref = _ref_with_sites(6)
    params = PhaseParams(maxNotSumTransitions=True,
                         minPartitionsInAColumn=100,
                         maxPartitionsInAColumn=100,
                         minPosteriorProbabilityForPartition=0.0,
                         minReadCoverageToSupportPhasingBetweenHeterozygousSites=1)
    # two het islands (sites 0-1 and 4-5); overlapping uninformative reads
    # keep the hmm connected but no read spans hets on both sides
    left = [_pseq(ref, "La", 0, [[0, 60], [0, 60], [0, 0]]),
            _pseq(ref, "Lb", 0, [[60, 0], [60, 0], [0, 0]])]
    mid = [_pseq(ref, "Ma", 2, [[0, 0]] * 2),
           _pseq(ref, "Mb", 2, [[0, 0]] * 2)]
    right = [_pseq(ref, "Ra", 3, [[0, 0], [0, 60], [0, 60]]),
             _pseq(ref, "Rb", 3, [[0, 0], [60, 0], [60, 0]])]
    hmms = get_rp_hmms(left + mid + right, ref, params)
    assert len(hmms) == 1
    frags = split_where_phasing_is_uncertain(hmms[0])
    assert len(frags) >= 2
    # fragments tile the original interval contiguously
    assert frags[0].ref_start == 0
    for a, b in zip(frags, frags[1:]):
        assert a.ref_start + a.ref_length == b.ref_start
    assert frags[-1].ref_start + frags[-1].ref_length == 6
    # each fragment's columns are internally consistent
    for f in frags:
        assert len(f.merges) == len(f.columns) - 1
        assert f.columns[0].ref_start == f.ref_start
        total = sum(c.length for c in f.columns)
        assert total == f.ref_length


def test_split_keeps_linked_hets_together():
    from margin_tpu.phase.rphmm import split_where_phasing_is_uncertain
    ref = _ref_with_sites(4)
    params = PhaseParams(maxNotSumTransitions=True,
                         minPartitionsInAColumn=100,
                         maxPartitionsInAColumn=100,
                         minPosteriorProbabilityForPartition=0.0,
                         minReadCoverageToSupportPhasingBetweenHeterozygousSites=1)
    # reads span ALL sites: linkage everywhere, no split
    a = _pseq(ref, "A", 0, [[0, 60]] * 4)
    b = _pseq(ref, "B", 0, [[60, 0]] * 4)
    hmms = get_rp_hmms([a, b], ref, params)
    frags = split_where_phasing_is_uncertain(hmms[0])
    assert len(frags) == 1


def test_score_pending_sv_banded_path():
    """SV-length pairs go through the kmer-anchored banded kernel
    (bubbleGraph.c:1447-1453) and must closely match the dense forward."""
    import numpy as np
    from margin_tpu.alphabet import seq_to_symbols
    from margin_tpu.ops import pairhmm
    from margin_tpu.params import StateMachineParams
    from margin_tpu.phase.bubbles import Bubble, _score_pending

    rng = np.random.default_rng(13)
    sm = StateMachineParams.default_nucleotide()
    tables = pairhmm.PairHmmTables.from_params(sm)
    seq = "".join("ACGT"[v] for v in rng.integers(0, 4, 700))
    x = seq_to_symbols(seq)
    y = list(seq)
    for j in range(0, len(y), 37):
        y[j] = "ACGT"[rng.integers(0, 4)]
    y = seq_to_symbols("".join(y))

    def run(sv_limit):
        b = Bubble(0, 1, 0, None, None, [None], [None, None],
                   np.zeros((2, 1), dtype=np.float32))
        _score_pending([b], [(x, y), (x, x)], [0, 0], [], 
                       [(0, 0, 0), (0, 1, 0)], tables, False, 1024, False,
                       sv_limit=sv_limit, expansion=20)
        return b.allele_read_supports.copy()

    dense = run(sv_limit=0)          # SV routing off -> dense kernel
    banded_sv = run(sv_limit=512)    # 700 > 512 -> kmer-anchored banded
    # anchored band covers the (near-diagonal) mass: totals agree closely
    assert np.allclose(dense, banded_sv, atol=0.5)
    # and the relative ordering of allele supports is preserved
    assert (dense[0, 0] < dense[1, 0]) == (banded_sv[0, 0] < banded_sv[1, 0])


def test_rphmm_matches_bruteforce_partition_enumeration():
    """stRPHmmTest-style equivalence: with pruning disabled and all reads
    spanning all sites, the HMM's max-forward probability and traceback
    must equal brute-force enumeration of all 2^n read bipartitions."""
    rng = np.random.default_rng(23)
    for trial in range(25):
        n_reads = int(rng.integers(2, 7))
        n_sites = int(rng.integers(2, 6))
        ref = _ref_with_sites(n_sites)
        params = PhaseParams(maxNotSumTransitions=True,
                             minPartitionsInAColumn=1 << n_reads,
                             maxPartitionsInAColumn=1 << n_reads,
                             minPosteriorProbabilityForPartition=0.0,
                             includeInvertedPartitions=True)
        pseqs = [
            _pseq(ref, f"r{i}", 0,
                  [[int(v) for v in rng.integers(0, 61, 2)]
                   for _ in range(n_sites)])
            for i in range(n_reads)
        ]
        hmms = get_rp_hmms(pseqs, ref, params)
        assert len(hmms) == 1
        hmm = hmms[0]
        hmm.forward_backward(include_ancestor=True)

        # brute force: emission of every bipartition (reads in hap1 by bit)
        col = hmm.columns[0]
        order = {ps_id: k for k, ps_id in
                 enumerate(id(ps) for ps in col.seqs)}
        probs = np.stack([np.array(ps.probs, dtype=np.int64).reshape(
            n_sites, 2) for ps in col.seqs])  # (reads, sites, alleles)
        best = -np.inf
        for part in range(1 << n_reads):
            total = 0
            for s in range(n_sites):
                in1 = [(part >> k) & 1 for k in range(n_reads)]
                h1 = sum(probs[k, s] for k in range(n_reads) if in1[k])
                h2 = sum(probs[k, s] for k in range(n_reads) if not in1[k])
                h1 = h1 if np.ndim(h1) else np.zeros(2, dtype=np.int64)
                h2 = h2 if np.ndim(h2) else np.zeros(2, dtype=np.int64)
                total += int(min(h1[a1] + h2[a2]
                                 for a1 in range(2) for a2 in range(2)))
            best = max(best, -float(total))
        assert hmm.forward_log_prob == pytest.approx(best, abs=1e-9), \
            (trial, n_reads, n_sites)
        # the traceback's partition achieves the optimum
        path = hmm.forward_traceback()
        emission_at_path = float(col.emission[col.partitions.index(path[0])])
        assert emission_at_path == pytest.approx(best, abs=1e-9)


def test_native_extraction_matches_python_walk():
    """mio_extract_substrings (native/marginio.cc) vs the vectorized Python
    walk (phase/readextract.py): identical reads, names, strands, lengths,
    filtered split, substring text and quals on the real miniature data —
    the Python walk stays the parity oracle for the native engine."""
    import os
    import numpy as np
    from margin_tpu.io import bam as bamio, native
    from margin_tpu.io.fasta import FastaIndex
    from margin_tpu.io.vcf import mark_svs, parse_vcf
    from margin_tpu.phase import readextract as RE, variants
    from margin_tpu.phase.chunker import construct_chunker

    if native.lib() is None:
        pytest.skip("native marginio unavailable")
    params = Params.load(reference_path("params", "phase",
                                        "allParams.haplotag.ont-r94g507.json"))
    bam = reference_path("tests", "data", "realData",
                         "HG002.r94g360.chr20_59M_100k.bam")
    fa = reference_path("tests", "data", "realData",
                        "hg38.chr20_59M_100k.fa")
    vcf = reference_path("tests", "data", "realData",
                         "HG002.r94g360.chr20_59M_100k.vcf")
    vcf_entries = parse_vcf(
        vcf, None, use_rle=params.polish.useRunLengthEncoding,
        only_pass=params.phase.onlyUsePassVCFEntries,
        include_homozygous=params.phase.includeHomozygousVCFEntries)
    mark_svs(vcf_entries, params.phase.indelSizeForSVHandling)
    ch = construct_chunker(bam, None, {"chr20"}, params.polish)
    reader = bamio.BamReader(bam)
    fasta = FastaIndex(fa)
    rng = np.random.default_rng(0)
    ck = ch.chunks[0]
    chunk_ref = fasta.fetch(ck.ref_name, ck.chunk_overlap_start,
                            ck.chunk_overlap_end)
    primary, _ = variants.get_vcf_entries_for_region(
        vcf_entries, ck.ref_name, ck.chunk_overlap_start,
        ck.chunk_overlap_end, params, rng)
    variants.update_vcf_entries_with_substrings(primary, chunk_ref, params)

    def run(use_native):
        os.environ["MARGIN_TPU_NATIVE_EXTRACT"] = "1" if use_native else "0"
        try:
            cr = RE.PrefetchedChunkReader(reader, ck)
            return RE.extract_read_substrings_sv_aware(ck, primary, cr,
                                                       params)
        finally:
            os.environ.pop("MARGIN_TPU_NATIVE_EXTRACT", None)

    rn, fn = run(True)
    rp, fp = run(False)
    assert len(rn) == len(rp) and len(fn) == len(fp)
    assert sum(len(r.substrings) for r in rn) > 1000  # real work happened
    for a, b in zip(rn + fn, rp + fp):
        assert a.read_name == b.read_name
        assert a.forward_strand == b.forward_strand
        assert a.full_read_length == b.full_read_length
        assert a.substrings == b.substrings
        assert [e.ref_pos for e in a.vcf_entries] == \
               [e.ref_pos for e in b.vcf_entries]
        for qa, qb in zip(a.qualities, b.qualities):
            if qb is None:
                assert qa is None
            else:
                assert np.array_equal(np.asarray(qa), np.asarray(qb))
