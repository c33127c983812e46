"""Polish-path tests: POA construction/augment semantics and consensus
accuracy on the reference's real E. coli 100bp windows
(tests/polisherTest.c:633-728 analogue)."""

import numpy as np
import pytest

from margin_tpu.ops import pairhmm
from margin_tpu.params import Params
from margin_tpu.polish import repeats
from margin_tpu.polish.driver import poa_realign_all
from margin_tpu.polish.poa import Poa, PoaRead, poa_realign
from margin_tpu.rle import RleString

from conftest import reference_path

EXAMPLES = reference_path("tests", "data", "polishTestExamples",
                          "20_random_100bp_windows_directional_ecoli_guppy")


def _read_fasta(path):
    seqs = []
    names = []
    with open(path) as fh:
        cur = []
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                names.append(line[1:])
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line)
        if cur:
            seqs.append("".join(cur))
    return names, seqs


def _identity(a: str, b: str) -> float:
    """Edit-distance identity between two strings (O(nm) DP)."""
    n, m = len(a), len(b)
    bb = np.frombuffer(b.encode(), np.uint8)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        diag = prev[:-1] + (ord(a[i - 1]) != bb)
        cur[1:] = np.minimum(prev[1:] + 1, diag)
        for j in range(1, m + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return 1.0 - int(prev[m]) / max(n, m)


@pytest.fixture(scope="module")
def polish_params():
    return Params.load(reference_path("params", "polish", "ont", "r9.4",
                                      "allParams.np.human.r94-g360.json"))


@pytest.fixture(scope="module")
def norle_params():
    return Params.load(reference_path("params", "polish", "misc",
                                      "allParams.no_rle.json"))


def test_poa_reference_graph(polish_params):
    ref = RleString.encode("GATTACA")
    poa = Poa(ref, 51)
    assert len(poa.nodes) == ref.length + 1
    assert poa.nodes[0].base == "N"
    assert [n.base for n in poa.nodes[1:]] == list("GATACA")


@pytest.mark.slow  # ~2 min for both parametrizations; covered nightly
@pytest.mark.parametrize("rle", [True, False])
def test_polish_examples_improve_identity(polish_params, norle_params, rle):
    """Aggregate consensus identity vs truth must beat the starting draft
    (polisherTest.c test_poa_realign_examples). Fast subset (2 windows);
    the slow marker runs the fuller 6-window sweep."""
    _polish_examples_improve_identity(polish_params, norle_params, rle, 2)


@pytest.mark.slow
@pytest.mark.parametrize("rle", [True, False])
def test_polish_examples_improve_identity_full(polish_params, norle_params,
                                               rle):
    _polish_examples_improve_identity(polish_params, norle_params, rle, 6)


@pytest.mark.parametrize("rle", [True, False])
def test_native_consensus_matches_python(polish_params, norle_params, rle):
    """mpoa_consensus (native/marginpoa.cc) must reproduce the Python
    consensus oracle exactly — string, counts and poaToConsensusMap — on
    real E. coli window POAs with inserts/deletes and post-realign repeat
    estimation (poa.c:1350-1588 parity)."""
    from margin_tpu.polish import native_poa

    if native_poa.lib() is None:
        pytest.skip("native poa engine unavailable")
    params = polish_params if rle else norle_params
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)
    checked = 0
    for ex in range(2):
        names, seqs = _read_fasta(f"{EXAMPLES}/{ex}.fasta")
        reads = []
        for name, seq in zip(names[1:], seqs[1:]):
            rle_read = (RleString.encode(seq) if pp.useRunLengthEncoding
                        else RleString.identity(seq))
            reads.append(PoaRead(name, name[-1] == "F", rle_read, None,
                                 len(seq)))
        rle_ref = (RleString.encode(seqs[0]) if pp.useRunLengthEncoding
                   else RleString.identity(seqs[0]))
        poa = poa_realign(reads, None, rle_ref, pp, tables)
        if pp.useRunLengthEncoding:
            repeats.estimate_repeat_counts(poa, reads, pp.repeat_sub_matrix)
        cons_py, map_py = poa._get_consensus_py(pp)
        got = native_poa.consensus(poa, pp)
        assert got is not None
        cons_c, map_c = got
        assert cons_c.bases == cons_py.bases
        np.testing.assert_array_equal(cons_c.counts, cons_py.counts)
        assert cons_c.non_rle_length == cons_py.non_rle_length
        np.testing.assert_array_equal(map_c, map_py)
        checked += 1
    assert checked == 2


def _polish_examples_improve_identity(polish_params, norle_params, rle, n_ex):
    params = polish_params if rle else norle_params
    pp = params.polish
    tables = pairhmm.PairHmmTables.from_params(
        pp.sm_forward, pp.sm_reverse,
        repeat=pp.repeat_sub_matrix if pp.useRepeatCountsInAlignment else None)
    total_start = total_cons = 0.0
    for ex in range(n_ex):
        _, seqs = _read_fasta(f"{EXAMPLES}/{ex}.fasta")
        names, _ = _read_fasta(f"{EXAMPLES}/{ex}.fasta")
        _, true_seqs = _read_fasta(f"{EXAMPLES}/{ex}.ref.fasta")
        true_ref = true_seqs[0]
        start_ref = seqs[0]
        reads = []
        for name, seq in zip(names[1:], seqs[1:]):
            strand = name[-1]
            assert strand in "FR"
            rle_read = (RleString.encode(seq) if pp.useRunLengthEncoding
                        else RleString.identity(seq))
            reads.append(PoaRead(name, strand == "F", rle_read, None, len(seq)))
        rle_ref = (RleString.encode(start_ref) if pp.useRunLengthEncoding
                   else RleString.identity(start_ref))
        poa = poa_realign_all(reads, None, rle_ref, params, tables)
        if pp.useRunLengthEncoding:
            repeats.estimate_repeat_counts(poa, reads, pp.repeat_sub_matrix)
        consensus = poa.ref_string.expand()
        total_start += _identity(start_ref, true_ref)
        total_cons += _identity(consensus, true_ref)
    # consensus must on aggregate beat the draft (the reference test,
    # polisherTest.c:672-686, only logs metrics; improvement is the invariant)
    assert total_cons > total_start, (total_cons / n_ex, total_start / n_ex)
    assert total_cons / n_ex > 0.92, total_cons / n_ex


@pytest.mark.slow
def test_polish_with_hifi_params(tmp_path):
    """BASELINE.json config 3: the PacBio-HiFi parameter set runs through
    the polish path (here on ONT reads — model mismatch, so the bar is
    identity, not improvement)."""
    from margin_tpu.io.fasta import FastaIndex
    from margin_tpu.polish.driver import run_polish
    params = Params.load(reference_path("params", "polish", "pacbio", "hifi",
                                        "allParams.hifi.json"))
    out = run_polish(
        reference_path("tests", "data", "realData",
                       "HG002.r94g360.chr20_59M_100k.bam"),
        reference_path("tests", "data", "realData", "hg38.chr20_59M_100k.fa"),
        params, str(tmp_path / "hifi"), region="chr20:1000-3000",
        log=lambda *a: None)
    truth = FastaIndex(reference_path(
        "tests", "data", "realData",
        "hg38.chr20_59M_100k.fa")).fetch("chr20", 1000, 3000).upper()
    assert _identity(out.sequences[0][1], truth) > 0.95


def test_polish_long_run_length_edge_case(tmp_path):
    """tests/data/edgeCases/longRunLength: reads with homopolymer runs far
    beyond maximumRepeatLength (51) must polish without error, with the run
    clamped to the matrix maximum (repeatSubMatrix_getMinAndMaxRepeat-
    CountObservations cutoff)."""
    import shutil
    from margin_tpu.polish.driver import run_polish
    src = reference_path("tests", "data", "edgeCases")
    shutil.copy(f"{src}/longRunLength.bam", tmp_path / "lrl.bam")
    shutil.copy(f"{src}/longRunLength.bam.bai", tmp_path / "lrl.bam.bai")
    shutil.copy(f"{src}/longRunLength.ref.fa", tmp_path / "ref.fa")
    params = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                        "allParams.np.human.r94-g360.json"))
    out = run_polish(str(tmp_path / "lrl.bam"), str(tmp_path / "ref.fa"),
                     params, str(tmp_path / "out"), log=lambda *a: None)
    seq = out.sequences[0][1]
    assert seq.startswith("ACGTACGT")
    # the A-run is reported at the clamp (50), not the reads' ~68
    run = len(seq[8:]) - len(seq[8:].lstrip("A"))
    assert 45 <= run <= 50


@pytest.mark.slow
def test_polish_large_gap_deletion(tmp_path):
    """tests/data/largeGapTest: 10 reads with 2000M3000D2000M CIGARs must
    polish the 3000bp deletion out of the reference."""
    import shutil
    from margin_tpu.io.bam import BamReader
    from margin_tpu.polish.driver import run_polish
    src = reference_path("tests", "data", "largeGapTest")
    shutil.copy(f"{src}/largeGapTest.bam", tmp_path / "lg.bam")
    shutil.copy(f"{src}/largeGapTest.bam.bai", tmp_path / "lg.bam.bai")
    with BamReader(str(tmp_path / "lg.bam")) as r:
        rec = next(iter(r))
        seq = "".join("=ACMGRSVTWYHKDBN"[c]
                      for c in rec.seq_nibbles()[:rec.l_seq])
        name = r.header.ref_names[0]
    ref = "A" * 10000 + seq[:2000] + "T" * 3000 + seq[2000:] + "A" * 100
    with open(tmp_path / "ref.fa", "w") as fh:
        fh.write(f">{name}\n")
        for i in range(0, len(ref), 60):
            fh.write(ref[i:i + 60] + "\n")
    params = Params.load(reference_path("params", "polish", "ont", "r9.4",
                                        "allParams.np.human.r94-g360.json"))
    out = run_polish(str(tmp_path / "lg.bam"), str(tmp_path / "ref.fa"),
                     params, str(tmp_path / "out"),
                     region=f"{name}:10000-17000", log=lambda *a: None)
    cons = out.sequences[0][1]
    # the 3000bp T-run deletion is gone: consensus near the 4000bp read span
    assert 3800 <= len(cons) <= 4300
    assert "T" * 500 not in cons


def test_anchor_alignments_flat_matches_scalar(monkeypatch):
    """Poa._anchor_alignments_flat (vectorized over the native export's
    flat observation arrays + C greedy dedup) vs the scalar tuple walk:
    identical anchors per read, with and without a consensus map."""
    import numpy as np

    # route the realign bands to the native kernel: the jax-CPU scan
    # makes this setup ~20 s, the anchors under test are identical
    monkeypatch.setenv("MARGIN_TPU_NATIVE_SCAN_CELLS", "1000")
    from margin_tpu.params import Params
    from margin_tpu.io import bam as bamio
    from margin_tpu.io.fasta import FastaIndex
    from margin_tpu.polish.poa import poa_realign
    from margin_tpu.polish.reads import convert_to_reads_and_alignments
    from margin_tpu.rle import RleString
    from margin_tpu.phase.chunker import construct_chunker
    from conftest import reference_path

    params = Params.load(reference_path(
        "params", "polish", "ont", "r9.4",
        "allParams.np.human.r94-g344.json"))
    bam = reference_path("tests", "data", "realData",
                         "HG002.r94g360.chr20_59M_100k.bam")
    fasta = FastaIndex(reference_path("tests", "data", "realData",
                                      "hg38.chr20_59M_100k.fa"))
    chunkr = construct_chunker(bam, "chr20:2000-5000", {"chr20"},
                               params.polish)
    ck = chunkr.chunks[0]
    reader = bamio.BamReader(bam)
    ref = RleString.encode(fasta.fetch(ck.ref_name, ck.chunk_overlap_start,
                                       ck.chunk_overlap_end))
    reads, alns, _, _ = convert_to_reads_and_alignments(ck, ref, reader,
                                                        params.polish)
    tables = pairhmm.PairHmmTables.from_params(
        params.polish.sm_forward, params.polish.sm_reverse,
        repeat=params.polish.repeat_sub_matrix)
    poa = poa_realign(reads, alns, ref, params.polish, tables,
                      use_lut=True)
    assert poa._flat_obs is not None  # native builder path
    for p2c in (None,
                np.arange(len(poa.nodes) - 1, dtype=np.int64),
                np.where(np.arange(len(poa.nodes) - 1) % 7 == 3, -1,
                         np.arange(len(poa.nodes) - 1)).astype(np.int64)):
        fast = poa._anchor_alignments_flat(p2c, len(reads), params.polish)
        flat_obs = poa._flat_obs
        try:
            poa._flat_obs = None  # force the scalar oracle
            slow = poa.get_anchor_alignments(p2c, len(reads), params.polish)
        finally:
            poa._flat_obs = flat_obs
        assert len(fast) == len(slow)
        for a, b in zip(fast, slow):
            aa = np.asarray(a, dtype=np.int64).reshape(-1, 3)
            bb = np.asarray(b, dtype=np.int64).reshape(-1, 3)
            assert np.array_equal(aa, bb)
