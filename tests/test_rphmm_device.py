"""Device stRPHmm forward-backward (phase/rphmm_device.py) vs the float64
numpy oracle in phase/rphmm.py.

With maxNotSumTransitions=true every FB quantity is integer-valued, so the
int32 device kernel must be BIT-IDENTICAL to the host (hmm.c:827-942
semantics), including through fuse/cross-product/prune cycles."""

import os

import numpy as np
import pytest

from margin_tpu.params import PhaseParams
from margin_tpu.phase.bubbles import ProfileSeq, Reference, Site
from margin_tpu.phase import rphmm_device
from margin_tpu.phase.rphmm import get_rp_hmms


def _random_ref(rng, n_sites, max_alleles=3):
    sites = []
    off = 0
    for _ in range(n_sites):
        a = int(rng.integers(2, max_alleles + 1))
        sites.append(Site(
            a, off,
            rng.integers(0, 30, a).astype(np.uint16),
            rng.integers(0, 90, (a, a)).astype(np.uint16)))
        off += a
    return Reference("t", sites, off)


def _random_pseqs(rng, ref, n_reads, span=None):
    offsets = ref.allele_offsets()
    seqs = []
    for i in range(n_reads):
        if span is None:
            s = int(rng.integers(0, max(1, ref.length - 2)))
            e = int(rng.integers(s + 1, ref.length + 1))
        else:
            s, e = span
        probs = rng.integers(0, 64, int(offsets[e] - offsets[s]))
        seqs.append(ProfileSeq(None, f"r{i}", s, e - s,
                               int(offsets[s]), probs.astype(np.uint8)))
    return seqs


def _snapshot(hmm):
    out = []
    for c in hmm.columns:
        out.append((np.array(c.emission), np.array(c.forward),
                    np.array(c.backward), c.total_log_prob))
    for m in hmm.merges:
        out.append((np.array(m.forward), np.array(m.backward)))
    out.append((hmm.forward_log_prob, hmm.backward_log_prob))
    return out


def _assert_bitwise(a, b):
    assert len(a) == len(b)
    for xa, xb in zip(a, b):
        for va, vb in zip(xa if isinstance(xa, tuple) else (xa,),
                          xb if isinstance(xb, tuple) else (xb,)):
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.parametrize("include_ancestor", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_fb_bit_identical(seed, include_ancestor):
    rng = np.random.default_rng(seed)
    ref = _random_ref(rng, 14)
    params = PhaseParams(maxNotSumTransitions=True,
                         minPartitionsInAColumn=4,
                         maxPartitionsInAColumn=16,
                         minPosteriorProbabilityForPartition=0.01)
    seqs = _random_pseqs(rng, ref, 12)
    hmms = get_rp_hmms(seqs, ref, params)
    assert hmms
    for hmm in hmms:
        hmm.forward_backward(include_ancestor=include_ancestor)
        host = _snapshot(hmm)
        os.environ["MARGIN_TPU_RPHMM"] = "device"
        try:
            rphmm_device.forward_backward_device(
                hmm, include_ancestor=include_ancestor)
        finally:
            os.environ.pop("MARGIN_TPU_RPHMM", None)
        _assert_bitwise(_snapshot(hmm), host)


def test_device_fb_through_prune_cycle():
    """FB -> prune -> FB with the device path must keep traceback + genome
    fragment identical to the host-only run (the production sequence in
    phase/phasing.py)."""
    rng = np.random.default_rng(7)
    ref = _random_ref(rng, 20, max_alleles=2)
    params = PhaseParams(maxNotSumTransitions=True,
                         minPartitionsInAColumn=4,
                         maxPartitionsInAColumn=8,
                         minPosteriorProbabilityForPartition=0.01)
    seqs = _random_pseqs(rng, ref, 16)

    def run(mode):
        os.environ["MARGIN_TPU_RPHMM"] = mode
        try:
            hmms = get_rp_hmms(seqs, ref, params)
            paths = []
            for hmm in hmms:
                hmm.forward_backward()
                hmm.prune()
                hmm.forward_backward()
                paths.append(hmm.forward_traceback())
            return paths
        finally:
            os.environ.pop("MARGIN_TPU_RPHMM", None)

    assert run("device") == run("host")


def test_device_fb_deep_wide_column():
    """Stress the padded-slab path: one wide multi-allele column group with
    depth near the 64-read cap and ragged read spans."""
    rng = np.random.default_rng(11)
    ref = _random_ref(rng, 6, max_alleles=5)
    params = PhaseParams(maxNotSumTransitions=True,
                         minPartitionsInAColumn=8,
                         maxPartitionsInAColumn=32,
                         minPosteriorProbabilityForPartition=0.001)
    seqs = _random_pseqs(rng, ref, 40, span=(0, 6))
    hmms = get_rp_hmms(seqs, ref, params)
    for hmm in hmms:
        hmm.forward_backward()
        host = _snapshot(hmm)
        os.environ["MARGIN_TPU_RPHMM"] = "device"
        try:
            rphmm_device.forward_backward_device(hmm)
        finally:
            os.environ.pop("MARGIN_TPU_RPHMM", None)
        _assert_bitwise(_snapshot(hmm), host)


def test_use_device_fb_policy():
    """Sum-transitions and overflow-risk chains must stay on the host."""
    rng = np.random.default_rng(3)
    ref = _random_ref(rng, 4)
    params = PhaseParams(maxNotSumTransitions=False,
                         minPartitionsInAColumn=4,
                         maxPartitionsInAColumn=8,
                         minPosteriorProbabilityForPartition=0.01)
    seqs = _random_pseqs(rng, ref, 4)
    hmm = get_rp_hmms(seqs, ref, params)[0]
    assert not rphmm_device.use_device_fb(hmm, True)
