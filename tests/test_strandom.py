"""glibc rand() replica tests: exact stream parity with libc (validated
against a compiled C probe) + the downsample Bernoulli consumption."""

import numpy as np

from margin_tpu.utils.strandom import RAND_MAX, GlibcRandom, make_rng


def test_glibc_stream_seed1():
    # golden values from compiled glibc: srand(1); rand() x 12
    g = GlibcRandom(1)
    assert [g.rand() for _ in range(12)] == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793,
        424238335, 719885386, 1649760492, 596516649, 1189641421,
        1025202362, 1350490027]


def test_glibc_stream_seed42():
    g = GlibcRandom(42)
    assert [g.rand() for _ in range(5)] == [
        71876166, 708592740, 1483128881, 907283241, 442951012]


def test_seed_zero_maps_to_one():
    assert GlibcRandom(0).rand() == GlibcRandom(1).rand() == 1804289383


def test_random_in_unit_interval():
    g = GlibcRandom(7)
    vals = [g.random() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert abs(np.mean(vals) - 0.5) < 0.05


def test_state_roundtrip():
    g = GlibcRandom(1)
    for _ in range(100):
        g.rand()
    state = g.getstate()
    a = [g.rand() for _ in range(50)]
    g2 = GlibcRandom(99)
    g2.setstate(state)
    assert [g2.rand() for _ in range(50)] == a


def test_make_rng_modes():
    assert isinstance(make_rng("st", 0), GlibcRandom)
    import random
    assert isinstance(make_rng("python", 0), random.Random)


def test_downsample_with_glibc_rng_deterministic():
    """The phase-path downsample consumes one draw per read in order;
    with the glibc stream the kept set is fully deterministic."""
    from margin_tpu.phase.downsample import downsample_reads_by_vcf_spans

    class R:
        def __init__(self, n_entries, full_len):
            self.vcf_entries = list(range(n_entries))
            self.full_read_length = full_len
            self.read_name = f"r{n_entries}_{full_len}"

    rng = GlibcRandom(1)
    reads = [R(10, 1000), R(10, 900), R(10, 800), R(10, 700), R(10, 100)]
    # 5 reads x 10 spanned over 4 entries = avg 12.5 >= depth 10
    kept, discarded, did = downsample_reads_by_vcf_spans(10, 4, reads, rng)
    assert did
    kept2, discarded2, did2 = downsample_reads_by_vcf_spans(
        10, 4, reads, GlibcRandom(1))
    assert [r.read_name for r in kept] == [r.read_name for r in kept2]
