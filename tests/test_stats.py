"""FLD / effective-length math vs direct (loop) ports of the reference
formulas (src/SailfishQuantify.cpp:648-838, src/EmpiricalDistribution.cpp)."""

import math

import numpy as np

from sailfish_tpu.stats.fld import (
    EmpiricalDistribution,
    correction_factors_from_counts,
    normal_fragment_length_counts,
    normal_fragment_length_dist,
    smoothed_effective_lengths,
    unsmoothed_effective_lengths,
)


def loop_normal_frag_length_dist(mean, sd, max_len):
    cf = [0.0] * max_len
    cmass = cdens = 0.0
    for i in range(max_len):
        x = (i - mean) / sd
        d = math.exp(-0.5 * x * x) / sd
        cmass += i * d
        cdens += d
        if cdens > 0:
            cf[i] = cmass / cdens
    return np.array(cf)


def test_normal_fld_correction_factors():
    got = normal_fragment_length_dist(200, 80, 1000)
    want = loop_normal_frag_length_dist(200, 80, 1000)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_normal_fld_counts_sum():
    c = normal_fragment_length_counts(200, 80, 1000, 10000)
    assert abs(int(c.sum()) - 10000) < 600  # rounding slack
    assert c[200] == c.max()  # peak at the mean (plateau from rounding)


def test_correction_factors_from_counts_loop_port():
    rng = np.random.default_rng(0)
    counts = np.zeros(1000, dtype=np.int64)
    fl = rng.normal(180, 40, 5000).astype(int)
    fl = fl[(fl > 0) & (fl < 1000)]
    np.add.at(counts, fl, 1)

    got = correction_factors_from_counts(counts)
    # direct loop port (reference :789-802)
    vals = np.zeros(1000)
    mult = np.zeros(1000, dtype=np.int64)
    cf = np.zeros(1000)
    mult[0] = counts[0]
    for i in range(1, 1000):
        v = counts[i]
        vals[i] = v * i + vals[i - 1]
        mult[i] = v + mult[i - 1]
        if mult[i] > 0:
            cf[i] = vals[i] / mult[i]
    np.testing.assert_allclose(got[1:], cf[1:], rtol=1e-12)


def test_smoothed_effective_lengths():
    cf = normal_fragment_length_dist(200, 80, 1000)
    ref_lens = np.array([100, 250, 1500, 5])
    eff = smoothed_effective_lengths(ref_lens, cf)
    assert eff[3] == 5 - cf[5] + 1.0
    assert eff[2] == 1500 - cf[999] + 1.0
    assert eff[0] == 100 - cf[100] + 1.0
    # effLen < 1 clamps back to refLen: force with a huge correction
    cf2 = np.full(1000, 500.0)
    eff2 = smoothed_effective_lengths(np.array([100]), cf2)
    assert eff2[0] == 100.0


def test_empirical_distribution_basic():
    # Reference quirk (src/EmpiricalDistribution.cpp:45-71, inherited
    # from isolator): the entry at which the cumulative crosses 1-1e-6
    # is EXCLUDED from the pmf support and the rest is renormalized —
    # here the 300 bin (60% of mass!) is dropped and {100,200} rescale
    # to {0.25, 0.75}.  We reproduce this bit-for-bit.
    vals = np.arange(1000)
    lens = np.zeros(1000, dtype=np.int64)
    lens[100] = 10
    lens[200] = 30
    lens[300] = 60
    emp = EmpiricalDistribution(vals, lens)
    assert emp.min_val == 0 and emp.max_val == 999
    assert emp.median() == 300.0  # weighted median (pre-truncation)
    assert abs(emp.pdf(100) - 0.25) < 1e-12
    assert abs(emp.pdf(200) - 0.75) < 1e-12
    assert emp.pdf(300) == 0.0
    assert abs(emp.cdf(150) - 0.25) < 1e-12
    assert abs(emp.cdf(250) - 1.0) < 1e-12
    assert emp.cdf(10_000) == 1.0
    assert emp.pdf(10_000) == 0.0


def test_unsmoothed_effective_lengths():
    vals = np.arange(1000)
    lens = np.zeros(1000, dtype=np.int64)
    lens[100] = 1
    lens[200] = 1
    emp = EmpiricalDistribution(vals, lens)
    # truncation quirk drops the 200 bin; pdf(100) = 1.0; median = 200
    assert emp.pdf(100) == 1.0 and emp.pdf(200) == 0.0
    assert emp.median() == 200.0
    ref_lens = np.array([50, 150, 1000])
    eff = unsmoothed_effective_lengths(ref_lens, emp)
    assert eff[0] == 50   # <= median keeps refLen
    assert eff[1] == 150  # <= median keeps refLen
    assert abs(eff[2] - emp.pdf(100) * 901.0) < 1e-9


def test_empirical_realize_histogram():
    vals = np.arange(10)
    lens = np.array([0, 0, 5, 5, 3, 0, 0, 0, 0, 0], dtype=np.int64)
    emp = EmpiricalDistribution(vals, lens)
    rng = np.random.default_rng(0)
    h = emp.realize(rng, 1000)
    assert h.sum() == 1000
    # truncation drops the last (4) bin; draws land on {2, 3}
    assert h[2] + h[3] == 1000
