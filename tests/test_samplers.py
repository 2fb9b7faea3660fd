"""Bootstrap and Gibbs posterior samplers: statistical sanity against
the exact posterior structure of simple class configurations."""

import numpy as np
import pytest

from sailfish_tpu.eqclass.classes import EqClassAccumulator
from sailfish_tpu.infer.bootstrap import run_bootstraps
from sailfish_tpu.infer.em import run_em
from sailfish_tpu.infer.gibbs import run_gibbs


def make_classes(items):
    acc = EqClassAccumulator()
    for label, c in items:
        acc.add(tuple(label), c)
    return acc.finish()


@pytest.fixture(scope="module")
def world():
    eq = make_classes([
        ((0,), 500),
        ((1,), 300),
        ((0, 1), 200),
        ((2,), 100),
        ((1, 2), 60),
    ])
    eff = np.array([1000.0, 1000.0, 500.0])
    total = float(eq.total_count())
    em = run_em(eq, eff, total, 3, dtype="float64")
    return eq, eff, total, em


def test_bootstrap_statistics(world):
    eq, eff, total, em = world
    draws = list(run_bootstraps(
        eq, eff, 3, num_bootstraps=30, seed=1, dtype="float64",
    ))
    assert len(draws) == 30
    mat = np.stack(draws)
    # each replicate conserves the total count
    np.testing.assert_allclose(mat.sum(axis=1), total, rtol=1e-6)
    # replicate means bracket the point estimate
    mean = mat.mean(axis=0)
    np.testing.assert_allclose(mean, em.alphas, rtol=0.15)
    # variability exists (it's a bootstrap, not a constant)
    assert mat.std(axis=0).max() > 1.0
    # determinism given the seed
    again = list(run_bootstraps(eq, eff, 3, num_bootstraps=3, seed=1,
                                dtype="float64"))
    np.testing.assert_allclose(np.stack(again), mat[:3])


def test_bootstrap_vbem(world):
    eq, eff, total, em = world
    draws = list(run_bootstraps(
        eq, eff, 3, num_bootstraps=5, use_vbem=True, seed=2,
        dtype="float64",
    ))
    mat = np.stack(draws)
    assert mat.shape == (5, 3)
    assert (mat >= 0).all()
    # VBEM adds the 0.01 prior per transcript before truncation; totals
    # remain close to the fragment count
    np.testing.assert_allclose(mat.sum(axis=1), total, rtol=0.01)


def test_gibbs_samples(world):
    eq, eff, total, em = world
    samples = list(run_gibbs(
        eq, eff, em.alphas, 3, num_samples=20, total_mapped=total,
        seed=3, num_chains=2,
    ))
    assert len(samples) == 20
    mat = np.stack(samples)
    assert mat.dtype == np.int32
    # every sample is a valid allocation: totals conserved exactly
    assert (mat.sum(axis=1) == int(total)).all()
    # singleton-class floors: txp0 always holds >= its unique 500 reads
    assert (mat[:, 0] >= 500).all()
    assert (mat[:, 1] >= 300).all()
    assert (mat[:, 2] >= 100).all()
    # means in the right region
    mean = mat.mean(axis=0)
    np.testing.assert_allclose(mean, em.alphas, rtol=0.25)
    # chain actually moves
    assert (mat.std(axis=0) > 0).any()


def test_gibbs_blocked_matches_sequential_reference_chain(world):
    """VERDICT round-1 #9: the blocked device chain's posterior must
    match a faithful sequential-scan port of the reference chain
    (src/CollapsedGibbsSampler.cpp:96-186, refimpl/gibbs.py) in its
    first two moments within Monte-Carlo error on a toy config.

    Both chains target the same collapsed conditional structure; the
    blocked variant conditions all classes on one per-round snapshot
    instead of the sequential running state (documented divergence,
    infer/gibbs.py docstring) — this test bounds the practical effect."""
    from sailfish_tpu.refimpl.gibbs import run_gibbs_sequential

    eq, eff, total, em = world
    n = 600
    seq = np.stack(list(run_gibbs_sequential(
        eq, eff, em.alphas, 3, num_samples=n, total_mapped=total, seed=11,
    )))
    blk = np.stack(list(run_gibbs(
        eq, eff, em.alphas, 3, num_samples=n, total_mapped=total,
        seed=12, num_chains=4,
    )))
    assert (seq.sum(axis=1) == int(total)).all()
    assert (blk.sum(axis=1) == int(total)).all()

    ms, mb = seq.mean(axis=0), blk.mean(axis=0)
    ss, sb = seq.std(axis=0), blk.std(axis=0)
    # means agree within a few combined standard errors (thinned chains
    # retain autocorrelation; allow 5x the naive SE, plus a floor)
    se = (ss + sb) / np.sqrt(n)
    assert np.all(np.abs(ms - mb) <= 5.0 * se + 2.0), (ms, mb, se)
    # posterior spread agrees to within 20% relative
    np.testing.assert_allclose(sb, ss, rtol=0.20)
