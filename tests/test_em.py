"""Collapsed EM/VBEM vs a direct loop port of the reference update rules
(src/CollapsedEMOptimizer.cpp:224-369, 711-893)."""

import numpy as np
from scipy.special import digamma as scipy_digamma

from sailfish_tpu.eqclass.classes import EqClassAccumulator
from sailfish_tpu.infer.em import class_weights, run_em

DENORM_MIN = 4.9406564584124654e-324


def loop_em(eq, eff_lens, total_mapped, num_txps, use_vbem=False,
            tol=0.01, max_iter=10000, min_iter=50):
    """Direct scalar port of CollapsedEMOptimizer::optimize."""
    eff = np.maximum(np.asarray(eff_lens, float), 1.0)
    labels = list(eq.labels())
    counts = eq.counts
    weights = []
    for lab in labels:
        w = np.array([1.0 / eff[t] for t in lab])
        weights.append(w / w.sum())
    active = sorted({t for lab in labels for t in lab})
    alphas = np.zeros(num_txps)
    alphas[active] = total_mapped / len(active)
    total_len = eff.sum()
    prior = 0.01

    it = 0
    converged = False
    while it < min_iter or (it < max_iter and not converged):
        out = np.zeros(num_txps)
        if use_vbem:
            out[:] = prior
            log_norm = scipy_digamma(alphas.sum())
            exp_theta = np.where(
                alphas > DENORM_MIN,
                np.exp(scipy_digamma(np.maximum(alphas, 1e-320)) - log_norm),
                0.0,
            )
            src = exp_theta
        else:
            src = alphas
        for lab, w, c in zip(labels, weights, counts):
            if len(lab) == 1:
                out[lab[0]] += c
                continue
            av = src[list(lab)] * w
            denom = av.sum()
            if denom <= DENORM_MIN:
                continue
            # np.add.at: duplicate transcript ids in a label accumulate
            np.add.at(out, np.array(lab), av * (c / denom))
        converged = True
        for t in range(num_txps):
            if out[t] > 1e-2:
                rel = abs(alphas[t] - out[t]) / out[t]
                if rel > tol:
                    converged = False
        alphas = out
        it += 1
    cutoff = (prior + 1e-8) if use_vbem else 1e-8
    alphas[alphas <= cutoff] = 0.0
    return alphas, it


def make_classes(items):
    acc = EqClassAccumulator()
    for label, c in items:
        acc.add(tuple(label), c)
    return acc.finish()


def test_em_matches_loop_port_simple():
    eq = make_classes([
        ((0,), 100),
        ((1,), 50),
        ((0, 1), 30),
        ((0, 1, 2), 20),
        ((2,), 5),
    ])
    eff = np.array([1000.0, 500.0, 2000.0])
    total = 205.0
    got = run_em(eq, eff, total, 3, dtype="float64")
    want, want_iters = loop_em(eq, eff, total, 3)
    np.testing.assert_allclose(got.alphas, want, rtol=1e-9, atol=1e-12)
    assert got.num_iterations == want_iters
    assert abs(got.alphas.sum() - total) < 1e-6


def test_em_duplicate_members():
    # labels can contain a transcript twice (orphaned ends on the same
    # transcript) — both copies get weight like the reference
    eq = make_classes([
        ((0, 0, 1), 40),
        ((0,), 10),
        ((1,), 10),
    ])
    eff = np.array([100.0, 100.0])
    got = run_em(eq, eff, 60.0, 2, dtype="float64")
    want, _ = loop_em(eq, eff, 60.0, 2)
    np.testing.assert_allclose(got.alphas, want, rtol=1e-9)


def test_vbem_matches_loop_port():
    eq = make_classes([
        ((0,), 200),
        ((0, 1), 100),
        ((1, 2), 50),
        ((2,), 25),
    ])
    eff = np.array([800.0, 1200.0, 300.0])
    total = 375.0
    got = run_em(eq, eff, total, 3, use_vbem=True, dtype="float64")
    want, want_iters = loop_em(eq, eff, total, 3, use_vbem=True)
    np.testing.assert_allclose(got.alphas, want, rtol=1e-7, atol=1e-9)
    assert got.num_iterations == want_iters


def test_em_inactive_transcripts_stay_zero():
    eq = make_classes([((1,), 100)])
    eff = np.array([500.0, 500.0, 500.0])
    got = run_em(eq, eff, 100.0, 3, dtype="float64")
    assert got.alphas[0] == 0.0 and got.alphas[2] == 0.0
    assert abs(got.alphas[1] - 100.0) < 1e-9


def test_class_weights_efflen_normalized():
    eq = make_classes([((0, 1), 10)])
    eff = np.array([100.0, 300.0])
    w = class_weights(eq, eff)
    np.testing.assert_allclose(w, [0.75, 0.25])
