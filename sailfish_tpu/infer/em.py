"""Collapsed EM / VBEM over equivalence classes — the jitted TPU core.

Semantics follow the reference CollapsedEMOptimizer exactly
(src/CollapsedEMOptimizer.cpp):

  * class weights: w_i = (1/effLen_i) / sum_j (1/effLen_j) within each
    class (the `count` factor cancels; :745-772)
  * init: active transcripts (appearing in any class) start at
    totalMappedFrags / numActive (:774-803)
  * EM update (:224-281): for multi-transcript classes,
      alphaOut[t] += count * (alpha[t] w_t) / sum_{t' in class} alpha w;
    classes with denom <= DBL_DENORM_MIN contribute nothing; singleton
    classes contribute their full count unconditionally
  * VBEM update (:288-369): expTheta = exp(digamma(alpha) - digamma(sum
    alpha)) where alpha > DBL_DENORM_MIN else 0; alphaOut starts at the
    prior 0.01 for EVERY transcript, then classes add count * expTheta w
    / denom with the same singleton/denom rules
  * convergence (:849-861): for transcripts with alphaPrime > 1e-2,
    relDiff = |alpha - alphaPrime| / alphaPrime must all be <= tol;
    iterate while (it < 50) or (it < maxIter and not converged)
  * truncation (:36-44, 875): final alphas <= cutoff set to 0, where
    cutoff = 1e-8 (EM) or 0.01 + 1e-8 (VBEM)

The whole optimization is ONE jitted lax.while_loop: per iteration two
segment-sums (class denominators, transcript accumulations) — entirely
gather/scatter-add, which XLA maps onto the VPU with fused layouts.

The update is expressed over a CSR [members, class-of-member] flattening,
so iteration cost is O(total class membership), same as the reference's
TBB loop but data-parallel on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..eqclass.classes import EqClasses

# reference: std::numeric_limits<double>::denorm_min()
_DENORM_MIN64 = 4.9406564584124654e-324
# usable "tiny" per dtype: in float32 the f64 denorm is just 0, so use
# the smallest positive normal instead (same role: "denominator is
# effectively zero").
def _min_eqclass_weight(dtype):
    if dtype == jnp.float64:
        return _DENORM_MIN64
    return float(np.finfo(np.float32).tiny)


@dataclasses.dataclass
class EMResult:
    alphas: np.ndarray          # estimated counts per transcript (post-truncation)
    num_iterations: int
    max_rel_diff: float
    converged: bool


def _em_step(alpha, members, class_of_member, counts, weights, singleton, num_txps,
             min_w):
    """One EM update: returns alphaOut."""
    av = alpha[members] * weights                      # gather + multiply
    denom = jax.ops.segment_sum(av, class_of_member, num_segments=counts.shape[0])
    ok = (denom > min_w) & (~singleton)
    scale = jnp.where(ok, counts / jnp.where(ok, denom, 1.0), 0.0)
    contrib = av * scale[class_of_member]
    out = jax.ops.segment_sum(contrib, members, num_segments=num_txps)
    # singleton classes: full count to the lone member
    sing_contrib = jnp.where(singleton, counts, 0.0)
    out = out + jax.ops.segment_sum(
        sing_contrib[class_of_member], members, num_segments=num_txps
    )
    return out


def _vbem_step(alpha, members, class_of_member, counts, weights, singleton,
               num_txps, prior_alpha, min_w):
    alpha_sum = jnp.sum(alpha)
    log_norm = jax.scipy.special.digamma(alpha_sum)
    exp_theta = jnp.where(
        alpha > _DENORM_MIN64 if alpha.dtype == jnp.float64 else alpha > 0.0,
        jnp.exp(jax.scipy.special.digamma(jnp.maximum(alpha, 1e-300)) - log_norm),
        0.0,
    )
    av = exp_theta[members] * weights
    denom = jax.ops.segment_sum(av, class_of_member, num_segments=counts.shape[0])
    ok = (denom > min_w) & (~singleton)
    scale = jnp.where(ok, counts / jnp.where(ok, denom, 1.0), 0.0)
    contrib = av * scale[class_of_member]
    out = jax.ops.segment_sum(contrib, members, num_segments=num_txps)
    sing_contrib = jnp.where(singleton, counts, 0.0)
    out = out + jax.ops.segment_sum(
        sing_contrib[class_of_member], members, num_segments=num_txps
    )
    return prior_alpha + out


@partial(
    jax.jit,
    static_argnames=(
        "num_txps", "use_vbem", "min_iter", "max_iter", "rel_diff_tol",
        "alpha_check_cutoff",
    ),
)
def _optimize_jit(
    members,
    class_of_member,
    counts,
    weights,
    singleton,
    alpha0,
    *,
    num_txps: int,
    use_vbem: bool,
    min_iter: int,
    max_iter: int,
    rel_diff_tol: float,
    alpha_check_cutoff: float,
):
    dtype = alpha0.dtype
    min_w = _min_eqclass_weight(dtype)
    prior_alpha = jnp.asarray(0.01, dtype)

    def step(alpha):
        if use_vbem:
            return _vbem_step(
                alpha, members, class_of_member, counts, weights, singleton,
                num_txps, prior_alpha, min_w,
            )
        return _em_step(
            alpha, members, class_of_member, counts, weights, singleton,
            num_txps, min_w,
        )

    def cond(state):
        it, _, converged, _ = state
        return (it < min_iter) | ((it < max_iter) & (~converged))

    def body(state):
        it, alpha, _, _ = state
        alpha_prime = step(alpha)
        check = alpha_prime > alpha_check_cutoff
        rel = jnp.abs(alpha - alpha_prime) / jnp.where(check, alpha_prime, 1.0)
        rel = jnp.where(check, rel, -jnp.inf)
        max_rel = jnp.max(rel, initial=-jnp.inf)
        converged = jnp.all(jnp.where(check, rel <= rel_diff_tol, True))
        return (it + 1, alpha_prime, converged, max_rel)

    init = (
        jnp.asarray(0, jnp.int32),
        alpha0,
        jnp.asarray(False),
        jnp.asarray(-jnp.inf, dtype),
    )
    it, alpha, converged, max_rel = jax.lax.while_loop(cond, body, init)
    return it, alpha, converged, max_rel


def class_weights(eq: EqClasses, eff_lens: np.ndarray, dtype=np.float64):
    """Per-member weights 1/effLen normalized within class
    (src/CollapsedEMOptimizer.cpp:745-772)."""
    eff = np.maximum(np.asarray(eff_lens, dtype=np.float64), 1.0)
    inv = 1.0 / eff[eq.members]
    com = eq.class_of_member()
    denom = np.bincount(com, weights=inv, minlength=eq.num_classes)
    return (inv / denom[com]).astype(dtype)


def run_em(
    eq: EqClasses,
    eff_lens: np.ndarray,
    total_mapped: float,
    num_txps: int,
    *,
    use_vbem: bool = False,
    rel_diff_tol: float = 0.01,
    max_iter: int = 10000,
    min_iter: int = 50,
    dtype: str = "float64",
) -> EMResult:
    """Run the collapsed EM/VBEM to convergence and truncate."""
    jdtype = jnp.float64 if dtype == "float64" else jnp.float32
    if jdtype == jnp.float64 and not jax.config.read("jax_enable_x64"):
        jdtype = jnp.float32

    weights = class_weights(eq, eff_lens, dtype=np.float64)
    com = eq.class_of_member()
    sizes = eq.class_sizes()
    singleton = (sizes == 1)

    active = np.zeros(num_txps, dtype=bool)
    active[np.unique(eq.members)] = True
    num_active = int(active.sum())
    if num_active == 0:
        raise RuntimeError("no transcripts are expressed; mapping failed?")
    alpha0 = np.where(active, total_mapped / num_active, 0.0)

    it, alpha, converged, max_rel = _optimize_jit(
        jnp.asarray(eq.members, jnp.int32),
        jnp.asarray(com, jnp.int32),
        jnp.asarray(eq.counts, jdtype),
        jnp.asarray(weights, jdtype),
        jnp.asarray(singleton),
        jnp.asarray(alpha0, jdtype),
        num_txps=num_txps,
        use_vbem=use_vbem,
        min_iter=min_iter,
        max_iter=max_iter,
        rel_diff_tol=rel_diff_tol,
        alpha_check_cutoff=1e-2,
    )
    alphas = np.array(alpha, dtype=np.float64)
    cutoff = (0.01 + 1e-8) if use_vbem else 1e-8
    alphas[alphas <= cutoff] = 0.0
    return EMResult(
        alphas=alphas,
        num_iterations=int(it),
        max_rel_diff=float(max_rel),
        converged=bool(converged),
    )
