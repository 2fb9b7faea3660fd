"""Bootstrap replicates of the collapsed EM.

Semantics from CollapsedEMOptimizer::gatherBootstraps / doBootstrap
(reference src/CollapsedEMOptimizer.cpp:438-709):

  * per replicate, class counts are redrawn Multinomial(totalCount,
    p_c = origCount_c / totalCount)
  * the EM (or VBEM) re-runs to convergence with the SAME class weights
    and the uniform active-transcript init
  * the bootstrap convergence check reads `alphas[i] > 1e-2` (the
    PREVIOUS iterate — unlike the main path which checks alphasPrime;
    :498-505) — reproduced here
  * final alphas truncated at 1e-8 (VBEM: 0.01 + 1e-8) and emitted as
    raw doubles

TPU design: all R replicates run as one jitted while_loop over stacked
state; converged replicates freeze (so each replicate stops at exactly
its own iteration count, like the reference's serial loops).  The
multinomial is drawn by inverting the class-count CDF at N uniforms —
exact, fully vectorized, no O(C) sequential chain.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..eqclass.classes import EqClasses
from .em import _em_step, _vbem_step, _min_eqclass_weight, class_weights


@partial(jax.jit, static_argnames=("num_draws", "num_classes"))
def _multinomial_counts(key, cdf, num_draws: int, num_classes: int):
    """counts ~ Multinomial(num_draws, diff(cdf)) via inverse-CDF."""
    u = jax.random.uniform(key, (num_draws,), dtype=cdf.dtype)
    bins = jnp.searchsorted(cdf, u, side="right")
    return jnp.bincount(
        jnp.clip(bins, 0, num_classes - 1), length=num_classes
    ).astype(cdf.dtype)


@partial(
    jax.jit,
    static_argnames=("num_txps", "use_vbem", "max_iter", "rel_diff_tol"),
)
def _bootstrap_em(
    members, class_of_member, counts_r,  # counts_r: (R, C)
    weights, singleton, alpha0,          # alpha0: (num_txps,)
    *,
    num_txps: int,
    use_vbem: bool,
    max_iter: int,
    rel_diff_tol: float,
):
    R = counts_r.shape[0]
    dtype = counts_r.dtype
    min_w = _min_eqclass_weight(dtype)
    prior_alpha = jnp.asarray(0.01, dtype)

    def one_step(alpha, counts):
        if use_vbem:
            return _vbem_step(alpha, members, class_of_member, counts,
                              weights, singleton, num_txps, prior_alpha, min_w)
        return _em_step(alpha, members, class_of_member, counts, weights,
                        singleton, num_txps, min_w)

    step_all = jax.vmap(one_step, in_axes=(0, 0))

    def cond(state):
        it, _, done = state
        return (it < max_iter) & (~jnp.all(done))

    def body(state):
        it, alpha, done = state
        alpha_prime = step_all(alpha, counts_r)
        # bootstrap convergence reads the OLD alphas (:498-505)
        check = alpha > 1e-2
        rel = jnp.abs(alpha - alpha_prime) / jnp.where(
            check, jnp.abs(alpha_prime), 1.0
        )
        conv = jnp.all(jnp.where(check, rel <= rel_diff_tol, True), axis=1)
        new_done = done | conv
        alpha = jnp.where(done[:, None], alpha, alpha_prime)
        return (it + 1, alpha, new_done)

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.broadcast_to(alpha0, (R, num_txps)).astype(dtype),
        jnp.zeros(R, bool),
    )
    _, alpha, _ = jax.lax.while_loop(cond, body, init)
    return alpha


def run_bootstraps(
    eq: EqClasses,
    eff_lens: np.ndarray,
    num_txps: int,
    *,
    num_bootstraps: int,
    use_vbem: bool = False,
    rel_diff_tol: float = 0.01,
    max_iter: int = 10000,
    seed: int = 0,
    dtype: str = "float64",
    replicates_per_round: int = 16,
) -> Iterator[np.ndarray]:
    """Yield per-replicate truncated alpha vectors (float64)."""
    jdtype = jnp.float64 if (
        dtype == "float64" and jax.config.read("jax_enable_x64")
    ) else jnp.float32

    weights = jnp.asarray(class_weights(eq, eff_lens), jdtype)
    members = jnp.asarray(eq.members, jnp.int32)
    com = jnp.asarray(eq.class_of_member(), jnp.int32)
    singleton = jnp.asarray(eq.class_sizes() == 1)
    C = eq.num_classes
    total = eq.total_count()

    active = np.zeros(num_txps, dtype=bool)
    active[np.unique(eq.members)] = True
    alpha0 = np.where(active, total / active.sum(), 0.0)
    alpha0 = jnp.asarray(alpha0, jdtype)

    probs = eq.counts.astype(np.float64) / total
    cdf = jnp.asarray(np.cumsum(probs), jdtype)

    cutoff = (0.01 + 1e-8) if use_vbem else 1e-8
    key = jax.random.PRNGKey(seed)
    done = 0
    while done < num_bootstraps:
        r = min(replicates_per_round, num_bootstraps - done)
        keys = jax.random.split(key, r + 1)
        key = keys[0]
        counts_r = jnp.stack(
            [_multinomial_counts(k, cdf, total, C) for k in keys[1:]]
        )
        alphas = _bootstrap_em(
            members, com, counts_r, weights, singleton, alpha0,
            num_txps=num_txps,
            use_vbem=use_vbem,
            max_iter=max_iter,
            rel_diff_tol=rel_diff_tol,
        )
        alphas = np.array(alphas, dtype=np.float64)
        alphas[alphas <= cutoff] = 0.0
        for i in range(r):
            yield alphas[i]
        done += r
