"""Collapsed Gibbs sampler over equivalence classes.

Reference semantics (src/CollapsedGibbsSampler.cpp): allocations are
initialized by a multinomial split of each class's count proportional to
(priorAlpha + EM-mass_t) * aux_t (:35-94); then each emitted sample runs
10 internal rounds, each round re-drawing a Uniform(0.25, 0.75) fraction
of every class's allocation from a multinomial conditioned on the
current global per-transcript counts (:96-186); priorAlpha = 1e-8
(:215); emitted samples are integer per-transcript count vectors.

TPU redesign — CHROMATIC systematic scan: the reference resamples
classes SEQUENTIALLY within a round, so class j sees the txp counts
already updated by classes < j.  A naive all-at-once parallel update
(snapshot conditioning) is NOT the same chain — it subtracts every
class's resample mass before any conditional is evaluated, which
flattens the conditionals and measurably overdisperses the posterior
(~2x the std on toy configs).  Instead the class-conflict graph
(classes sharing a transcript) is greedily colored on host
(color_classes); each round sweeps the colors in order, resampling all
classes of one color in parallel conditioned on the CURRENT counts.
Within a color no transcript is shared, so those conditionals are
exactly independent — the sweep is a valid systematic-scan Gibbs
update targeting the same posterior as the reference's sequential
chain (validated moment-by-moment against a faithful sequential port
in tests/test_samplers.py).  Chains (the reference parallelizes via
TBB ranges, :223-270) map to a vmapped chain axis; each chain emits
its share of samples sequentially.

Per-class multinomials are drawn by a binomial chain along each class's
members (scan over the max class size, all classes in parallel).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..eqclass.classes import EqClasses
from .em import class_weights

_PRIOR = 1e-8


def _class_of(offsets, num_members):
    out = jnp.zeros(num_members, dtype=jnp.int32)
    out = out.at[offsets[1:-1]].add(1)
    return jnp.cumsum(out)


def _class_multinomial(key, n_c, probs_m, offsets, sizes, com,
                       max_size: int, num_classes: int, num_members: int):
    """For each class c, draw Multinomial(n_c, probs of its members) via
    a binomial chain over member positions (all classes in parallel)."""
    M = num_members
    draws = jnp.zeros(M, dtype=jnp.float32)
    rem_p = jax.ops.segment_sum(probs_m, com, num_segments=num_classes)

    def body(j, state):
        key, rem_n, rem_p, draws = state
        key, sub = jax.random.split(key)
        midx = jnp.clip(offsets[:-1] + j, 0, M - 1)
        in_class = j < sizes
        last = j == sizes - 1
        p_j = jnp.where(in_class, probs_m[midx], 0.0)
        safe_p = jnp.where(rem_p > 0, rem_p, 1.0)
        frac = jnp.clip(p_j / safe_p, 0.0, 1.0)
        x = jax.random.binomial(sub, jnp.maximum(rem_n, 0.0), frac).astype(
            rem_n.dtype
        )
        x = jnp.where(in_class & ~last, x, 0.0)
        x = jnp.where(last, jnp.maximum(rem_n, 0.0), x)  # remainder
        draws = draws.at[midx].add(jnp.where(in_class, x, 0.0))
        rem_n = rem_n - jnp.where(in_class, x, 0.0)
        rem_p = rem_p - p_j
        return (key, rem_n, rem_p, draws)

    _, _, _, draws = jax.lax.fori_loop(
        0, max_size, body, (key, n_c.astype(jnp.float32), rem_p, draws)
    )
    return draws


@partial(jax.jit, static_argnames=("max_size", "num_classes", "num_txps",
                                   "num_members", "inner_rounds",
                                   "num_colors"))
def _gibbs_rounds(
    key, txp_counts, count_m, offsets, sizes, aux_m, tid_m, colors,
    *,
    max_size: int,
    num_classes: int,
    num_txps: int,
    num_members: int,
    inner_rounds: int,
    num_colors: int,
):
    M = num_members
    com = _class_of(offsets, M)

    def one_color(carry, g):
        """Resample only the classes of color `g`, conditioned on the
        CURRENT global counts — classes within a color share no
        transcript, so their conditionals are exactly independent and
        the color sweep is a systematic-scan (Gauss–Seidel) Gibbs
        update, not a snapshot approximation."""
        key, txp_counts, count_m = carry
        key, kf, km = jax.random.split(key, 3)
        # singletons NEVER resample (reference groupSize > 1 guard,
        # :129) — including them would subtract their mass from the
        # conditioning counts and flatten co-colored classes'
        # conditionals (measured ~2x posterior overdispersion)
        sel_c = (colors == g) & (sizes > 1)
        sel_m = sel_c[com]
        frac = jax.random.uniform(
            kf, (num_classes,), minval=0.25, maxval=0.75,
            dtype=count_m.dtype,
        )
        resamp_m = jnp.where(sel_m, jnp.round(frac[com] * count_m), 0.0)
        n_c = jax.ops.segment_sum(resamp_m, com, num_segments=num_classes)
        count_rest = count_m - resamp_m
        txp_cur = txp_counts - jax.ops.segment_sum(
            resamp_m, tid_m, num_segments=num_txps
        )
        probs_m = (_PRIOR + txp_cur[tid_m]) * aux_m
        denom = jax.ops.segment_sum(probs_m, com, num_segments=num_classes)
        ok = denom > 1e-30
        draws = _class_multinomial(
            km, jnp.where(ok, n_c, 0.0), probs_m, offsets, sizes, com,
            max_size, num_classes, M,
        )
        # degenerate classes put their resampled mass back unchanged
        draws = jnp.where(ok[com], draws, resamp_m)
        count_m = count_rest + draws
        txp_counts = txp_cur + jax.ops.segment_sum(
            draws, tid_m, num_segments=num_txps
        )
        return (key, txp_counts, count_m), None

    def one_round(carry, _):
        carry, _ = jax.lax.scan(
            one_color, carry, jnp.arange(num_colors, dtype=jnp.int32)
        )
        return carry, None

    (key, txp_counts, count_m), _ = jax.lax.scan(
        one_round, (key, txp_counts, count_m), None, length=inner_rounds
    )
    return txp_counts, count_m


def color_classes(eq: EqClasses) -> np.ndarray:
    """Greedy coloring of the class-conflict graph: two classes
    conflict when they share a transcript (ambiguous classes containing
    one transcript form a clique, so num_colors >= the max number of
    ambiguous classes any transcript belongs to).  Singleton classes
    never resample and all take color 0."""
    C = eq.num_classes
    colors = np.zeros(C, dtype=np.int32)
    sizes = eq.class_sizes()
    taken: dict[int, set] = {}
    for c in range(C):
        if sizes[c] <= 1:
            continue
        o0, o1 = int(eq.offsets[c]), int(eq.offsets[c + 1])
        tids = eq.members[o0:o1]
        used = set()
        for t in tids:
            used |= taken.get(int(t), set())
        g = 0
        while g in used:
            g += 1
        colors[c] = g
        for t in tids:
            taken.setdefault(int(t), set()).add(g)
    return colors


def run_gibbs(
    eq: EqClasses,
    eff_lens: np.ndarray,
    em_alphas: np.ndarray,
    num_txps: int,
    *,
    num_samples: int,
    total_mapped: float,
    seed: int = 0,
    inner_rounds: int = 10,
    num_chains: int = 4,
) -> Iterator[np.ndarray]:
    """Yield integer count-vector samples (int32) in reference format."""
    weights = class_weights(eq, eff_lens, dtype=np.float64)
    offsets = jnp.asarray(eq.offsets, jnp.int32)
    sizes = jnp.asarray(eq.class_sizes(), jnp.int32)
    tid_m = jnp.asarray(eq.members, jnp.int32)
    aux_m = jnp.asarray(weights, jnp.float32)
    M = eq.num_members
    C = eq.num_classes
    max_size = int(eq.class_sizes().max()) if C else 1
    num_chains = max(1, min(num_chains, num_samples))

    # init allocation: host multinomial split by (prior + mass) * aux
    alpha_sum = em_alphas.sum()
    mass = (em_alphas / alpha_sum * total_mapped) if alpha_sum > 0 else em_alphas
    rng = np.random.default_rng(seed)
    p = (_PRIOR + mass[eq.members]) * weights
    init_counts = []
    for _ in range(num_chains):
        cm = np.zeros(M)
        for c in range(C):
            o0, o1 = int(eq.offsets[c]), int(eq.offsets[c + 1])
            pc = p[o0:o1]
            s = pc.sum()
            if o1 - o0 == 1 or s <= 0:
                cm[o0] = eq.counts[c]
            else:
                cm[o0:o1] = rng.multinomial(int(eq.counts[c]), pc / s)
        init_counts.append(cm)

    tc = jnp.asarray(
        np.stack([
            np.bincount(eq.members, weights=cm, minlength=num_txps)
            for cm in init_counts
        ]),
        jnp.float32,
    )
    cm = jnp.asarray(np.stack(init_counts), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_chains)

    colors_np = color_classes(eq)
    num_colors = int(colors_np.max()) + 1 if C else 1
    colors = jnp.asarray(colors_np, jnp.int32)

    rounds_vm = jax.vmap(
        lambda k, t, c: _gibbs_rounds(
            k, t, c, offsets, sizes, aux_m, tid_m, colors,
            max_size=max_size, num_classes=C, num_txps=num_txps,
            num_members=M, inner_rounds=inner_rounds,
            num_colors=num_colors,
        ),
        in_axes=(0, 0, 0),
    )

    produced = 0
    while produced < num_samples:
        splits = jax.vmap(jax.random.split)(keys)
        step_keys, keys = splits[:, 0], splits[:, 1]
        tc, cm = rounds_vm(step_keys, tc, cm)
        out = np.asarray(tc)
        for i in range(num_chains):
            if produced >= num_samples:
                break
            yield np.round(out[i]).astype(np.int32)
            produced += 1
