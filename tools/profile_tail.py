"""Micro-benchmarks of the merge/collapse tail's primitive costs on the
real chip, so optimization effort goes where the time is:
  - final label sort: lax.sort (B, 4C) 2-operand stable
  - PE pair matching: (B, 2C, 2C) cross-product reductions
  - orientation dedupe: 2x (B, C..2C) cross-products
  - collapse: dim-0 lax.sort of B with 5-6 operands + segment_sum
  - label hash: vectorized position-tabulation reduction

Usage: python tools/profile_tail.py   (BENCH_BATCH/BENCH_CAP env)
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("BENCH_BATCH", 16384))
C = int(os.environ.get("BENCH_CAP", 32))
REPS = int(os.environ.get("PROF_REPS", 5))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    W = 4 * C
    txp = jnp.asarray(rng.integers(0, 20000, (B, W)), jnp.int32)
    val = jnp.asarray(rng.random((B, W)) < 0.05)
    t2 = jnp.asarray(rng.integers(0, 20000, (B, 2 * C)), jnp.int32)
    v2 = jnp.asarray(rng.random((B, 2 * C)) < 0.05)
    p2 = jnp.asarray(rng.integers(0, 1000, (B, 2 * C)), jnp.int32)
    h1 = jnp.asarray(rng.integers(0, 2**31, B), jnp.uint32)
    h2 = jnp.asarray(rng.integers(0, 2**31, B), jnp.uint32)
    mp = jnp.asarray(rng.random(B) < 0.9)
    ll = jnp.asarray(rng.integers(0, 8, B), jnp.int32)

    @jax.jit
    def label_sort(txp, val):
        NEG = jnp.int32(2**31 - 1)
        _, lab = jax.lax.sort(
            (jnp.where(val, txp, NEG), jnp.where(val, txp, -1)),
            dimension=1, num_keys=1, is_stable=True)
        return lab

    @jax.jit
    def pair_match(t2, v2, p2):
        m = (t2[:, :, None] == t2[:, None, :]) & v2[:, None, :] & v2[:, :, None]
        mate_pos = jnp.sum(jnp.where(m, p2[:, None, :], 0), axis=2)
        return m.any(axis=2), mate_pos

    @jax.jit
    def collapse(h1, h2, mp, ll):
        from sailfish_tpu.map.pair import collapse_unique
        return collapse_unique(h1, h2, mp, ll)

    @jax.jit
    def hashes(txp, ll):
        from sailfish_tpu.map.pair import _hash_labels
        return _hash_labels(jnp.where(val, txp, -1), ll)

    cases = [
        ("label_sort (B,4C) 1key", lambda: label_sort(txp, val)),
        ("pair_match (B,2C,2C)", lambda: pair_match(t2, v2, p2)),
        ("collapse_unique 2xBsort", lambda: collapse(h1, h2, mp, ll)),
        ("hash_labels", lambda: hashes(txp, ll)),
    ]
    for name, fn in cases:
        t0 = time.time()
        r = jax.tree_util.tree_map(
            lambda a: a.block_until_ready(), fn())
        log(f"{name:26s} compile {time.time()-t0:5.1f}s")
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), fn())
            best = min(best, time.time() - t0)
        log(f"{name:26s} {best*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
