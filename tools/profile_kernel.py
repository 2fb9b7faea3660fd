"""Kernel phase bisection on the real chip: times the pallas mapping
call under debug variants (full, no-postpass, phases subsets) to locate
where per-step time goes.

Usage: python tools/profile_kernel.py  (env knobs match bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 16384))
CAP = int(os.environ.get("BENCH_CAP", 32))
REPS = int(os.environ.get("PROF_REPS", 3))


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

    sys.path.insert(0, "/root/repo")
    import bench as B

    # cache the synthetic index + batch on disk: the build is ~100s and
    # identical across profiling runs
    cache = f"/tmp/benchidx_{os.environ.get('BENCH_TXPS', 20000)}"
    rng = np.random.default_rng(0)
    c1 = None
    if os.path.isdir(cache) and os.path.exists(cache + ".batch.npz"):
        from sailfish_tpu.index.builder import load_index

        idx = load_index(cache)
        z = np.load(cache + ".batch.npz")
        c1, c2, lens = z["c1"], z["c2"], z["lens"]
        if c1.shape[0] < BATCH:
            # stale cache smaller than the requested batch: slicing it
            # would SILENTLY measure a smaller batch (this bug once
            # inflated a bisection 4x) — regenerate instead
            log(f"cached batch has {c1.shape[0]} rows < {BATCH}; regenerating")
            B.NUM_BATCHES = 1
            B.BATCH = max(BATCH, 65536)
            seqs = [rng.integers(0, 4, B.TXP_LEN + 50 * (i % 7)).astype(np.uint8)
                    for i in range(B.NUM_TXPS)]
            (c1, c2, lens), = B.simulate_batches(seqs, rng)
            np.savez(cache + ".batch.npz", c1=c1, c2=c2, lens=lens)
        else:
            log(f"loaded cached index {cache}")
    if c1 is None:
        from sailfish_tpu.index.builder import save_index

        idx, seqs = B.build_world(rng)
        B.NUM_BATCHES = 1
        B.BATCH = max(BATCH, 65536)
        (c1, c2, lens), = B.simulate_batches(seqs, rng)
        save_index(idx, cache)
        np.savez(cache + ".batch.npz", c1=c1, c2=c2, lens=lens)
    log(f"backend={jax.default_backend()} batch={BATCH} cap={CAP}")

    from sailfish_tpu.map.pallas_kernel import (
        map_oriented_lanes_pallas, prepare_pallas_text,
    )

    text = prepare_pallas_text(idx, CAP)
    codes = jnp.asarray(c1)
    jlens = jnp.asarray(lens)
    # match the production defaults: full scan budget (reference
    # semantics), nip skip rule, uniform-length static-flip lane build
    steps = int(os.environ.get("PROF_STEPS", c1.shape[1]))
    kw = dict(k=idx.k, cand_cap=CAP, max_mmps=4, max_steps=steps,
              ht_bits=int(idx.kmer_ht["ht_bits"]),
              ht_probes=int(idx.kmer_ht["max_probes"]),
              skip_jump=(os.environ.get("PROF_SKIP", "nip") == "jump"),
              uniform_len=int(lens[0]),
              interpret=False)

    def sync(x):
        """Force execution with a small D2H pull: block_until_ready over
        the tunneled PJRT plugin has been observed returning early for
        some executables, making timings meaningless.  Pulling one small
        output array (~0.1-0.5MB, a constant ~50ms tax on every variant)
        guarantees the whole executable actually ran."""
        if isinstance(x, dict):
            for k in ("meta", "num_mapped_loci", "valid"):
                if k in x:
                    np.asarray(x[k])
                    return x
        leaf = jax.tree_util.tree_leaves(x)[-1]
        np.asarray(leaf)
        return x

    sel = os.environ.get("PROF_VARIANTS", "full,scan,ab,a,shell").split(",")
    all_variants = {
        "full": ("full", dict()),
        "scan": ("scan-only(no postpass)", dict(postpass=False)),
        "ab": ("phases=ab (no cands)", dict(phases="ab", postpass=False)),
        "a": ("phases=a (probe only)", dict(phases="a", postpass=False)),
        "shell": ("phases=- (loop shell)", dict(phases="-", postpass=False)),
        "launch": ("max_steps=0 (launch)", dict(phases="-", postpass=False,
                                                max_steps0=True)),
    }
    variants = [all_variants[v] for v in sel]
    for name, extra in variants:
        extra = dict(extra)
        vkw = dict(kw)
        if extra.pop("max_steps0", False):
            vkw["max_steps"] = 0
        t0 = time.time()
        out = sync(map_oriented_lanes_pallas(text, codes, jlens, **vkw,
                                             **extra))
        log(f"{name:26s} compile+run {time.time()-t0:6.1f}s")
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            sync(map_oriented_lanes_pallas(text, codes, jlens, **vkw,
                                           **extra))
            best = min(best, time.time() - t0)
        log(f"{name:26s} {best*1e3:8.1f} ms  "
            f"({2*BATCH/best:,.0f} lanes/s)")


if __name__ == "__main__":
    main()
