"""Outer-step accounting for the pallas scan: runs the kernel scan-only
on the cached bench world and prints the distribution of per-block
outer while iterations (meta[:,3]) plus derived ns/obody — the real
denominator for per-step cost attribution.

Usage: python tools/obody_stats.py   (uses /tmp/benchidx_20000 cache)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
CAP = int(os.environ.get("BENCH_CAP", 32))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sailfish_tpu.index.builder import load_index
    from sailfish_tpu.map.pallas_kernel import (
        LB, map_oriented_lanes_pallas, prepare_pallas_text,
    )

    cache = f"/tmp/benchidx_{os.environ.get('BENCH_TXPS', 20000)}"
    idx = load_index(cache)
    z = np.load(cache + ".batch.npz")
    c1, lens = z["c1"][:BATCH], z["lens"][:BATCH]
    text = prepare_pallas_text(idx, CAP)
    kw = dict(k=idx.k, cand_cap=CAP, max_mmps=4, max_steps=c1.shape[1],
              ht_bits=int(idx.kmer_ht["ht_bits"]),
              ht_probes=int(idx.kmer_ht["max_probes"]),
              uniform_len=int(lens[0]), postpass=False)
    out = map_oriented_lanes_pallas(text, jnp.asarray(c1),
                                    jnp.asarray(lens), **kw)
    meta = np.asarray(out["meta"])
    np.asarray(out["meta"][:4])
    t0 = time.time()
    out = map_oriented_lanes_pallas(text, jnp.asarray(c1),
                                    jnp.asarray(lens), **kw)
    np.asarray(out["meta"][:4])
    dt = time.time() - t0
    meta = np.asarray(out["meta"])
    per_block = meta[::LB, 3]  # same value for all lanes in a block
    total_obody = int(per_block.sum())
    print(f"blocks={len(per_block)} obody_total={total_obody} "
          f"mean/block={per_block.mean():.2f} max={per_block.max()}")
    hist = np.bincount(np.clip(per_block, 0, 30))
    print("hist (iters -> blocks):",
          {i: int(v) for i, v in enumerate(hist) if v})
    print(f"scan wall {dt*1e3:.1f} ms -> {dt/max(total_obody,1)*1e9:.0f} "
          f"ns/obody")


if __name__ == "__main__":
    main()
