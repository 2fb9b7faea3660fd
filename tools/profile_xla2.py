"""Parameter sweep for the xla2 kernel on the real chip.

Times one mate-call per configuration with real D2H sync pulls
(block_until_ready lies over the tunnel). Run AFTER /tmp/race1.py has
picked the winning sweep mode; this tunes its knobs.

Env:
  BENCH_BATCH (65536)   fragments per batch
  BENCH_CAP   (32)      hit capacity
  PROF_GRID   ("sweep=4,8,16;c0=2,4;rounds=8,10;floor=2048,4096")
  PROF_REPS   (3)
"""
from __future__ import annotations

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
CAP = int(os.environ.get("BENCH_CAP", 32))
REPS = int(os.environ.get("PROF_REPS", 3))
GRID = os.environ.get(
    "PROF_GRID", "sweep=8;c0=2,4;rounds=8,10;floor=2048,4096"
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.index.builder import load_index
    from sailfish_tpu.map.encode import make_oriented_lanes
    from sailfish_tpu.map.kernels2 import map_oriented_lanes_xla2
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    idx = load_index("/tmp/benchidx_20000")
    z = np.load("/tmp/benchidx_20000.batch.npz")
    c1, lens = z["c1"][:BATCH], z["lens"][:BATCH]
    assert c1.shape[0] == BATCH

    grid = {}
    for part in GRID.split(";"):
        k, v = part.split("=")
        grid[k] = [int(x) for x in v.split(",")]

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP, kernel="xla2")
    bk = DeviceMapperBackend(idx, opts)
    text = bk._text_arg()
    lanes = make_oriented_lanes(
        jnp.asarray(c1), jnp.asarray(lens), idx.prefix_bases
    )
    base_kw = dict(
        k=idx.k, cand_cap=CAP, max_mmps=opts.max_mmps,
        max_steps=opts.effective_scan_steps(c1.shape[1]),
        ht_bits=bk.ht_bits, ht_probes=bk.ht_probes,
        skip_jump=False, filt_bits=bk._xla2_filt_bits,
    )

    results = []
    for sw, c0, nr, fl in itertools.product(
        grid.get("sweep", [8]), grid.get("c0", [4]),
        grid.get("rounds", [10]), grid.get("floor", [4096]),
    ):
        kw = dict(base_kw, sweep_win=sw, c_tier0=c0, n_rounds=nr,
                  floor_width=fl)
        name = f"sweep={sw} c0={c0} rounds={nr} floor={fl}"
        try:
            t0 = time.time()
            r = map_oriented_lanes_xla2(text, lanes, **kw)
            nm = np.asarray(r["num_mapped_loci"][:64])
            log(f"{name:44s} compile+run {time.time()-t0:6.1f}s")
            best = 1e9
            for _ in range(REPS):
                t0 = time.time()
                r = map_oriented_lanes_xla2(text, lanes, **kw)
                np.asarray(r["num_mapped_loci"][:64])
                best = min(best, time.time() - t0)
            log(f"{name:44s} {best*1e3:8.1f} ms")
            results.append((best, name))
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")

    log("==== best configs ====")
    for t, name in sorted(results)[:8]:
        log(f"  {t*1e3:8.1f} ms  {name}")


if __name__ == "__main__":
    main()
