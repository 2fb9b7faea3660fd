"""Per-stage wall-clock breakdown of one device mapping batch on the
real chip: map kernel, merge_and_collapse, collapse/pack, D2H pulls,
host label fold.  Everything is timed post-compile with explicit
block_until_ready sync points so the tunnel's async dispatch doesn't
hide costs in the wrong bucket.

Usage:  python tools/profile_stages.py   (env knobs match bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_TXPS = int(os.environ.get("BENCH_TXPS", 20000))
TXP_LEN = int(os.environ.get("BENCH_TXP_LEN", 1000))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 100))
BATCH = int(os.environ.get("BENCH_BATCH", 16384))
ERR_RATE = float(os.environ.get("BENCH_ERR", 0.005))
CAP = int(os.environ.get("BENCH_CAP", 32))
KERNEL = os.environ.get("BENCH_KERNEL", "pallas")
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

    rng = np.random.default_rng(0)
    idx, seqs = B.build_world(rng)
    B.NUM_BATCHES = 1
    (c1, c2, lens), = B.simulate_batches(seqs, rng)
    log(f"backend={jax.default_backend()} batch={BATCH} cap={CAP} "
        f"kernel={KERNEL}")

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP, kernel=KERNEL)
    backend = DeviceMapperBackend(idx, opts)
    expected = parse_library_format("IU")

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, x)
        return x

    pc1, pl1 = backend._pad_batch(c1, lens)
    pc2, pl2 = backend._pad_batch(c2, lens)
    jl1 = jnp.asarray(pl1)
    jl2 = jnp.asarray(pl2)

    def stage_map():
        h1 = backend._map_lanes(pc1, pl1)
        h2 = backend._map_lanes(pc2, pl2)
        return sync((h1, h2))

    def stage_tail(h):
        h1, h2 = h
        return sync(backend._tail(h1, h2, jl1, jl2, expected,
                                  paired_end=True))

    acc = HashedEqClassAccumulator()

    def stage_finish(res):
        return backend.finish_batch_fast((res, BATCH), acc)

    t0 = time.time(); h = stage_map()
    log(f"map compile+run {time.time()-t0:.1f}s")
    t0 = time.time(); res = stage_tail(h)
    log(f"tail compile+run {time.time()-t0:.1f}s")
    t0 = time.time(); bs = stage_finish(res)
    log(f"finish compile+run {time.time()-t0:.1f}s (U={len(acc)})")

    stages = {}
    for _ in range(REPS):
        t0 = time.time(); h = stage_map()
        stages.setdefault("map", []).append(time.time() - t0)
        t0 = time.time(); res = stage_tail(h)
        stages.setdefault("tail", []).append(time.time() - t0)
        t0 = time.time(); bs = stage_finish(res)
        stages.setdefault("finish", []).append(time.time() - t0)

    total = 0.0
    for name, ts in stages.items():
        best = min(ts)
        total += best
        log(f"{name:10s} {best*1e3:8.1f} ms  (all: "
            + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")
    log(f"{'TOTAL':10s} {total*1e3:8.1f} ms  -> "
        f"{BATCH/total:,.0f} frags/s (unpipelined, stage-synced)")


if __name__ == "__main__":
    main()
