"""Production-step bisection: host packing vs device compute vs finish.

Times, at bench scale:
  P: host _pack_reads of both mates (numpy, per batch)
  S: device fused step (prefetched device inputs, sync on scalars pull)
  F: finish_batch_fast given a completed step (D2H + host fold)
  D: submit_pe + finish (the unpipelined production step, = P+S+F)

Usage: python tools/profile_step.py   (env knobs match bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
CAP = int(os.environ.get("BENCH_CAP", 32))
REPS = int(os.environ.get("PROF_REPS", 5))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench as B
    cache = f"/tmp/benchidx_{os.environ.get('BENCH_TXPS', 20000)}"
    rng = np.random.default_rng(0)
    from sailfish_tpu.index.builder import load_index

    idx = load_index(cache)
    z = np.load(cache + ".batch.npz")
    c1, c2, lens = z["c1"][:BATCH], z["c2"][:BATCH], z["lens"][:BATCH]
    log(f"backend={jax.default_backend()} batch={BATCH} cap={CAP}")

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator
    from sailfish_tpu.io.fastq import FastqBatch
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP, kernel="pallas")
    backend = DeviceMapperBackend(idx, opts)
    expected = parse_library_format("IU")
    b1 = FastqBatch(codes=c1, lens=lens)
    b2 = FastqBatch(codes=c2, lens=lens)

    def timeit(name, fn, sync):
        t0 = time.time()
        r = fn()
        sync(r)
        log(f"{name:40s} compile+run {time.time()-t0:6.1f}s")
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            r = fn()
            sync(r)
            best = min(best, time.time() - t0)
        log(f"{name:40s} {best*1e3:8.1f} ms")
        return r, best

    # P: host packing
    timeit("P: host _pack_reads + pad (both mates)",
           lambda: backend.prefetch_pe(b1, b2), lambda r: None)

    # S: device fused step from prefetched inputs
    pf = backend.prefetch_pe(b1, b2)

    def step():
        return backend.submit_pe(pf, expected)

    def sync_s(tok):
        np.asarray(tok[0]["scalars"][:8])

    (tok, _) = timeit("S: device fused step (prefetched)", step, sync_s)

    # F: finish from a completed step
    def fin():
        acc = HashedEqClassAccumulator()
        t = backend.submit_pe(pf, expected)
        np.asarray(t[0]["scalars"][:1])  # drain compute first
        t0 = time.time()
        bs = backend.finish_batch_fast(t, acc)
        return time.time() - t0

    fs = [fin() for _ in range(REPS)]
    log(f"{'F: finish_batch_fast (D2H + fold)':40s} "
        f"{min(fs)*1e3:8.1f} ms")

    # D: the whole unpipelined step
    acc = HashedEqClassAccumulator()

    def prod():
        tok = backend.submit_pe(b1, b2, expected)
        return backend.finish_batch_fast(tok, acc)

    (_, best) = timeit("D: submit_pe+finish (production)", prod,
                       lambda r: r)
    log(f"production: {BATCH/best:,.0f} frags/s unpipelined")


if __name__ == "__main__":
    main()
