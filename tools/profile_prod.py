"""Definitive production-path bisection on the real chip.

Times, at bench scale, with real (small) D2H pulls as sync points:
  A. H2D upload of one batch's codes
  B. pallas kernel+postpass alone (map_oriented_lanes_pallas, jnp inputs)
  C. backend._map_lanes x2 mates (adds half-slicing + dict plumbing)
  D. production fused step: submit_pe + finish_batch_fast (bench truth)

Usage: python tools/profile_prod.py   (env knobs match bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
CAP = int(os.environ.get("BENCH_CAP", 32))
REPS = int(os.environ.get("PROF_REPS", 3))
KERNEL = os.environ.get("BENCH_KERNEL", "pallas")
SWEEP = int(os.environ.get("BENCH_SWEEP", 0))


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

    import bench as B
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
    c1, c2, lens = c1[:BATCH], c2[:BATCH], lens[:BATCH]
    assert c1.shape[0] == BATCH, (c1.shape, BATCH)
    log(f"backend={jax.default_backend()} batch={BATCH} cap={CAP}")

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator
    from sailfish_tpu.io.fastq import FastqBatch
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP, kernel=KERNEL,
                     xla2_sweep_win=SWEEP)
    backend = DeviceMapperBackend(idx, opts)
    expected = parse_library_format("IU")

    def timeit(name, fn, sync):
        t0 = time.time()
        r = fn()
        sync(r)
        log(f"{name:34s} compile+run {time.time()-t0:6.1f}s")
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            r = fn()
            sync(r)
            best = min(best, time.time() - t0)
        log(f"{name:34s} {best*1e3:8.1f} ms")
        return best

    # Steps are individually selectable (PROF_STEPS=ABD default ABD):
    # mixing the standalone B wrapper with the production D step in one
    # process intermittently trips the axon-tunnel executable-reuse
    # flake, so clean measurements run one lettered step per process.
    steps = os.environ.get("PROF_STEPS", "ABD").upper()

    # A. H2D
    if "A" in steps:
        timeit("A: H2D 2x codes (13.6MB)",
               lambda: (jax.device_put(c1), jax.device_put(c2)),
               lambda r: [x.block_until_ready() for x in r])

    # B. kernel+postpass alone
    text = backend._text_arg()
    jc1 = jnp.asarray(c1)
    jlens = jnp.asarray(lens)
    if "B" not in steps:
        pass
    elif KERNEL == "pallas":
        from sailfish_tpu.map.pallas_kernel import map_oriented_lanes_pallas

        kw = dict(
            k=idx.k, cand_cap=CAP, max_mmps=opts.max_mmps,
            max_steps=opts.effective_scan_steps(c1.shape[1]),
            ht_bits=backend.ht_bits, ht_probes=backend.ht_probes,
            skip_jump=False, uniform_len=int(lens[0]),
            n_text=backend._pallas_n_text,
            filt_bits=backend._pallas_filt_bits,
            w16_bits=backend._pallas_w16_bits, interpret=False,
        )
        timeit("B: map_oriented_lanes_pallas(m1)",
               lambda: map_oriented_lanes_pallas(text, jc1, jlens, **kw),
               lambda r: np.asarray(r["num_mapped_loci"]))
    elif KERNEL == "xla2":
        from sailfish_tpu.map.encode import make_oriented_lanes
        from sailfish_tpu.map.kernels2 import map_oriented_lanes_xla2

        lanes = make_oriented_lanes(jc1, jnp.asarray(lens),
                                    idx.prefix_bases)
        kw = dict(
            k=idx.k, cand_cap=CAP, max_mmps=opts.max_mmps,
            max_steps=opts.effective_scan_steps(c1.shape[1]),
            ht_bits=backend.ht_bits, ht_probes=backend.ht_probes,
            skip_jump=False, filt_bits=backend._xla2_filt_bits,
            sweep_win=SWEEP,
        )
        timeit("B: map_oriented_lanes_xla2(m1)",
               lambda: map_oriented_lanes_xla2(text, lanes, **kw),
               lambda r: np.asarray(r["num_mapped_loci"]))

    # C. _map_lanes x2 (jnp inputs) — OPT-IN: re-jitting the standalone
    # wrapper after step B intermittently trips the axon-tunnel
    # executable-reuse flake (async InvalidArgument) and wedges the
    # device for the rest of the process (docs/ROADMAP.md round-3
    # gotchas).  Step D carries the same information.
    if "C" in steps and os.environ.get("PROF_STEP_C", "0") == "1":
        jc2 = jnp.asarray(c2)
        timeit("C: _map_lanes x2 (jnp in)",
               lambda: (backend._map_lanes(jc1, lens),
                        backend._map_lanes(jc2, lens)),
               lambda r: [np.asarray(h["mlen"]) for pair in r
                          for h in pair])

    # D. production fused step
    if "D" in steps:
        acc = HashedEqClassAccumulator()

        def prod():
            tok = backend.submit_pe(
                FastqBatch(codes=c1, lens=lens),
                FastqBatch(codes=c2, lens=lens), expected,
            )
            return backend.finish_batch_fast(tok, acc)

        best = timeit("D: submit_pe+finish (production)", prod,
                      lambda r: r)
        log(f"production: {BATCH/best:,.0f} frags/s unpipelined")


if __name__ == "__main__":
    main()
