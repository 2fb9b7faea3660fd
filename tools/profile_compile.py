"""Warmup decomposition: where do the warm-start seconds go?

The bench warmup (one fused production step) has three sequential
costs: (1) Python tracing + StableHLO lowering of the fused step —
runs EVERY process, the persistent cache cannot help; (2) backend
compile — a persistent-cache HIT loads the serialized executable, a
MISS compiles (remote, minutes on the tunnel); (3) first execution.
This tool times them separately so the warmup work targets the right
one.

Usage: python tools/profile_compile.py   (env knobs match bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
CAP = int(os.environ.get("BENCH_CAP", 64))
CAP_MAX = int(os.environ.get("BENCH_CAP_MAX", 1024))


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
    B.BATCH = BATCH
    rng = np.random.default_rng(0)
    t0 = time.time()
    idx, seqs = B.build_world(rng)
    log(f"world ready in {time.time()-t0:.1f}s")

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.io.fastq import FastqBatch
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP,
                     hit_capacity_max=CAP_MAX, kernel="pallas")
    backend = DeviceMapperBackend(idx, opts)
    expected = parse_library_format("IU")

    t0 = time.time()
    text = backend._text_arg()
    log(f"prepare_pallas_text + device_put: {time.time()-t0:.1f}s")

    # one real batch, padded/packed exactly like submit_pe
    B.NUM_BATCHES = 1
    (c1, c2, lens), = B.simulate_batches(seqs, rng)
    from sailfish_tpu.map.pipeline import _pack_reads

    pc1, pl1 = backend._pad_batch(c1, lens)
    pc2, pl2 = backend._pad_batch(c2, lens)
    ul1 = backend._uniform_len(pl1)
    L1 = pc1.shape[1]
    pw1, nm1 = _pack_reads(pc1)
    pw2, nm2 = _pack_reads(pc2)
    import jax.numpy as jnp

    args = (text, backend._bias_text_arg(),
            jnp.asarray(pw1), jnp.asarray(nm1), jnp.asarray(pl1),
            jnp.asarray(pw2), jnp.asarray(nm2), jnp.asarray(pl2))

    fn = backend._pe_step(expected, ul1, ul1, L1, L1)
    t0 = time.time()
    lowered = fn.lower(*args)
    t_lower = time.time() - t0
    log(f"trace + lower:     {t_lower:8.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"compile/cache-load:{t_compile:8.1f}s")
    t0 = time.time()
    # execute via the jitted fn (the lowered/compiled pair shares the
    # jit's cache, so this dispatches the compiled executable)
    r = fn(*args)
    np.asarray(r["scalars"][:1])
    log(f"first execution:   {time.time()-t0:8.1f}s")
    log(f"TOTAL warm-path:   {t_lower + t_compile:8.1f}s (+ first exec)")


if __name__ == "__main__":
    main()
