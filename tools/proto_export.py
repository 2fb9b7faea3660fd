"""Prototype: AOT-export the fused production step to skip per-process
tracing/lowering (the dominant warm-start cost).

Phase 1 (EXPORT=1): build the backend, jax.export the fused PE step,
serialize to /tmp/step_export.bin.
Phase 2 (default): deserialize in a FRESH process, jit the .call, run
one real batch, time every phase — the candidate warm path.
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
PATH = "/tmp/step_export.bin"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import bench as B
    B.BATCH = BATCH
    rng = np.random.default_rng(0)
    idx, seqs = B.build_world(rng)

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend, _pack_reads

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP,
                     hit_capacity_max=CAP_MAX, kernel="pallas")
    backend = DeviceMapperBackend(idx, opts)
    expected = parse_library_format("IU")

    B.NUM_BATCHES = 1
    (c1, c2, lens), = B.simulate_batches(seqs, rng)
    pc1, pl1 = backend._pad_batch(c1, lens)
    pc2, pl2 = backend._pad_batch(c2, lens)
    ul1 = backend._uniform_len(pl1)
    L1 = pc1.shape[1]
    pw1, nm1 = _pack_reads(pc1)
    pw2, nm2 = _pack_reads(pc2)
    import jax.numpy as jnp

    t0 = time.time()
    text = backend._text_arg()
    log(f"prepare text: {time.time()-t0:.1f}s")
    args = (text, backend._bias_text_arg(),
            jnp.asarray(pw1), jnp.asarray(nm1), jnp.asarray(pl1),
            jnp.asarray(pw2), jnp.asarray(nm2), jnp.asarray(pl2))
    return backend, expected, ul1, L1, args


def main():
    import jax

    if os.environ.get("EXPORT", "0") == "1":
        backend, expected, ul1, L1, args = setup()
        fn = backend._pe_step(expected, ul1, ul1, L1, L1)
        t0 = time.time()
        exp = jax.export.export(fn)(*args)
        log(f"export (trace+lower): {time.time()-t0:.1f}s")
        t0 = time.time()
        blob = exp.serialize()
        open(PATH, "wb").write(blob)
        log(f"serialize: {time.time()-t0:.1f}s ({len(blob)/1e6:.1f} MB)")
        # sanity: run it
        t0 = time.time()
        r = jax.jit(exp.call)(*args)
        np.asarray(r["scalars"][:1])
        log(f"exec via exported.call: {time.time()-t0:.1f}s")
    else:
        t_all = time.time()
        backend, expected, ul1, L1, args = setup()
        t0 = time.time()
        exp = jax.export.deserialize(bytearray(open(PATH, "rb").read()))
        log(f"deserialize: {time.time()-t0:.1f}s")
        t0 = time.time()
        fn = jax.jit(exp.call)
        r = fn(*args)
        np.asarray(r["scalars"][:1])
        log(f"first call (compile+exec): {time.time()-t0:.1f}s")
        t0 = time.time()
        r = fn(*args)
        np.asarray(r["scalars"][:1])
        log(f"second call: {time.time()-t0:.2f}s")
        log(f"TOTAL fresh-process warm path: {time.time()-t_all:.1f}s")


if __name__ == "__main__":
    main()
