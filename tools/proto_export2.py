"""Prototype 2: cross-process EXECUTABLE cache for the fused step.

The axon backend never reads the jax persistent compilation cache, so
every process pays a full remote compile whose wall time is tunnel
weather (measured 52.8s / 141.7s / 704.4s for the identical HLO).
PJRT executable serialization works on this backend; this prototype
proves the flow on the production fused step:

EXPORT=1: AOT-compile the fused PE step, serialize the EXECUTABLE to
/tmp/step_exe.pkl.   Default: fresh process, deserialize_and_load +
run one real batch — no tracing, no compile.
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/step_exe.pkl"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from tools.proto_export import setup

    backend, expected, ul1, L1, args = setup()
    if os.environ.get("EXPORT", "0") == "1":
        from jax.experimental.serialize_executable import serialize

        fn = backend._pe_step(expected, ul1, ul1, L1, L1)
        t0 = time.time()
        lowered = fn.lower(*args)
        log(f"trace+lower: {time.time()-t0:.1f}s")
        t0 = time.time()
        comp = lowered.compile()
        log(f"compile: {time.time()-t0:.1f}s")
        t0 = time.time()
        payload, in_tree, out_tree = serialize(comp)
        pickle.dump((payload, in_tree, out_tree), open(PATH, "wb"))
        log(f"serialize: {time.time()-t0:.1f}s "
            f"({os.path.getsize(PATH)/1e6:.1f} MB)")
    else:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        t0 = time.time()
        payload, in_tree, out_tree = pickle.load(open(PATH, "rb"))
        comp = deserialize_and_load(payload, in_tree, out_tree)
        log(f"load+deserialize: {time.time()-t0:.1f}s")
        t0 = time.time()
        r = comp(*args)
        np.asarray(r["scalars"][:1])
        log(f"first exec: {time.time()-t0:.2f}s")
        t0 = time.time()
        r = comp(*args)
        s = np.asarray(r["scalars"])
        log(f"second exec: {time.time()-t0:.2f}s; mapped={int(s[0])}")


if __name__ == "__main__":
    main()
