"""Microbenchmark of the pallas per-candidate op chain on real hardware.

Times a scalar fori_loop whose body is a dependent chain of the same
ops the mapping kernel's _align_one uses (dynamic sublane roll of a
(16,128) tile, dynamic lane roll of a (1,256) pair, scratch stores),
isolating per-op cost from DMA and phase structure.  Each variant runs
ITERS loop iterations; report is ns/iteration and ns/op.

Usage: python tools/ubench_pallas.py   (on the TPU)
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("UB_ITERS", 100_000))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def make(variant: str):
        def kern(x_ref, hbm_ref, o_ref, scr, pair, al, dscr, dsem):
            def body(t, acc):
                tt = acc & jnp.int32(7)
                if variant == "empty":
                    return acc + 1
                if variant == "roll16x4":
                    r = scr[...]
                    for _ in range(4):
                        r = pltpu.roll(r, 16 - tt, 0)
                    return acc + r[0, 0]
                if variant == "roll1x4":
                    r = pair[...]
                    for _ in range(4):
                        r = pltpu.roll(r, 256 - tt, 1)
                    return acc + r[0, 0]
                if variant == "store6":
                    for j in range(3):
                        pair[:, :128] = scr[j : j + 1, :]
                        pair[:, 128:] = scr[j + 1 : j + 2, :]
                    return acc + pair[0, 0]
                if variant == "alignchain":
                    # the real _align_one shape: big roll, two
                    # pair-roll-store halves, identity where+roll+stores
                    tr = pltpu.roll(scr[...], 16 - tt, 0)
                    pair[:, :128] = tr[0:1, :]
                    pair[:, 128:] = tr[3:4, :]
                    al[0:1, 0:128] = pltpu.roll(pair[...], 256 - tt, 1)[:, 0:128]
                    pair[:, :128] = tr[3:4, :]
                    pair[:, 128:] = tr[6:7, :]
                    al[0:1, 128:256] = pltpu.roll(pair[...], 256 - tt, 1)[:, 0:128]
                    idrows = jnp.where(tt == 0, tr[1:3, :], tr[4:6, :])
                    idal = pltpu.roll(idrows, 128 - tt, 1)
                    al[1:2, 0:1] = idal[0:1, 0:1]
                    al[1:2, 1:2] = idal[1:2, 0:1]
                    return acc + al[1, 0]
                if variant == "lcp":
                    neq = (al[...] - al[0:1, :]) != 0
                    col = jax.lax.broadcasted_iota(jnp.int32, al.shape, 1)
                    colm = jnp.where(neq & (col >= acc), col, jnp.int32(256))
                    return acc + jnp.min(colm)
                if variant == "when8_true":
                    for j in range(8):
                        @pl.when(acc >= j)
                        def _():
                            pair[0:1, j : j + 1] = jnp.full(
                                (1, 1), j, jnp.int32)
                    return acc + 1
                if variant == "when8_false":
                    for j in range(8):
                        @pl.when(acc < -j - 1)
                        def _():
                            pair[0:1, j : j + 1] = jnp.full(
                                (1, 1), j, jnp.int32)
                    return acc + 1
                if variant == "when8_smem":
                    for j in range(8):
                        @pl.when(acc >= j)
                        def _():
                            o_ref[0, 0] = acc + j
                    return acc + 1
                if variant == "select8":
                    v = acc
                    for j in range(8):
                        v = jnp.where(acc >= j, v + j, v)
                    o_ref[0, 0] = v
                    return acc + 1
                if variant == "smem16":
                    v = acc
                    for _ in range(16):
                        v = x_ref[0, v & 0] + v  # dependent SMEM loads
                    return v + 1
                if variant == "dma16":
                    row = (acc & jnp.int32(1023)) * 8
                    pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(row, 16), :],
                        dscr.at[pl.ds(0, 16), :],
                        dsem.at[0],
                    ).start()
                    pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(row, 16), :],
                        dscr.at[pl.ds(0, 16), :],
                        dsem.at[0],
                    ).wait()
                    return acc + 1
                if variant == "dma16x4":
                    for j in range(4):
                        row = ((acc + 997 * j) & jnp.int32(1023)) * 8
                        pltpu.make_async_copy(
                            hbm_ref.at[pl.ds(row, 16), :],
                            dscr.at[pl.ds(j * 16, 16), :],
                            dsem.at[j],
                        ).start()
                    for j in range(4):
                        row = ((acc + 997 * j) & jnp.int32(1023)) * 8
                        pltpu.make_async_copy(
                            hbm_ref.at[pl.ds(row, 16), :],
                            dscr.at[pl.ds(j * 16, 16), :],
                            dsem.at[j],
                        ).wait()
                    return acc + 1
                if variant == "while0":
                    def c(s):
                        return s[1] < 0

                    def b(s):
                        return (s[0] + 1, s[1])

                    r = jax.lax.while_loop(c, b, (acc, acc))
                    return r[0] + 1
                raise ValueError(variant)

            o_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, x_ref[0, 0])

        return kern

    x = jnp.zeros((1, 1), jnp.int32)
    hbm = jnp.zeros((1024 * 8 + 16, 128), jnp.int32)
    for variant in ("empty", "roll16x4", "roll1x4", "store6",
                    "alignchain", "lcp", "when8_true", "when8_false",
                    "when8_smem", "select8", "while0", "smem16",
                    "dma16", "dma16x4"):
        f = pl.pallas_call(
            make(variant),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((16, 128), jnp.int32),
                pltpu.VMEM((1, 256), jnp.int32),
                pltpu.VMEM((8, 256), jnp.int32),
                pltpu.VMEM((64, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )
        r = jax.jit(f)(x, hbm)
        np.asarray(r)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(jax.jit(f)(x, hbm))
            best = min(best, time.time() - t0)
        print(f"{variant:12s} {best*1e9/ITERS:8.1f} ns/iter", flush=True)


if __name__ == "__main__":
    main()
