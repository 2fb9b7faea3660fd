"""In-mate-call stage bisection on the real chip (round-4 pack-domain
pipeline).

The production mapping call (map_oriented_lanes_pallas) is ONE jit;
this tool re-runs its internal stages as SEPARATE jits on identical
inputs so each stage's wall-clock is visible:

  s0 pack-domain lane build (RC + aligned words + N-mask)
  s1 16-mer lane screen (single-word Bloom)
  s2 clean-lane fast path (_fastpath_clean)
  s3 first compaction (argsort + small row gathers)
  s4 xscan (two-phase vectorized NIP scan on the live prefix)
  s5 second compaction + unpack + residual pallas kernel
  s6 dual prefix postpass + frame-0 scatters

Per-stage sums exceed the fused call (XLA fuses producers across stage
boundaries; every sync is a D2H round trip), but the RATIOS locate the
time.  Select stages with PIECES=0123456.

Sync points are real D2H pulls — block_until_ready can return early on
the tunneled chip (docs/ROADMAP.md).

Usage: python tools/profile_pieces.py   (env knobs match bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 65536))
CAP = int(os.environ.get("BENCH_CAP", 32))
REPS = int(os.environ.get("PROF_REPS", 4))
PIECES = os.environ.get("PIECES", "0123456")
FUSE = os.environ.get("PROF_FUSE", "1") == "1"  # mate-fused widths


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
            c1 = None
    if c1 is None:
        from sailfish_tpu.index.builder import save_index

        idx, seqs = B.build_world(rng)
        B.NUM_BATCHES = 1
        B.BATCH = max(BATCH, 65536)
        (c1, c2, lens), = B.simulate_batches(seqs, rng)
        save_index(idx, cache)
        np.savez(cache + ".batch.npz", c1=c1, c2=c2, lens=lens)
    c1, c2, lens = c1[:BATCH], c2[:BATCH], lens[:BATCH]
    if FUSE:
        # production mate fusion: both mates in one mapping call
        c1 = np.concatenate([c1, c2], axis=0)
        lens = np.concatenate([lens, lens])
    log(f"backend={jax.default_backend()} rows={c1.shape[0]} cap={CAP}")

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.map.pallas_kernel import (
        WINR, WINW, LB, _fastpath_clean, _intersect_sort, mmp_scan_pallas,
    )
    from sailfish_tpu.map.pipeline import DeviceMapperBackend
    from sailfish_tpu.map.xscan import nip_scan_xla, pos_words

    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP, kernel="pallas")
    backend = DeviceMapperBackend(idx, opts)
    text = backend._text_arg()
    k = idx.k
    n_text = backend._pallas_n_text
    filt_bits = backend._pallas_filt_bits
    w16_bits = backend._pallas_w16_bits
    filtxl_bits = backend._pallas_filtxl_bits
    ht_bits, ht_probes = backend.ht_bits, backend.ht_probes
    max_steps = opts.effective_scan_steps(c1.shape[1])
    L = c1.shape[1]
    ul = int(lens[0])
    Bn = c1.shape[0]
    B2 = 2 * Bn
    WA = max((L + 15) // 16 + 2, 9)
    WA = WA + (WA & 1)
    NB = 16 * WA

    def timeit(name, fn, sync):
        t0 = time.time()
        r = fn()
        sync(r)
        log(f"{name:46s} compile+run {time.time()-t0:6.1f}s")
        best = 1e9
        for _ in range(REPS):
            t0 = time.time()
            r = fn()
            sync(r)
            best = min(best, time.time() - t0)
        log(f"{name:46s} {best*1e3:8.1f} ms")
        return r, best

    jc = jnp.asarray(c1)
    jlens = jnp.asarray(lens)
    ht16, pk_rows, sa_ov = text["ht16"], text["pk_rows"], text["sa_ov"]
    text_flat = text["text_rows"].reshape(-1)
    filtxl_flat = text["filtxl_rows"].reshape(-1)
    w16_rows = text["w16_rows"]

    # ---- s0: pack-domain lane build ----
    @jax.jit
    def s0(codes, lens):
        rc = jnp.where(codes[:, :ul][:, ::-1] < 4,
                       jnp.uint8(3) - codes[:, :ul][:, ::-1], jnp.uint8(4))
        if ul < L:
            rc = jnp.concatenate(
                [rc, jnp.full((Bn, L - ul), 4, jnp.uint8)], axis=1)
        oc = jnp.concatenate([codes, rc], axis=0)
        olens = jnp.concatenate([lens, lens]).astype(jnp.int32)
        ocp = jnp.concatenate(
            [oc, jnp.full((B2, NB - L), 4, jnp.uint8)], axis=1)
        sub = jnp.where(ocp >= 4, jnp.uint8(0), ocp).astype(jnp.uint32)
        vv = sub.reshape(B2, WA, 16)
        aw = jnp.zeros((B2, WA), jnp.uint32)
        for jj in range(16):
            aw = (aw << jnp.uint32(2)) | vv[:, :, jj]
        nbv = (ocp >= 4).reshape(B2, NB // 32, 32)
        nmask = jnp.zeros((B2, NB // 32), jnp.uint32)
        for jj in range(32):
            nmask = nmask | (
                nbv[:, :, jj].astype(jnp.uint32) << jnp.uint32(jj))
        colL = jnp.arange(L, dtype=jnp.int32)[None, :]
        has_n = ((oc >= 4) & (colL < olens[:, None])).any(axis=1)
        return aw, nmask, has_n, olens

    def sync0(r):
        np.asarray(r[0][:1, :1])

    if "0" in PIECES:
        (aw, nmask, has_n, olens), _ = timeit(
            "s0 pack-domain lane build", lambda: s0(jc, jlens), sync0)
    else:
        aw, nmask, has_n, olens = s0(jc, jlens)

    # ---- s1: 16-mer screen (single-word Bloom) ----
    @jax.jit
    def s1(aw, olens, w16_rows):
        stride = min(16, k - 15)
        ps = list(range(0, L - 16 + 1, stride))

        def word_at(p):
            w, o = p >> 4, p & 15
            if o == 0:
                return aw[:, w]
            return ((aw[:, w] << jnp.uint32(2 * o))
                    | (aw[:, w + 1] >> jnp.uint32(32 - 2 * o)))

        keys = jnp.stack([word_at(p) for p in ps], axis=1)
        wm = jnp.uint32((1 << w16_bits) // 32 - 1)
        h1 = keys * jnp.uint32(0x9E3779B1)
        h1 = h1 ^ (h1 >> jnp.uint32(15))
        h1 = h1 * jnp.uint32(0xC2B2AE3D)
        h1 = (h1 ^ (h1 >> jnp.uint32(13))) & wm
        h2 = keys * jnp.uint32(0x165667B1)
        h2 = h2 ^ (h2 >> jnp.uint32(16))
        h2 = h2 * jnp.uint32(0x7FEB352D)
        h2 = h2 ^ (h2 >> jnp.uint32(11))
        v = w16_rows[h1.astype(jnp.int32)]
        present = (
            (v >> (h2 & jnp.uint32(31)).astype(jnp.int32))
            & (v >> ((h2 >> jnp.uint32(5)) & jnp.uint32(31)).astype(
                jnp.int32)) & 1) == 1
        valid = (jnp.asarray(ps, jnp.int32)[None, :] + 16
                 <= olens[:, None])
        keep = jnp.any(present & valid, axis=1)
        return jnp.where(keep, olens, 0)

    if "1" in PIECES:
        (klens, _) = timeit("s1 16-mer lane screen (single-word)",
                            lambda: s1(aw, olens, w16_rows),
                            lambda r: np.asarray(r[:8]))
    else:
        klens = s1(aw, olens, w16_rows)
    log(f"   live after screen: {int((np.asarray(klens) > 0).sum())}/{B2}")

    # ---- s2: clean fast path ----
    @jax.jit
    def s2(aw, has_n, klens, ht16, pk_rows, text_flat):
        cl, _, _ = _fastpath_clean(
            aw, has_n, klens, ht16, pk_rows, text_flat,
            k=k, ht_bits=ht_bits, ht_probes=ht_probes, n_text=n_text)
        return cl, jnp.where(cl, 0, klens)

    if "2" in PIECES:
        ((f_clean, klens2), _) = timeit(
            "s2 clean-lane fast path",
            lambda: s2(aw, has_n, klens, ht16, pk_rows, text_flat),
            lambda r: np.asarray(r[0][:8]))
    else:
        f_clean, klens2 = s2(aw, has_n, klens, ht16, pk_rows, text_flat)
    log(f"   live after fastpath: "
        f"{int((np.asarray(klens2) > 0).sum())}/{B2}")

    # ---- s3: first compaction ----
    @jax.jit
    def s3(aw, nmask, has_n, klens2):
        order = jnp.argsort((klens2 == 0).astype(jnp.int32), stable=True)
        return (order, aw[order], nmask[order], klens2[order],
                has_n[order])

    if "3" in PIECES:
        ((order, aw_c, nm_c, kl_c, hn_c), _) = timeit(
            "s3 first compaction (argsort + small gathers)",
            lambda: s3(aw, nmask, has_n, klens2),
            lambda r: np.asarray(r[1][:1, :1]))
    else:
        order, aw_c, nm_c, kl_c, hn_c = s3(aw, nmask, has_n, klens2)

    # ---- s4: xscan ----
    P = max(B2 // 4, LB)
    xscan_t = int(os.environ.get("SF_XSCAN_T", "7"))
    xscan_f = min(int(os.environ.get("SF_XSCAN_F", "4")), 8, CAP)
    xscan_b = tuple(
        tuple(int(x) for x in seg.split(":"))
        for seg in os.environ.get("SF_XSCAN_B", "2:1,4:1,8:3").split(",")
        if seg
    )

    @jax.jit
    def s4(aw_c, kl_c, hn_c, ht16, pk_rows, sa_ov, text_flat,
           filtxl_flat):
        return nip_scan_xla(
            aw_c[:P], kl_c[:P], hn_c[:P], ht16, pk_rows, sa_ov,
            text_flat, filtxl_flat, k=k, C=CAP, M=opts.max_mmps,
            F=xscan_f, T=xscan_t, L_read=min(L, WINR), ht_bits=ht_bits,
            ht_probes=ht_probes, filt_bits=filtxl_bits, n_text=n_text,
            skip_jump=False, sched_b=xscan_b)

    if "p" in PIECES:
        # s4 sub-bisection: the per-position presence precompute alone
        # (pos_words keys + one Bloom gather per (lane, position) +
        # reverse cummin next-present table)
        npos = min(L, WINR) - k + 1

        @jax.jit
        def s4p(aw_c, filtxl_flat):
            awp = aw_c[:P]
            k0a = pos_words(awp, npos)
            k1a = pos_words(awp[:, 1:], npos) >> jnp.uint32(2 * (32 - k))
            h1a = (k0a * jnp.uint32(0x9E3779B1))
            h1a = h1a ^ (h1a >> jnp.uint32(15))
            h1a = h1a * jnp.uint32(0xC2B2AE3D)
            h1a = h1a ^ (h1a >> jnp.uint32(13))
            h2a = (k1a * jnp.uint32(0x27D4EB2F)) ^ (
                k0a * jnp.uint32(0x165667B1))
            h2a = h2a ^ (h2a >> jnp.uint32(16))
            h2a = h2a * jnp.uint32(0x7FEB352D)
            h2a = h2a ^ (h2a >> jnp.uint32(11))
            fmask = jnp.int32((1 << filtxl_bits) - 1)
            wid = h1a.astype(jnp.int32) & (fmask >> 5)
            v = filtxl_flat[wid]
            pres = (((v >> (h2a.astype(jnp.int32) & 31))
                     & (v >> ((h2a >> jnp.uint32(5)).astype(jnp.int32)
                              & 31))) & 1) == 1
            posi = jnp.arange(npos, dtype=jnp.int32)[None, :]
            pres = pres & (posi + k <= kl_c[:P][:, None])
            nxt = jax.lax.cummin(
                jnp.where(pres, posi, jnp.int32(1 << 20)), axis=1,
                reverse=True)
            return nxt

        timeit("s4p   presence precompute only",
               lambda: s4p(aw_c, filtxl_flat),
               lambda r: np.asarray(r[:8]))

    if "4" in PIECES:
        (xs, _) = timeit(
            "s4 xscan (two-phase NIP scan)",
            lambda: s4(aw_c, kl_c, hn_c, ht16, pk_rows, sa_ov,
                       text_flat, filtxl_flat),
            lambda r: np.asarray(r[0][:8]))
    else:
        xs = s4(aw_c, kl_c, hn_c, ht16, pk_rows, sa_ov, text_flat,
                filtxl_flat)
    handled = np.asarray(xs[0])
    livec = np.asarray(kl_c)[:P] > 0
    log(f"   xscan handled: {int(handled.sum())}, "
        f"punted: {int(livec.sum() - handled.sum())}")

    # ---- s5: second compaction + unpack + residual kernel ----
    PK = B2 if (B2 <= 32768 or w16_bits == 0) else max(B2 // 8, LB)
    kl_np = np.asarray(kl_c).copy()
    kl_np[:P] = np.where(handled, 0, kl_np[:P])
    kl_k = jnp.asarray(kl_np)
    live2 = int((kl_np > 0).sum())
    log(f"   kernel residual: {live2} lanes, PK={PK}")

    if "5" in PIECES:
        @jax.jit
        def s5(aw_c, nm_c, kl_k, text_rows, sa_rows, ht_rows, filt_rows):
            livek = kl_k > 0
            lv = jnp.minimum(livek.sum().astype(jnp.int32), PK)
            order2 = jnp.argsort(~livek, stable=True)
            idx2 = order2[:PK]
            aw_k = aw_c[idx2]
            nm_k = nm_c[idx2]
            kl_kc = kl_k[idx2]
            awr = jnp.repeat(aw_k, 16, axis=1)
            shr = jnp.asarray(
                (2 * (15 - (np.arange(NB) & 15))).astype(np.uint32)
            )[None, :]
            cds = ((awr >> shr) & jnp.uint32(3)).astype(jnp.int32)
            nmr = jnp.repeat(nm_k, 32, axis=1)
            shn = jnp.asarray(
                (np.arange(NB) % 32).astype(np.uint32))[None, :]
            nbit = (nmr >> shn) & jnp.uint32(1)
            codes_k = jnp.where(nbit == 1, jnp.int32(4), cds)
            if WINW > NB:
                codes_k = jnp.concatenate(
                    [codes_k, jnp.full((PK, WINW - NB), 4, jnp.int32)],
                    axis=1)
            else:
                codes_k = codes_k[:, :WINW]
            npw = min(L + 1, WINW)
            pw_k = pos_words(aw_k, npw)
            if WINW > npw:
                pw_k = jnp.concatenate(
                    [pw_k, jnp.zeros((PK, WINW - npw), jnp.uint32)],
                    axis=1)
            pw_k = jax.lax.bitcast_convert_type(pw_k, jnp.int32)
            return mmp_scan_pallas(
                codes_k, pw_k, kl_kc, text_rows, sa_rows, ht_rows,
                filt_rows, lv, k=k, cand_cap=CAP,
                max_mmps=opts.max_mmps, max_steps=max_steps,
                ht_bits=ht_bits, ht_probes=ht_probes, skip_jump=False,
                n_text=n_text, interpret=False, filt_bits=filt_bits,
                filt_access="row")

        timeit("s5 2nd compaction + unpack + kernel",
               lambda: s5(aw_c, nm_c, kl_k, text["text_rows"],
                          text["sa_rows"], text["ht_rows"],
                          text["filt_rows"]),
               lambda r: np.asarray(r[3][:8]))

    # ---- s6: dual prefix postpass + frame-0 scatters ----
    if "6" in PIECES:
        M, C = opts.max_mmps, CAP
        xs_txp, xs_pin, xs_vld, xs_nm = xs[1], xs[2], xs[3], xs[4]
        gk = (jnp.zeros((PK, M * C), jnp.int32),
              jnp.zeros((PK, M * C), jnp.int32),
              jnp.zeros((PK, M * C), jnp.int32),
              jnp.zeros((PK, 4), jnp.int32))

        @jax.jit
        def s6(xs_txp, xs_pin, xs_vld, xs_nm, gk_txp, gk_pin, gk_vld,
               gk_meta, order):
            xt, xp, xv = _intersect_sort(xs_txp, xs_pin, xs_vld, xs_nm,
                                         C=xscan_f, M=M)
            padc = ((0, 0), (0, C - xscan_f))
            xt = jnp.pad(xt, padc)
            xv = jnp.pad(xv, padc)
            kt, kp, kv = _intersect_sort(gk_txp, gk_pin, gk_vld,
                                         gk_meta[:, 0], C=C, M=M)
            txp0 = jnp.zeros((B2, C), jnp.int32)
            vld0 = jnp.zeros((B2, C), bool)
            oP = order[:P]
            txp0 = txp0.at[oP].set(xt)
            vld0 = vld0.at[oP].set(xv)
            oK = order[:PK]  # stand-in for order[idx2]
            txp0 = txp0.at[oK].set(kt)
            vld0 = vld0.at[oK].set(kv)
            return txp0, vld0

        timeit("s6 dual prefix postpass + scatters",
               lambda: s6(xs_txp, xs_pin, xs_vld, xs_nm, *gk, order),
               lambda r: np.asarray(r[0][:1, :1]))


if __name__ == "__main__":
    main()
