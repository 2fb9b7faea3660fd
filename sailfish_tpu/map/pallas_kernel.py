"""Pallas TPU kernel for the MMP-scan inner loop.

The XLA formulation of the scan (map/kernels.py) pays for masked lanes
and masked candidates because every step is a full-width gather; this
kernel gives each lane real dynamic control flow:

  * per lane, a scalar while-loop runs only the steps that lane needs
    (jump-skip: ~#errors + 1); probes, candidate fetches and compares are
    predicated, so skipped work is actually skipped
  * every HBM access is an 8-row-aligned (8, 128) i32 tile DMA followed
    by a dynamic SUBLANE rotate (row to front) and a dynamic LANE rotate
    (element to front) — the only dynamic addressing Mosaic's tiling
    rules allow for large arrays
  * the seed probe fetches one aligned hash-table tile and rotates the
    wanted 16-word bucket to the front
  * each candidate fetches two aligned text tiles, rotates them into
    READ coordinates, then ONE vectorized true-code compare yields every
    candidate's LCP (separators and read padding terminate matches
    naturally)

Mosaic rules this design honors (each learned the hard way):
  - DMA slices must be whole (8, 128) tiles at 8-row-aligned offsets for
    large i32 arrays; arbitrary-offset byte slices are not allowed
  - dynamic rotate (pltpu.roll) exists for 32-bit lanes only — hence the
    text/SA/read copies used here are i32 (one code per element) — and
    works on both the sublane and lane axes
  - scalar stores target SMEM; vector stores need static offsets
  - no unsigned scalars/reductions; hash math runs in wrapping int32
    with masked logical shifts

Interface: mmp_scan_pallas returns per-lane MMP slots (candidate global
positions + validity + query positions); the shared XLA post-pass
(intersection/dedupe/sort) then produces the same hit arrays as
map_oriented_lanes.  Selected via QuantOpts.kernel = "pallas"; validated
against the XLA kernel and the numpy oracle in interpret mode on CPU.

Constraints: reads <= WINR (128) bases; k in [17, 31]; both skip rules
(nip default / jump) — misses fast-forward inside the probe loop so an
error region costs inner probe iterations, not full outer steps.

Hardware status: compiles and runs on the TPU v5e — the scan step
measures ~188k fragments/s at batch 4096 (22 ms for 8192 lanes) vs ~18k
fragments/s for the XLA scan, a ~10x kernel-level speedup from actually
skipping inactive work.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINR = 128          # max read length
ROW = 128           # text codes per i32 row
WINW = 256          # read-coordinate window width (>= max read length x2)
LB = int(os.environ.get("SF_PALLAS_LB", "8"))  # lanes per kernel instance
BUCKETS_PER_ROW = 8  # 8 x 16 i32 = one 512-byte hash row
PAD_ROWS = 24       # row padding so 8-row aligned fetches stay in bounds
_LAST_TEXT_ID = None  # jit-cache guard (see map_oriented_lanes_pallas)


def _lsr32(x, n: int):
    """Logical right shift of an int32 scalar (mask off sign extension)."""
    return (x >> jnp.int32(n)) & jnp.int32((1 << (32 - n)) - 1)


def _mix_i32(k0, k1):
    """index/kmerhash.mix_hash_u32 in two's-complement int32 (wrapping
    multiply/xor are bit-identical; shifts need explicit masking)."""
    m0 = jnp.int32(np.int32(np.uint32(0x9E3779B1)))
    m1 = jnp.int32(np.int32(np.uint32(0x85EBCA77)))
    m2 = jnp.int32(np.int32(np.uint32(0xC2B2AE3D)))
    h = (k0 * m0) ^ (k1 * m1)
    h = h ^ _lsr32(h, 15)
    h = h * m2
    h = h ^ _lsr32(h, 13)
    return h


def _mix2_i32(k0, k1):
    """index/kmerhash.filter_hash2_u32 in int32 (second presence-filter
    probe; the first reuses _mix_i32, which the bucket index needs
    anyway)."""
    ma = jnp.int32(np.int32(np.uint32(0x27D4EB2F)))
    mb = jnp.int32(np.int32(np.uint32(0x165667B1)))
    mc = jnp.int32(np.int32(np.uint32(0x7FEB352D)))
    h = (k1 * ma) ^ (k0 * mb)
    h = h ^ _lsr32(h, 16)
    h = h * mc
    h = h ^ _lsr32(h, 11)
    return h


def pack_kmer_table_rows(ht, sa=None) -> np.ndarray:
    """(S, BUCKET) arrays -> (S/8, 128) i32: eight interleaved 16-word
    buckets [k0 x4 | k1 x4 | lo x4 | cnt x4] per row, so one probe is a
    single (1, 128) row DMA + rotate.

    When `sa` is given, unique k-mers (cnt == 1) store the TEXT POSITION
    sa[lo] directly instead of the SA offset — the kernel then skips the
    suffix-array window fetch entirely for the (majority) unique-seed
    case, removing one HBM round trip from the critical path."""
    lo = ht["ht_lo"].astype(np.int32)
    cnt = ht["ht_cnt"].astype(np.int32)
    if sa is not None:
        direct = np.asarray(sa, np.int32)[np.clip(lo, 0, len(sa) - 1)]
        lo = np.where(cnt == 1, direct, lo)
    inter = np.concatenate(
        [
            ht["ht_key0"].view(np.int32),
            ht["ht_key1"].view(np.int32),
            lo,
            cnt,
        ],
        axis=1,
    )  # (S, 16)
    S = inter.shape[0]
    pad_rows = (-S) % BUCKETS_PER_ROW
    if pad_rows:
        inter = np.concatenate(
            [inter, np.zeros((pad_rows, 16), np.int32)], axis=0
        )
    rows = inter.reshape(-1, BUCKETS_PER_ROW * 16)
    # + 8 rows so 8-row-aligned tile fetches never run off the end
    return np.concatenate([rows, np.zeros((8, 128), np.int32)], axis=0)


def _scan_kernel(
    codes_ref,   # (LB, WINW) i32 VMEM — lane codes (one per elem), SEP pad
    pw_ref,      # (LB, WINW) i32 SMEM — packed 16-base words (A-sub bits)
    lens_ref,    # (LB, 1) i32 SMEM
    text_ref,    # (3*Rt, 128) i32 HBM — FUSED rows: for text block r the
                 # rows are [codes_r; txp_of_pos_r; pos_in_txp_r], so one
                 # candidate DMA carries the window AND its identity
    sa_ref,      # (Rs, 128) i32 HBM — SA rows, sentinel padded
    ht_ref,      # (S/8, 128) i32 HBM — unique k-mers store sa[lo] direct
    filt_ref,    # (F/128, 128) i32 VMEM — k-mer presence Bloom bits
    gtxp_ref,    # (LB, M*C) i32 VMEM out — candidate transcript ids
    gpin_ref,    # (LB, M*C) i32 VMEM out — candidate in-txp positions
                 # (already minus the query offset)
    vld_ref,     # (LB, M*C) i32 VMEM out
    meta_ref,    # (LB, 4) i32 SMEM out: [nm, overflow, mlen, reserved]
    htrow_s,     # (LB*8, 128) i32 scratch (per-lane hash tiles)
    safetch_s,   # (LB*16, 128) i32 scratch (per-lane SA tiles)
    saal_s,      # (LB, 256) i32 scratch (rotated SA interval positions)
    txal_s,      # (LB, 256) i32 scratch (per-candidate transcript ids)
    poal_s,      # (LB, 256) i32 scratch (per-candidate in-txp positions)
    canda_s,     # (C*16, 128) i32 scratch (candidate fused tiles, bank A)
    candb_s,     # (C*16, 128) i32 scratch (candidate fused tiles, bank B)
    candc_s,     # bank C
    candd_s,     # bank D
    pair_s,      # (1, 256) i32 scratch (row-pair staging)
    ala_s,       # (C, WINW) i32 scratch (read-aligned text, bank A)
    alb_s,       # (C, WINW) i32 scratch (read-aligned text, bank B)
    alc_s,       # bank C
    ald_s,       # bank D
    sem_h, sem_sa, sem_ca, sem_cb, sem_cc, sem_cd,
    st_s,        # (LB, 8) i32 SMEM scratch — per-lane scan state:
                 # [i, nm, steps, h, lo, cnt, probe_done, att]
    *,
    k: int,
    C: int,
    M: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    n_text: int,
    skip_jump: bool = False,
    phases: str = "abc",
    filt_bits: int = 0,
    filt_access: str = "scalar",
):
    """Phase-synchronous scan: all LB lanes advance one MMP step per
    outer iteration, and each phase (hash probe, SA window, candidate
    text windows) issues ITS DMAs FOR EVERY LANE before waiting on any —
    HBM latency is paid once per phase per step, not once per lane per
    access.  Per-lane divergence (different step counts, candidate
    counts, probe chains) is handled by predication: inactive lanes
    issue no DMAs and touch no state.  Candidate windows additionally
    pipeline across lanes through two scratch banks (issue lane n+1's
    fetches while lane n's LCP is computed)."""
    hmask = jnp.int32((1 << ht_bits) - 1)
    fmask = jnp.int32((1 << filt_bits) - 1)
    I32 = jnp.int32

    def _filter_test(h1, h2):
        """Single-word presence test: the key's filter word index comes
        from h1, BOTH probe bits from disjoint 5-bit fields of h2 (the
        host builder uses the same scheme — index/kmerhash.py
        build_kmer_bloom), so one dynamic row load + one roll answers
        the whole test.  The filter lives in VMEM: a test costs no HBM
        traffic, which is what lets the per-position k-mer scan skip
        absent positions (the entire wrong-orientation sweep) at
        on-chip speed."""
        w = h1 & _lsr32(fmask, 5)
        row = _lsr32(w, 7)
        col = w & I32(127)
        if filt_access == "scalar":
            # NOTE: rejected by Mosaic on hardware (dynamic lane-dim
            # index must be statically 128-aligned); interpret-only.
            v = filt_ref[row, col]
        elif filt_access == "row":
            # dynamic UNALIGNED single-row vector load (dim 0 allows
            # dynamic starts) + one lane roll: measured ~free next to
            # the loop overhead on v5e (tools: proto_dynload row_u8)
            t = filt_ref[pl.ds(row, 1), :]
            t = pltpu.roll(t, 128 - col, 1)
            v = t[0, 0]
        else:  # "tile": 8-row-aligned load + two rolls
            r8 = (row >> 3) << 3
            tile = filt_ref[pl.ds(r8, 8), :]
            t = pltpu.roll(tile, 8 - (row & 7), 0)
            t = pltpu.roll(t[0:1, :], 128 - col, 1)
            v = t[0, 0]
        b1 = h2 & I32(31)
        b2 = _lsr32(h2, 5) & I32(31)
        return (((v >> b1) & (v >> b2)) & I32(1)) == I32(1)

    def ffwd_filter(lane):
        """Advance the lane to the next filter-positive position at or
        after st[0], consuming one scan step per filter-negative
        position (a Bloom negative PROVES the k-mer is absent, so this
        matches the probe-miss semantics exactly — same steps, same
        positions, no HBM probe).  On exit: either a candidate position
        (st[3] = its bucket hash, st[6]=0, probe pending) or no
        remaining candidate in budget (st[6]=1, st[5]=0)."""
        ln = lens_ref[lane, 0]

        def cond(c):
            return c[3] == I32(0)

        def step1(c):
            i, steps, _, _ = c
            in_b = (i + k <= ln) & (steps < max_steps)
            k0 = pw_ref[lane, i]
            k1 = _lsr32(pw_ref[lane, i + 16], 2 * (32 - k))
            h1 = _mix_i32(k0, k1)
            if filt_bits > 0:
                cand = in_b & _filter_test(h1, _mix2_i32(k0, k1))
            else:
                cand = in_b
            stop = cand | (~in_b)
            return (
                jnp.where(stop, i, i + 1),
                jnp.where(stop, steps, steps + 1),
                h1,
                stop.astype(I32),
            )

        # 8 positions per lax iteration: the loop-carry overhead on the
        # scalar unit (~400ns/iter measured) dwarfs the filter test
        # itself (~30ns single-word), so amortize it.  step1 is
        # idempotent once stopped (i/steps frozen by the wheres, h1
        # recomputed at the frozen position), so overscan inside a
        # block is harmless.  (16 was tried: Mosaic compile time blew
        # past 15 minutes — the body inlines per lane at two sites.)
        unroll = 8 if filt_bits > 0 else 1

        def body(c):
            for _ in range(unroll):
                c = step1(c)
            return c

        # peel one position: the common case (current position's k-mer
        # is filter-present) stops immediately, and the peel makes that
        # cost ONE filter test instead of `unroll` idempotent re-tests
        # inside the first loop body
        c0 = step1((st_s[lane, 0], st_s[lane, 2], I32(0), I32(0)))
        i, steps, h1, _ = jax.lax.while_loop(cond, body, c0)
        ok = (i + k <= ln) & (steps < max_steps)
        st_s[lane, 0] = i
        st_s[lane, 2] = steps
        st_s[lane, 3] = h1 & hmask
        st_s[lane, 5] = jnp.where(ok, st_s[lane, 5], I32(0))
        st_s[lane, 6] = jnp.where(ok, I32(0), I32(1))
        st_s[lane, 7] = I32(0)

    # ---- init outputs + per-lane state ----
    for lane in range(LB):
        for j in range(4):
            meta_ref[lane, j] = I32(0)
        for j in range(8):
            st_s[lane, j] = I32(0)
    vld_ref[...] = jnp.zeros(vld_ref.shape, jnp.int32)
    gtxp_ref[...] = jnp.zeros(gtxp_ref.shape, jnp.int32)
    gpin_ref[...] = jnp.zeros(gpin_ref.shape, jnp.int32)

    def lane_act(amask, lane):
        return ((amask >> lane) & 1) == 1

    def issue_probe(lane):
        h = st_s[lane, 3]
        row = h >> 3
        aligned = (row >> 3) << 3
        pltpu.make_async_copy(
            ht_ref.at[pl.ds(aligned, 8), :],
            htrow_s.at[pl.ds(lane * 8, 8), :],
            sem_h.at[lane],
        ).start()

    def resolve_probe(lane):
        """Resolve one hash-row fetch.  Outcomes:
          * found       -> record (lo, cnt), consume the position's step,
                          probe_done
          * collision   -> bump h and retry IN the already-fetched tile
                          (an 8-row tile holds 64 consecutive buckets, so
                          the h+1 bucket is resident 63/64 of the time —
                          one straight-line second attempt resolves most
                          2-long probe chains without another DMA round);
                          only a chain that walks off the tile re-enters
                          the pbody loop
          * miss        -> a filter false positive (or probe-chain
                          exhaustion): consume the step, advance, and
                          MARK the lane (st[5] = -1) — the pbody caller
                          runs the filter fast-forward for marked lanes
                          in a separate pass (keeping ffwd at two inline
                          sites bounds Mosaic compile time).
        A probe chain that exhausts ht_probes attempts counts as a miss
        (the oracle's empty exact-k interval)."""
        i = st_s[lane, 0]
        key0 = pw_ref[lane, i]
        key1 = _lsr32(pw_ref[lane, i + 16], 2 * (32 - k))
        h = st_s[lane, 3]
        pltpu.make_async_copy(
            ht_ref.at[pl.ds(((h >> 6) << 3), 8), :],
            htrow_s.at[pl.ds(lane * 8, 8), :],
            sem_h.at[lane],
        ).wait()

        def attempt(hh):
            """One bucket compare against the resident tile (valid only
            while hh >> 6 == h >> 6).  The four entries compare as (1,4)
            vector ops and reduce to four scalars (table keys are
            unique, so at most one entry can match)."""
            row = hh >> 3
            r8 = pltpu.roll(htrow_s[lane * 8 : lane * 8 + 8, :],
                            8 - (row & 7), 0)
            rolled = pltpu.roll(r8[0:1, :], 128 - (hh & 7) * 16, 1)
            key0v = rolled[0:1, 0:4]
            key1v = rolled[0:1, 4:8]
            lov = rolled[0:1, 8:12]
            cntv = rolled[0:1, 12:16]
            match = (cntv > 0) & (key0v == key0) & (key1v == key1)
            found = jnp.max(match.astype(jnp.int32)) == I32(1)
            flo = jnp.max(jnp.where(match, lov, I32(-(2**31))))
            flo = jnp.where(found, flo, I32(0))
            fcnt = jnp.max(jnp.where(match, cntv, I32(0)))
            has_empty = jnp.min(cntv) == I32(0)
            return found, flo, fcnt, has_empty

        def record_found(flo, fcnt):
            st_s[lane, 2] = st_s[lane, 2] + 1
            st_s[lane, 4] = flo
            st_s[lane, 5] = fcnt
            st_s[lane, 6] = I32(1)

        def record_miss():
            st_s[lane, 0] = i + 1
            st_s[lane, 2] = st_s[lane, 2] + 1
            st_s[lane, 5] = I32(-1)  # needs-ffwd marker
            st_s[lane, 6] = I32(1)   # cleared by the caller's ffwd pass

        att = st_s[lane, 7]
        f1, lo1, c1, e1 = attempt(h)
        ex1 = ~f1 & ~e1 & (att + 1 >= ht_probes)
        miss1 = (e1 & ~f1) | ex1
        coll1 = ~f1 & ~miss1
        h2 = (h + 1) & hmask
        in_tile = (h2 >> 6) == (h >> 6)

        @pl.when(f1)
        def _():
            record_found(lo1, c1)

        @pl.when(miss1)
        def _():
            record_miss()

        @pl.when(coll1 & in_tile)
        def _():
            f2, lo2, c2, e2 = attempt(h2)
            ex2 = ~f2 & ~e2 & (att + 2 >= ht_probes)
            miss2 = (e2 & ~f2) | ex2

            @pl.when(f2)
            def _():
                record_found(lo2, c2)

            @pl.when(miss2)
            def _():
                record_miss()

            @pl.when(~f2 & ~miss2)
            def _():
                st_s[lane, 3] = (h2 + 1) & hmask
                st_s[lane, 7] = att + 2

        @pl.when(coll1 & ~in_tile)
        def _():
            st_s[lane, 3] = h2
            st_s[lane, 7] = att + 1

    def _issue_one(lane, c, raw, cand_s, sem_c):
        i = st_s[lane, 0]
        g = jnp.clip(raw, 0, n_text - 1)
        spos = g - i + ROW  # front SEP row keeps >= 0
        trow = spos >> 7
        t_al = ((3 * trow) >> 3) << 3
        pltpu.make_async_copy(
            text_ref.at[pl.ds(t_al, 16), :],
            cand_s.at[pl.ds(c * 16, 16), :],
            sem_c.at[c],
        ).start()

    def issue_cands(lane, amask, cand_s, sem_c):
        act = lane_act(amask, lane)
        cnt = st_s[lane, 5]
        ccnt = jnp.minimum(cnt, C)

        # fast path: a TRUE unique seed (cnt == 1, not ccnt == 1 — with
        # cand_cap == 1 a multi-candidate seed would alias into this
        # branch and misread st[4], an SA offset, as a text position) —
        # its text position came straight from the hash bucket, and
        # none of the block scaffolding below is needed
        @pl.when(act & (cnt == 1))
        def _():
            _issue_one(lane, 0, st_s[lane, 4], cand_s, sem_c)

        # chunked predication: skip whole 8-candidate blocks of scalar
        # work at once
        for cc in range(0, C, 8):
            @pl.when(act & (ccnt > 1) & (cc < ccnt))
            def _():
                for c in range(cc, min(cc + 8, C)):
                    @pl.when(c < ccnt)
                    def _():
                        # ccnt > 1 here, so every candidate (incl. 0)
                        # comes from the rotated SA interval
                        _issue_one(lane, c, saal_s[lane, c],
                                   cand_s, sem_c)

    def _align_one(lane, c, raw, cand_s, al_s, sem_c):
        i = st_s[lane, 0]
        g = jnp.clip(raw, 0, n_text - 1)
        spos = g - i + ROW
        trow = spos >> 7
        t_al = ((3 * trow) >> 3) << 3
        off = 3 * trow - t_al
        rot = spos & 127
        pltpu.make_async_copy(
            text_ref.at[pl.ds(t_al, 16), :],
            cand_s.at[pl.ds(c * 16, 16), :],
            sem_c.at[c],
        ).wait()
        # fused rows: after rolling row `off` to the
        # front, text blocks trow/trow+1/trow+2 sit at
        # rows 0/3/6; their identity companions at +1/+2
        tr = pltpu.roll(cand_s[c * 16 : c * 16 + 16, :],
                        16 - off, 0)
        # window[j] = raw[rot + j]; rows pair A covers
        # j in [0,128), pair B covers [128,256)
        pair_s[:, :ROW] = tr[0:1, :]
        pair_s[:, ROW:] = tr[3:4, :]
        al_s[c : c + 1, 0:ROW] = pltpu.roll(
            pair_s[...], 256 - rot, 1
        )[:, 0:ROW]
        pair_s[:, :ROW] = tr[3:4, :]
        pair_s[:, ROW:] = tr[6:7, :]
        al_s[c : c + 1, ROW:WINW] = pltpu.roll(
            pair_s[...], 256 - rot, 1
        )[:, 0:ROW]
        # candidate identity (txp, in-txp pos) at text
        # position g rides the same fetch: g = window
        # start + i, i.e. block trow2 = (spos+i)>>7
        spos2 = spos + i
        delta = (spos2 >> 7) - trow
        idrows = jnp.where(
            delta == 0, tr[1:3, :], tr[4:6, :]
        )
        idal = pltpu.roll(idrows, 128 - (spos2 & 127), 1)
        txal_s[lane : lane + 1, c : c + 1] = idal[0:1, 0:1]
        poal_s[lane : lane + 1, c : c + 1] = idal[1:2, 0:1]

    def process_lane(lane, amask, cand_s, al_s, sem_c):
        act = lane_act(amask, lane)
        i = st_s[lane, 0]
        cnt = st_s[lane, 5]
        ccnt = jnp.minimum(cnt, C)
        over = cnt > C
        ln = lens_ref[lane, 0]
        one = cnt == 1  # true unique seed (see issue_cands)

        @pl.when(act & one)
        def _():
            _align_one(lane, 0, st_s[lane, 4], cand_s, al_s, sem_c)
            # narrow LCP + slot write + advance for the single-unique-
            # seed case: one (1, WINW) compare instead of (C, WINW),
            # and a single-column slot write (the rest of the slot keeps
            # its zero init).  NOTE: this branch intentionally mirrors
            # the vectorized `act & ~one` branch below (hit rule, M-slot
            # scan, skip_jump advance) minus the over/cnt>0 guards —
            # cnt == 1 makes over and cnt == 0 impossible here.  Edits
            # to either branch's hit/advance logic must be applied to
            # BOTH.
            neq = (al_s[0:1, :] - codes_ref[lane : lane + 1, :]) != 0
            col = jax.lax.broadcasted_iota(jnp.int32, (1, WINW), 1)
            colm = jnp.where(neq & (col >= i), col, jnp.int32(WINW))
            lstar = jnp.minimum(jnp.min(colm), ln) - i
            nm = st_s[lane, 1]
            hit = lstar >= k

            @pl.when(hit)
            def _():
                for m in range(M):
                    @pl.when(nm == m)
                    def _():
                        gtxp_ref[lane : lane + 1, m * C : m * C + 1] = (
                            txal_s[lane : lane + 1, 0:1]
                        )
                        gpin_ref[lane : lane + 1, m * C : m * C + 1] = (
                            poal_s[lane : lane + 1, 0:1] - i
                        )
                        vld_ref[lane : lane + 1, m * C : m * C + 1] = (
                            jnp.ones((1, 1), jnp.int32)
                        )
                meta_ref[lane, 2] = jnp.where(
                    nm == 0, lstar, meta_ref[lane, 2]
                )

            if skip_jump:
                hadv1 = lstar + 1
            else:
                hadv1 = jnp.maximum(1, lstar - k + 1)
            st_s[lane, 0] = i + jnp.where(hit, hadv1, 1)
            st_s[lane, 1] = nm + jnp.where(hit, 1, 0)

        for cc in range(0, C, 8):
            @pl.when(act & (ccnt > 1) & (cc < ccnt))
            def _():
                for c in range(cc, min(cc + 8, C)):
                    @pl.when(c < ccnt)
                    def _():
                        _align_one(lane, c, saal_s[lane, c],
                                   cand_s, al_s, sem_c)

        @pl.when(act & ~one)
        def _():
            # one vectorized LCP over all candidates: first mismatch at
            # column >= i (read padding = SEP mismatches text, so the
            # read end terminates matches automatically); stale al_s
            # rows from the bank's previous occupant are masked by
            # crange < ccnt
            readwin = jnp.broadcast_to(
                codes_ref[lane : lane + 1, :], (C, WINW)
            )
            neq = (al_s[...] - readwin) != 0
            col = jax.lax.broadcasted_iota(jnp.int32, (C, WINW), 1)
            colm = jnp.where(neq & (col >= i), col, jnp.int32(WINW))
            first_mm = jnp.min(colm, axis=1, keepdims=True)     # (C, 1)
            crange = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            lcp2 = jnp.where(
                crange < ccnt,
                jnp.minimum(first_mm, ln) - i,
                jnp.int32(-1),
            )
            lstar = jnp.max(lcp2)
            lcp = lcp2[:, 0]
            nm = st_s[lane, 1]
            hit = (lstar >= k) & (~over) & (cnt > 0)

            @pl.when(hit)
            def _():
                best = (lcp == lstar) & (crange[:, 0] < ccnt)
                for m in range(M):
                    @pl.when(nm == m)
                    def _():
                        gtxp_ref[lane : lane + 1, m * C : (m + 1) * C] = (
                            txal_s[lane : lane + 1, :C]
                        )
                        gpin_ref[lane : lane + 1, m * C : (m + 1) * C] = (
                            poal_s[lane : lane + 1, :C] - i
                        )
                        vld_ref[lane : lane + 1, m * C : (m + 1) * C] = (
                            best.astype(jnp.int32)[None, :]
                        )
                meta_ref[lane, 2] = jnp.where(
                    nm == 0, lstar, meta_ref[lane, 2]
                )

            meta_ref[lane, 1] = jnp.maximum(
                meta_ref[lane, 1], jnp.where(over, 1, 0)
            )
            # advance only when this lane's probe FOUND a k-mer (cnt>0):
            # on a miss, resolve_probe's fast-forward already moved i
            # past the missed position(s).  Rule: "jump" restarts past
            # the mismatch; "nip" (default) is the RapMap SACollector
            # overlap re-probe at i + max(1, lstar - k + 1).
            if skip_jump:
                hadv = lstar + 1
            else:
                hadv = jnp.maximum(1, lstar - k + 1)
            adv = jnp.where(
                cnt > 0, jnp.where(hit, hadv, 1), 0
            )
            st_s[lane, 0] = i + adv
            st_s[lane, 1] = nm + jnp.where(hit, 1, 0)

    def obody(carry):
        s, amask = carry
        if "a" not in phases:  # debug: phase bisection (no probes)
            for lane in range(LB):
                @pl.when(lane_act(amask, lane))
                def _():
                    st_s[lane, 0] = st_s[lane, 0] + 1
            return (s + 1, amask)

        # ---- Phase A: filter sweep to the next candidate position,
        # then hash probes batched across lanes (only candidate
        # positions ever touch HBM) ----
        for lane in range(LB):
            @pl.when(lane_act(amask, lane))
            def _():
                st_s[lane, 4] = I32(0)
                st_s[lane, 5] = I32(0)
                ffwd_filter(lane)

        pm0 = I32(0)
        for lane in range(LB):
            live = ((amask >> lane) & 1) & (1 - st_s[lane, 6])
            pm0 = pm0 | (live << lane)
        for lane in range(LB):
            @pl.when(((pm0 >> lane) & 1) == 1)
            def _():
                issue_probe(lane)

        def pcond(pmask):
            return pmask != 0

        def pbody(pmask):
            for lane in range(LB):
                @pl.when(((pmask >> lane) & 1) == 1)
                def _():
                    resolve_probe(lane)
            # deferred miss handling: filter fast-forward the marked
            # lanes to their next candidate position (st[6] flips back
            # to 0 if one exists in budget, re-entering the probe loop)
            for lane in range(LB):
                @pl.when((((pmask >> lane) & 1) == 1)
                         & (st_s[lane, 5] == -1))
                def _():
                    st_s[lane, 5] = I32(0)
                    ffwd_filter(lane)
            nmask = I32(0)
            for lane in range(LB):
                live = ((pmask >> lane) & 1) & (1 - st_s[lane, 6])
                nmask = nmask | (live << lane)
            for lane in range(LB):
                @pl.when(((nmask >> lane) & 1) == 1)
                def _():
                    issue_probe(lane)
            return nmask

        jax.lax.while_loop(pcond, pbody, pm0)

        # ---- Phase B: SA-interval position windows, needed only for
        # NON-unique seeds (cnt > 1; unique seeds got their position
        # straight from the hash bucket in resolve_probe).  Candidate
        # identity no longer ships from here — it rides each
        # candidate's fused text fetch in phase C. ----
        if "b" in phases:
            for lane in range(LB):
                @pl.when(lane_act(amask, lane) & (st_s[lane, 5] > 1))
                def _():
                    lo = st_s[lane, 4]
                    srow = lo >> 7
                    s_al = (srow >> 3) << 3
                    pltpu.make_async_copy(
                        sa_ref.at[pl.ds(s_al, 16), :],
                        safetch_s.at[pl.ds(lane * 16, 16), :],
                        sem_sa.at[lane],
                    ).start()
            for lane in range(LB):
                @pl.when(lane_act(amask, lane) & (st_s[lane, 5] > 1))
                def _():
                    lo = st_s[lane, 4]
                    srow = lo >> 7
                    s_al = (srow >> 3) << 3
                    pltpu.make_async_copy(
                        sa_ref.at[pl.ds(s_al, 16), :],
                        safetch_s.at[pl.ds(lane * 16, 16), :],
                        sem_sa.at[lane],
                    ).wait()
                    sr = pltpu.roll(
                        safetch_s[lane * 16 : lane * 16 + 16, :],
                        16 - (srow & 7), 0)
                    pair_s[:, :ROW] = sr[0:1, :]
                    pair_s[:, ROW:] = sr[1:2, :]
                    saal_s[lane : lane + 1, :] = pltpu.roll(
                        pair_s[...], 256 - (lo & 127), 1
                    )

        # ---- Phase C: candidate windows, NB scratch banks pipelined
        # over lanes (issue lane n's fetches while lane n-NB's are
        # processed) — depth 4 so each wait sees a DMA issued ~3 lane-
        # processings ago, fully hiding HBM latency.  Escalation passes
        # (large C) drop to depth 2 to stay inside VMEM.
        if "c" in phases:
            all_banks = (
                (canda_s, ala_s, sem_ca),
                (candb_s, alb_s, sem_cb),
                (candc_s, alc_s, sem_cc),
                (candd_s, ald_s, sem_cd),
            )
            NB = min(4 if C <= 64 else 2, LB)
            banks = all_banks[:NB]
            for lane in range(min(NB, LB)):
                b = banks[lane % NB]
                issue_cands(lane, amask, b[0], b[2])
            for lane in range(NB, LB):
                b = banks[lane % NB]
                process_lane(lane - NB, amask, b[0], b[1], b[2])
                issue_cands(lane, amask, b[0], b[2])
            for lane in range(max(LB - NB, 0), LB):
                b = banks[lane % NB]
                process_lane(lane, amask, b[0], b[1], b[2])
        else:
            for lane in range(LB):
                @pl.when(lane_act(amask, lane))
                def _():
                    st_s[lane, 0] = st_s[lane, 0] + 1

        # ---- next-step active mask ----
        nmask = I32(0)
        for lane in range(LB):
            a = (amask >> lane) & 1
            a = a & jnp.where(
                st_s[lane, 0] + k <= lens_ref[lane, 0], 1, 0
            )
            a = a & jnp.where(st_s[lane, 1] < M, 1, 0)
            a = a & jnp.where(st_s[lane, 2] < max_steps, 1, 0)
            nmask = nmask | (a << lane)
        return (s + 1, nmask)

    def ocond(carry):
        s, amask = carry
        return (s < max_steps) & (amask != 0)

    am0 = I32(0)
    for lane in range(LB):
        am0 = am0 | (
            jnp.where(k <= lens_ref[lane, 0], 1, 0) << lane
        )
    s_fin, _ = jax.lax.while_loop(ocond, obody, (I32(0), am0))
    for lane in range(LB):
        meta_ref[lane, 0] = st_s[lane, 1]
        # meta slot 3: outer-step count of this lane's BLOCK (profiling;
        # all lanes in a block share it)
        meta_ref[lane, 3] = s_fin


@partial(
    jax.jit,
    static_argnames=("k", "cand_cap", "max_mmps", "max_steps", "ht_bits",
                     "ht_probes", "n_text", "interpret", "skip_jump",
                     "phases", "filt_bits", "filt_access"),
)
def mmp_scan_pallas(
    codes_i32,   # (B2, WINW) i32 lane codes, SEP padded
    pw_i32,      # (B2, WINW) i32 packed words (bits)
    lens,        # (B2,) i32
    text_rows,   # (3*Rt, 128) i32 FUSED [codes; txp; pos] rows per block
    sa_rows,     # (Rs, 128) i32 sentinel-padded SA rows
    ht_rows,     # (S/8, 128) i32 (unique k-mers carry sa[lo] directly)
    filt_rows,   # (F/4096, 128) i32 presence-filter bits (VMEM resident)
    live_lanes=None,  # traced i32 scalar: live lanes sit in rows
                 # [0, live_lanes) (caller-compacted).  When given, the
                 # grid is DYNAMIC — only ceil(live/LB) blocks launch,
                 # so an almost-dead batch (the production case after
                 # the clean fast path + xscan) pays for its live blocks
                 # only.  Rows beyond the launched blocks are NOT
                 # written (stale HBM) — the caller must mask them.
    *,
    k: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    n_text: int = 0,
    interpret: bool = False,
    skip_jump: bool = False,
    phases: str = "abc",
    filt_bits: int = 0,
    filt_access: str = "scalar",
):
    if cand_cap < 2:
        # the kernel's branch structure assumes cnt == 1 is the only
        # single-candidate case (see issue_cands); cand_cap == 1 would
        # leave multi-candidate seeds with no processing branch
        raise ValueError("mmp_scan_pallas requires cand_cap >= 2")
    B2 = codes_i32.shape[0]
    C, M = cand_cap, max_mmps
    if live_lanes is None:
        grid = (B2 // LB,)
    else:
        nb = jnp.clip((live_lanes + (LB - 1)) // LB, 1, B2 // LB)
        grid = (nb,)

    kern = partial(
        _scan_kernel,
        k=k, C=C, M=M, max_steps=max_steps,
        ht_bits=ht_bits, ht_probes=ht_probes, n_text=n_text,
        skip_jump=skip_jump, phases=phases,
        filt_bits=filt_bits, filt_access=filt_access,
    )
    gtxp, gpin, vld, meta = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LB, WINW), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, WINW), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LB, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((LB, M * C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, M * C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, M * C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, 4), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B2, M * C), jnp.int32),
            jax.ShapeDtypeStruct((B2, M * C), jnp.int32),
            jax.ShapeDtypeStruct((B2, M * C), jnp.int32),
            jax.ShapeDtypeStruct((B2, 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LB * 8, 128), jnp.int32),    # htrow_s
            pltpu.VMEM((LB * 16, 128), jnp.int32),   # safetch_s
            pltpu.VMEM((LB, 256), jnp.int32),        # saal_s
            pltpu.VMEM((LB, 256), jnp.int32),        # txal_s
            pltpu.VMEM((LB, 256), jnp.int32),        # poal_s
            pltpu.VMEM((cand_cap * 16, 128), jnp.int32),  # canda_s
            pltpu.VMEM((cand_cap * 16, 128), jnp.int32),  # candb_s
            # banks C/D exist only at pipeline depth 4 (C <= 64);
            # escalation passes get placeholder tiles to spare VMEM
            pltpu.VMEM(((cand_cap if cand_cap <= 64 else 1) * 16, 128),
                       jnp.int32),                   # candc_s
            pltpu.VMEM(((cand_cap if cand_cap <= 64 else 1) * 16, 128),
                       jnp.int32),                   # candd_s
            pltpu.VMEM((1, 256), jnp.int32),         # pair_s
            pltpu.VMEM((cand_cap, WINW), jnp.int32),  # ala_s
            pltpu.VMEM((cand_cap, WINW), jnp.int32),  # alb_s
            pltpu.VMEM((cand_cap if cand_cap <= 64 else 1, WINW),
                       jnp.int32),                   # alc_s
            pltpu.VMEM((cand_cap if cand_cap <= 64 else 1, WINW),
                       jnp.int32),                   # ald_s
            pltpu.SemaphoreType.DMA((LB,)),          # sem_h
            pltpu.SemaphoreType.DMA((LB,)),          # sem_sa
            pltpu.SemaphoreType.DMA((cand_cap,)),    # sem_ca
            pltpu.SemaphoreType.DMA((cand_cap,)),    # sem_cb
            pltpu.SemaphoreType.DMA((cand_cap,)),    # sem_cc
            pltpu.SemaphoreType.DMA((cand_cap,)),    # sem_cd
            pltpu.SMEM((LB, 8), jnp.int32),          # st_s
        ],
        interpret=interpret,
    )(codes_i32, pw_i32, lens.reshape(-1, 1), text_rows, sa_rows, ht_rows,
      filt_rows)
    return gtxp, gpin, vld, meta


def _grprev32(x):
    """Reverse the sixteen 2-bit groups of each u32 (base order flip)."""
    U32 = jnp.uint32
    x = ((x & U32(0x33333333)) << U32(2)) | ((x >> U32(2)) & U32(0x33333333))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x >> U32(4)) & U32(0x0F0F0F0F))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x >> U32(8)) & U32(0x00FF00FF))
    return (x << U32(16)) | (x >> U32(16))


def _bitrev32(x):
    U32 = jnp.uint32
    x = ((x & U32(0x55555555)) << U32(1)) | ((x >> U32(1)) & U32(0x55555555))
    x = ((x & U32(0x33333333)) << U32(2)) | ((x >> U32(2)) & U32(0x33333333))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x >> U32(4)) & U32(0x0F0F0F0F))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x >> U32(8)) & U32(0x00FF00FF))
    return (x << U32(16)) | (x >> U32(16))


def _morton2(x):
    """Spread the low 16 bits of each u32 to even positions, then
    duplicate each into its odd neighbor: bit i -> bits {2i, 2i+1}."""
    U32 = jnp.uint32
    x = x & U32(0xFFFF)
    x = (x | (x << U32(8))) & U32(0x00FF00FF)
    x = (x | (x << U32(4))) & U32(0x0F0F0F0F)
    x = (x | (x << U32(2))) & U32(0x33333333)
    x = (x | (x << U32(1))) & U32(0x55555555)
    return x | (x << U32(1))


def _pad_bits_mask(nw: int, start: int) -> np.ndarray:
    """Static (nw,) u32 row: bit j of word w set iff 32w + j >= start
    (LSB-first bit convention)."""
    out = np.zeros(nw, np.uint32)
    for w in range(nw):
        lo = 32 * w
        if lo >= start:
            out[w] = 0xFFFFFFFF
        elif lo + 32 > start:
            out[w] = np.uint32(0xFFFFFFFF) << np.uint32(start - lo)
    return out


def _packed_lanes(pw, nm, lens, *, U: int, L: int, WA: int, NB: int):
    """Pack-domain lane build DIRECTLY from the H2D 2-bit words —
    replaces unpacking to (B, L) u8 codes and re-packing to aligned
    words (the old s0 built ~(B2, NB) u8/u32 intermediates; this is
    ~20 word-level VPU ops on (B, L/16) arrays).

    pw: (B, Wp) u32 LSB-first 2-bit base words (N packed as base 0),
    nm: (B, Wn) u32 LSB-first N bitmask — pipeline._pack_reads layout.
    U = uniform read length (static; RC lanes are a static flip).

    Returns (aw, nmask, has_n, olens) for the fused [fwd; rc] lane
    block: aw (B2, WA) u32 MSB-first aligned words (A-substituted),
    nmask (B2, NB//32) u32 (bit = N or position >= len), has_n (B2,)."""
    U32 = jnp.uint32
    B = pw.shape[0]
    Wp = pw.shape[1]
    Wn = nm.shape[1]
    NW = NB // 32
    olen1 = lens.astype(jnp.int32)

    # ---- forward lanes: aw = per-word group reversal of pw ----
    aw_f = _grprev32(pw)
    if WA > Wp:
        aw_f = jnp.concatenate(
            [aw_f, jnp.zeros((B, WA - Wp), U32)], axis=1)
    else:
        aw_f = aw_f[:, :WA]
    # H2D nm already covers N and the code-4 padding in [len, L);
    # extend with the static >= L region up to NB
    padL = jnp.asarray(_pad_bits_mask(NW, L))[None, :]
    if NW > Wn:
        nm_f = jnp.concatenate([nm, jnp.zeros((B, NW - Wn), U32)], axis=1)
    else:
        nm_f = nm[:, :NW]
    nm_f = nm_f | padL

    # ---- reverse-complement lanes (static flip, length U) ----
    Wr = (U + 15) // 16
    pad = 16 * Wr - U
    # base-order reversal of the first Wr words (LSB domain)
    pwr = [_grprev32(pw[:, Wr - 1 - w]) for w in range(Wr)]
    pwr.append(jnp.zeros(B, U32))
    if pad:
        sh = U32(2 * pad)
        pws = [
            (pwr[w] >> sh) | (pwr[w + 1] << (U32(32) - sh))
            for w in range(Wr)
        ]
    else:
        pws = pwr[:Wr]
    pwc = jnp.stack(pws, axis=1)
    # rc N bitmask: full bit reversal of the first Wn' words + shift
    Wnr = (U + 31) // 32
    padn = 32 * Wnr - U
    nmr = [_bitrev32(nm[:, Wnr - 1 - w]) for w in range(Wnr)]
    nmr.append(jnp.zeros(B, U32))
    if padn:
        shn = U32(padn)
        nms = [
            (nmr[w] >> shn) | (nmr[w + 1] << (U32(32) - shn))
            for w in range(Wnr)
        ]
    else:
        nms = nmr[:Wnr]
    nm_rc = jnp.stack(nms, axis=1)
    if NW > Wnr:
        nm_rc = jnp.concatenate(
            [nm_rc, jnp.zeros((B, NW - Wnr), U32)], axis=1)
    padU = jnp.asarray(_pad_bits_mask(NW, U))[None, :]
    nm_rc = nm_rc | padU
    # complement (v -> 3-v == v ^ 3 per group); then zero everything
    # at/after U (static) and every N group (A-substitution)
    pwc = ~pwc
    # per-word static keep mask for bases < U (2 bits per base,
    # LSB-first): base m of word w is at bits [2m, 2m+1]
    keep = np.zeros(Wr, np.uint32)
    for w in range(Wr):
        nb_w = min(max(U - 16 * w, 0), 16)
        keep[w] = (
            0xFFFFFFFF if nb_w == 16
            else ((np.uint32(1) << np.uint32(2 * nb_w)) - 1)
        )
    pwc = pwc & jnp.asarray(keep)[None, :]
    # clear N groups: expand each 16-bit half of the rc N mask
    nhalf = []
    for w in range(Wr):
        src = nm_rc[:, w // 2]
        nhalf.append(src >> U32(16) if (w & 1) else src)
    nbits = jnp.stack(nhalf, axis=1)
    pwc = pwc & ~_morton2(nbits)
    aw_r = _grprev32(pwc)
    if WA > Wr:
        aw_r = jnp.concatenate(
            [aw_r, jnp.zeros((B, WA - Wr), U32)], axis=1)

    aw = jnp.concatenate([aw_f, aw_r], axis=0)
    nmask = jnp.concatenate([nm_f, nm_rc], axis=0)
    # has_n: any N inside [0, len) — identical for fwd and rc lanes
    col = jnp.arange(Wn, dtype=jnp.int32)[None, :] * 32
    nb_in = jnp.minimum(jnp.maximum(olen1[:, None] - col, 0), 32)
    inmask = jnp.where(
        nb_in >= 32,
        U32(0xFFFFFFFF),
        (U32(1) << jnp.minimum(nb_in, 31).astype(U32)) - U32(1),
    )
    h1 = ((nm & inmask) != 0).any(axis=1)
    has_n = jnp.concatenate([h1, h1], axis=0)
    olens = jnp.concatenate([olen1, olen1], axis=0)
    return aw, nmask, has_n, olens


def _env_bool(s):
    return s not in ("0", "false", "False")


def _knob(tuning, env, attr, default, conv):
    """Tuning knobs live in QuantOpts (`tuning`; CLI --advanced flags).
    The SF_* environment variables are DEBUG OVERRIDES only: an env var
    that is explicitly set wins over the opts value, an unset one defers
    to opts (or the documented default for direct callers that pass no
    tuning)."""
    v = os.environ.get(env)
    if v is not None:
        return conv(v)
    if tuning is not None:
        return getattr(tuning, attr)
    return default


def map_oriented_lanes_pallas(
    text_pallas: dict,
    codes: jnp.ndarray,   # (B, L) u8 reads
    lens: jnp.ndarray,
    *,
    k: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    skip_jump: bool = False,
    interpret: bool = False,
    phases: str = "abc",
    postpass: bool = True,
    uniform_len: int | None = None,
    n_text: int | None = None,
    filt_bits: int | None = None,
    filt_access: str | None = None,
    w16_bits: int | None = None,
    filtxl_bits: int | None = None,
    packed: tuple | None = None,
    tuning: "QuantOpts | None" = None,
):
    """Full per-lane mapping via the Pallas scan + XLA post-pass.

    Returns the same dict as kernels.map_oriented_lanes.  The whole
    path (lane build, scan kernel, post-pass) runs under ONE jit —
    eager per-op dispatch costs ~25ms/op of round-trip latency on a
    tunneled device, which dwarfed the kernel itself.

    `uniform_len`: when every read in the batch has this length (the
    normal Illumina case; the caller checks), the reverse-complement
    lane build is a static flip instead of a (B, L) element gather.
    """
    B, L = codes.shape
    if L > WINR:
        raise ValueError(f"pallas path supports reads up to {WINR} bases")

    def knob(env, attr, default, conv):
        return _knob(tuning, env, attr, default, conv)

    _b = _env_bool
    if filt_access is None:
        # "row": dynamic unaligned (1,128) VMEM row load + one roll —
        # the cheapest variant Mosaic accepts on v5e.  ("scalar"
        # dynamic VMEM indexing is rejected on hardware: lane-dimension
        # indices must be statically 128-aligned.)
        filt_access = knob("SF_FILT_ACCESS", "filt_access", "row", str)
    if w16_bits is None:
        w16_bits = text_pallas.get("w16_bits", 0)
    if not knob("SF_LANE_SCREEN", "lane_screen", True, _b):
        w16_bits = 0
    compact_lanes = knob("SF_LANE_COMPACT", "lane_compact", True, _b)
    # clean-lane fast path: requires the prepared pk_rows/ht16 arrays
    # (older callers may pass a reduced dict) and the post-pass
    fastpath = (
        knob("SF_FASTPATH", "use_fastpath", True, _b)
        and "pk_rows" in text_pallas
        and postpass
    )
    # vectorized NIP scan for the residual lanes: needs the fastpath
    # arrays, an unbinding step budget (max_steps >= positions), and
    # lane compaction (it runs on the compacted live prefix)
    fb = (filt_bits if filt_bits is not None
          else text_pallas.get("filt_bits", 0))
    xscan = (
        fastpath
        and compact_lanes
        and "filtxl_rows" in text_pallas
        and "sa_ov" in text_pallas
        and knob("SF_XSCAN", "use_xscan", True, _b)
        and max_steps >= (L - k + 1)
        and 17 <= k <= 31
        and fb > 0
    )
    # T=7: the light phase A can spend an event deferring a chained /
    # multi-candidate probe to phase B, so error lanes need one more
    # event than the old all-full schedule
    xscan_t = knob("SF_XSCAN_T", "xscan_t", 7, int)
    xscan_f = min(knob("SF_XSCAN_F", "xscan_f", 4, int), 8, cand_cap)
    xscan_t1 = knob("SF_XSCAN_T1", "xscan_t1", 2, int)
    xscan_p2 = knob("SF_XSCAN_P2", "xscan_p2", 2, int)
    # phase-B narrowing schedule "div:steps,div:steps,..." — each
    # segment runs `steps` full events on a P//div compacted prefix
    # (measured decay on the bench world: most lanes finish in their
    # first full event, so later events run at a fraction of the width)
    xscan_b = tuple(
        tuple(int(x) for x in seg.split(":"))
        for seg in knob("SF_XSCAN_B", "xscan_schedule",
                        "2:1,4:1,8:3", str).split(",")
        if seg
    )
    # Workaround for a jax executable-reuse bug: calling the jitted
    # wrapper with a DIFFERENT index whose arrays have identical shapes
    # (new process-global arrays, same avals/statics) can hit a cached
    # executable whose runtime buffer list no longer matches
    # ("Execution supplied 9 buffers but compiled program expected 17").
    # One index per process is the production shape; tests build many
    # tiny indexes, so drop the wrapper's jit cache whenever the text
    # identity changes.
    global _LAST_TEXT_ID
    tid = id(text_pallas.get("text_rows"))
    if _LAST_TEXT_ID is not None and _LAST_TEXT_ID != tid:
        _map_lanes_pallas_jit.clear_cache()
        mmp_scan_pallas.clear_cache()
    _LAST_TEXT_ID = tid
    # feature-gated arrays ride as None when their feature is off: an
    # always-passed-but-unused array gets PRUNED from the compiled
    # executable, and the persistent compilation cache can then hand an
    # executable whose buffer list doesn't match the caller's
    use_packed = (
        packed is not None
        and uniform_len is not None
        and xscan
        and knob("SF_PACKED_LANES", "packed_lanes", True, _b)
    )
    pw_h2d, nm_h2d = packed if use_packed else (None, None)
    # when packed, `codes` would be a passed-but-DCE-pruned argument —
    # the exact pruned-arg + persistent-cache buffer-mismatch hazard the
    # feature-gated Nones above exist to avoid — so it rides as None and
    # its width rides as the static L_pad instead
    return _map_lanes_pallas_jit(
        (None if use_packed else codes), lens, pw_h2d, nm_h2d,
        text_pallas["text_rows"], text_pallas["sa_rows"],
        text_pallas["ht_rows"], text_pallas["filt_rows"],
        (text_pallas.get("w16_rows") if w16_bits else None),
        (text_pallas.get("pk_rows") if fastpath else None),
        (text_pallas.get("ht16") if fastpath else None),
        (text_pallas.get("filtxl_rows") if xscan else None),
        (text_pallas.get("sa_ov") if xscan else None),
        k=k, cand_cap=cand_cap, max_mmps=max_mmps, max_steps=max_steps,
        ht_bits=ht_bits, ht_probes=ht_probes, skip_jump=skip_jump,
        n_text=(n_text if n_text is not None
                else text_pallas["n_text"]),
        L_pad=codes.shape[1],
        interpret=interpret,
        phases=phases, postpass=postpass, uniform_len=uniform_len,
        filt_bits=(filt_bits if filt_bits is not None
                   else text_pallas["filt_bits"]),
        filt_access=filt_access,
        w16_bits=w16_bits,
        compact_lanes=compact_lanes,
        fastpath=fastpath,
        xscan=xscan,
        xscan_t=xscan_t,
        xscan_f=xscan_f,
        xscan_t1=xscan_t1,
        xscan_p2=xscan_p2,
        xscan_b=xscan_b,
        filtxl_bits=(
            (filtxl_bits if filtxl_bits is not None
             else text_pallas.get("filtxl_bits", 0)) if xscan else 0),
    )


def _build_lanes(codes, pw_h2d, nm_h2d, lens, uniform_len, L):
    """Oriented [fwd; rc] pack-domain lane arrays from either the H2D
    2-bit words (pw_h2d/nm_h2d; codes may be None) or per-base u8 codes.
    Returns (aw, nmask, has_n, olens, oc, WA, NB); oc is the (B2, L) u8
    code block (None on the packed path, where nothing needs it)."""
    B = lens.shape[0]
    B2 = 2 * B
    # aligned words: enough for pos_words funnels (read + 16-base
    # lookahead) and for the 8-word fast-path verify; even so the
    # N-bitmask packs to whole 32-bit words
    WA = max((L + 15) // 16 + 2, 9)
    WA = WA + (WA & 1)
    NB = 16 * WA

    # complement arithmetically (A<->T, C<->G, N(4) fixed) — a 5-entry
    # table lookup would be an elementwise gather, slow on TPU
    def compl(x):
        return jnp.where(x < 4, jnp.uint8(3) - x, jnp.uint8(4))

    if pw_h2d is not None:
        # pack-domain lane build straight from the H2D 2-bit words —
        # ~20 word-level VPU ops on (B, L/16) arrays instead of
        # building (B2, NB) u8/u32 intermediates (and XLA dead-code
        # eliminates the caller's unpack of `codes`)
        aw, nmask, has_n, olens = _packed_lanes(
            pw_h2d, nm_h2d, lens, U=uniform_len, L=L, WA=WA, NB=NB)
        return aw, nmask, has_n, olens, None, WA, NB
    if uniform_len is not None:
        # static flip — no per-element gather
        rc = compl(codes[:, :uniform_len][:, ::-1])
        if uniform_len < L:
            rc = jnp.concatenate(
                [rc, jnp.full((B, L - uniform_len), 4, jnp.uint8)], axis=1
            )
    else:
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        src = lens.astype(jnp.int32)[:, None] - 1 - j
        rc = jnp.take_along_axis(codes, jnp.clip(src, 0, L - 1), axis=1)
        rc = jnp.where(src >= 0, compl(rc), jnp.uint8(4))
    oc = jnp.concatenate([codes, rc], axis=0)            # (B2, L) u8
    olens = jnp.concatenate([lens, lens]).astype(jnp.int32)

    # ---- pack-domain lane arrays ----
    ocp = jnp.concatenate(
        [oc, jnp.full((B2, NB - L), 4, jnp.uint8)], axis=1
    )                                                     # (B2, NB)
    subv = jnp.where(ocp >= 4, jnp.uint8(0), ocp).astype(jnp.uint32)
    vv = subv.reshape(B2, WA, 16)
    aw = jnp.zeros((B2, WA), jnp.uint32)
    for jj in range(16):
        aw = (aw << jnp.uint32(2)) | vv[:, :, jj]
    nbv = (ocp >= 4).reshape(B2, NB // 32, 32)
    nmask = jnp.zeros((B2, NB // 32), jnp.uint32)
    for jj in range(32):
        nmask = nmask | (
            nbv[:, :, jj].astype(jnp.uint32) << jnp.uint32(jj)
        )
    colL = jnp.arange(L, dtype=jnp.int32)[None, :]
    has_n = ((oc >= 4) & (colL < olens[:, None])).any(axis=1)
    return aw, nmask, has_n, olens, oc, WA, NB


def _screen16(aw, olens, w16_rows, w16_bits, *, L: int, k: int):
    """16-mer lane screen (semantics-preserving lane skip).

    A quasi-mapping hit needs an exact k-mer seed; a present k-mer
    implies every contained 16-mer word present in the text.  Testing
    one word per stride <= k-15 therefore covers every k-mer window:
    a lane whose tested words are ALL Bloom-absent provably has zero
    hits and is fed length 0.  Bloom false positives only admit a
    lane that then finds nothing."""
    if not (w16_bits > 0 and L >= 16 and k >= 16 + 1):
        return olens
    stride = min(16, k - 15)
    ps = list(range(0, L - 16 + 1, stride))

    def word_at(p):
        w, o = p >> 4, p & 15
        if o == 0:
            return aw[:, w]
        return ((aw[:, w] << jnp.uint32(2 * o))
                | (aw[:, w + 1] >> jnp.uint32(32 - 2 * o)))

    keys = jnp.stack([word_at(p) for p in ps], axis=1)  # (B2, T)
    # single-word blocked layout (index/kmerhash.build_word16_bloom):
    # word index from mix_hash_u32(key, 0), both probe bits from
    # disjoint 5-bit fields of filter_hash2_u32(key, 0) — ONE
    # gather per tested position instead of two
    wm = jnp.uint32((1 << w16_bits) // 32 - 1)
    h1 = keys * jnp.uint32(0x9E3779B1)
    h1 = h1 ^ (h1 >> jnp.uint32(15))
    h1 = h1 * jnp.uint32(0xC2B2AE3D)
    h1 = (h1 ^ (h1 >> jnp.uint32(13))) & wm
    # filter_hash2_u32(key, 0)
    h2 = keys * jnp.uint32(0x165667B1)
    h2 = h2 ^ (h2 >> jnp.uint32(16))
    h2 = h2 * jnp.uint32(0x7FEB352D)
    h2 = h2 ^ (h2 >> jnp.uint32(11))

    v = w16_rows[h1.astype(jnp.int32)]
    present = (
        (v >> (h2 & jnp.uint32(31)).astype(jnp.int32))
        & (v >> ((h2 >> jnp.uint32(5)) & jnp.uint32(31)).astype(
            jnp.int32))
        & 1
    ) == 1
    valid = (jnp.asarray(ps, jnp.int32)[None, :] + 16
             <= olens[:, None])
    keep = jnp.any(present & valid, axis=1)
    return jnp.where(keep, olens, 0)


@partial(
    jax.jit,
    static_argnames=("k", "cand_cap", "max_mmps", "max_steps", "ht_bits",
                     "ht_probes", "n_text", "interpret", "skip_jump",
                     "phases", "postpass", "uniform_len", "filt_bits",
                     "filt_access", "w16_bits", "compact_lanes",
                     "fastpath", "xscan", "xscan_t", "xscan_f",
                     "xscan_t1", "xscan_p2", "xscan_b", "filtxl_bits",
                     "L_pad"),
)
def _map_lanes_pallas_jit(
    codes, lens, pw_h2d, nm_h2d,
    text_rows, sa_rows, ht_rows, filt_rows, w16_rows,
    pk_rows, ht16, filtxl_rows, sa_ov,
    *,
    k: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    n_text: int,
    interpret: bool,
    skip_jump: bool = False,
    phases: str = "abc",
    postpass: bool = True,
    uniform_len: int | None = None,
    filt_bits: int = 0,
    filt_access: str = "scalar",
    w16_bits: int = 0,
    compact_lanes: bool = True,
    fastpath: bool = False,
    xscan: bool = False,
    xscan_t: int = 7,
    xscan_f: int = 4,
    xscan_t1: int = 2,
    xscan_p2: int = 2,
    xscan_b: tuple = (),
    filtxl_bits: int = 0,
    L_pad: int | None = None,
):
    """Oriented-lane mapping: pack-domain lane pipeline (round 4).

    Lanes are carried as ALIGNED 16-base words (B2, WA) u32 plus an
    N-bitmask — ~30x smaller than the (B2, WINW) code/per-position-word
    arrays this used to build — so the screen, clean fast path, xscan
    and both lane compactions run on small arrays.  The full-width
    code/word arrays the Pallas kernel needs are unpacked (elementwise
    funnel shifts, no gathers) ONLY for the residual kernel prefix
    after the second compaction.  See docs/ROADMAP.md round 4."""
    from .kernels import NEG
    from .xscan import pos_words

    if codes is None:          # packed path: codes ride as 2-bit words
        B, L = lens.shape[0], L_pad
    else:
        B, L = codes.shape
    B2 = 2 * B
    aw, nmask, has_n, olens, oc, WA, NB = _build_lanes(
        codes, pw_h2d, nm_h2d, lens, uniform_len, L)
    klens = _screen16(aw, olens, w16_rows, w16_bits, L=L, k=k)

    # ---- clean-lane fast path ----
    # resolve unique-seed full-length-match lanes entirely in XLA (one
    # bucket-pair probe + one packed-word verify, all row gathers)
    f_clean = None
    if fastpath:
        f_clean, f_txp, f_pos = _fastpath_clean(
            aw, has_n, klens, ht16, pk_rows, text_rows.reshape(-1),
            k=k, ht_bits=ht_bits, ht_probes=ht_probes, n_text=n_text,
        )
        klens = jnp.where(f_clean, 0, klens)

    C, M = cand_cap, max_mmps

    if xscan:
        # ===== compacted pack-domain path (the production default) ====
        # first compaction: live lanes to the front; all further stages
        # run on prefixes.  Gathers move (B2, WA) words + the N-mask —
        # ~30x less than permuting (B2, WINW) code/word arrays.
        order = jnp.argsort((klens == 0).astype(jnp.int32), stable=True)
        P = max(B2 // 4, LB)
        # ONE fused row gather instead of three: gather cost on TPU is
        # dominated by a per-ROW floor (~35M single-word rows/s), so
        # [aw | klens | has_n] ride one (B2, WA+2) gather and split
        fused_c = jnp.concatenate([
            jax.lax.bitcast_convert_type(aw, jnp.int32),
            klens[:, None],
            has_n[:, None].astype(jnp.int32),
        ], axis=1)[order]
        kl_c = fused_c[:, WA]
        aw_p = jax.lax.bitcast_convert_type(
            fused_c[:P, :WA], jnp.uint32)
        hn_p = fused_c[:P, WA + 1] != 0
        oP = order[:P]

        from .xscan import nip_scan_xla

        handled, xs_txp, xs_pin, xs_vld, xs_nm, xs_mlen, xs_over = (
            nip_scan_xla(
                aw_p, kl_c[:P], hn_p,
                ht16, pk_rows, sa_ov, text_rows.reshape(-1),
                filtxl_rows.reshape(-1),
                k=k, C=C, M=M, F=xscan_f, T=xscan_t,
                L_read=min(L, WINR), ht_bits=ht_bits,
                ht_probes=ht_probes, filt_bits=filtxl_bits,
                n_text=n_text, skip_jump=skip_jump,
                T1=xscan_t1, P2_div=xscan_p2, sched_b=xscan_b,
            )
        )
        kl_k = kl_c.at[:P].set(jnp.where(handled, 0, kl_c[:P]))

        # ---- second compaction: the kernel residual set ----
        # xscan leaves ~0.5% of lanes (punts); compacting them lets the
        # kernel launch ceil(live/LB) blocks instead of a grid sized by
        # the pre-xscan live count, and the kernel's full-width code /
        # per-position-word arrays are unpacked for the PK prefix only.
        # PK = B2 for small batches (tests: no spill path at all);
        # production prefix B2/4 covers any realistic residual — a
        # pathological overflow (live residual beyond PK) marks those
        # fragments overflow, which the escalation pass remaps exactly.
        # B2/32 = 8192 rows at a 64k batch — 4x the measured residual
        # (~2k live lanes after xscan at 0.5% error, profile_pieces
        # 2026-08-20); the unpack + kernel-side postpass run at PK
        # width, so oversizing it costs real milliseconds, and an
        # overflow is exact anyway (escalation remap)
        pk_div = int(os.environ.get("SF_PK_DIV", "32"))
        PK = B2 if (B2 <= 32768 or w16_bits == 0) else max(B2 // pk_div, LB)
        livek = kl_k > 0
        live2 = livek.sum().astype(jnp.int32)
        order2 = jnp.argsort(~livek, stable=True)
        idx2 = order2[:PK]
        of2 = order[idx2]  # frame-0 indices of the kernel rows
        aw_k = aw[of2]
        nm_k = nmask[of2]
        kl_kc = kl_k[idx2]

        # unpack kernel lane arrays at the PK prefix only (elementwise
        # funnel shifts — no gathers)
        awr = jnp.repeat(aw_k, 16, axis=1)                # (PK, NB)
        shr = jnp.asarray(
            (2 * (15 - (np.arange(NB) & 15))).astype(np.uint32)
        )[None, :]
        cds = ((awr >> shr) & jnp.uint32(3)).astype(jnp.int32)
        nmr = jnp.repeat(nm_k, 32, axis=1)
        shn = jnp.asarray((np.arange(NB) % 32).astype(np.uint32))[None, :]
        nbit = (nmr >> shn) & jnp.uint32(1)
        codes_k = jnp.where(nbit == 1, jnp.int32(4), cds)
        if WINW > NB:
            codes_k = jnp.concatenate(
                [codes_k, jnp.full((PK, WINW - NB), 4, jnp.int32)],
                axis=1,
            )
        else:
            codes_k = codes_k[:, :WINW]
        npw = min(L + 1, WINW)
        pw_k = pos_words(aw_k, npw)
        if WINW > npw:
            pw_k = jnp.concatenate(
                [pw_k, jnp.zeros((PK, WINW - npw), jnp.uint32)], axis=1
            )
        pw_k = jax.lax.bitcast_convert_type(pw_k, jnp.int32)

        kkw = dict(
            k=k, cand_cap=C, max_mmps=M, max_steps=max_steps,
            ht_bits=ht_bits, ht_probes=ht_probes, skip_jump=skip_jump,
            n_text=n_text, interpret=interpret, phases=phases,
            filt_bits=filt_bits, filt_access=filt_access,
        )
        dyn = (not interpret) and os.environ.get("SF_DYNGRID", "1") == "1"
        lv = jnp.minimum(live2, PK) if dyn else None
        gk_txp, gk_pin, gk_vld, gk_meta = mmp_scan_pallas(
            codes_k, pw_k, kl_kc,
            text_rows, sa_rows, ht_rows, filt_rows, lv, **kkw,
        )
        # rows past the dynamic grid are stale HBM; dead rows mask out
        lm2 = (kl_kc > 0)[:, None]
        gk_txp = jnp.where(lm2, gk_txp, 0)
        gk_pin = jnp.where(lm2, gk_pin, 0)
        gk_vld = jnp.where(lm2, gk_vld, 0)
        gk_meta = jnp.where(lm2, gk_meta, 0)

        # ---- per-prefix postpass + frame-0 scatters ----
        # the xscan emits at most xscan_f candidates per MMP slot, so
        # its intersection + sort runs at width F (not C) and the
        # result rows zero-pad up to the C-wide output slots
        xt, xp, xv = _intersect_sort(
            xs_txp, xs_pin, xs_vld, xs_nm, C=xscan_f, M=M
        )
        kt, kp, kv = _intersect_sort(
            gk_txp, gk_pin, gk_vld, gk_meta[:, 0], C=C, M=M
        )

        Fx = min(xscan_f, C)
        mlen0 = jnp.zeros(B2, jnp.int32)
        over0 = jnp.zeros(B2, bool)
        nml0 = jnp.zeros(B2, jnp.int32)

        # xscan rows first (punted rows write partial state, then the
        # kernel scatter overwrites them — punts are always in the
        # kernel set).  The xscan emits at most F candidates, so only
        # an (B2, F) sub-slab is scattered; columns F..C-1 are zero
        # except where the kernel's full-width rows land below.
        def widen(sub, fill):
            ext = jnp.full((B2, C - Fx), fill, sub.dtype)
            return jnp.concatenate([sub, ext], axis=1)

        txp0 = widen(jnp.zeros((B2, Fx), jnp.int32).at[oP].set(
            xt[:, :Fx]), 0)
        pos0 = widen(jnp.zeros((B2, Fx), jnp.int32).at[oP].set(
            xp[:, :Fx]), 0)
        vld0 = widen(jnp.zeros((B2, Fx), bool).at[oP].set(
            xv[:, :Fx]), False)
        mlen0 = mlen0.at[oP].set(xs_mlen)
        over0 = over0.at[oP].set(xs_over)
        nml0 = nml0.at[oP].set(xv.sum(axis=1))

        # kernel rows; dead prefix rows redirect out of range (dropped)
        oK = jnp.where(kl_kc > 0, of2, B2)
        txp0 = txp0.at[oK].set(kt)
        pos0 = pos0.at[oK].set(kp)
        vld0 = vld0.at[oK].set(kv)
        mlen0 = mlen0.at[oK].set(gk_meta[:, 2])
        over0 = over0.at[oK].set(gk_meta[:, 1] != 0)
        nml0 = nml0.at[oK].set(kv.sum(axis=1))

        if PK < B2:
            # live residual beyond the kernel prefix (pathological —
            # see PK note): those fragments must not emit partial hits;
            # mark them overflow so the escalation pass remaps exactly
            rank1 = jnp.cumsum(livek.astype(jnp.int32)) - 1
            spill1 = livek & (rank1 >= PK)
            oS = jnp.where(spill1, order, B2)
            spill0 = jnp.zeros(B2, bool).at[oS].set(True)
            vld0 = vld0 & ~spill0[:, None]
            over0 = over0 | spill0
            mlen0 = jnp.where(spill0, 0, mlen0)
            nml0 = jnp.where(spill0, 0, nml0)

        out = {
            "txp": txp0,
            "pos": pos0,
            "valid": vld0,
            "mlen": mlen0,
            "overflow": over0,
            "num_mapped_loci": nml0,
        }
    else:
        # ===== full-width path (bounded budgets / debug configs) =====
        pad = jnp.full((B2, WINW - L), 4, jnp.uint8)
        codes_pad = jnp.concatenate([oc, pad], axis=1)
        from .encode import _pack_words

        pw_i32 = jax.lax.bitcast_convert_type(
            _pack_words(codes_pad, sub=0), jnp.int32
        )

        # ---- lane compaction ----
        order = inv = None
        # postpass=False is the scan-only debug interface: its outputs
        # are per-input-lane arrays, so compaction must be skipped
        if compact_lanes and (w16_bits > 0 or fastpath) and postpass:
            order = jnp.argsort(
                (klens == 0).astype(jnp.int32), stable=True
            )
            inv = jnp.argsort(order)
            codes_pad = codes_pad[order]
            pw_i32 = pw_i32[order]
            klens = klens[order]

        dyn = (not interpret) and (order is not None) \
            and os.environ.get("SF_DYNGRID", "1") == "1"
        kkw = dict(
            k=k, cand_cap=C, max_mmps=M, max_steps=max_steps,
            ht_bits=ht_bits, ht_probes=ht_probes, skip_jump=skip_jump,
            n_text=n_text, interpret=interpret, phases=phases,
            filt_bits=filt_bits, filt_access=filt_access,
        )
        codes_i32 = codes_pad.astype(jnp.int32)
        if not dyn:
            gtxp, gpin, vld, meta = mmp_scan_pallas(
                codes_i32, pw_i32, klens,
                text_rows, sa_rows, ht_rows, filt_rows, **kkw,
            )
        else:
            live1 = (klens > 0).sum().astype(jnp.int32)
            gtxp, gpin, vld, meta = mmp_scan_pallas(
                codes_i32, pw_i32, klens,
                text_rows, sa_rows, ht_rows, filt_rows, live1, **kkw,
            )
            lm = (klens > 0)[:, None]
            gtxp = jnp.where(lm, gtxp, 0)
            gpin = jnp.where(lm, gpin, 0)
            vld = jnp.where(lm, vld, 0)
            meta = jnp.where(lm, meta, 0)
        if not postpass:  # debug: scan-only timing
            return {"gtxp": gtxp, "gpin": gpin, "vld": vld, "meta": meta}
        s_txp, s_pos, s_vld = _intersect_sort(
            gtxp, gpin, vld, meta[:, 0], C=C, M=M
        )
        out = {
            "txp": s_txp,
            "pos": s_pos,
            "valid": s_vld,
            "mlen": meta[:, 2],
            "overflow": meta[:, 1].astype(bool),
            "num_mapped_loci": s_vld.sum(axis=1),
        }
        if inv is not None:
            out = {kk: v2[inv] for kk, v2 in out.items()}

    if f_clean is not None:
        # splice fast-resolved lanes: one hit in slot 0 (matches the
        # sorted postpass convention — a single valid hit lands first,
        # invalid slots carry the zero init), mlen = full read length
        col0 = jnp.arange(C)[None, :] == 0
        sel = f_clean[:, None]
        out["txp"] = jnp.where(sel, jnp.where(col0, f_txp[:, None], 0),
                               out["txp"])
        out["pos"] = jnp.where(sel, jnp.where(col0, f_pos[:, None], 0),
                               out["pos"])
        out["valid"] = jnp.where(sel, col0, out["valid"])
        out["mlen"] = jnp.where(f_clean, olens, out["mlen"])
        out["overflow"] = jnp.where(f_clean, False, out["overflow"])
        out["num_mapped_loci"] = jnp.where(
            f_clean, 1, out["num_mapped_loci"]
        )
    return out


def _intersect_sort(gtxp, gpin, vld, nm, *, C: int, M: int):
    """MMP-slot intersection + dedupe + (txp, pos) sort — the shared
    post-pass over any row prefix.  Pure arithmetic + ONE multi-operand
    lexicographic sort (payloads ride the sort network; no gathers)."""
    from .kernels import NEG

    R = gtxp.shape[0]
    m_txp = gtxp.reshape(R, M, C)
    m_pos = gpin.reshape(R, M, C)
    m_vld = vld.reshape(R, M, C).astype(bool)
    hvalid = m_vld[:, 0, :]
    htxp = m_txp[:, 0, :]
    hpos = m_pos[:, 0, :]
    for m in range(1, M):
        has_m = nm > m
        match = (
            (htxp[:, :, None] == m_txp[:, m, None, :])
            & (hpos[:, :, None] == m_pos[:, m, None, :])
            & m_vld[:, m, None, :]
        ).any(axis=2)
        hvalid = hvalid & jnp.where(has_m[:, None], match, True)

    key_t = jnp.where(hvalid, htxp, NEG)
    _, s_pos, s_txp, s_vld = jax.lax.sort(
        (key_t, hpos, htxp, hvalid), dimension=1, num_keys=2,
        is_stable=True,
    )
    first = jnp.ones_like(s_vld)
    first = first.at[:, 1:].set(
        ~((s_txp[:, 1:] == s_txp[:, :-1]) & s_vld[:, :-1])
    )
    s_vld = s_vld & first
    return s_txp, s_pos, s_vld


def _fastpath_clean(
    aw,          # (B2, WA) u32 ALIGNED lane words (A-substituted)
    has_n,       # (B2,) bool — lane contains a non-ACGT code in [0, len)
    klens,       # (B2,) i32 post-screen lane lengths
    ht16,        # (S, 16) i32 bucket rows [k0 x4|k1 x4|lo x4|cnt x4]
    pk_rows,     # (Rw, 32) i32 OVERLAPPED [16 words | 16 flags] stride 8
    text_flat,   # (3*Rt*128,) i32 flat view of the FUSED text rows
    *,
    k: int,
    ht_bits: int,
    ht_probes: int,
    n_text: int,
):
    """Vectorized clean-lane resolution (XLA, one probe + one packed
    verify): a lane whose position-0 k-mer resolves to a UNIQUE text
    position (cnt == 1; the hash row stores sa[lo] directly) and whose
    full read matches the text there has, by the MMP scan rules,
    exactly one MMP covering the whole read — the scan ends
    (i advances past len-k) and the hit set is that single locus.  Such
    lanes never need the scalar Pallas kernel; on error-free
    unique-seed reads (the majority of a typical run) this removes the
    per-lane scalar orchestration entirely.

    Gather economy: ONE 16-word bucket row gather resolves probe h1;
    keys displaced into later chain buckets simply fall through to the
    scan paths (conservative — they resolve there).  ONE overlapped
    17-word pk_rows gather serves the 9-word verify window (16 words +
    a flag bitmask).

    Exactness: every condition is conservative — unresolved probes,
    multi-candidate seeds, reads containing non-ACGT codes, and text
    windows touching a special (N / separator / text-end) 16-base word
    all fall through to the scan paths, which recompute from scratch.
    For accepted lanes the packed-word compare equals the true-code
    compare because both sides are then pure ACGT.

    Returns (clean, txp, pos): clean (B2,) bool; txp/pos valid where
    clean (the single hit, pos already in-transcript at query offset
    0)."""
    U32 = jnp.uint32
    B2 = aw.shape[0]
    hmask = jnp.int32((1 << ht_bits) - 1)
    S = ht16.shape[0]
    Rw = pk_rows.shape[0]
    # width-generic verify: PKD data words per pk row serve up to
    # PKD - 8 read words (offset < 8); 17-wide rows -> 8 words (128bp),
    # 25-wide rows -> 16 words (256bp, xlong).  Compare only the words
    # the lanes actually carry (WA - 1 covers any klens <= 16*(WA-2))
    PKD = pk_rows.shape[1] - 1
    RW = min(PKD - 8, aw.shape[1] - 1)
    WSEL = RW + 1

    k0 = aw[:, 0]
    k1 = aw[:, 1] >> U32(2 * (32 - k))
    # index/kmerhash.mix_hash_u32
    h = (k0 * U32(0x9E3779B1)) ^ (k1 * U32(0x85EBCA77))
    h = h ^ (h >> U32(15))
    h = h * U32(0xC2B2AE3D)
    h = h ^ (h >> U32(13))
    h1 = (h.astype(jnp.int32)) & hmask
    k0i = jax.lax.bitcast_convert_type(k0, jnp.int32)
    k1i = jax.lax.bitcast_convert_type(k1, jnp.int32)

    row16 = ht16[jnp.clip(h1, 0, S - 1)]                # (B2, 16)
    m = ((row16[:, 12:16] > 0)
         & (row16[:, 0:4] == k0i[:, None])
         & (row16[:, 4:8] == k1i[:, None]))
    found = m.any(axis=1)
    cnt = jnp.where(m, row16[:, 12:16], 0).sum(axis=1)
    p = jnp.where(m, row16[:, 8:12], 0).sum(axis=1)
    # direct text position when cnt == 1 (keys displaced past bucket
    # h1 are simply not found here — conservative)

    active = (klens >= k) & ~has_n & found & (cnt == 1)

    pc = jnp.clip(p, 0, n_text - 1)
    w0 = pc >> 4
    # overlapped pk rows: the WSEL-word window at offset w0 & 7 sits in
    # ONE row (row r covers words 8r..8r+PKD-1; col PKD = flag bits)
    ra = pk_rows[jnp.clip(w0 >> 3, 0, Rw - 1)]          # (B2, PKD + 1)
    d = w0 & 7

    def selw(mat):
        out = jnp.zeros((B2, WSEL), mat.dtype)
        for dd in range(8):
            out = jnp.where(
                (d == dd)[:, None], mat[:, dd : dd + WSEL], out)
        return out

    W9 = jax.lax.bitcast_convert_type(selw(ra[:, :PKD]), jnp.uint32)
    # flag bit w covers word 8r+w; window word j is flag bit d + j
    fb = ra[:, PKD] >> d
    S9 = jnp.stack([(fb >> jj) & 1 for jj in range(WSEL)], axis=1)
    o = pc & 15
    sh = (o * 2).astype(jnp.uint32)[:, None]
    awin = jnp.where(
        (o == 0)[:, None],
        W9[:, 0:RW],
        (W9[:, 0:RW] << sh) | (W9[:, 1:WSEL] >> (U32(32) - sh)),
    )                                                    # (B2, RW)
    rw = aw[:, 0:RW]                                     # (B2, RW)
    x = awin ^ rw
    # leading equal bases per word (earliest base in the MSBs)
    sm = x
    for b in (1, 2, 4, 8, 16):
        sm = sm | (sm >> U32(b))
    eqb = ((U32(32) - jax.lax.population_count(sm)) >> U32(1)).astype(
        jnp.int32
    )
    wj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    bp = jnp.where(x != 0, 16 * wj + eqb, jnp.int32(4096))
    raw = jnp.min(bp, axis=1)
    lstar = jnp.minimum(raw, klens)
    nword = (klens + 15) >> 4
    spec_hit = ((S9 != 0)
                & (jax.lax.broadcasted_iota(jnp.int32, S9.shape, 1)
                   <= nword[:, None])).any(axis=1)
    clean = active & (lstar >= klens) & ~spec_hit

    q = pc + ROW  # fused rows carry a front SEP block
    base = (3 * (q >> 7) + 1) * 128 + (q & 127)
    txp = text_flat[base]
    pos = text_flat[base + 128]
    return clean, txp, pos


def _index_fingerprint(index) -> str:
    """Cheap identity for the prepared-arrays disk cache: static index
    parameters + a sample of the suffix array (a rebuilt index in the
    same directory changes the SA with overwhelming probability)."""
    import hashlib

    h = hashlib.sha256()
    h.update(repr((index.text_len, index.num_transcripts, index.k,
                   index.prefix_bases)).encode())
    sa = np.asarray(index.sa)
    h.update(sa[: 1 << 14].tobytes())
    h.update(sa[-(1 << 14):].tobytes())
    return h.hexdigest()[:16]


def prepare_pallas_text(index, cand_cap: int, pk_words: int = 16,
                        cache_dir: str | None = None) -> dict:
    """Device arrays for the Pallas path.

    `pk_words`: data words per overlapped pk verify row (stride 8, +1
    flag word).  16 serves reads <= 128bp (RW = 8 word compares at
    offsets < 8); 24 serves reads <= 256bp (xlong path).

    `cache_dir`: when given, the BUILT numpy images (fused text rows,
    pk/sa overlap rows, blooms, bucket table) are cached there as one
    .npz — the host-side build costs tens of seconds at GENCODE scale
    and is identical across runs of the same index.

    text_rows are FUSED: text block r (128 positions, one front SEP row
    keeps read-aligned window starts non-negative) occupies three
    consecutive rows [codes_r; txp_of_pos_r; pos_in_txp_r], so each
    candidate window DMA carries the text AND the candidate's
    (transcript, in-transcript position) identity — the old SA-ordered
    companion fetches (3 extra DMAs per lane-step) are gone.  The hash
    rows store sa[lo] directly for unique k-mers, which skips the SA
    window fetch for the (majority) unique-seed case too."""
    if index.kmer_ht is None:
        raise ValueError("pallas mapping path requires a k-mer table (k >= 17)")
    _ARR = ("text_rows", "sa_rows", "ht_rows", "filt_rows", "w16_rows",
            "pk_rows", "ht16", "filtxl_rows", "sa_ov")
    _SCAL = ("n_text", "filt_bits", "filtxl_bits", "w16_bits")
    npz_path = None
    if cache_dir:
        fp = _index_fingerprint(index)
        npz_path = os.path.join(cache_dir, f"pallas_pk{pk_words}_{fp}.npz")
        if os.path.exists(npz_path):
            try:
                z = np.load(npz_path, allow_pickle=False)
                out = {kk: jnp.asarray(z[kk]) for kk in _ARR}
                out.update({kk: int(z[kk]) for kk in _SCAL})
                return out
            except Exception:
                try:
                    os.unlink(npz_path)
                except OSError:
                    pass
    n = index.text_len
    nrows = 1 + (-(-n // ROW)) + PAD_ROWS
    text = np.full((nrows * ROW,), 4, dtype=np.int32)
    text[ROW : ROW + n] = index.codes
    txp_of_pos = np.asarray(index.txp_of_pos, np.int32)
    txp_offsets = np.asarray(index.txp_offsets, np.int32)
    tx_full = np.zeros(nrows * ROW, dtype=np.int32)
    tx_full[ROW : ROW + n] = txp_of_pos[:n]
    po_full = np.zeros(nrows * ROW, dtype=np.int32)
    po_full[ROW : ROW + n] = np.arange(n, dtype=np.int32) - txp_offsets[
        txp_of_pos[:n]
    ]
    fused = np.stack(
        [text.reshape(-1, ROW), tx_full.reshape(-1, ROW),
         po_full.reshape(-1, ROW)], axis=1,
    ).reshape(-1, ROW)  # rows [codes_r, txp_r, pos_r] per block
    sarows = -(-n // ROW) + PAD_ROWS
    sa = np.full((sarows * ROW,), n - 1, dtype=np.int32)
    sa[:n] = index.sa
    from ..index.kmerhash import build_kmer_bloom, build_word16_bloom

    bloom = build_kmer_bloom(index.kmer_ht)
    # second, LARGER k-mer Bloom for the XLA nip scan (xscan.py): the
    # kernel's filter lives in VMEM and is capped at 2^26 bits (~25%
    # false positives on a 20M-key index — fine there, an FP costs one
    # cheap probe), but the vectorized scan pays a bounded EVENT per FP,
    # so it reads this HBM-resident low-FP instance instead
    bloom_xl = build_kmer_bloom(index.kmer_ht, max_bits_log2=30,
                                bits_per_key=16)
    # 16-mer lane-screen filter: only useful when the strided test
    # spacing (k-15) is wide enough that the screen is cheap
    if index.k >= 23:
        w16 = build_word16_bloom(index.packed16, n)
        w16_rows, w16_bits = w16["w16_words"], w16["w16_bits"]
    else:
        w16_rows, w16_bits = np.zeros(8, np.int32), 0
    ht_rows_np = pack_kmer_table_rows(index.kmer_ht, sa=index.sa)

    # ---- clean-lane fast-path arrays (_fastpath_clean / xscan) ----
    # OVERLAPPED aligned 16-base text words + per-word special flags
    # (word touches N / separator / text end): row r covers words
    # [8r, 8r+16) as [16 words | 16 flags], so ANY 9-word verify window
    # (offset w0 & 7) lives in ONE row gather.  2x the non-overlapped
    # footprint — pk rows are ~n/16 words, so this stays small next to
    # the fused text rows.
    from numpy.lib.stride_tricks import sliding_window_view

    n16 = -(-n // 16)
    aligned = np.zeros(n16, dtype=np.uint32)
    aligned[:] = np.asarray(index.packed16, np.uint32)[: 16 * n16 : 16][:n16]
    codes_np = np.asarray(index.codes[:n])
    specpos = np.zeros(16 * n16, dtype=bool)
    specpos[:n] = codes_np >= 4
    specpos[n:] = True  # text-end padding counts as special
    spec_word = specpos.reshape(n16, 16).any(axis=1).astype(np.int32)
    PKD = pk_words
    rw_rows = -(-n16 // 8) + 2
    wpad = np.zeros(rw_rows * 8 + PKD, dtype=np.uint32)
    spad = np.ones(rw_rows * 8 + PKD, dtype=np.int32)  # pad rows: special
    wpad[:n16] = aligned
    spad[:n16] = spec_word
    w16s = np.ascontiguousarray(
        sliding_window_view(wpad, PKD)[::8][:rw_rows]
    )
    s16s = np.ascontiguousarray(
        sliding_window_view(spad, PKD)[::8][:rw_rows]
    )
    # flags ride as ONE bitmask word (bit w = word 8r+w special), so a
    # verify window gather moves PKD+1 words instead of 2*PKD — gather
    # cost is per element, so the narrower row is ~2x cheaper
    sbits = (s16s.astype(np.uint32)
             << np.arange(PKD, dtype=np.uint32)[None, :]).sum(
        axis=1, dtype=np.uint32).astype(np.int32)
    pk_rows = np.concatenate(
        [w16s.view(np.int32), sbits[:, None]], axis=1
    )  # (Rw, PKD + 1): [PKD words | flag bits]
    # OVERLAPPED SA rows for the xscan candidate slice: row r covers
    # SA[16r, 16r+24), so any (lo & 15) + F <= 24 window is ONE gather
    rs16 = -(-n // 16) + 2
    sa_pad = np.full(rs16 * 16 + 24, n - 1, dtype=np.int32)
    sa_pad[:n] = index.sa
    sa_ov = np.ascontiguousarray(
        sliding_window_view(sa_pad, 24)[::16][:rs16]
    )  # (Rs, 24)
    S = index.kmer_ht["ht_lo"].shape[0]
    ht16 = ht_rows_np[: S // 8].reshape(S, 16)
    np_out = {
        "text_rows": fused,
        "sa_rows": sa.reshape(-1, ROW),
        "ht_rows": ht_rows_np,
        "filt_rows": np.asarray(bloom["filt_rows"]),
        "w16_rows": np.asarray(w16_rows),
        "pk_rows": pk_rows,
        "ht16": ht16,
        "filtxl_rows": np.asarray(bloom_xl["filt_rows"]),
        "sa_ov": sa_ov,
    }
    scalars = {
        "n_text": n,
        "filt_bits": int(bloom["filt_bits_log2"]),
        "filtxl_bits": int(bloom_xl["filt_bits_log2"]),
        "w16_bits": int(w16_bits),
    }
    if npz_path:
        try:
            import tempfile

            os.makedirs(cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **np_out, **{
                    kk: np.int64(v) for kk, v in scalars.items()})
            os.replace(tmp, npz_path)
        except Exception:
            pass
    out = {kk: jnp.asarray(v) for kk, v in np_out.items()}
    out.update(scalars)
    return out
