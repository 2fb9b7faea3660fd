"""Vectorized bounded NIP scan (the "everything-else" fast path).

The Pallas kernel (pallas_kernel.py) gives each lane real dynamic
control flow, but all per-lane work inside a block serializes on the
TensorCore's ONE scalar pipeline — measured ~58µs per 8-lane block
step on v5e, which caps the kernel at ~450ms per 64k-fragment
mate-call no matter how few lanes remain.  This module runs the SAME
scan semantics as dense vectorized XLA over a compacted lane prefix:
every per-event operation (hash-table probe, SA-interval slice,
packed-word LCP verify, hit recording, NIP advance) is a row gather or
elementwise op across all lanes at once, so per-lane cost is VPU work
instead of microseconds of serialized scalar work.

Gather economy (round 4 — this stage is gather-VOLUME-bound; measured
on v5e the cost is per element moved, regardless of row width):
  * lanes arrive as ALIGNED 16-base words (P, WA) — per-position keys
    are derived by funnel shifts (VPU), not carried as (P, 256) arrays
  * phase A is LIGHT: one 16-word bucket gather per event; only
    unique seeds (cnt == 1) are verified (no SA slice at all); events
    that would need a probe chain or a multi-candidate verify DEFER —
    the lane simply stays active and phase B redoes the position with
    the full machinery (sound: the event never executed)
  * phase B resolves probe chains with direct bucket-row gathers
    (offsets 0..3; one 16-word row each — NO reshaped pair view: at
    GENCODE scale XLA materialized that reshape as a layout-padded
    copy of the whole table, see probe_pairrows); chains that walk
    past the covered offsets PUNT (rare)
  * the packed-text verify reads 17-word overlapped pk_rows (16 words
    + ONE flag-bitmask word; stride 8): any 9-word window in one row
  * SA slices read overlapped sa_ov rows (stride 16, width 24)

Two-phase schedule: most lanes that reach this scan finish in 1-3
probe events, so iterating the full lane prefix T times wastes most of
the work.  Phase A runs T1 light events at full width P; the still-
active lanes are then compacted to a P//P2DIV prefix and phase B runs
the remaining T-T1 full events there.  Both phases are lax.scan loops
(ONE traced body each instead of T unrolled copies — the unrolled form
dominated XLA compile time of the fused production step).  Active
lanes that overflow the phase-B prefix PUNT to the Pallas kernel, so
the shrink is semantics-free.

Exactness contract (mirrors refimpl/mapper._mmps + the Pallas kernel):
  * presence: the index's single-word k-mer Bloom — a negative PROVES
    the k-mer absent, so absent positions advance i by 1 exactly like
    the kernel's ffwd (with the production step budget >= read length
    the budget never binds, so WHICH sound absence proof fires is
    unobservable); a false positive probes the table and misses, also
    advancing by 1 — identical outcomes
  * a DEFERRED event leaves the lane state untouched (position, MMPs),
    so re-executing it later with the full machinery is the same scan
  * probes must resolve within the fetched window (first bucket in
    phase A, the bucket-pair window in phase B) — otherwise defer /
    punt; a bucket with an empty slot and no match is a definitive
    miss (the builder's chains never skip an empty slot)
  * candidate intervals: cnt == 1 uses the direct text position the
    hash row stores; 2 <= cnt <= F slices the SA; cnt > C sets the
    overflow flag and advances (reference-parity no-hit);
    F < cnt <= C punts
  * LCP verify compares A-substituted packed words, exact because
    lanes containing N punt and candidate windows touching a special
    (N / separator / text-end) word punt
  * lanes still active after T events punt
Punted lanes keep their kernel length and are recomputed from scratch
by the Pallas kernel, so every punt is semantics-free.

Reference behavior pinned: RapMap SACollector MMP scan as used by
/root/reference/src/SailfishQuantify.cpp:192-213 (see
tests/test_hand_fixtures.py for on-paper derivations)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32
_BIG = jnp.int32(1 << 20)


def _mix_u32(k0, k1):
    h = (k0 * U32(0x9E3779B1)) ^ (k1 * U32(0x85EBCA77))
    h = h ^ (h >> U32(15))
    h = h * U32(0xC2B2AE3D)
    return h ^ (h >> U32(13))


def _mix2_u32(k0, k1):
    h = (k1 * U32(0x27D4EB2F)) ^ (k0 * U32(0x165667B1))
    h = h ^ (h >> U32(16))
    h = h * U32(0x7FEB352D)
    return h ^ (h >> U32(11))


def _select_w(mat, d, out_w):
    """mat (P, width) -> (P, out_w) = mat[p, d:d+out_w] via a small
    static select (d bounded by width - out_w)."""
    P, width = mat.shape
    out = jnp.zeros((P, out_w), mat.dtype)
    for dd in range(width - out_w + 1):
        out = jnp.where((d == dd)[:, None], mat[:, dd : dd + out_w], out)
    return out


def pos_words(aw, npos: int):
    """(P, WA) aligned words -> (P, npos) per-position 16-base words via
    funnel shifts: word(j) = aw[j>>4] << 2(j&15) | aw[j>>4 + 1] >> ...
    (pure VPU — replaces carrying a (P, 256) per-position array)."""
    P, WA = aw.shape
    nw = (npos + 15) >> 4
    lo = jnp.repeat(aw[:, :nw], 16, axis=1)[:, :npos]
    hi = jnp.repeat(aw[:, 1 : nw + 1], 16, axis=1)[:, :npos]
    sh = jnp.asarray(
        (2 * (np.arange(npos) & 15)).astype(np.uint32))[None, :]
    return jnp.where(sh == 0, lo, (lo << sh) | (hi >> (U32(32) - sh)))


def _bucket16(row16, k0i, k1i):
    m = ((row16[:, 12:16] > 0)
         & (row16[:, 0:4] == k0i[:, None])
         & (row16[:, 4:8] == k1i[:, None]))
    found = m.any(axis=1)
    lo = jnp.where(m, row16[:, 8:12], 0).sum(axis=1)
    cnt = jnp.where(m, row16[:, 12:16], 0).sum(axis=1)
    empty = (row16[:, 12:16] == 0).any(axis=1)
    return found, lo, cnt, empty


def probe_pairrows(ht16, h1, k0i, k1i, *, ht_probes: int):
    """Full probe-chain resolution: chain offsets 0..3 gather their
    bucket rows DIRECTLY from the (S, 16) table.

    (An earlier version viewed the table as (S//2, 32) bucket-pair rows
    via an in-graph reshape — at GENCODE scale XLA materialized that
    reshape as a 128-lane-padded relayout COPY of the whole table:
    16 GB + 8 GB of HBM temps for a 2 GB argument, an instant OOM.
    Direct row gathers keep the argument's compact layout and, as a
    bonus, cover offset 3 for odd h1 too, so fewer chains punt.)

    Chains that wrap past the table end return unresolved — the caller
    punts those lanes, which is always semantics-free.

    Returns (found, lo, cnt, miss, unresolved)."""
    P = h1.shape[0]
    S = ht16.shape[0]
    nprobe = min(ht_probes, 4)
    found = jnp.zeros(P, bool)
    stopped = jnp.zeros(P, bool)
    unres = jnp.zeros(P, bool)
    lo = jnp.zeros(P, I32)
    cnt = jnp.zeros(P, I32)
    for a in range(nprobe):
        row16 = ht16[jnp.clip(h1 + a, 0, S - 1)]
        avail = h1 + a < S
        fa, loa, ca, ea = _bucket16(row16, k0i, k1i)
        live = ~stopped & ~unres & ~found
        unres = unres | (live & ~avail)
        newly = live & avail & fa
        lo = jnp.where(newly, loa, lo)
        cnt = jnp.where(newly, ca, cnt)
        found = found | newly
        stopped = stopped | (avail & ea & ~fa & live)
    if ht_probes <= 4:
        miss = ~found & ~unres
    else:
        miss = ~found & stopped & ~unres
        unres = unres | (~found & ~stopped)
    return found, lo, cnt, miss, unres


def _select8(mat, d, out_w):
    """mat (P, width) -> (P, out_w) = mat[p, d:d+out_w] for d in [0, 8)
    (the pk/sa overlapped rows have stride 8, so the in-row offset is
    always < 8 regardless of the row width)."""
    out = jnp.zeros((mat.shape[0], out_w), mat.dtype)
    for dd in range(8):
        out = jnp.where((d == dd)[:, None], mat[:, dd : dd + out_w], out)
    return out


def _verify_lcp(gc_f, rw, jc, lens, pk_rows):
    """Packed-word LCP of ONE candidate column: compare the text window
    starting at global position (gc_f + jc) - jc ... i.e. the window
    whose column j aligns with read position j — against the read's
    aligned words, from read column jc.  Returns (lcp_f, spec_f).

    Width-generic: RW (read words) comes from rw.shape[1]; the pk rows
    must carry at least RW + 8 data words (stride 8, offset < 8) plus
    the flag word — 17-wide rows serve RW = 8 (reads <= 128bp), 25-wide
    rows serve RW = 16 (reads <= 256bp)."""
    Rw = pk_rows.shape[0]
    RW = rw.shape[1]
    PKD = pk_rows.shape[1] - 1
    if PKD < RW + 8:
        raise ValueError(
            f"pk rows carry {PKD} data words; reads of {16 * RW} bases "
            f"need >= {RW + 8} (rebuild with prepare_pallas_text "
            "pk_words)")
    WSEL = RW + 1
    w0 = gc_f >> 4
    ra = pk_rows[jnp.clip(w0 >> 3, 0, Rw - 1)]          # (P, PKD + 1)
    Wv = jax.lax.bitcast_convert_type(
        _select8(ra[:, :PKD], w0 & 7, WSEL), U32)
    fb = ra[:, PKD] >> (w0 & 7)
    o = gc_f & 15
    sh = (o * 2).astype(U32)[:, None]
    aw = jnp.where(
        (o == 0)[:, None],
        Wv[:, 0:RW],
        (Wv[:, 0:RW] << sh) | (Wv[:, 1:WSEL] >> (U32(32) - sh)),
    )
    x = aw ^ rw
    # ignore compare columns < j: zero the leading (j - 16*wi) bases of
    # each word (earliest base sits in the MSBs)
    wi8 = jnp.arange(RW, dtype=I32)[None, :]
    lead = jnp.clip(jc[:, None] - 16 * wi8, 0, 16)
    keep = jnp.where(
        lead >= 16, U32(0),
        jnp.where(lead == 0, U32(0xFFFFFFFF),
                  U32(0xFFFFFFFF) >> (2 * lead).astype(U32)),
    )
    x = x & keep
    sm = x
    for b in (1, 2, 4, 8, 16):
        sm = sm | (sm >> U32(b))
    eqb = ((U32(32) - jax.lax.population_count(sm))
           >> U32(1)).astype(I32)
    bp = jnp.where(x != 0, 16 * wi8 + eqb, I32(4096))
    raw = jnp.min(bp, axis=1)
    lcp_f = jnp.minimum(raw, lens) - jc
    # the compared window words [j>>4, nword] must be special-free for
    # the A-substituted compare to equal the true-code compare
    nword = (lens + 15) >> 4
    jword = jc >> 4
    wi9 = jnp.arange(WSEL, dtype=I32)[None, :]
    s9 = jnp.stack([(fb >> jj) & 1 for jj in range(WSEL)], axis=1)
    spec_f = ((s9 != 0) & (wi9 >= jword[:, None])
              & (wi9 <= nword[:, None])).any(axis=1)
    return lcp_f, spec_f


def _event_step(state, lane, tables, *, k, C, M, F, Fs, ht_bits,
                ht_probes, n_text, skip_jump, npos, light):
    """One probe event for every lane.  `light` = phase-A economy mode:
    single-bucket probe, unique-seed verify only; anything needing the
    probe chain, the SA slice, or a multi-candidate verify DEFERS (the
    lane state is untouched and the lane stays active for phase B).
    `Fs` is the static candidate-slot width of the state (phase B's F);
    light events write slot 0 only."""
    i, nm, mlen, over, punt, gtxp, gpin, vld = state
    k0a, k1a, nxt, rw, lens = lane
    ht16, pk_rows, sa_ov, text_flat = tables
    P = i.shape[0]
    S = ht16.shape[0]
    Rs = sa_ov.shape[0]

    act0 = (i + k <= lens) & (nm < M) & ~punt
    ic = jnp.clip(i, 0, npos - 1)
    j = jnp.take_along_axis(nxt, ic[:, None], axis=1)[:, 0]
    # no remaining present position -> the kernel would ffwd to the
    # read end and stop: mark done by parking i past the end
    no_more = act0 & (j >= _BIG)
    i = jnp.where(no_more, lens, i)
    act = act0 & ~no_more
    jc = jnp.where(act, j, 0)

    # ---- probe ----
    k0 = jnp.take_along_axis(k0a, jc[:, None], axis=1)[:, 0]
    k1 = jnp.take_along_axis(k1a, jc[:, None], axis=1)[:, 0]
    hmask = I32((1 << ht_bits) - 1)
    h1 = _mix_u32(k0, k1).astype(I32) & hmask
    k0i = jax.lax.bitcast_convert_type(k0, I32)
    k1i = jax.lax.bitcast_convert_type(k1, I32)
    if light:
        f1, lo, cnt, e1 = _bucket16(
            ht16[jnp.clip(h1, 0, S - 1)], k0i, k1i)
        found = f1
        # empty slot + no match = definitive miss; full bucket with no
        # match = the chain continues -> DEFER to phase B
        miss = ~f1 & e1
        defer = ~f1 & ~e1
        unresolved = jnp.zeros(P, bool)
    else:
        found, lo, cnt, miss, unresolved = probe_pairrows(
            ht16, h1, k0i, k1i, ht_probes=ht_probes)
        defer = jnp.zeros(P, bool)

    # ---- candidate positions ----
    single = found & (cnt == 1)
    if light:
        # only unique seeds execute; multi-candidate events defer
        defer = defer | (found & (cnt > 1) & (cnt <= C))
        nexec = 1
        p = jnp.where(single, lo, 0)[:, None]            # (P, 1)
        ncand = jnp.where(single, 1, 0)
    else:
        nexec = F
        multi = found & (cnt > 1) & (cnt <= F)
        srow = jnp.clip(jnp.where(multi, lo, 0) >> 4, 0, Rs - 1)
        sa24 = sa_ov[srow]                               # (P, 24)
        pf = _select_w(sa24, jnp.where(multi, lo & 15, 0), F)
        p = jnp.where(single[:, None],
                      jnp.broadcast_to(lo[:, None], (P, F)), pf)
        ncand = jnp.where(found, jnp.minimum(cnt, F), 0)
    fcols = jnp.arange(nexec, dtype=I32)[None, :]
    inc = fcols < ncand[:, None]                 # (P, nexec) real cands
    g = p - jc[:, None]
    bad_g = inc & ((g < 0) | (p >= n_text))
    gc = jnp.clip(g, 0, n_text - 1)
    pcl = jnp.clip(p, 0, n_text - 1)

    # ---- verify each candidate: packed-word LCP from col j ----
    lcp = jnp.full((P, nexec), -1, I32)
    spec_any = jnp.zeros(P, bool)
    for f in range(nexec):
        lcp_f, spec_f = _verify_lcp(gc[:, f], rw, jc, lens, pk_rows)
        lcp = lcp.at[:, f].set(lcp_f)
        spec_any = spec_any | (inc[:, f] & spec_f)

    lcpm = jnp.where(inc, lcp, -1)
    lstar = jnp.max(lcpm, axis=1)
    overflow_ev = act & ~defer & found & (cnt > C)
    punt_ev = act & ~defer & (
        unresolved
        | (found & (cnt > nexec) & (cnt <= C) & jnp.asarray(not light))
        | (found & (cnt <= nexec) & (bad_g.any(axis=1) | spec_any))
    )
    hit = act & ~defer & ~punt_ev & found & (cnt > 0) & (cnt <= nexec) \
        & (lstar >= k)
    nohit_adv = act & ~defer & ~punt_ev & (
        miss | overflow_ev
        | (found & (cnt <= nexec) & (lstar < k))
    )

    # ---- record hits (one-hot over the M MMP slots, Fs cand slots) ----
    q = pcl + 128  # fused text rows carry a front SEP block (ROW)
    base = (3 * (q >> 7) + 1) * 128 + (q & 127)
    txp_f = text_flat[base]
    pin_f = text_flat[base + 128] - jc[:, None]
    best = inc & (lcpm == lstar[:, None])                # (P, nexec)
    padF = Fs - nexec
    if padF:
        txp_f = jnp.pad(txp_f, ((0, 0), (0, padF)))
        pin_f = jnp.pad(pin_f, ((0, 0), (0, padF)))
        best = jnp.pad(best, ((0, 0), (0, padF)))
    onem = (hit[:, None]
            & (jnp.arange(M, dtype=I32)[None, :] == nm[:, None]))
    sel = onem[:, :, None] & best[:, None, :]            # (P, M, Fs)
    gtxp = jnp.where(sel, txp_f[:, None, :], gtxp)
    gpin = jnp.where(sel, pin_f[:, None, :], gpin)
    vld = jnp.where(onem[:, :, None], sel, vld)
    mlen = jnp.where(hit & (nm == 0), lstar, mlen)
    over = over | overflow_ev
    punt = punt | punt_ev

    if skip_jump:
        adv = lstar + 1
    else:
        adv = jnp.maximum(1, lstar - k + 1)
    i = jnp.where(hit, jc + adv, jnp.where(nohit_adv, jc + 1, i))
    nm = nm + jnp.where(hit, 1, 0)
    return (i, nm, mlen, over, punt, gtxp, gpin, vld)


def nip_scan_xla(
    aw,          # (P, WA) u32 ALIGNED 16-base lane words (A-substituted)
    lens,        # (P,) i32 lane lengths (0 = dead/already handled)
    has_n,       # (P,) bool — lane contains a non-ACGT code in [0, len)
    ht16,        # (S, 16) i32 bucket rows [k0 x4|k1 x4|lo x4|cnt x4]
    pk_rows,     # (Rw, 17) i32 OVERLAPPED [16 words | flag bits], stride 8
    sa_ov,       # (Rs, 24) i32 OVERLAPPED SA rows, stride 16
    text_flat,   # flat i32 view of the fused text rows (identity source)
    filt_flat,   # (Fw,) i32 flat k-mer Bloom words (single-word layout)
    *,
    k: int,
    C: int,            # cand_cap (overflow threshold)
    M: int,            # max MMPs
    F: int,            # max candidates verified per phase-B event (2..8)
    T: int,            # max probe events per lane
    L_read: int,       # static read-window width (positions 0..L_read-k)
    ht_bits: int,
    ht_probes: int,
    filt_bits: int,
    n_text: int,
    skip_jump: bool,
    T1: int = 2,       # phase-A (light) events before compaction
    P2_div: int = 2,   # phase-B prefix = P // P2_div
    sched_b: tuple = (),  # ((width_div, steps), ...) phase-B segments;
    # empty = one segment (P2_div, T - T1).  Each segment compacts the
    # still-active lanes to a P//width_div prefix (overflow punts,
    # semantics-free) and runs `steps` full events there.  Most lanes
    # finish in their first 1-2 full events, so narrowing the prefix
    # geometrically cuts the dominant phase-B gather volume several-fold.
):
    """Returns (handled, gtxp (P, M*F), gpin, vld, nm, mlen, over):
    `handled` lanes carry complete, exact scan results; others must go
    to the Pallas kernel.  NOTE the candidate-slot width is F (not C) —
    the scan never emits more than F candidates per MMP."""
    P = aw.shape[0]
    npos = L_read - k + 1
    fmask = I32((1 << filt_bits) - 1)
    shift_k1 = U32(2 * (32 - k))

    # ---- per-position keys + Bloom presence (one word per test) ----
    k0a = pos_words(aw, npos)
    k1a = pos_words(aw[:, 1:], npos) >> shift_k1
    h1a = _mix_u32(k0a, k1a)
    h2a = _mix2_u32(k0a, k1a)
    wid = h1a.astype(I32) & (fmask >> 5)
    v = filt_flat[wid]
    pres = (((v >> (h2a.astype(I32) & 31))
             & (v >> ((h2a >> U32(5)).astype(I32) & 31))) & 1) == 1
    posi = jnp.arange(npos, dtype=I32)[None, :]
    pres = pres & (posi + k <= lens[:, None])
    nxt = jax.lax.cummin(
        jnp.where(pres, posi, _BIG), axis=1, reverse=True
    )  # (P, npos): next present position >= i

    # read words at positions 0, 16, ..: enough whole words to cover
    # L_read bases (8 for <= 128bp; wider for long reads, matched by
    # wider pk verify rows)
    RW = (L_read + 15) >> 4
    rw = aw[:, 0:RW]  # (P, RW)

    Fs = F
    kw = dict(k=k, C=C, M=M, F=F, Fs=Fs, ht_bits=ht_bits,
              ht_probes=ht_probes, n_text=n_text, skip_jump=skip_jump,
              npos=npos)
    tables = (ht16, pk_rows, sa_ov, text_flat)

    def scan_phase(state, lane, steps, light):
        def body(st, _):
            return _event_step(st, lane, tables, light=light, **kw), None

        state, _ = jax.lax.scan(body, state, None, length=steps)
        return state

    state = (
        jnp.zeros(P, I32),                 # i
        jnp.zeros(P, I32),                 # nm
        jnp.zeros(P, I32),                 # mlen
        jnp.zeros(P, bool),                # over
        has_n & (lens > 0),                # punt
        jnp.zeros((P, M, Fs), I32),        # gtxp
        jnp.zeros((P, M, Fs), I32),        # gpin
        jnp.zeros((P, M, Fs), bool),       # vld
    )
    lane = (k0a, k1a, nxt, rw, lens)

    T1 = min(T1, T)
    state = scan_phase(state, lane, T1, light=True)

    def active_of(st, ln):
        i, nm, _, _, punt = st[:5]
        ic = jnp.clip(i, 0, npos - 1)
        jn = jnp.take_along_axis(ln[2], ic[:, None], axis=1)[:, 0]
        return (i + k <= ln[4]) & (nm < M) & ~punt & (jn < _BIG)

    if not sched_b:
        sched_b = ((P2_div, T - T1),)
    for div, steps in sched_b:
        if steps <= 0 or T <= T1:
            continue
        # ---- compact still-active lanes to a narrower prefix ----
        # all segments compact from the full P frame (state scatters
        # back after each segment); per-position keys are RECOMPUTED
        # from the gathered aligned words (VPU funnel shifts) instead
        # of gathering two (W, npos) matrices — ~7x fewer moved words
        act = active_of(state, lane)
        P2 = max(P // div, 8)
        # active lanes beyond the prefix punt (semantics-free: the
        # kernel recomputes them from scratch)
        rank = jnp.cumsum(act.astype(I32)) - 1
        spill = act & (rank >= P2)
        i, nm, mlen, over, punt, gtxp, gpin, vld = state
        punt = punt | spill
        act = act & ~spill
        order = jnp.argsort(~act, stable=True)
        idx = order[:P2]
        aw_s = aw[idx]
        k0s = pos_words(aw_s, npos)
        k1s = pos_words(aw_s[:, 1:], npos) >> shift_k1
        sub_state = (i[idx], nm[idx], mlen[idx], over[idx], punt[idx],
                     gtxp[idx], gpin[idx], vld[idx])
        sub_lane = (k0s, k1s, nxt[idx], aw_s[:, 0:RW], lens[idx])
        sub_state = scan_phase(sub_state, sub_lane, steps, light=False)
        si, snm, smlen, sover, spunt, sgtxp, sgpin, svld = sub_state
        i = i.at[idx].set(si)
        nm = nm.at[idx].set(snm)
        mlen = mlen.at[idx].set(smlen)
        over = over.at[idx].set(sover)
        punt = punt.at[idx].set(spunt)
        gtxp = gtxp.at[idx].set(sgtxp)
        gpin = gpin.at[idx].set(sgpin)
        vld = vld.at[idx].set(svld)
        state = (i, nm, mlen, over, punt, gtxp, gpin, vld)

    i, nm, mlen, over, punt, gtxp, gpin, vld = state
    # any lane still holding a future candidate event is unfinished
    punt = punt | active_of(state, lane)
    handled = (lens > 0) & ~punt

    return (handled, gtxp.reshape(P, M * Fs), gpin.reshape(P, M * Fs),
            vld.reshape(P, M * Fs), nm, mlen, over)
