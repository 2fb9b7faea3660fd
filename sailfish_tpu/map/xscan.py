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

Gather economy (round 4 — everything here is gather-bound, measured
~13M rows/s on v5e regardless of row width up to 32):
  * lanes arrive as ALIGNED 16-base words (P, WA) — per-position keys
    are derived by funnel shifts (VPU), not carried as (P, 256) arrays
  * hash probes fetch BUCKET-PAIR rows: ht16 reshaped (S/2, 32) gives
    buckets {2r, 2r+1} per row, so a 4-deep probe chain costs 2 row
    gathers instead of 4; chains that walk outside the fetched pair
    window PUNT (rare: chains >= 3 starting at an odd bucket)
  * the packed-text verify reads OVERLAPPED pk_rows (stride 8, 16
    words + 16 flags per row): any 9-word window lives in ONE row
  * SA slices read OVERLAPPED sa_ov rows (stride 16, width 24): any
    (lo & 15) + F <= 24 window lives in ONE row

Two-phase schedule: most lanes that reach this scan finish in 1-3
probe events (one MMP to the error, a Bloom-guided jump past it, one
MMP to the read end), so iterating the full lane prefix T times wastes
most of the work.  Phase A runs T1 events at full width P; the still-
active lanes are then compacted to a P//4 prefix and phase B runs the
remaining T-T1 events there.  Both phases are lax.scan loops (ONE
traced body each instead of T unrolled copies — the unrolled form
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
  * probes resolve within the fetched bucket-pair window — an
    unresolved chain PUNTS (includes ht_probes > 4, wrap-around, and
    odd-start chains needing the 4th bucket)
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
    import numpy as np

    P, WA = aw.shape
    nw = (npos + 15) >> 4
    lo = jnp.repeat(aw[:, :nw], 16, axis=1)[:, :npos]
    hi = jnp.repeat(aw[:, 1 : nw + 1], 16, axis=1)[:, :npos]
    sh = jnp.asarray(
        (2 * (np.arange(npos) & 15)).astype(np.uint32))[None, :]
    return jnp.where(sh == 0, lo, (lo << sh) | (hi >> (U32(32) - sh)))


def probe_pairrows(ht32, h1, k0i, k1i, *, ht_bits: int, ht_probes: int):
    """Full probe-chain resolution from TWO bucket-pair row gathers.

    ht32 is the (S, 16) bucket table viewed as (S//2, 32): row r holds
    buckets {2r, 2r+1}.  Rows h1>>1 and h1>>1 + 1 cover chain offsets
    0..3 for even h1 and 0..2 for odd h1.  Chains that continue past
    the covered window (or wrap past the table end) return unresolved
    — the caller punts those lanes, which is always semantics-free.

    Returns (found, lo, cnt, miss, unresolved)."""
    P = h1.shape[0]
    S2 = ht32.shape[0]
    S = 2 * S2
    p0 = jnp.clip(h1 >> 1, 0, S2 - 1)
    rowA = ht32[p0]
    rowB = ht32[jnp.clip(p0 + 1, 0, S2 - 1)]
    odd = (h1 & 1) == 1

    def bucket16(row16):
        m = ((row16[:, 12:16] > 0)
             & (row16[:, 0:4] == k0i[:, None])
             & (row16[:, 4:8] == k1i[:, None]))
        found = m.any(axis=1)
        lo = jnp.where(m, row16[:, 8:12], 0).sum(axis=1)
        cnt = jnp.where(m, row16[:, 12:16], 0).sum(axis=1)
        empty = (row16[:, 12:16] == 0).any(axis=1)
        return found, lo, cnt, empty

    # chain offset a -> bucket slice: even h1 = [A0, A1, B0, B1],
    # odd h1 = [A1, B0, B1, <unfetched>]
    evn = (rowA[:, :16], rowA[:, 16:], rowB[:, :16], rowB[:, 16:])
    odds = (rowA[:, 16:], rowB[:, :16], rowB[:, 16:], None)
    nprobe = min(ht_probes, 4)
    found = jnp.zeros(P, bool)
    stopped = jnp.zeros(P, bool)
    unres = jnp.zeros(P, bool)
    lo = jnp.zeros(P, I32)
    cnt = jnp.zeros(P, I32)
    for a in range(nprobe):
        if odds[a] is None:
            row16 = evn[a]
            avail = ~odd
        else:
            row16 = jnp.where(odd[:, None], odds[a], evn[a])
            avail = jnp.ones(P, bool)
        avail = avail & (h1 + a < S)
        fa, loa, ca, ea = bucket16(row16)
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
        unres = unres | (~found & ~stopped & ~unres)
    return found, lo, cnt, miss, unres


def _event_step(state, lane, tables, *, k, C, M, F, ht_bits, ht_probes,
                n_text, skip_jump, npos):
    """One probe event for every lane: Bloom-guided advance to the next
    present position, hash probe, candidate fetch + packed-word LCP
    verify, hit recording, NIP/JUMP advance.  All state is stacked
    arrays so the caller can run this under lax.scan."""
    i, nm, mlen, over, punt, gtxp, gpin, vld = state
    k0a, k1a, nxt, rw, lens = lane
    ht32, pk_rows, sa_ov, text_flat = tables
    P = i.shape[0]
    Rw = pk_rows.shape[0]
    Rs = sa_ov.shape[0]
    fcols = jnp.arange(F, dtype=I32)[None, :]
    wi9 = jnp.arange(9, dtype=I32)[None, :]

    act0 = (i + k <= lens) & (nm < M) & ~punt
    ic = jnp.clip(i, 0, npos - 1)
    j = jnp.take_along_axis(nxt, ic[:, None], axis=1)[:, 0]
    # no remaining present position -> the kernel would ffwd to the
    # read end and stop: mark done by parking i past the end
    no_more = act0 & (j >= _BIG)
    i = jnp.where(no_more, lens, i)
    act = act0 & ~no_more
    jc = jnp.where(act, j, 0)

    # ---- probe (bucket-pair rows; unresolved chains punt) ----
    k0 = jnp.take_along_axis(k0a, jc[:, None], axis=1)[:, 0]
    k1 = jnp.take_along_axis(k1a, jc[:, None], axis=1)[:, 0]
    hmask = I32((1 << ht_bits) - 1)
    h1 = _mix_u32(k0, k1).astype(I32) & hmask
    k0i = jax.lax.bitcast_convert_type(k0, I32)
    k1i = jax.lax.bitcast_convert_type(k1, I32)
    found, lo, cnt, miss, unresolved = probe_pairrows(
        ht32, h1, k0i, k1i, ht_bits=ht_bits, ht_probes=ht_probes)

    # ---- candidate positions ----
    single = found & (cnt == 1)
    multi = found & (cnt > 1) & (cnt <= F)
    srow = jnp.clip(jnp.where(multi, lo, 0) >> 4, 0, Rs - 1)
    sa24 = sa_ov[srow]                              # (P, 24)
    pf = _select_w(sa24, jnp.where(multi, lo & 15, 0), F)
    p = jnp.where(single[:, None],
                  jnp.broadcast_to(lo[:, None], (P, F)), pf)
    ncand = jnp.where(found, jnp.minimum(cnt, F), 0)
    inc = fcols < ncand[:, None]                 # (P, F) real cands
    g = p - jc[:, None]
    bad_g = inc & ((g < 0) | (p >= n_text))
    gc = jnp.clip(g, 0, n_text - 1)
    pcl = jnp.clip(p, 0, n_text - 1)

    # ---- verify each candidate: packed-word LCP from col j ----
    lcp = jnp.full((P, F), -1, I32)
    spec_any = jnp.zeros(P, bool)
    nword = (lens + 15) >> 4
    jword = jc >> 4
    for f in range(F):
        gf = gc[:, f]
        w0 = gf >> 4
        # overlapped pk rows: row r holds words 8r..8r+15 (+ flags),
        # so the 9-word window at offset w0 & 7 sits in ONE row
        ra = pk_rows[jnp.clip(w0 >> 3, 0, Rw - 1)]   # (P, 32)
        W9 = jax.lax.bitcast_convert_type(
            _select_w(ra[:, :16], w0 & 7, 9), U32)
        S9 = _select_w(ra[:, 16:], w0 & 7, 9)
        o = gf & 15
        sh = (o * 2).astype(U32)[:, None]
        aw = jnp.where(
            (o == 0)[:, None],
            W9[:, 0:8],
            (W9[:, 0:8] << sh) | (W9[:, 1:9] >> (U32(32) - sh)),
        )
        x = aw ^ rw
        # ignore compare columns < j: zero the leading (j - 16*wi)
        # bases of each word (earliest base sits in the MSBs)
        wi8 = jnp.arange(8, dtype=I32)[None, :]
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
        lcp = lcp.at[:, f].set(lcp_f)
        # the compared window words [j>>4, nword] must be special-free
        # for the A-substituted compare to equal the true-code compare
        spec_f = ((S9 != 0) & (wi9 >= jword[:, None])
                  & (wi9 <= nword[:, None])).any(axis=1)
        spec_any = spec_any | (inc[:, f] & spec_f)

    lcpm = jnp.where(inc, lcp, -1)
    lstar = jnp.max(lcpm, axis=1)
    overflow_ev = act & found & (cnt > C)
    punt_ev = act & (
        unresolved
        | (found & (cnt > F) & (cnt <= C))
        | (found & (cnt <= F) & (bad_g.any(axis=1) | spec_any))
    )
    hit = act & ~punt_ev & found & (cnt > 0) & (cnt <= F) \
        & (lstar >= k)
    nohit_adv = act & ~punt_ev & (
        miss | overflow_ev
        | (found & (cnt <= F) & (lstar < k))
    )

    # ---- record hits (one-hot over the M MMP slots) ----
    q = pcl + 128  # fused text rows carry a front SEP block (ROW)
    base = (3 * (q >> 7) + 1) * 128 + (q & 127)
    txp_f = text_flat[base]
    pin_f = text_flat[base + 128] - jc[:, None]
    best = inc & (lcpm == lstar[:, None])                # (P, F)
    padC = C - F
    if padC:
        txp_f = jnp.pad(txp_f, ((0, 0), (0, padC)))
        pin_f = jnp.pad(pin_f, ((0, 0), (0, padC)))
        best = jnp.pad(best, ((0, 0), (0, padC)))
    onem = (hit[:, None]
            & (jnp.arange(M, dtype=I32)[None, :] == nm[:, None]))
    sel = onem[:, :, None] & best[:, None, :]            # (P, M, C)
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
    pk_rows,     # (Rw, 32) i32 OVERLAPPED [16 words | 16 flags], stride 8
    sa_ov,       # (Rs, 24) i32 OVERLAPPED SA rows, stride 16
    text_flat,   # flat i32 view of the fused text rows (identity source)
    filt_flat,   # (Fw,) i32 flat k-mer Bloom words (single-word layout)
    *,
    k: int,
    C: int,            # cand_cap (overflow threshold)
    M: int,            # max MMPs
    F: int,            # max candidates verified per event (2..8)
    T: int,            # max probe events per lane
    L_read: int,       # static read-window width (positions 0..L_read-k)
    ht_bits: int,
    ht_probes: int,
    filt_bits: int,
    n_text: int,
    skip_jump: bool,
    T1: int = 2,       # phase-A events at full width before compaction
):
    """Returns (handled, gtxp (P, M*C), gpin, vld, nm, mlen, over):
    `handled` lanes carry complete, exact scan results; others must go
    to the Pallas kernel."""
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

    rw = aw[:, 0:8]  # (P, 8) read words at positions 0, 16, .., 112

    ht32 = ht16.reshape(-1, 32)
    kw = dict(k=k, C=C, M=M, F=F, ht_bits=ht_bits, ht_probes=ht_probes,
              n_text=n_text, skip_jump=skip_jump, npos=npos)
    tables = (ht32, pk_rows, sa_ov, text_flat)

    def scan_phase(state, lane, steps):
        def body(st, _):
            return _event_step(st, lane, tables, **kw), None

        state, _ = jax.lax.scan(body, state, None, length=steps)
        return state

    state = (
        jnp.zeros(P, I32),                 # i
        jnp.zeros(P, I32),                 # nm
        jnp.zeros(P, I32),                 # mlen
        jnp.zeros(P, bool),                # over
        has_n & (lens > 0),                # punt
        jnp.zeros((P, M, C), I32),         # gtxp
        jnp.zeros((P, M, C), I32),         # gpin
        jnp.zeros((P, M, C), bool),        # vld
    )
    lane = (k0a, k1a, nxt, rw, lens)

    T1 = min(T1, T)
    state = scan_phase(state, lane, T1)

    def active_of(st, ln):
        i, nm, _, _, punt = st[:5]
        ic = jnp.clip(i, 0, npos - 1)
        jn = jnp.take_along_axis(ln[2], ic[:, None], axis=1)[:, 0]
        return (i + k <= ln[4]) & (nm < M) & ~punt & (jn < _BIG)

    if T > T1:
        # ---- compact still-active lanes to a quarter-width prefix ----
        act = active_of(state, lane)
        P2 = max(P // 4, 8)
        # active lanes beyond the prefix punt (semantics-free: the
        # kernel recomputes them from scratch)
        rank = jnp.cumsum(act.astype(I32)) - 1
        spill = act & (rank >= P2)
        i, nm, mlen, over, punt, gtxp, gpin, vld = state
        punt = punt | spill
        act = act & ~spill
        order = jnp.argsort(~act, stable=True)
        idx = order[:P2]
        sub_state = (i[idx], nm[idx], mlen[idx], over[idx], punt[idx],
                     gtxp[idx], gpin[idx], vld[idx])
        sub_lane = (k0a[idx], k1a[idx], nxt[idx], rw[idx], lens[idx])
        sub_state = scan_phase(sub_state, sub_lane, T - T1)
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

    return (handled, gtxp.reshape(P, M * C), gpin.reshape(P, M * C),
            vld.reshape(P, M * C), nm, mlen, over)
