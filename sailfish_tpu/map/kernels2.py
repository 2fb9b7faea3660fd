"""Round-compacted XLA quasi-mapping scan (kernel="xla2").

Same MMP semantics as map/kernels.py and the Pallas kernel (RapMap-
parity nip/jump advance, exact-k hash seeding, candidate cap +
overflow — the hit sets behind /root/reference/src/SailfishQuantify.cpp
:192-213), organized for the TPU's measured strengths instead of
per-lane sequencing:

  * element gathers run ~95M/s on a v5e and 131k-row sorts are ~free,
    while the Pallas kernel's per-lane scalar sequencing costs ~5us per
    active lane — so this formulation has NO per-lane control flow
  * the scan runs as a static schedule of ROUNDS over active-compacted
    lanes; each round hash-probes, expands candidates, computes
    packed-word LCPs (16 bases per u32), and advances by the nip/jump
    rule.  A filter-negative in the k-mer table's Bloom filter PROVES
    the k-mer absent, so a swept position behaves exactly like a
    probed miss (1 step, no hit, no overflow) — identical semantics,
    no table traffic
  * two sweep strategies: `sweep_win=0` precomputes presence for every
    (lane, position) up front (one Bloom gather each; "next present
    position >= p" via a reverse cummin); `sweep_win=N` (preferred)
    probes the lane's CURRENT position directly — a clean lane maps
    without touching the filter — and only the miss path gathers an
    N-position presence window.  Windowed mode also chains the hash
    probe: ONE bucket fetch per round with the probe cursor carried in
    lane state (the table's worst-case chain is ~8 buckets; ~95% of
    present keys resolve in their home bucket), and fetches candidate
    text/metadata through fused rows (ht_fused, pos_meta) and
    funnel-shifted contiguous aligned-word slices (txt_align)
  * between rounds active lanes COMPACT to the front (one stable sort)
    and the next round runs at a statically smaller width — most lanes
    finish in 1-3 probes (an error-free read maps in ONE), so late
    rounds cost ~nothing
  * candidate expansion is TIERED: seeds with cnt <= c_tier0 expand
    inline; wider seeds (cnt <= cand_cap) compact into a small static
    side-buffer expanded at full width.  A wide seed that does not fit
    the buffer is DEFERRED (its lane simply retries next round), never
    dropped — exactness does not depend on the buffer size
  * lanes that outlive the round schedule (error-dense reads, Bloom
    false-positive chains, N-runs over low-complexity text) finish in a
    bounded `lax.while_loop` TAIL at a small static width running the
    same round body — the loop exits as soon as no lane is active, so
    ordinary batches pay ~zero for the exactness guarantee

Differential tests pin this kernel bit-identical to map/kernels.py and
the numpy oracle (tests/test_xla2.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kernels import NEG, _clz32, _mix_u32


def _mix2_u32(k0, k1):
    """index/kmerhash.filter_hash2_u32 (bit positions for the
    single-word Bloom test) — must match bit-for-bit."""
    h = (k1 * jnp.uint32(0x27D4EB2F)) ^ (k0 * jnp.uint32(0x165667B1))
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(11))
    return h


def _round_widths(b2: int, n_rounds: int, floor: int):
    """Static compaction schedule: half width twice (wrong-orientation
    lanes die in the presence precompute, so ~half of B2 is the real
    initial active set), then halve down to the floor."""
    floor = max(16, min(floor, b2))
    w = min(b2, max(floor, b2 // 2))
    out = []
    for r in range(n_rounds):
        out.append(w)
        if r >= 1:
            w = max(floor, w // 2)
    return out


def _round_widths_window(b2: int, n_rounds: int, floor: int):
    """Probe-first schedule: clean lanes (the majority) finish in round
    one; error lanes sweep their mismatch regions for ~4-8 rounds, so
    width decays a half-step per TWO rounds instead of halving."""
    floor = max(16, min(floor, b2))
    out = [min(b2, max(floor, b2 // 2))]
    w = max(floor, b2 // 4)
    while len(out) < n_rounds:
        out.append(w)
        if len(out) < n_rounds:
            out.append(w)
        w = max(floor, w // 2)
    return out[:n_rounds]


@partial(
    jax.jit,
    static_argnames=("k", "cand_cap", "c_tier0", "max_mmps", "max_steps",
                     "ht_probes", "ht_bits", "skip_jump", "filt_bits",
                     "n_rounds", "floor_width", "wide_div", "tail_width",
                     "tail_iters", "sweep_win"),
)
def map_oriented_lanes_xla2(
    text,          # XLA index arrays + filt_words (uint32[m/32] Bloom)
    lanes,         # dict from make_oriented_lanes
    *,
    k: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_probes: int,
    ht_bits: int,
    skip_jump: bool = False,
    filt_bits: int,
    c_tier0: int = 4,
    n_rounds: int = 10,
    floor_width: int = 4096,
    wide_div: int = 16,
    tail_width: int = 4096,
    tail_iters: int = 0,
    sweep_win: int = 0,
):
    sa = text["sa"]
    pa = text.get("packed16")
    sep_dist = text.get("sep_dist")
    txp_of_pos = text.get("txp_of_pos")
    txp_offsets = text["txp_offsets"]
    filt_words = text["filt_words"]
    ht_key0, ht_key1 = text.get("ht_key0"), text.get("ht_key1")
    ht_lo, ht_cnt = text["ht_lo"], text.get("ht_cnt")
    ht_fused = text.get("ht_fused")     # (S, BUCKET*4) u32 or absent
    pos_meta = text.get("pos_meta")     # (N, 3) i32 [sep, txp, off] or absent
    txt_align = text.get("txt_align")   # (N//16 + pad,) u32 aligned words

    B2, L = lanes["codes"].shape
    C, M = cand_cap, max_mmps
    c0 = min(c_tier0, C)
    n_text = sa.shape[0]
    W16 = (L + 15) // 16
    w_start = k // 16       # hash-seeded candidates share the first k
    pw = lanes["pw_a"]                     # (B2, L) uint32
    lens = lanes["lens"].astype(jnp.int32)  # (B2,)
    bad_dist = lanes["bad_dist"]           # (B2, L) int32
    key1_shift = jnp.uint32(2 * (32 - k)) if k > 16 else jnp.uint32(0)
    hmask = jnp.int32((1 << ht_bits) - 1)
    # lane-aligned query words (qal_words[li, a] == pw[li, 16a]); the
    # zero padding equals the A-substituted past-end convention
    qal_words = jnp.pad(pw[:, ::16], ((0, 0), (0, W16 + 2)))
    if tail_iters <= 0:
        # window mode: a pathological lane can spend up to ht_probes
        # rounds per position on probe chains — bound the tail so the
        # conservative-overflow cap stays unreachable in practice
        tail_iters = (max_steps * (ht_probes + 2)
                      if sweep_win > 0 else 4 * max_steps)

    wmask = jnp.uint32((1 << filt_bits) // 32 - 1)

    def bloom_bit(k0, k1):
        """Single-word Bloom test: a negative PROVES the k-mer absent
        from the table, so sweeping a negative position == probing it
        and missing, for 1 step either way."""
        h1 = _mix_u32(k0, k1)
        h2 = _mix2_u32(k0, k1)
        fv = filt_words[(h1 & wmask).astype(jnp.int32)]
        return ((fv >> (h2 & jnp.uint32(31)))
                & (fv >> ((h2 >> jnp.uint32(5)) & jnp.uint32(31)))
                & jnp.uint32(1)) == 1

    if sweep_win <= 0:
        # ---- presence precompute: one Bloom gather per (lane, pos) ----
        pos_ar = jnp.arange(L, dtype=jnp.int32)[None, :]
        key0_all = pw                                           # pw[p]
        key1_all = jnp.roll(pw, -16, axis=1) >> key1_shift      # pw[p+16]
        bit = bloom_bit(key0_all, key1_all)
        present = bit & (pos_ar + k <= lens[:, None])
        # next present position >= p (sentinel L when none); one extra
        # column so st_i in [0, L] always indexes validly
        nxt = jnp.where(present, pos_ar, L)
        nxt_present = jax.lax.cummin(nxt, axis=1, reverse=True)
        nxt_present = jnp.concatenate(
            [nxt_present, jnp.full((B2, 1), L, jnp.int32)], axis=1
        )
    else:
        # ---- on-demand sweep: Bloom gathers only for the window of
        # positions each active lane actually faces this round.  Most
        # lanes probe 1-3 positions total, so fetching presence for all
        # L positions up front wastes ~an order of magnitude of gather
        # bandwidth; the window pays only for what the scan visits.
        nxt_present = None

    # ---- full-width per-lane scan state, scattered into by rounds ----
    st_i = jnp.zeros(B2, jnp.int32)
    st_steps = jnp.zeros(B2, jnp.int32)
    st_nm = jnp.zeros(B2, jnp.int32)
    st_over = jnp.zeros(B2, bool)
    st_mlen = jnp.zeros(B2, jnp.int32)
    st_h = jnp.full(B2, -1, jnp.int32)   # in-flight probe bucket (-1 idle)
    m_txp = jnp.zeros((B2, M, C), jnp.int32)
    m_pos = jnp.zeros((B2, M, C), jnp.int32)
    m_vld = jnp.zeros((B2, M, C), bool)
    order0 = jnp.arange(B2, dtype=jnp.int32)

    def active_of(st_i, st_steps, st_nm):
        """Lanes that will actually probe next round (sweep-aware)."""
        if nxt_present is None:
            # window mode can't see the next present position without
            # gathering; a lane stays active until it sweeps off the
            # read end or out of its step budget (same termination,
            # discovered a window at a time)
            return (
                (st_i + k <= lens)
                & (st_steps < max_steps)
                & (st_nm < M)
            )
        nx = nxt_present[order0, jnp.clip(st_i, 0, L)]
        return (
            (nx + k <= lens)
            & (st_steps + (nx - st_i) < max_steps)
            & (st_nm < M)
        )

    def compact_order(act):
        _, order = jax.lax.sort(
            ((~act).astype(jnp.int32), order0), dimension=0, num_keys=1,
            is_stable=True,
        )
        return order

    def probe_bucket(h, key0, key1):
        """Gather ONE bucket and test it: (anym, lo, cnt, has_empty)."""
        if ht_fused is not None:
            # one row gather carries the whole bucket:
            # [key0, key1, lo, cnt] x BUCKET entries
            fr = ht_fused[h].reshape(h.shape[0], -1, 4)
            cr = fr[:, :, 3].astype(jnp.int32)
            lor = fr[:, :, 2].astype(ht_lo.dtype)
            match = (
                (cr > 0)
                & (fr[:, :, 0] == key0[:, None])
                & (fr[:, :, 1] == key1[:, None])
            )
        else:
            cr = ht_cnt[h]                       # (Wn, BUCKET)
            lor = ht_lo[h]
            match = (
                (cr > 0)
                & (ht_key0[h] == key0[:, None])
                & (ht_key1[h] == key1[:, None])
            )
        anym = match.any(axis=1)
        j = jnp.argmax(match, axis=1)[:, None]
        lo = jnp.take_along_axis(lor, j, axis=1)[:, 0]
        cnt = jnp.take_along_axis(cr, j, axis=1)[:, 0]
        return anym, lo, cnt, (cr == 0).any(axis=1)

    def probe(key0, key1, live):
        """Bucketized open-addressing probe, identical to
        kernels.seed_hash: a probed empty entry or probe exhaustion
        proves no exact-k match."""
        h0 = (_mix_u32(key0, key1)
              & jnp.uint32(hmask)).astype(jnp.int32)
        Wn = key0.shape[0]

        def body(_, st):
            h, done, found, lo, cnt = st
            anym, blo, bcnt, has_empty = probe_bucket(h, key0, key1)
            hit = (~done) & anym
            lo = jnp.where(hit, blo, lo)
            cnt = jnp.where(hit, bcnt, cnt)
            found = found | hit
            done = done | anym | has_empty
            h = jnp.where(done, h, (h + 1) & hmask)
            return (h, done, found, lo, cnt)

        _, _, found, lo, cnt = jax.lax.fori_loop(
            0, ht_probes, body,
            (h0, ~live, jnp.zeros(Wn, bool),
             jnp.zeros(Wn, ht_lo.dtype), jnp.zeros(Wn, jnp.int32)),
        )
        found = found & live
        return found, lo, jnp.where(found, cnt, 0)

    def expand(li, q_i, lo, cnt, on, cwidth):
        """Candidate loci + LCPs for `cwidth` candidates per row.
        Returns (lstar, txp, posn, best) with lstar=-1 where ~on."""
        crange = jnp.arange(cwidth, dtype=jnp.int32)[None, :]
        cvalid = (crange < cnt[:, None]) & on[:, None]
        cidx = lo[:, None] + jnp.minimum(
            crange, jnp.maximum(cnt[:, None] - 1, 0)
        ).astype(lo.dtype)
        g = sa[jnp.clip(cidx, 0, n_text - 1)]
        # all depth words in two batched gathers (query + text); the
        # sequential "while previous words matched" chain becomes an
        # exclusive any-mismatch prefix along the depth axis
        depths = 16 * jnp.arange(w_start, W16, dtype=jnp.int32)
        if txt_align is not None:
            # query words via the same funnel trick: one contiguous
            # slice of the lane's aligned words + shift by q_i & 15
            Dq = W16 - w_start
            aq = (q_i >> 4) + w_start
            qwal = jax.vmap(
                lambda r, a: jax.lax.dynamic_slice(
                    qal_words[r], (a,), (Dq + 1,)
                )
            )(li, aq)                               # (Wn, D+1)
            shq = (2 * (q_i & 15)).astype(jnp.uint32)[:, None]
            qhi = qwal[:, :-1] << shq
            qlo = qwal[:, 1:] >> ((jnp.uint32(32) - shq) & jnp.uint32(31))
            qa = qhi | jnp.where(shq == 0, jnp.uint32(0), qlo)
        else:
            qa = pw[li[:, None],
                    jnp.clip(q_i[:, None] + depths[None, :], 0, L - 1)]
        if txt_align is not None:
            # all depth words share one shift (depths are multiples of
            # 16), so ONE contiguous slice of D+1 aligned words plus a
            # funnel shift reconstructs them — XLA sees slice_sizes=D+1
            # (one DMA descriptor per candidate) instead of D separate
            # strided gathers
            D = W16 - w_start
            a0 = (g >> 4) + w_start
            wal = jax.vmap(jax.vmap(
                lambda a: jax.lax.dynamic_slice(txt_align, (a,), (D + 1,))
            ))(a0)                                   # (Wn, cw, D+1)
            sh = (2 * (g & 15)).astype(jnp.uint32)[:, :, None]
            hi = wal[:, :, :-1] << sh
            lo = wal[:, :, 1:] >> ((jnp.uint32(32) - sh) & jnp.uint32(31))
            ta = hi | jnp.where(sh == 0, jnp.uint32(0), lo)
        else:
            ta = pa[g[:, :, None] + depths[None, None, :]]
        x = qa[:, None, :] ^ ta                      # (Wn, cw, D)
        add = jnp.where(x == 0, 16, _clz32(x) >> 1)
        bad = (x != 0).astype(jnp.int32)
        prev_bad = jnp.cumsum(bad, axis=-1) - bad    # exclusive prefix
        lcp = 16 * w_start + jnp.where(
            prev_bad == 0, add, 0
        ).sum(axis=-1, dtype=jnp.int32)
        if pos_meta is not None:
            pm = pos_meta[jnp.clip(g, 0, n_text - 1)]   # (Wn, cw, 3)
            lcp = jnp.minimum(lcp, pm[:, :, 0])
            txp = pm[:, :, 1]
            posn = (g - pm[:, :, 2]).astype(jnp.int32) - q_i[:, None]
        else:
            lcp = jnp.minimum(lcp, sep_dist[g].astype(jnp.int32))
            txp = txp_of_pos[jnp.clip(g, 0, n_text - 1)]
            posn = (g - txp_offsets[txp]).astype(jnp.int32) - q_i[:, None]
        lcp = jnp.minimum(lcp, bad_dist[li, jnp.clip(q_i, 0, L - 1)][:, None])
        lcp = jnp.where(cvalid, lcp, -1)
        lstar = jnp.max(lcp, axis=1)
        best = (lcp == lstar[:, None]) & cvalid
        return lstar, txp, posn, best

    def record(m_txp, m_pos, m_vld, li, slot, txp, posn, best, hit):
        """Scatter one MMP's candidates into (lane, slot); non-hit rows
        scatter out of range and drop.  Scatters at the tier's native
        candidate width — a (lane, slot) is written at most once per
        scan, so columns past cw keep their zero/False init."""
        gi = jnp.where(hit, li, B2)
        si = jnp.where(hit, slot, 0)
        cw = txp.shape[1]
        ci = jnp.arange(cw, dtype=jnp.int32)[None, :]
        m_txp = m_txp.at[gi[:, None], si[:, None], ci].set(
            txp, mode="drop")
        m_pos = m_pos.at[gi[:, None], si[:, None], ci].set(
            posn, mode="drop")
        m_vld = m_vld.at[gi[:, None], si[:, None], ci].set(
            best & hit[:, None], mode="drop")
        return m_txp, m_pos, m_vld

    def round_step(sel, state, wide_cap):
        """One probe round over lanes `sel` (active-compacted)."""
        (st_i, st_steps, st_nm, st_over, st_mlen, st_h,
         m_txp, m_pos, m_vld) = state
        Wr = sel.shape[0]
        i0 = st_i[sel]
        # sweep: absent positions each consume one step, exactly like
        # the sequential kernel's probe-and-miss at those positions
        if nxt_present is None:
            # probe-first: probe the lane's CURRENT position directly —
            # a clean lane maps without ever touching the Bloom filter.
            # The miss path (below) sweeps a window for the next
            # present position.
            i1 = i0
            steps_at = st_steps[sel]
            live = (
                (i1 + k <= lens[sel])
                & (steps_at < max_steps)
                & (st_nm[sel] < M)
            )
        else:
            i1 = nxt_present[sel, jnp.clip(i0, 0, L)]
            steps_at = st_steps[sel] + (i1 - i0)
            live = (
                (i1 + k <= lens[sel])
                & (steps_at < max_steps)
                & (st_nm[sel] < M)
            )
        key0 = pw[sel, jnp.clip(i1, 0, L - 1)]
        key1 = pw[sel, jnp.clip(i1 + 16, 0, L - 1)] >> key1_shift
        if nxt_present is None:
            # chained probe: ONE bucket per round.  ~95% of present
            # keys resolve in their home bucket; a displaced key
            # carries its probe cursor in st_h and finishes next
            # round, instead of every lookup paying ht_probes bucket
            # fetches.  An empty slot or probe exhaustion proves a
            # miss, identically to the fori_loop probe.
            home = (_mix_u32(key0, key1)
                    & jnp.uint32(hmask)).astype(jnp.int32)
            hcur = st_h[sel]
            h = jnp.where(hcur >= 0, hcur, home)
            anym, lo, cnt, has_empty = probe_bucket(h, key0, key1)
            attempts = (h - home) & hmask
            found = live & anym
            cnt = jnp.where(found, cnt, 0)
            exhausted = attempts + 1 >= ht_probes
            unresolved = live & ~anym & ~has_empty & ~exhausted
        else:
            found, lo, cnt = probe(key0, key1, live)
            unresolved = jnp.zeros(Wr, bool)
        over_step = found & (cnt > C)
        t0 = found & ~over_step & (cnt <= c0)
        tw = found & ~over_step & (cnt > c0)

        # tier 0: inline expansion at width c0
        lstar, txp, posn, best = expand(sel, i1, lo, cnt, t0, c0)
        lstar = jnp.where(t0, lstar, -1)

        # wide tier: compact into a small static buffer at full C;
        # seeds beyond the buffer DEFER (lane retries next round)
        rank = jnp.cumsum(tw.astype(jnp.int32)) - 1
        fit = tw & (rank < wide_cap)
        worder = jnp.argsort(~tw, stable=True).astype(jnp.int32)
        b = worder[:wide_cap]                      # rows within sel
        bon = jnp.arange(wide_cap, dtype=jnp.int32) < jnp.minimum(
            tw.sum(), wide_cap
        )
        bl, bq = sel[b], i1[b]
        wlstar, wtxp, wposn, wbest = expand(
            bl, bq, lo[b], jnp.where(bon, cnt[b], 0), bon, C
        )
        # scatter wide lstar back to rows (deferred rows stay -1)
        lstar = lstar.at[jnp.where(bon, b, Wr)].set(
            jnp.where(bon, wlstar, 0), mode="drop"
        )

        hit = (t0 | fit) & (lstar >= k)
        m_txp, m_pos, m_vld = record(
            m_txp, m_pos, m_vld, sel, st_nm[sel], txp, posn, best,
            t0 & hit,
        )
        whit = bon & (wlstar >= k) & fit[b]
        m_txp, m_pos, m_vld = record(
            m_txp, m_pos, m_vld, bl, st_nm[bl], wtxp, wposn, wbest, whit
        )

        first = hit & (st_nm[sel] == 0)
        st_mlen = st_mlen.at[jnp.where(first, sel, B2)].set(
            jnp.where(first, lstar, 0), mode="drop"
        )

        if skip_jump:
            hadv = lstar + 1
        else:
            hadv = jnp.maximum(1, lstar - k + 1)
        deferred = (tw & ~fit) | unresolved
        resolved = live & ~deferred
        adv = jnp.where(hit, hadv, 1)
        ni = jnp.where(resolved, i1 + adv, i1)
        nsteps = steps_at + resolved.astype(jnp.int32)
        if nxt_present is None:
            # miss path: the probe at i1 consumed one step; sweep a
            # Bloom window over i1+1.. for the next present position
            # (a filter-negative proves a miss, so each swept position
            # charges one step exactly like probing it).  No present
            # position in the window -> advance past it blind.
            S = sweep_win
            miss = live & ~found & ~unresolved
            jr = jnp.arange(S, dtype=jnp.int32)[None, :]
            pj = i1[:, None] + 1 + jr                       # (Wr, S)
            k0j = pw[sel[:, None], jnp.clip(pj, 0, L - 1)]
            k1j = pw[sel[:, None], jnp.clip(pj + 16, 0, L - 1)] \
                >> key1_shift
            candj = (
                bloom_bit(k0j, k1j)
                & (pj + k <= lens[sel][:, None])
                & (steps_at[:, None] + 1 + jr < max_steps)
            )
            has = candj.any(axis=1)
            jj = jnp.argmax(candj, axis=1).astype(jnp.int32)
            ni_miss = jnp.where(has, i1 + 1 + jj, i1 + 1 + S)
            ns_miss = steps_at + 1 + jnp.where(has, jj, S)
            ni = jnp.where(miss, ni_miss, ni)
            nsteps = jnp.where(miss, ns_miss, nsteps)
        st_i = st_i.at[sel].set(ni)
        st_steps = st_steps.at[sel].set(nsteps)
        st_nm = st_nm.at[sel].set(st_nm[sel] + hit.astype(jnp.int32))
        st_over = st_over.at[sel].set(st_over[sel] | over_step)
        if nxt_present is None:
            # carry the probe cursor: unresolved chains continue at
            # h+1; wide-deferred lanes re-land on their matched bucket
            # in one gather; everyone else goes idle
            nh = jnp.where(
                unresolved, (h + 1) & hmask,
                jnp.where(tw & ~fit, h, -1),
            )
            st_h = st_h.at[sel].set(nh)
        return (st_i, st_steps, st_nm, st_over, st_mlen, st_h,
                m_txp, m_pos, m_vld)

    # ---- static rounds, geometric compaction ----
    state = (st_i, st_steps, st_nm, st_over, st_mlen, st_h,
             m_txp, m_pos, m_vld)
    widths = (_round_widths_window(B2, n_rounds, floor_width)
              if sweep_win > 0
              else _round_widths(B2, n_rounds, floor_width))
    for Wr in widths:
        act = active_of(state[0], state[1], state[2])
        order = compact_order(act)
        wc = max(8, min(Wr, max(Wr // wide_div, 64)))
        state = round_step(order[:Wr], state, wc)

    # ---- exactness tail: same body in a while_loop, exits when no
    # lane is active (ordinary batches exit immediately) ----
    TW = max(16, min(tail_width, B2))
    WT = max(8, min(TW, max(TW // wide_div, 64)))

    def t_cond(carry):
        it, state = carry
        act = active_of(state[0], state[1], state[2])
        return (it < tail_iters) & jnp.any(act)

    def t_body(carry):
        it, state = carry
        act = active_of(state[0], state[1], state[2])
        order = compact_order(act)
        return (it + 1, round_step(order[:TW], state, WT))

    _, state = jax.lax.while_loop(t_cond, t_body, (jnp.int32(0), state))
    (st_i, st_steps, st_nm, st_over, st_mlen, st_h,
     m_txp, m_pos, m_vld) = state
    # only reachable through the tail_iters safety cap: conservative
    st_over = st_over | active_of(st_i, st_steps, st_nm)

    # ---- intersection + dedupe + sort (identical to kernels.py) ----
    hvalid = m_vld[:, 0, :]
    htxp = m_txp[:, 0, :]
    hpos = m_pos[:, 0, :]
    for m in range(1, M):
        has_m = st_nm > m
        match = (
            (htxp[:, :, None] == m_txp[:, m, None, :])
            & (hpos[:, :, None] == m_pos[:, m, None, :])
            & m_vld[:, m, None, :]
        ).any(axis=2)
        hvalid = hvalid & jnp.where(has_m[:, None], match, True)

    key_t = jnp.where(hvalid, htxp, NEG)
    ord1 = jnp.argsort(hpos, axis=1, stable=True)
    t1 = jnp.take_along_axis(key_t, ord1, axis=1)
    ord2 = jnp.argsort(t1, axis=1, stable=True)
    order = jnp.take_along_axis(ord1, ord2, axis=1)
    s_txp = jnp.take_along_axis(htxp, order, axis=1)
    s_pos = jnp.take_along_axis(hpos, order, axis=1)
    s_vld = jnp.take_along_axis(hvalid, order, axis=1)
    first = jnp.ones_like(s_vld)
    first = first.at[:, 1:].set(
        ~((s_txp[:, 1:] == s_txp[:, :-1]) & s_vld[:, :-1])
    )
    s_vld = s_vld & first

    return {
        "txp": s_txp,
        "pos": s_pos,
        "valid": s_vld,
        "mlen": st_mlen,
        "overflow": st_over,
        "num_mapped_loci": s_vld.sum(axis=1),
    }
