"""Batched quasi-mapping kernels (JAX, static shapes, masked lanes).

The algorithm matches the documented semantics of refimpl/mapper.py with
two static capacities (candidates per MMP, MMPs per lane); lanes whose
intervals stay above the candidate cap are flagged `overflow` and treated
as unmapped (the analog in spirit of the reference's --maxReadOcc
discard, src/SailfishQuantify.cpp:217).

Per oriented lane (= read or its reverse complement), a fixed number of
MMP-scan steps runs:

  1. seed lookup at the current position — either an exact-k-mer hash
     probe (index/kmerhash.py; expected O(1), bucket-row gathers, exact
     static probe bound) or, for indexes without a table, a P-base
     prefix-table lookup plus packed-word binary-search refinement
  2. candidate LCPs against the A-substituted packed words, then capped
     by the index's SEP distance and the lane's next-non-ACGT distance —
     so matches can never cross a transcript boundary, an N, or the read
     end (one u32 gather per 16 bases per candidate + one u8 gather)
  3. hit if max LCP >= k; advance past the mismatch (skip_jump) or by
     the RapMap-style overlap rule

With `scan_shrink > 1`, steps after the first run on a COMPACTED lane
subset: still-active lanes sort to the front and the step executes at
1/shrink^step width (lane state rows gather/scatter — contiguous row
moves, cheap).  Active lanes beyond the shrunken width (possible only on
adversarial batches; bounds are per-batch) are dropped as overflow.
This trades a documented capacity for a ~steps/2 reduction in gather
work, which is the kernel's bottleneck (~100M random gathers/s on a
v5e via XLA).

After the scan, a static intersection pass keeps first-MMP loci
consistent with all later MMPs, dedupes per transcript (keeping the
smallest position), and sorts hits by transcript id.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = jnp.int32(2**31 - 1)  # sentinel txp id for invalid hit slots


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of uint32 (x=0 -> 32), exact integer ops."""
    s = x
    s = s | (s >> jnp.uint32(1))
    s = s | (s >> jnp.uint32(2))
    s = s | (s >> jnp.uint32(4))
    s = s | (s >> jnp.uint32(8))
    s = s | (s >> jnp.uint32(16))
    return (32 - jax.lax.population_count(s).astype(jnp.int32)).astype(jnp.int32)


def _mix_u32(k0: jnp.ndarray, k1: jnp.ndarray) -> jnp.ndarray:
    """Must match index/kmerhash.py mix_hash_u32 exactly."""
    h = (k0 * jnp.uint32(0x9E3779B1)) ^ (k1 * jnp.uint32(0x85EBCA77))
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> jnp.uint32(13))
    return h


def _search_bound(sa, packed, val, lo, hi, depth, upper: bool, iters: int):
    """Vectorized binary search over SA[lo:hi) ordered by
    packed[sa[m]+depth]; returns first m with key >= val (or > val)."""
    n = sa.shape[0]

    def body(_, state):
        l, h = state
        cont = l < h
        mid = (l + h) >> 1
        g = sa[jnp.clip(mid, 0, n - 1)] + depth
        key = packed[g]
        pred = (key <= val) if upper else (key < val)
        l = jnp.where(cont & pred, mid + 1, l)
        h = jnp.where(cont & (~pred), mid, h)
        return (l, h)

    l, h = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return l


@partial(
    jax.jit,
    static_argnames=("k", "prefix_bases", "cand_cap", "max_mmps", "max_steps",
                     "bs_iters", "use_hash", "ht_probes", "ht_bits",
                     "skip_jump", "scan_shrink", "axis_name"),
)
def map_oriented_lanes(
    text,          # dict of device index arrays (see pipeline.prep)
    lanes,         # dict from make_oriented_lanes
    *,
    k: int,
    prefix_bases: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    bs_iters: int = 26,
    use_hash: bool = False,
    ht_probes: int = 0,
    ht_bits: int = 0,
    skip_jump: bool = True,
    scan_shrink: int = 1,
    shrink_exact: bool = False,
    axis_name: str | None = None,
):
    """When `axis_name` is set, the call runs under shard_map with the
    INDEX sharded across that mesh axis (each device holds a sub-index
    over a contiguous transcript range; see parallel/shardidx.py) and
    the scan steps stay in lockstep via per-step collectives: the MMP
    length is the max LCP over ALL shards (pmax), the interval size for
    the --maxReadOcc overflow rule is the global candidate count (psum),
    and every shard advances its scan position identically — so the
    union of per-shard hits equals the single-index hit set exactly.
    This is the >HBM long-context path (SURVEY §5): a transcriptome too
    big for one chip's HBM maps at full speed with the index striped
    over the mesh and only three (B2,)-vector collectives per scan step
    riding ICI."""
    sa = text["sa"]                  # int32[N]
    pa = text["packed16"]            # uint32[N + pad]
    sep_dist = text["sep_dist"]      # uint8[N + pad]
    table_lo = text["table_lo"]      # int32[4^P + 1]
    txp_of_pos = text["txp_of_pos"]  # int32[N]
    txp_offsets = text["txp_offsets"]  # int32[T]
    txp_base = text.get("txp_base")  # scalar: shard's first global txp id

    B2, L = lanes["codes"].shape
    C, M = cand_cap, max_mmps
    n_text = sa.shape[0]
    W16 = (L + 15) // 16  # number of 16-base words to compare for LCP
    key1_shift = jnp.uint32(2 * (32 - k)) if k > 16 else jnp.uint32(0)

    # per-lane arrays the scan steps read (rows gather with the lanes
    # during compaction)
    laneset_full = {
        "lens": lanes["lens"],
        "pw_a": lanes["pw_a"],
        "qpref": lanes["qpref"],
        "valid16": lanes["valid16"],
        "validP": lanes["validP"],
        "bad_dist": lanes["bad_dist"],
    }

    def take1(arr2d, i):
        """arr2d (H, L) gathered at per-lane position i (H,) -> (H,)"""
        return jnp.take_along_axis(
            arr2d, jnp.clip(i, 0, L - 1)[:, None], axis=1
        )[:, 0]

    def seed_hash(ls, i, active):
        """Exact-k interval via bucketized hash probe (k >= 17)."""
        H = i.shape[0]
        key0 = take1(ls["pw_a"], i)
        key1 = take1(ls["pw_a"], i + 16) >> key1_shift
        mask = jnp.int32((1 << ht_bits) - 1)
        h0 = (_mix_u32(key0, key1) & mask.astype(jnp.uint32)).astype(jnp.int32)
        ht_key0, ht_key1 = text["ht_key0"], text["ht_key1"]
        ht_lo, ht_cnt = text["ht_lo"], text["ht_cnt"]

        def body(_, st):
            h, done, found, lo, cnt = st
            cr = ht_cnt[h]                      # (H, BUCKET)
            k0r = ht_key0[h]
            k1r = ht_key1[h]
            match = (cr > 0) & (k0r == key0[:, None]) & (k1r == key1[:, None])
            anym = match.any(axis=1)
            j = jnp.argmax(match, axis=1)[:, None]
            hit = (~done) & anym
            lo = jnp.where(
                hit, jnp.take_along_axis(ht_lo[h], j, axis=1)[:, 0], lo
            )
            cnt = jnp.where(
                hit, jnp.take_along_axis(cr, j, axis=1)[:, 0], cnt
            )
            has_empty = (cr == 0).any(axis=1)
            found = found | hit
            done = done | anym | has_empty
            h = jnp.where(done, h, (h + 1) & mask)
            return (h, done, found, lo, cnt)

        _, done, found, lo, cnt = jax.lax.fori_loop(
            0, ht_probes, body,
            (h0, jnp.zeros(H, bool), jnp.zeros(H, bool),
             jnp.zeros(H, ht_lo.dtype), jnp.zeros(H, jnp.int32)),
        )
        found = found & active
        # a miss (empty entry in a probed bucket, or probe exhaustion)
        # proves no exact-k match
        return lo, jnp.where(found, cnt, 0), found

    def seed_prefix(ls, i, pvalid):
        """Prefix-table seed + packed-word refinement (fallback path)."""
        v = take1(ls["qpref"], i)
        v_safe = jnp.where(pvalid, v, 0)
        lo = table_lo[v_safe]
        hi = jnp.where(pvalid, table_lo[v_safe + 1], lo)

        # An EMPTY refinement at depth covering >= k bases proves the
        # position has no k-mer hit (max LCP < 16*(w+1) <= k) — a plain
        # miss, not an overflow.  Sharded: the refinement trigger and
        # the emptiness proof both use the GLOBAL interval size (the
        # single-index kernel refines when the whole-text interval is
        # too big; a shard's slice of it may be small or empty).
        def gsum(x):
            if axis_name is None:
                return x
            return jax.lax.psum(x, axis_name)

        proven_miss = jnp.zeros_like(pvalid)
        for w in (0, 1):
            depth = 16 * w
            need = (
                (gsum(hi - lo) > C)
                & (i + depth + 16 <= ls["lens"])
                & take1(ls["valid16"], i + depth)
                & ~proven_miss
            )
            qa = take1(ls["pw_a"], i + depth)
            nlo = _search_bound(sa, pa, qa, lo, hi, depth, upper=False,
                                iters=bs_iters)
            nhi = _search_bound(sa, pa, qa, lo, hi, depth, upper=True,
                                iters=bs_iters)
            # globally-empty refinement: proves a miss when the depth
            # covers >= k bases, otherwise the coarse interval stands
            # (the global-overflow case, exactly as single-index)
            gempty = gsum(nhi - nlo) <= 0
            if k >= 16 * (w + 1):
                proven_miss = proven_miss | (need & gempty)
            # globally non-empty: every shard adopts its slice of the
            # refined interval — which may be empty for THIS shard
            # (single-index semantics: the refined interval replaces
            # the coarse one; a shard with no matching suffix holds an
            # empty slice, not its stale coarse interval)
            adopt = need & ~gempty
            lo = jnp.where(adopt, jnp.minimum(nlo, nhi), lo)
            hi = jnp.where(adopt, nhi, hi)
        csize = jnp.where(proven_miss, 0, hi - lo)
        return lo, csize, pvalid & ~proven_miss

    def scan_step(ls, state):
        i, nm, overflow, mlen, m_txp, m_pos, m_vld = state
        H = i.shape[0]
        lens = ls["lens"]
        active = (i + k <= lens) & (nm < M)

        if use_hash:
            lo, csize, may_hit = seed_hash(ls, i, active)
        else:
            pvalid = take1(ls["validP"], i) & active
            lo, csize, may_hit = seed_prefix(ls, i, pvalid)

        if axis_name is not None:
            # sharded index: the overflow rule and the hit decision use
            # GLOBAL quantities so every shard's scan stays in lockstep
            g_csize = jax.lax.psum(csize, axis_name)
            g_may_hit = jax.lax.psum(may_hit.astype(jnp.int32),
                                     axis_name) > 0
        else:
            g_csize, g_may_hit = csize, may_hit
        step_overflow = g_may_hit & (g_csize > C)
        cnt = jnp.minimum(csize, C)

        # --- candidate LCPs ---
        # masked candidate slots clamp to the last valid one so their
        # gathers dedupe to an already-fetched address
        crange = jnp.arange(C, dtype=jnp.int32)[None, :]
        cvalid = crange < cnt[:, None]
        cidx = lo[:, None] + jnp.minimum(
            crange, jnp.maximum(cnt[:, None] - 1, 0)
        ).astype(lo.dtype)
        g = sa[jnp.clip(cidx, 0, n_text - 1)]  # (H, C), sa dtype

        # hash-seeded candidates share the first k bases (A-substituted),
        # so the first floor(k/16) whole words need no comparison
        w_start = (k // 16) if use_hash else 0
        lcp = jnp.full((H, C), 16 * w_start, dtype=jnp.int32)
        matched = jnp.ones((H, C), dtype=bool)
        for w in range(w_start, W16):
            depth = 16 * w
            qa = take1(ls["pw_a"], i + depth)[:, None]
            ta = pa[g + depth]
            x = qa ^ ta
            add = jnp.where(x == 0, 16, _clz32(x) >> 1)
            lcp = lcp + jnp.where(matched, add, 0)
            matched = matched & (x == 0)
        # cap: transcript boundary (text) and N/read-end (query)
        lcp = jnp.minimum(lcp, sep_dist[g].astype(jnp.int32))
        lcp = jnp.minimum(lcp, take1(ls["bad_dist"], i)[:, None])
        lcp = jnp.where(cvalid, lcp, -1)

        lstar = jnp.max(lcp, axis=1)
        if axis_name is not None:
            lstar = jax.lax.pmax(lstar, axis_name)
        hit = g_may_hit & (lstar >= k) & (~step_overflow)

        # implied loci for hit candidates; in-transcript positions
        # always fit int32 even when global positions are int64
        txp = txp_of_pos[jnp.clip(g, 0, n_text - 1)]
        pos = (g - txp_offsets[txp]).astype(jnp.int32) - i[:, None]
        if txp_base is not None:
            # sharded index: local transcript ids -> global
            txp = txp + txp_base
        best = (lcp == lstar[:, None]) & cvalid & hit[:, None]

        # record the MMP into slot nm
        slot = (
            jnp.arange(M, dtype=jnp.int32)[None, :] == nm[:, None]
        ) & hit[:, None]  # (H, M), all False when no hit
        sel = slot[:, :, None]  # (H, M, 1)
        m_txp = jnp.where(sel, txp[:, None, :], m_txp)
        m_pos = jnp.where(sel, pos[:, None, :], m_pos)
        m_vld = jnp.where(sel, best[:, None, :], m_vld)
        mlen = jnp.where(hit & (nm == 0), lstar, mlen)

        overflow = overflow | step_overflow
        nm = nm + hit.astype(jnp.int32)
        if skip_jump:
            adv = jnp.where(hit, lstar + 1, 1)
        else:
            adv = jnp.where(hit, jnp.maximum(1, lstar - k + 1), 1)
        i = i + jnp.where(active, adv, 0)
        return (i, nm, overflow, mlen, m_txp, m_pos, m_vld)

    state = (
        jnp.zeros(B2, jnp.int32),                       # i
        jnp.zeros(B2, jnp.int32),                       # num mmps
        jnp.zeros(B2, bool),                            # overflow
        jnp.zeros(B2, jnp.int32),                       # mlen (first MMP l*)
        jnp.zeros((B2, M, C), jnp.int32),               # mmp txp
        jnp.zeros((B2, M, C), jnp.int32),               # mmp pos
        jnp.zeros((B2, M, C), bool),                    # mmp cand valid
    )
    # NOTE: a while_loop with an any(active) early exit was tried here
    # and made XLA compilation pathological (minutes instead of ~1s);
    # unrolled steps with static widths compile fast.
    lens_full = laneset_full["lens"]
    if scan_shrink <= 1:
        state, _ = jax.lax.scan(
            lambda st, _: (scan_step(laneset_full, st), None),
            state, None, length=max_steps,
        )
    else:
        state = scan_step(laneset_full, state)
        width = B2
        for _ in range(1, max_steps):
            width = max(64, width // scan_shrink)
            i, nm, overflow, mlen, m_txp, m_pos, m_vld = state
            active = (i + k <= lens_full) & (nm < M)
            # slot priority: lanes that already found an MMP (likely to
            # find the next) > miss-scanning lanes > done lanes
            prio = jnp.where(active, jnp.where(nm > 0, 0, 1), 2)
            order = jnp.argsort(prio, stable=True).astype(jnp.int32)
            sel = order[:width]
            spill = order[width:]
            if shrink_exact:
                # exact variant (xlong residual path): a still-active
                # lane that does not fit the narrowed width is marked
                # OVERFLOW (its partial MMPs are dropped by the caller's
                # overflow handling and the escalation pass remaps it
                # from scratch) instead of silently keeping a truncated
                # hit set
                sact = active[spill]
                overflow = overflow.at[spill].set(
                    overflow[spill] | sact)
                m_vld = m_vld.at[spill].set(
                    jnp.where(sact[:, None, None], False, m_vld[spill]))
            # active lanes that did not fit STOP scanning — without
            # shrink_exact they keep the MMPs already recorded
            # (equivalent to a per-lane adaptive step budget; mostly
            # affects miss-scanning lanes that would find nothing)
            i = i.at[spill].set(L)
            sub_ls = {kk: v[sel] for kk, v in laneset_full.items()}
            sub_state = (
                i[sel], nm[sel], overflow[sel], mlen[sel],
                m_txp[sel], m_pos[sel], m_vld[sel],
            )
            si, snm, sov, sml, st_, sp_, sv_ = scan_step(sub_ls, sub_state)
            state = (
                i.at[sel].set(si),
                nm.at[sel].set(snm),
                overflow.at[sel].set(sov),
                mlen.at[sel].set(sml),
                m_txp.at[sel].set(st_),
                m_pos.at[sel].set(sp_),
                m_vld.at[sel].set(sv_),
            )
    i, nm, overflow, mlen, m_txp, m_pos, m_vld = state

    # --- position-consistent intersection: base = MMP slot 0 ---
    hvalid = m_vld[:, 0, :]
    htxp = m_txp[:, 0, :]
    hpos = m_pos[:, 0, :]
    for m in range(1, M):
        has_m = nm > m  # slot m exists
        match = (
            (htxp[:, :, None] == m_txp[:, m, None, :])
            & (hpos[:, :, None] == m_pos[:, m, None, :])
            & m_vld[:, m, None, :]
        ).any(axis=2)
        hvalid = hvalid & jnp.where(has_m[:, None], match, True)

    # --- dedupe per transcript (keep smallest pos), sort by txp ---
    key_t = jnp.where(hvalid, htxp, NEG)
    # stable two-pass lexicographic argsort: pos minor, txp major
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
        "txp": s_txp,          # (B2, C) sorted by txp among valid
        "pos": s_pos,
        "valid": s_vld,
        "mlen": mlen,          # (B2,)
        "overflow": overflow,  # (B2,)
        "num_mapped_loci": s_vld.sum(axis=1),
    }
