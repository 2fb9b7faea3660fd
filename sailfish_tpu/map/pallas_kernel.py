"""Pallas TPU kernel for the MMP-scan inner loop.

The XLA formulation of the scan (map/kernels.py) pays for masked lanes
and masked candidates because every step is a full-width gather; this
kernel gives each lane real dynamic control flow:

  * per lane, a scalar while-loop runs only the steps that lane needs
    (jump-skip: ~#errors + 1)
  * the seed probe DMAs one interleaved 64-byte bucket row per probe
  * candidate verification DMAs each candidate's text window (contiguous
    bytes) with per-candidate semaphores — the DMAs overlap — then one
    vectorized compare computes all LCPs at once, against TRUE codes
    (transcript separators and N terminate matches naturally; no packed
    words or distance caps needed in-kernel)

Interface: mmp_scan_pallas returns per-lane MMP slots (candidate global
positions + validity + query positions); the shared XLA post-pass
(intersection/dedupe/sort) then produces the same hit arrays as
map_oriented_lanes.  Selected via QuantOpts.kernel = "pallas"; validated
against the XLA kernel and the numpy oracle in interpret mode on CPU.

Constraints: reads <= WINR (128) bases; k >= 17 (hash table required);
jump skip rule only.

Hardware status (round 1): validated bit-exact against the XLA kernel
and the numpy oracle in interpret mode; Mosaic compilation of the DMA
loop is still blocked on tile-alignment rules for small arbitrary-offset
HBM slices (bucket rows / SA slices / text windows all want unaligned
DMA).  The known remedies — align-down + SMEM scalar reads for the
table/SA, and per-candidate dynamic roll (tpu.rotate) or 128-aligned
double-row fetches for text windows — are round-2 work; see
docs/ROADMAP.md.  The XLA kernel remains the production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINR = 128         # compare window bytes (max read length)
CODES_W = 256      # lane codes block width (>= WINR + max read length)
LB = 8             # lanes per kernel instance


def _lsr32(x, n: int):
    """Logical right shift of an int32 scalar (mask off sign extension)."""
    return (x >> jnp.int32(n)) & jnp.int32((1 << (32 - n)) - 1)


def _mix_i32(k0, k1):
    """index/kmerhash.mix_hash_u32 in two's-complement int32 (wrapping
    multiply/xor are bit-identical; shifts need explicit masking).
    Mosaic has no unsigned scalars and no 1-D bitcast."""
    m0 = jnp.int32(np.int32(np.uint32(0x9E3779B1)))
    m1 = jnp.int32(np.int32(np.uint32(0x85EBCA77)))
    m2 = jnp.int32(np.int32(np.uint32(0xC2B2AE3D)))
    h = (k0 * m0) ^ (k1 * m1)
    h = h ^ _lsr32(h, 15)
    h = h * m2
    h = h ^ _lsr32(h, 13)
    return h


def interleave_kmer_table(ht) -> np.ndarray:
    """(S, BUCKET) arrays -> (S, 16) u32 rows [k0 x4 | k1 x4 | lo x4 |
    cnt x4] so one probe is a single 64-byte DMA."""
    return np.concatenate(
        [
            ht["ht_key0"].view(np.int32),
            ht["ht_key1"].view(np.int32),
            ht["ht_lo"].astype(np.int32),
            ht["ht_cnt"].astype(np.int32),
        ],
        axis=1,
    )


def _scan_kernel(
    codes_ref,   # (LB, CODES_W) u8 VMEM — oriented lane codes, SEP padded
    pw_ref,      # (LB, CODES_W) i32 SMEM — packed 16-base words (A-sub,
                 # bitcast to i32; SMEM allows arbitrary scalar indexing)
    lens_ref,    # (LB, 1) i32 VMEM
    text_ref,    # (CODES_W + N + CODES_W,) u8 HBM — SEP-padded both ends
    sa_ref,      # (N + C,) i32 HBM — SA padded with sentinels
    ht_ref,      # (S, 16) i32 HBM (keys bit-reinterpreted)
    gpos_ref,    # (LB, M*C) i32 VMEM out
    vld_ref,     # (LB, M*C) i32 VMEM out
    qpos_ref,    # (LB, M) i32 VMEM out
    meta_ref,    # (LB, 4) i32 VMEM out: [nm, overflow, mlen, steps]
    bucket_s,    # (1, 16) u32 scratch
    sas_s,       # (1, C) i32 scratch
    win_s,       # (C, WINR) u8 scratch
    sem_b, sem_sa, sem_w,
    *,
    k: int,
    C: int,
    M: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    n_text: int,
):
    hmask = jnp.int32((1 << ht_bits) - 1)

    for lane in range(LB):
        ln = lens_ref[lane, 0]

        def probe(i):
            """Hash lookup of the k-mer at read position i -> (lo, cnt);
            cnt = 0 on miss.  Keys come from the precomputed packed-word
            rows (32-bit scalar extracts are the one dynamic VMEM access
            Mosaic allows)."""
            key0 = pw_ref[lane, i]
            key1 = _lsr32(pw_ref[lane, i + 16], 2 * (32 - k))
            h0 = _mix_i32(key0, key1) & hmask

            def pcond(st):
                _, done, _, _, att = st
                return (~done) & (att < ht_probes)

            def pbody(st):
                h, done, lo, cnt, att = st
                cp = pltpu.make_async_copy(ht_ref.at[h], bucket_s.at[0], sem_b)
                cp.start()
                cp.wait()
                found = jnp.asarray(False)
                flo = jnp.int32(0)
                fcnt = jnp.int32(0)
                has_empty = jnp.asarray(False)
                for e in range(4):
                    ek0 = bucket_s[0, e]
                    ek1 = bucket_s[0, 4 + e]
                    elo = bucket_s[0, 8 + e]
                    ecnt = bucket_s[0, 12 + e]
                    hit_e = (ecnt > 0) & (ek0 == key0) & (ek1 == key1)
                    flo = jnp.where(hit_e & ~found, elo, flo)
                    fcnt = jnp.where(hit_e & ~found, ecnt, fcnt)
                    found = found | hit_e
                    has_empty = has_empty | (ecnt == 0)
                lo = jnp.where(found, flo, lo)
                cnt = jnp.where(found, fcnt, cnt)
                done = found | has_empty
                h = jnp.where(done, h, (h + 1) & hmask)
                return (h, done, lo, cnt, att + 1)

            st = (h0, jnp.asarray(False), jnp.int32(0), jnp.int32(0),
                  jnp.int32(0))
            st = jax.lax.while_loop(pcond, pbody, st)
            return st[2], st[3]

        def step_body(state):
            i, nm, ovf = state
            lo, cnt = probe(i)
            over = cnt > C
            ccnt = jnp.minimum(cnt, C)

            @pl.when(ccnt > 0)
            def _():
                # candidate SA slice (contiguous; array is sentinel-padded)
                cp = pltpu.make_async_copy(
                    sa_ref.at[pl.ds(lo, C)], sas_s.at[0], sem_sa
                )
                cp.start()
                cp.wait()
                # overlap all candidate window DMAs.  Windows align to
                # the READ START (text is SEP padded CODES_W on both
                # ends, so g - i + CODES_W is always in bounds) — the
                # read side then needs only STATIC slices, which is what
                # Mosaic requires of vector VMEM accesses.
                for c in range(C):
                    @pl.when(c < ccnt)
                    def _():
                        g = jnp.clip(sas_s[0, c], 0, n_text - 1)
                        pltpu.make_async_copy(
                            text_ref.at[pl.ds(g - i + CODES_W, CODES_W)],
                            win_s.at[c],
                            sem_w.at[c],
                        ).start()
                for c in range(C):
                    @pl.when(c < ccnt)
                    def _():
                        g = jnp.clip(sas_s[0, c], 0, n_text - 1)
                        pltpu.make_async_copy(
                            text_ref.at[pl.ds(g - i + CODES_W, CODES_W)],
                            win_s.at[c],
                            sem_w.at[c],
                        ).wait()

            # one vectorized LCP over all candidates (true codes):
            # first mismatch at column >= i, relative to i.  (The read's
            # SEP padding at its length mismatches any text base, so the
            # read end terminates matches automatically.)
            readwin = jnp.broadcast_to(
                codes_ref[lane : lane + 1, :], (C, CODES_W)
            )  # explicit broadcast — implicit i1 relayouts trip Mosaic
            neq = (win_s[...].astype(jnp.int32)
                   - readwin.astype(jnp.int32)) != 0
            col = jax.lax.broadcasted_iota(jnp.int32, (C, CODES_W), 1)
            colm = jnp.where(neq & (col >= i), col, jnp.int32(CODES_W))
            first_mm = jnp.min(colm, axis=1, keepdims=True)     # (C, 1)
            crange = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            lcp2 = jnp.where(
                crange < ccnt,
                jnp.minimum(first_mm, ln) - i,
                jnp.int32(-1),
            )                                                    # (C, 1)
            lstar = jnp.max(lcp2)
            lcp = lcp2[:, 0]

            hit = (lstar >= k) & (~over) & (cnt > 0)

            @pl.when(hit)
            def _():
                best = (lcp == lstar) & (crange[:, 0] < ccnt)
                # static store offsets per MMP slot (Mosaic rejects
                # dynamic-offset vector stores)
                for m in range(M):
                    @pl.when(nm == m)
                    def _():
                        gpos_ref[lane : lane + 1, m * C : (m + 1) * C] = (
                            jnp.clip(sas_s[0:1, :], 0, n_text - 1)
                        )
                        vld_ref[lane : lane + 1, m * C : (m + 1) * C] = (
                            best.astype(jnp.int32)[None, :]
                        )
                qpos_ref[lane, nm] = i
                meta_ref[lane, 2] = jnp.where(nm == 0, lstar, meta_ref[lane, 2])

            meta_ref[lane, 1] = jnp.maximum(
                meta_ref[lane, 1], jnp.where(over, 1, 0)
            )
            adv = jnp.where(hit, lstar + 1, 1)
            return (i + adv, nm + jnp.where(hit, 1, 0), ovf | over)

        def step_cond(state):
            i, nm, _ = state
            return (i + k <= ln) & (nm < M)

        # init outputs for this lane (meta/qpos live in SMEM -> scalar
        # stores; gpos/vld are VMEM rows -> 2-D stores)
        for j in range(4):
            meta_ref[lane, j] = jnp.int32(0)
        for j in range(M):
            qpos_ref[lane, j] = jnp.int32(0)
        vld_ref[lane : lane + 1, :] = jnp.zeros(
            (1, vld_ref.shape[1]), jnp.int32
        )
        gpos_ref[lane : lane + 1, :] = jnp.zeros(
            (1, gpos_ref.shape[1]), jnp.int32
        )

        # bounded dynamic loop: (steps, state)
        def ocond(st):
            s, inner = st
            return (s < max_steps) & step_cond(inner)

        def obody(st):
            s, inner = st
            return (s + 1, step_body(inner))

        _, final = jax.lax.while_loop(
            ocond, obody,
            (jnp.int32(0), (jnp.int32(0), jnp.int32(0), jnp.asarray(False))),
        )
        meta_ref[lane, 0] = final[1]
        meta_ref[lane, 1] = jnp.maximum(
            meta_ref[lane, 1], jnp.where(final[2], 1, 0)
        )


@partial(
    jax.jit,
    static_argnames=("k", "cand_cap", "max_mmps", "max_steps", "ht_bits",
                     "ht_probes", "interpret"),
)
def mmp_scan_pallas(
    codes_pad,   # (B2, CODES_W) u8 SEP-padded oriented lane codes
    pw_pad,      # (B2, CODES_W) u32 packed 16-base words of codes_pad
    lens,        # (B2,) i32
    text_pad,    # (CODES_W + N + CODES_W,) u8 SEP-padded both ends
    sa_pad,      # (N + cand_cap,) i32 sentinel-padded SA
    ht_rows,     # (S, 16) i32 (keys bit-reinterpreted)
    *,
    k: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    interpret: bool = False,
):
    B2 = codes_pad.shape[0]
    C, M = cand_cap, max_mmps
    n_text = sa_pad.shape[0] - C
    grid = (B2 // LB,)
    assert text_pad.shape[0] == n_text + 2 * CODES_W

    kern = partial(
        _scan_kernel,
        k=k, C=C, M=M, max_steps=max_steps,
        ht_bits=ht_bits, ht_probes=ht_probes, n_text=n_text,
    )
    gpos, vld, qpos, meta = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LB, CODES_W), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, CODES_W), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LB, 1), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((LB, M * C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, M * C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, M), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LB, 4), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B2, M * C), jnp.int32),
            jax.ShapeDtypeStruct((B2, M * C), jnp.int32),
            jax.ShapeDtypeStruct((B2, M), jnp.int32),
            jax.ShapeDtypeStruct((B2, 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 16), jnp.int32),
            pltpu.VMEM((1, cand_cap), jnp.int32),
            pltpu.VMEM((cand_cap, CODES_W), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((cand_cap,)),
        ],
        interpret=interpret,
    )(codes_pad, pw_pad, lens.reshape(-1, 1), text_pad, sa_pad, ht_rows)
    return gpos, vld, qpos, meta


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
    interpret: bool = False,
):
    """Full per-lane mapping via the Pallas scan + XLA post-pass.

    Returns the same dict as kernels.map_oriented_lanes.
    """
    from .kernels import NEG

    B, L = codes.shape
    if L > WINR:
        raise ValueError(f"pallas path supports reads up to {WINR} bases")

    # oriented lanes, SEP padded to CODES_W
    comp = jnp.array([3, 2, 1, 0, 4], dtype=jnp.uint8)
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lens.astype(jnp.int32)[:, None] - 1 - j
    rc = jnp.take_along_axis(codes, jnp.clip(src, 0, L - 1), axis=1)
    rc = jnp.where(src >= 0, comp[rc], jnp.uint8(4))
    oc = jnp.concatenate([codes, rc], axis=0)
    B2 = 2 * B
    pad = jnp.full((B2, CODES_W - L), 4, jnp.uint8)
    codes_pad = jnp.concatenate([oc, pad], axis=1)
    olens = jnp.concatenate([lens, lens]).astype(jnp.int32)
    from .encode import _pack_words

    pw_pad = jax.lax.bitcast_convert_type(
        _pack_words(codes_pad, sub=0), jnp.int32
    )

    gpos, vld, qpos, meta = mmp_scan_pallas(
        codes_pad, pw_pad, olens,
        text_pallas["text_pad"], text_pallas["sa_pad"],
        text_pallas["ht_rows"],
        k=k, cand_cap=cand_cap, max_mmps=max_mmps, max_steps=max_steps,
        ht_bits=ht_bits, ht_probes=ht_probes, interpret=interpret,
    )
    C, M = cand_cap, max_mmps
    gpos = gpos.reshape(B2, M, C)
    m_vld = vld.reshape(B2, M, C).astype(bool)
    nm = meta[:, 0]
    overflow = meta[:, 1].astype(bool)
    mlen = meta[:, 2]

    # implied loci (XLA): txp via position map, pos = g - offset - qpos
    txp_of_pos = text_pallas["txp_of_pos"]
    txp_offsets = text_pallas["txp_offsets"]
    m_txp = txp_of_pos[gpos]
    m_pos = gpos - txp_offsets[m_txp] - qpos[:, :, None]

    # intersection + dedupe + sort: identical to kernels.map_oriented_lanes
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
        "mlen": mlen,
        "overflow": overflow,
        "num_mapped_loci": s_vld.sum(axis=1),
    }


def prepare_pallas_text(index, cand_cap: int) -> dict:
    """Device arrays for the Pallas path (SEP-padded text bytes,
    sentinel-padded SA, interleaved bucket rows)."""
    if index.kmer_ht is None:
        raise ValueError("pallas mapping path requires a k-mer table (k >= 17)")
    n = index.text_len
    text_pad = np.full(n + 2 * CODES_W, 4, dtype=np.uint8)
    text_pad[CODES_W : CODES_W + n] = index.codes
    sa_pad = np.full(n + cand_cap, n - 1, dtype=np.int32)
    sa_pad[:n] = index.sa
    return {
        "text_pad": jnp.asarray(text_pad),
        "sa_pad": jnp.asarray(sa_pad),
        "ht_rows": jnp.asarray(interleave_kmer_table(index.kmer_ht)),
        "txp_of_pos": jnp.asarray(index.txp_of_pos, jnp.int32),
        "txp_offsets": jnp.asarray(index.txp_offsets, jnp.int32),
    }
