"""Long-read mapping fast path (reads 129..256 bases), pure XLA.

The Pallas scan kernel is a 128bp design (WINR tiles, VMEM window
scratch); before round 5 a batch wider than 128 silently and
permanently swapped to the plain XLA kernel — measured ~11x slower —
which made 150bp PE (the dominant modern Illumina configuration) fall
off a performance cliff.  The reference has no such cliff: RapMap
handles arbitrary read lengths (/root/reference/src/
SailfishQuantify.cpp:105-452).

This path reuses the production pack-domain pipeline — lane build,
16-mer Bloom screen, clean-lane fast path, two-phase xscan — all of
which are width-generic XLA (the verify windows just need the wider
pk_rows built by prepare_pallas_text(pk_words=24)), and replaces the
residual Pallas kernel with the exact XLA scan kernel
(map/kernels.py) over a compacted residual prefix:

  * the XLA kernel needs no Mosaic window tiles, so it works at any
    read length; at the residual's size (~0.5% of lanes) its per-step
    full-width gathers are affordable
  * residual lanes beyond the prefix — and lanes the exact-shrink
    schedule spills — are marked OVERFLOW, which the wide-capacity
    escalation pass remaps from scratch (bit-exact), so every bound
    here is semantics-free

Output contract: identical to map_oriented_lanes /
map_oriented_lanes_pallas (same dict, same hit sets) — pinned by the
differential tests in tests/test_xlong.py.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encode import lanes_from_oriented
from .kernels import map_oriented_lanes
from .pallas_kernel import (
    WINR,
    _build_lanes,
    _env_bool,
    _fastpath_clean,
    _intersect_sort,
    _knob,
    _screen16,
)
from .xscan import nip_scan_xla

XWINR = 256  # max read length of this path (pk_words=24 verify rows)


def map_oriented_lanes_xlong(
    text_pallas: dict,   # wide-pk pallas text (prepare_pallas_text)
    text_xla: dict,      # XLA-kernel index arrays (pipeline .text)
    codes: jnp.ndarray,  # (B, L) u8 reads (None when packed)
    lens: jnp.ndarray,
    *,
    k: int,
    prefix_bases: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    skip_jump: bool = False,
    uniform_len: int | None = None,
    n_text: int | None = None,
    w16_bits: int | None = None,
    filtxl_bits: int | None = None,
    packed: tuple | None = None,
    tuning=None,
):
    """Dispatcher: resolves tuning knobs, routes to the jitted body.
    Mirrors map_oriented_lanes_pallas's interface."""
    L = codes.shape[1] if codes is not None else None
    if w16_bits is None:
        w16_bits = text_pallas.get("w16_bits", 0)
    if not _knob(tuning, "SF_LANE_SCREEN", "lane_screen", True, _env_bool):
        w16_bits = 0
    use_packed = (
        packed is not None
        and uniform_len is not None
        and _knob(tuning, "SF_PACKED_LANES", "packed_lanes", True,
                  _env_bool)
    )
    pw_h2d, nm_h2d = packed if use_packed else (None, None)
    xscan_t = _knob(tuning, "SF_XSCAN_T", "xscan_t", 7, int)
    xscan_f = min(_knob(tuning, "SF_XSCAN_F", "xscan_f", 4, int),
                  8, cand_cap)
    xscan_t1 = _knob(tuning, "SF_XSCAN_T1", "xscan_t1", 2, int)
    xscan_p2 = _knob(tuning, "SF_XSCAN_P2", "xscan_p2", 2, int)
    xscan_b = tuple(
        tuple(int(x) for x in seg.split(":"))
        for seg in _knob(tuning, "SF_XSCAN_B", "xscan_schedule",
                         "2:1,4:1,8:3", str).split(",")
        if seg
    )
    # residual prefix rows and shrink divisor (perf knobs; spills are
    # exact via overflow -> escalation)
    pk_rows_n = int(os.environ.get("SF_XLONG_PK", "512"))
    shrink = int(os.environ.get("SF_XLONG_SHRINK", "1"))
    return _map_lanes_xlong_jit(
        (None if use_packed else codes), lens, pw_h2d, nm_h2d,
        text_pallas["text_rows"], text_pallas["ht16"],
        text_pallas["pk_rows"], text_pallas["sa_ov"],
        text_pallas["filtxl_rows"],
        (text_pallas.get("w16_rows") if w16_bits else None),
        text_xla,
        k=k, prefix_bases=prefix_bases, cand_cap=cand_cap,
        max_mmps=max_mmps, max_steps=max_steps,
        ht_bits=ht_bits, ht_probes=ht_probes, skip_jump=skip_jump,
        uniform_len=uniform_len,
        n_text=(n_text if n_text is not None
                else text_pallas["n_text"]),
        w16_bits=w16_bits,
        filtxl_bits=(filtxl_bits if filtxl_bits is not None
                     else text_pallas.get("filtxl_bits", 0)),
        xscan_t=xscan_t, xscan_f=xscan_f, xscan_t1=xscan_t1,
        xscan_p2=xscan_p2, xscan_b=xscan_b,
        L_pad=L if L is not None else None,
        pk_resid=pk_rows_n, shrink=shrink,
    )


@partial(
    jax.jit,
    static_argnames=("k", "prefix_bases", "cand_cap", "max_mmps",
                     "max_steps", "ht_bits", "ht_probes", "skip_jump",
                     "uniform_len", "n_text", "w16_bits", "filtxl_bits",
                     "xscan_t", "xscan_f", "xscan_t1", "xscan_p2",
                     "xscan_b", "L_pad", "pk_resid", "shrink"),
)
def _map_lanes_xlong_jit(
    codes, lens, pw_h2d, nm_h2d,
    text_rows, ht16, pk_rows, sa_ov, filtxl_rows, w16_rows,
    text_xla,
    *,
    k: int,
    prefix_bases: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    ht_bits: int,
    ht_probes: int,
    skip_jump: bool,
    uniform_len: int | None,
    n_text: int,
    w16_bits: int,
    filtxl_bits: int,
    xscan_t: int,
    xscan_f: int,
    xscan_t1: int,
    xscan_p2: int,
    xscan_b: tuple,
    L_pad: int | None,
    pk_resid: int,
    shrink: int,
):
    if codes is None:
        B, L = lens.shape[0], L_pad
    else:
        B, L = codes.shape
    if L > XWINR:
        raise ValueError(f"xlong path supports reads up to {XWINR} bases")
    B2 = 2 * B
    C, M = cand_cap, max_mmps

    aw, nmask, has_n, olens, oc, WA, NB = _build_lanes(
        codes, pw_h2d, nm_h2d, lens, uniform_len, L)
    klens = _screen16(aw, olens, w16_rows, w16_bits, L=L, k=k)

    f_clean, f_txp, f_pos = _fastpath_clean(
        aw, has_n, klens, ht16, pk_rows, text_rows.reshape(-1),
        k=k, ht_bits=ht_bits, ht_probes=ht_probes, n_text=n_text,
    )
    klens = jnp.where(f_clean, 0, klens)

    # ---- first compaction: xscan over the live half ----
    # long-read batches keep the same live profile as 100bp ones
    # (screen kills most wrong-orientation lanes, the fast path most
    # clean lanes); a half-width prefix is generous, and spills are
    # exact (overflow -> escalation)
    order = jnp.argsort((klens == 0).astype(jnp.int32), stable=True)
    P = max(B2 // 2, 8)
    # ONE fused row gather instead of three (per-ROW gather floor)
    fused_c = jnp.concatenate([
        jax.lax.bitcast_convert_type(aw, jnp.int32),
        klens[:, None],
        has_n[:, None].astype(jnp.int32),
    ], axis=1)[order]
    WAx = aw.shape[1]
    kl_c = fused_c[:, WAx]
    aw_p = jax.lax.bitcast_convert_type(fused_c[:P, :WAx], jnp.uint32)
    hn_p = fused_c[:P, WAx + 1] != 0
    oP = order[:P]

    handled, xs_txp, xs_pin, xs_vld, xs_nm, xs_mlen, xs_over = (
        nip_scan_xla(
            aw_p, kl_c[:P], hn_p,
            ht16, pk_rows, sa_ov, text_rows.reshape(-1),
            filtxl_rows.reshape(-1),
            k=k, C=C, M=M, F=xscan_f, T=xscan_t,
            L_read=L, ht_bits=ht_bits,
            ht_probes=ht_probes, filt_bits=filtxl_bits,
            n_text=n_text, skip_jump=skip_jump,
            T1=xscan_t1, P2_div=xscan_p2, sched_b=xscan_b,
        )
    )
    kl_k = kl_c.at[:P].set(jnp.where(handled, 0, kl_c[:P]))

    # ---- second compaction: exact-XLA residual ----
    PK = min(max(pk_resid, 64), B2)
    livek = kl_k > 0
    order2 = jnp.argsort(~livek, stable=True)
    idx2 = order2[:PK]
    of2 = order[idx2]                 # frame-0 indices of residual rows
    aw_k = aw[of2]
    nm_k = nmask[of2]
    kl_kc = kl_k[idx2]

    # unpack residual lane codes (elementwise funnel shifts, no gathers)
    awr = jnp.repeat(aw_k, 16, axis=1)                    # (PK, NB)
    shr = jnp.asarray(
        (2 * (15 - (np.arange(NB) & 15))).astype(np.uint32))[None, :]
    cds = ((awr >> shr) & jnp.uint32(3)).astype(jnp.uint8)
    nmr = jnp.repeat(nm_k, 32, axis=1)
    shn = jnp.asarray((np.arange(NB) % 32).astype(np.uint32))[None, :]
    nbit = (nmr >> shn) & jnp.uint32(1)
    codes_k = jnp.where(nbit == 1, jnp.uint8(4), cds)[:, :L]

    lanes_pk = lanes_from_oriented(codes_k, kl_kc, prefix_bases)
    khits = map_oriented_lanes(
        text_xla, lanes_pk,
        k=k, prefix_bases=prefix_bases, cand_cap=C, max_mmps=M,
        max_steps=max_steps, use_hash=True, ht_probes=ht_probes,
        ht_bits=ht_bits, skip_jump=skip_jump,
        scan_shrink=shrink, shrink_exact=True,
    )
    lm2 = (kl_kc > 0)
    kt = jnp.where(lm2[:, None], khits["txp"], 0)
    kp = jnp.where(lm2[:, None], khits["pos"], 0)
    kv = jnp.where(lm2[:, None], khits["valid"], False)
    k_mlen = jnp.where(lm2, khits["mlen"], 0)
    k_over = jnp.where(lm2, khits["overflow"], False)

    # ---- postpass + frame-0 scatters (mirrors the pallas assembly) ----
    xt, xp, xv = _intersect_sort(
        xs_txp, xs_pin, xs_vld, xs_nm, C=xscan_f, M=M)

    Fx = min(xscan_f, C)
    mlen0 = jnp.zeros(B2, jnp.int32)
    over0 = jnp.zeros(B2, bool)
    nml0 = jnp.zeros(B2, jnp.int32)

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
    nml0 = nml0.at[oP].set(xv.sum(axis=1).astype(jnp.int32))

    # residual rows (dead prefix rows redirect out of range)
    oK = jnp.where(kl_kc > 0, of2, B2)
    txp0 = txp0.at[oK].set(kt)
    pos0 = pos0.at[oK].set(kp)
    vld0 = vld0.at[oK].set(kv)
    mlen0 = mlen0.at[oK].set(k_mlen.astype(jnp.int32))
    over0 = over0.at[oK].set(k_over)
    nml0 = nml0.at[oK].set(kv.sum(axis=1).astype(jnp.int32))

    # live residual beyond PK never reached the exact kernel (this
    # covers both xscan punts and live lanes beyond the xscan prefix —
    # the residual compaction collects every still-live lane): such
    # lanes must not emit partial hits — mark overflow so the
    # escalation pass remaps them from scratch
    rank1 = jnp.cumsum(livek.astype(jnp.int32)) - 1
    spillK = livek & (rank1 >= PK)
    oS = jnp.where(spillK, order, B2)
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

    # splice fast-resolved lanes (single hit in slot 0)
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
        f_clean, 1, out["num_mapped_loci"])
    return out
