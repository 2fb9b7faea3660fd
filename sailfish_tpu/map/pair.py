"""Orientation merge, paired-end merge, library-compat filtering and
equivalence-class label formation — the batched analog of the per-read
tail of processReadsQuasi (reference src/SailfishQuantify.cpp:215-434)
and of rapmap's mergeLeftRightHitsFuzzy.

All functions operate on the per-lane hit arrays produced by
map_oriented_lanes and keep static shapes: per fragment the joint-hit
slots are (4*C,) wide in BLOCK order (left fw/rc then right fw/rc) —
only the final label compaction sorts, producing labels in (transcript,
left-before-right) order exactly like the reference's merged jointHits.
Consumers needing reference hit order (seq-bias first-hit sampling)
reconstruct it with an explicit (txp, slot) key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = jnp.int32(2**31 - 1)
PAD = jnp.int32(-1)

# mate status codes for joint-hit slots
PAIRED, LEFT, RIGHT, SINGLE = 0, 1, 2, 3

_H1_INIT = jnp.uint32(2166136261)       # FNV-1a offset basis
_H1_PRIME = jnp.uint32(16777619)        # FNV prime
_H2_INIT = jnp.uint32(0x9E3779B9)
_H2_PRIME = jnp.uint32(0x85EBCA6B)


def _merge_orientations(fw, rc):
    """Combine fwd/rc hits of one read: one hit per transcript; on a
    transcript hit both ways the orientation with the larger first-MMP
    match length wins (rc only on strictly greater — refimpl.mapper).

    The result is NOT txp-sorted (slots are fw block then rc block):
    everything downstream is either order-agnostic (cross-product pair
    matching, per-slot compat masks) or restores order itself (the final
    label compaction sorts by (dropped, txp) — see merge_and_collapse),
    so the width-2C multi-operand sort this used to do was pure waste."""
    B = fw["txp"].shape[0] // 1
    rc_wins = rc["mlen"] > fw["mlen"]  # (B,)

    def cross(a, b):
        # for each slot of a: does its txp appear among valid slots of b?
        return (
            (a["txp"][:, :, None] == b["txp"][:, None, :])
            & b["valid"][:, None, :]
        ).any(axis=2)

    f_in_r = cross(fw, rc)
    r_in_f = cross(rc, fw)
    keep_f = fw["valid"] & ~(f_in_r & rc_wins[:, None])
    keep_r = rc["valid"] & ~(r_in_f & ~rc_wins[:, None])

    txp = jnp.concatenate([fw["txp"], rc["txp"]], axis=1)
    pos = jnp.concatenate([fw["pos"], rc["pos"]], axis=1)
    valid = jnp.concatenate([keep_f, keep_r], axis=1)
    C = fw["txp"].shape[1]
    fwd = jnp.concatenate(
        [jnp.ones((B, C), bool), jnp.zeros((B, C), bool)], axis=1
    )
    return {
        "txp": txp,
        "pos": pos,
        "fwd": fwd,
        "valid": valid,
        "overflow": fw["overflow"] | rc["overflow"],
    }


def _mix32(x):
    """murmur3 finalizer — full avalanche, vectorized."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _hash_labels(label, count):
    """Two independent 32-bit hashes over the compacted label row
    (sentinel PAD ignored), with the length mixed in.

    Position-tabulation form: avalanche each (value, position) pair
    independently, then combine with a commutative reduction — a single
    vectorized pass instead of the W-step sequential rolling hash (the
    label is compacted left, so position encodes order)."""
    B, W = label.shape
    live = label != PAD
    xu = (label + 1).astype(jnp.uint32)
    j = jnp.arange(W, dtype=jnp.uint32)[None, :]
    m1 = _mix32(xu ^ (j * _H1_PRIME) ^ _H1_INIT)
    m2 = _mix32(xu + (j * _H2_PRIME) + _H2_INIT)
    z = jnp.uint32(0)
    h1 = jax.lax.reduce(jnp.where(live, m1, z), z, jax.lax.bitwise_xor, (1,))
    h2 = jnp.where(live, m2, z).sum(axis=1, dtype=jnp.uint32)
    cu = count.astype(jnp.uint32)
    h1 = _mix32((h1 ^ cu) * _H1_PRIME)
    h2 = _mix32((h2 + cu) * _H2_PRIME)
    return h1, h2


def _se_compat_bits(expected_flags, status, fwd, ignore):
    """Orphan/SE compatibility from 6 precomputed booleans."""
    lf, lr, rf, rr, sf, sr = expected_flags
    compat = jnp.where(
        status == LEFT,
        jnp.where(fwd, lf, lr),
        jnp.where(
            status == RIGHT,
            jnp.where(fwd, rf, rr),
            jnp.where(fwd, sf, sr),
        ),
    )
    return compat | ignore


def _pe_compat(
    pos1, fwd1, len1, pos2, fwd2, len2, exp_orientation, exp_strandedness,
    allow_dovetail, ignore,
):
    """Vectorized hit_type + compatible_hit_paired
    (src/SailfishUtils.cpp:215-289).  Orientation codes: SAME=0, AWAY=1,
    TOWARD=2; strandedness codes: SA=0, AS=1, S=2, A=3, U=4."""
    end1 = jnp.where(fwd1, pos1, pos1 + len1)
    end2 = jnp.where(fwd2, pos2, pos2 + len2)
    opp = fwd1 != fwd2
    stretch1 = jnp.where(allow_dovetail, len2, 0)
    stretch2 = jnp.where(allow_dovetail, len1, 0)
    toward = jnp.where(
        fwd1, end1 <= end2 + stretch1, end2 <= end1 + stretch2
    )
    obs_orient = jnp.where(opp, jnp.where(toward, 2, 1), 0)
    obs_strand = jnp.where(
        opp, jnp.where(fwd1, 0, 1), jnp.where(fwd1, 2, 3)
    )
    compat = (obs_orient == exp_orientation) & (
        (exp_strandedness == 4) | (obs_strand == exp_strandedness)
    )
    return compat | ignore


@partial(
    jax.jit,
    static_argnames=(
        "paired_end", "cand_cap", "max_read_occs", "allow_orphans",
        "allow_dovetail", "ignore_compat", "enforce_compat", "return_slots",
    ),
)
def merge_and_collapse(
    hits1_fw, hits1_rc, hits2_fw, hits2_rc,
    lens1, lens2,
    exp_orientation, exp_strandedness, se_flags,
    *,
    paired_end: bool,
    cand_cap: int,
    max_read_occs: int,
    allow_orphans: bool,
    allow_dovetail: bool,
    ignore_compat: bool,
    enforce_compat: bool,
    return_slots: bool = False,
):
    """Fragment-level merge + label formation.

    Returns per-fragment arrays:
      label (B, 4C) int32 compacted (PAD sentinel), label_len (B,),
      h1/h2 (B,) uint32, mapped (B,), num_joint (B,), unique_paired (B,),
      frag_len (B,), num_fwd/num_rc (B,), overflow (B,)
    """
    C = cand_cap
    left = _merge_orientations(hits1_fw, hits1_rc)
    B = left["txp"].shape[0]
    ign = jnp.asarray(ignore_compat)

    if paired_end:
        right = _merge_orientations(hits2_fw, hits2_rc)
        # pair: left slot c pairs with right slot of the same transcript
        match = (
            (left["txp"][:, :, None] == right["txp"][:, None, :])
            & right["valid"][:, None, :]
            & left["valid"][:, :, None]
        )  # (B, 2C, 2C)
        paired_l = match.any(axis=2)
        # after _merge_orientations each transcript owns at most one valid
        # right slot, so a masked reduction replaces argmax + two gathers
        mate_pos = jnp.sum(
            jnp.where(match, right["pos"][:, None, :], 0), axis=2
        )
        mate_fwd = jnp.any(match & right["fwd"][:, None, :], axis=2)
        any_paired = paired_l.any(axis=1)

        W = 4 * C
        pad2 = ((0, 0), (0, W - 2 * C))

        def padw(x, fill):
            return jnp.pad(x, pad2, constant_values=fill)

        l1 = lens1[:, None]
        l2 = lens2[:, None]
        # paired representation (left-slot ordered, already txp-sorted)
        p_txp = padw(left["txp"], 0)
        p_pos = padw(left["pos"], 0)
        p_fwd = padw(left["fwd"], False)
        p_mpos = padw(mate_pos, 0)
        p_mfwd = padw(mate_fwd, False)
        p_valid = padw(paired_l, False)
        p_status = jnp.full((B, W), PAIRED, jnp.int32)

        # orphan representation: left block then right block, UNSORTED —
        # left-before-right on a shared transcript is guaranteed by block
        # order + the stable label sort below (like inplace_merge); all
        # other consumers are per-slot masks, so no sort is needed here
        o_txp = jnp.concatenate([left["txp"], right["txp"]], axis=1)
        o_pos = jnp.concatenate([left["pos"], right["pos"]], axis=1)
        o_fwd = jnp.concatenate([left["fwd"], right["fwd"]], axis=1)
        o_valid = jnp.concatenate([left["valid"], right["valid"]], axis=1)
        if not allow_orphans:
            o_valid = jnp.zeros_like(o_valid)
        o_status = jnp.concatenate(
            [jnp.full((B, 2 * C), LEFT, jnp.int32),
             jnp.full((B, 2 * C), RIGHT, jnp.int32)], axis=1
        )

        ap = any_paired[:, None]
        txp = jnp.where(ap, p_txp, o_txp)
        pos = jnp.where(ap, p_pos, o_pos)
        fwd = jnp.where(ap, p_fwd, o_fwd)
        mpos = jnp.where(ap, p_mpos, 0)
        mfwd = jnp.where(ap, p_mfwd, False)
        valid = jnp.where(ap, p_valid, o_valid)
        status = jnp.where(ap, p_status, o_status)
        overflow = left["overflow"] | right["overflow"]

        # compat per slot
        is_p = status == PAIRED
        pe_ok = _pe_compat(
            pos, fwd, jnp.broadcast_to(l1, (B, W)),
            mpos, mfwd, jnp.broadcast_to(l2, (B, W)),
            exp_orientation, exp_strandedness,
            jnp.asarray(allow_dovetail), ign,
        )
        se_ok = _se_compat_bits(se_flags, status, fwd, ign)
        compat = jnp.where(is_p, pe_ok, se_ok)
        fwd_hit = jnp.where(status == RIGHT, ~fwd, fwd)

        # fragment length (paired slots): span of both reads
        fstart = jnp.minimum(pos, mpos)
        fend = jnp.maximum(pos + l1, mpos + l2)
        slot_fraglen = fend - fstart
    else:
        W = 2 * C
        txp = left["txp"]
        pos = left["pos"]
        fwd = left["fwd"]
        valid = left["valid"]
        status = jnp.full((B, W), SINGLE, jnp.int32)
        overflow = left["overflow"]
        compat = _se_compat_bits(se_flags, status, fwd, ign)
        fwd_hit = fwd
        is_p = jnp.zeros((B, W), bool)
        slot_fraglen = jnp.zeros((B, W), jnp.int32)

    num_joint = valid.sum(axis=1)
    too_many = (num_joint > max_read_occs) | overflow
    valid = valid & ~too_many[:, None]
    num_joint = jnp.where(too_many, 0, num_joint)

    compat = compat & valid
    have_compat = compat.any(axis=1)
    selected = valid & jnp.where(have_compat[:, None], compat,
                                 ~jnp.asarray(enforce_compat))

    mapped = selected.any(axis=1)
    num_fwd = (selected & fwd_hit).sum(axis=1)
    num_rc = (selected & ~fwd_hit).sum(axis=1)

    # compact selected txps left IN ASCENDING TXP ORDER (this sort is
    # the only place slot order is canonicalized — upstream merges no
    # longer sort).  Key: selected slots carry their txp, dropped slots
    # NEG (int32 max) so they sink to the back; stable ties keep slot
    # order, i.e. left-read hits before right-read hits (inplace_merge
    # semantics of the reference's orphan merge).
    _, label = jax.lax.sort(
        (jnp.where(selected, txp, NEG), jnp.where(selected, txp, PAD)),
        dimension=1, num_keys=1, is_stable=True,
    )
    label_len = selected.sum(axis=1)

    if paired_end:
        # the lone joint hit's slot (num_joint == 1 when this matters)
        first_idx = jnp.argmax(valid, axis=1)
        is_paired_hit = jnp.take_along_axis(is_p, first_idx[:, None], axis=1)[:, 0]
        unique_paired = (num_joint == 1) & is_paired_hit & mapped
        frag_len = jnp.where(
            unique_paired,
            jnp.take_along_axis(slot_fraglen, first_idx[:, None], axis=1)[:, 0],
            0,
        )
    else:
        unique_paired = jnp.zeros(B, bool)
        frag_len = jnp.zeros(B, jnp.int32)

    h1, h2 = _hash_labels(label, label_len)
    h1 = jnp.where(mapped, h1, jnp.uint32(0xFFFFFFFF))
    h2 = jnp.where(mapped, h2, jnp.uint32(0xFFFFFFFF))

    out = {
        "label": label,
        "label_len": label_len,
        "h1": h1,
        "h2": h2,
        "mapped": mapped,
        "num_joint": num_joint,
        "unique_paired": unique_paired,
        "frag_len": frag_len,
        "num_fwd": num_fwd,
        "num_rc": num_rc,
        "overflow": overflow,
    }
    if return_slots:
        # joint-hit slot arrays for bias-model observation (device-
        # resident; consumed by stats/bias.bias_observe)
        out["slots"] = {
            "txp": txp,
            "pos": pos,
            "fwd": fwd,
            "mpos": mpos if paired_end else jnp.zeros_like(pos),
            "mfwd": mfwd if paired_end else jnp.zeros_like(fwd),
            "status": status,
            "valid": valid,
            "frag_len": slot_fraglen,
            "mapped": mapped,
        }
    return out


@jax.jit
def collapse_unique(h1, h2, mapped, label_len):
    """Within-batch collapse + unique-row compaction, fully on device.

    Sort lanes by (h1, h2), count identical-hash groups, then compact the
    group representatives to the front.  Returns (uniq, U):
      uniq (B, 5) int32 — [h1, h2, count, rep_orig_idx, label_len] with
      the U live classes in rows [0, U); U () int32.
    The host pulls only rows [0, bucket(U)) — the whole per-batch
    eq-class traffic is ~U*20 bytes instead of per-fragment arrays.
    """
    B = h1.shape[0]
    sh1, sh2, order, smapped, slen = jax.lax.sort(
        (h1, h2, jnp.arange(B, dtype=jnp.int32), mapped,
         label_len.astype(jnp.int32)),
        dimension=0, num_keys=2, is_stable=True,
    )
    newgrp = jnp.ones(B, bool)
    newgrp = newgrp.at[1:].set((sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1]))
    gid = jnp.cumsum(newgrp) - 1
    counts = jax.ops.segment_sum(
        smapped.astype(jnp.int32), gid, num_segments=B
    )
    group_count = counts[gid]
    is_first = newgrp & smapped
    _, ch1, ch2, ccnt, crep, clen = jax.lax.sort(
        ((~is_first).astype(jnp.int32),
         jax.lax.bitcast_convert_type(sh1, jnp.int32),
         jax.lax.bitcast_convert_type(sh2, jnp.int32),
         group_count, order, slen),
        dimension=0, num_keys=1, is_stable=True,
    )
    uniq = jnp.stack([ch1, ch2, ccnt, crep, clen], axis=1)
    return uniq, is_first.sum()


@jax.jit
def collapse_batch(h1, h2, mapped):
    """Within-batch collapse of identical labels: sort lanes by (h1, h2),
    mark group starts, count group sizes, and report each group's
    representative original lane.

    Returns (in sorted order): is_first (B,), group_count (B,),
    orig_idx (B,) — host takes is_first & mapped_sorted rows.
    """
    B = h1.shape[0]
    sh1, sh2, order, smapped = jax.lax.sort(
        (h1, h2, jnp.arange(B, dtype=jnp.int32), mapped),
        dimension=0, num_keys=2, is_stable=True,
    )

    newgrp = jnp.ones(B, bool)
    newgrp = newgrp.at[1:].set((sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1]))
    gid = jnp.cumsum(newgrp) - 1
    counts = jax.ops.segment_sum(
        smapped.astype(jnp.int32), gid, num_segments=B
    )
    group_count = counts[gid]
    is_first = newgrp & smapped
    return is_first, group_count, order
