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


def _shift_fwd(a, d, fill):
    """a[:, j+d] with out-of-range slots filled."""
    B = a.shape[0]
    return jnp.concatenate(
        [a[:, d:], jnp.full((B, d), fill, a.dtype)], axis=1
    )


def _shift_back(a, d, fill):
    """a[:, j-d] with out-of-range slots filled."""
    B = a.shape[0]
    return jnp.concatenate(
        [jnp.full((B, d), fill, a.dtype), a[:, : a.shape[1] - d]], axis=1
    )


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
    TOWARD=2; strandedness codes: SA=0, AS=1, S=2, A=3, U=4 (the
    libformat enum values, so the observed codes pack straight into a
    formatID).  Returns (compat, obs_orient, obs_strand)."""
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
    return compat | ignore, obs_orient, obs_strand


@partial(
    jax.jit,
    static_argnames=(
        "paired_end", "cand_cap", "max_read_occs", "allow_orphans",
        "allow_dovetail", "ignore_compat", "enforce_compat",
        "strict_intersect", "return_slots",
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
    strict_intersect: bool = False,
    return_slots: bool = False,
):
    """Fragment-level merge + label formation.

    Sort-based: the four oriented hit blocks (1fw, 1rc, 2fw, 2rc) are
    merged with ONE (B, W) lexicographic sort by (txp, side, orient);
    orientation resolution and left/right pairing are then adjacent-
    neighbor checks within runs of at most four same-transcript slots —
    O(W log W) instead of the O(C^2) per-slot cross products this used
    to do, which is what makes hit capacities near --maxReadOcc viable.

    Returns per-fragment arrays:
      label (B, 4C) int32 compacted (PAD sentinel), label_len (B,),
      h1/h2 (B,) uint32, mapped (B,), num_joint (B,), unique_paired (B,),
      frag_len (B,), num_fwd/num_rc (B,), overflow (B,)
    """
    C = cand_cap
    B = hits1_fw["txp"].shape[0]
    ign = jnp.asarray(ignore_compat)
    NOKEY = jnp.int32(-2)  # shift fill that never equals a valid txp

    # rc orientation wins a same-transcript tie only on strictly greater
    # first-MMP match length (refimpl.mapper semantics)
    rc1_wins = hits1_rc["mlen"] > hits1_fw["mlen"]  # (B,)
    if paired_end:
        rc2_wins = hits2_rc["mlen"] > hits2_fw["mlen"]
        blocks = (hits1_fw, hits1_rc, hits2_fw, hits2_rc)
        sides = (0, 0, 1, 1)
        orients = (0, 1, 0, 1)
    else:
        rc2_wins = rc1_wins
        blocks = (hits1_fw, hits1_rc)
        sides = (0, 0)
        orients = (0, 1)
    W = C * len(blocks)

    txp0 = jnp.concatenate([b["txp"] for b in blocks], axis=1)
    pos0 = jnp.concatenate([b["pos"] for b in blocks], axis=1)
    valid0 = jnp.concatenate([b["valid"] for b in blocks], axis=1)
    side0 = jnp.concatenate(
        [jnp.full((B, C), s, jnp.int32) for s in sides], axis=1
    )
    orient0 = jnp.concatenate(
        [jnp.full((B, C), o, jnp.int32) for o in orients], axis=1
    )
    overflow = blocks[0]["overflow"]
    for b in blocks[1:]:
        overflow = overflow | b["overflow"]

    # one lexicographic sort groups each transcript's (<=4) slots as
    # [L-fw, L-rc, R-fw, R-rc]; invalid slots sink to the back on NEG
    key0 = jnp.where(valid0, txp0, NEG)
    txp, side, orient, pos, valid_i = jax.lax.sort(
        (key0, side0, orient0, pos0, valid0.astype(jnp.int32)),
        dimension=1, num_keys=3, is_stable=False,
    )
    valid = valid_i.astype(bool)
    fwd = orient == 0

    # orientation resolution: a valid (txp, side) pair appearing in both
    # orientations occupies adjacent slots (fw first); drop the loser
    same_ts_next = (
        valid & _shift_fwd(valid, 1, False)
        & (txp == _shift_fwd(txp, 1, NOKEY))
        & (side == _shift_fwd(side, 1, jnp.int32(-1)))
    )
    dup_prev = _shift_back(same_ts_next, 1, False)
    rcw = jnp.where(side == 0, rc1_wins[:, None], rc2_wins[:, None])
    keep = (
        valid
        & jnp.where(same_ts_next, ~rcw, True)
        & jnp.where(dup_prev, rcw, True)
    )

    if paired_end:
        l1 = lens1[:, None]
        l2 = lens2[:, None]
        # pairing: a kept left slot's kept right partner (same txp) sits
        # 1..3 slots ahead (at most two dropped orientation losers and
        # one partner candidate in between)
        paired_l = jnp.zeros((B, W), bool)
        mate_pos = jnp.zeros((B, W), jnp.int32)
        mate_fwd = jnp.zeros((B, W), bool)
        for d in (1, 2, 3):
            kd = (
                keep & (side == 0)
                & _shift_fwd(keep, d, False)
                & (txp == _shift_fwd(txp, d, NOKEY))
                & (_shift_fwd(side, d, jnp.int32(0)) == 1)
            )
            new = kd & ~paired_l
            mate_pos = jnp.where(new, _shift_fwd(pos, d, 0), mate_pos)
            mate_fwd = jnp.where(new, _shift_fwd(fwd, d, False), mate_fwd)
            paired_l = paired_l | kd
        any_paired = paired_l.any(axis=1)
        ap = any_paired[:, None]

        # a fragment with any paired hit uses exactly its paired (left)
        # slots; otherwise kept slots become orphans.  Orphan gating
        # mirrors the reference merge pair (SailfishQuantify.cpp:204-213):
        # the default (mergeLeftRightHitsFuzzy) orphan-reports only when
        # exactly ONE end mapped — both ends mapping to disjoint
        # transcript sets leaves the fragment unmapped; --strictIntersect
        # (mergeLeftRightHits) instead reports BOTH ends' mappings as
        # orphans when the intersection is empty.
        orphans = keep if allow_orphans else jnp.zeros_like(keep)
        if not strict_intersect:
            left_has = (keep & (side == 0)).any(axis=1)
            right_has = (keep & (side == 1)).any(axis=1)
            one_end_only = ~(left_has & right_has)
            orphans = orphans & one_end_only[:, None]
        valid = jnp.where(ap, paired_l, orphans)
        status = jnp.where(
            ap, PAIRED, jnp.where(side == 0, LEFT, RIGHT)
        ).astype(jnp.int32)
        mpos = jnp.where(ap & paired_l, mate_pos, 0)
        mfwd = jnp.where(ap & paired_l, mate_fwd, False)

        is_p = status == PAIRED
        pe_ok, obs_o, obs_s = _pe_compat(
            pos, fwd, jnp.broadcast_to(l1, (B, W)),
            mpos, mfwd, jnp.broadcast_to(l2, (B, W)),
            exp_orientation, exp_strandedness,
            jnp.asarray(allow_dovetail), ign,
        )
        se_ok = _se_compat_bits(se_flags, status, fwd, ign)
        compat = jnp.where(is_p, pe_ok, se_ok)
        fwd_hit = jnp.where(status == RIGHT, ~fwd, fwd)
        # observed library format per slot (LibraryFormat.hpp:89-98
        # codec): paired slots pack hit_type's observed codes; orphans
        # count as SE SF/SR by the hit's forward/reverse orientation.
        # (The reference's ReadLibrary carries per-formatID counters but
        # Sailfish never feeds them; we implement the accounting.)
        pe_fmt = 1 | (obs_o << 1) | (obs_s << 3)
        se_fmt = (3 << 1) | (jnp.where(fwd_hit, 2, 3) << 3)
        slot_fmt = jnp.where(is_p, pe_fmt, se_fmt)

        # fragment length (paired slots): span of both reads
        fstart = jnp.minimum(pos, mpos)
        fend = jnp.maximum(pos + l1, mpos + l2)
        slot_fraglen = fend - fstart
    else:
        valid = keep
        status = jnp.full((B, W), SINGLE, jnp.int32)
        compat = _se_compat_bits(se_flags, status, fwd, ign)
        fwd_hit = fwd
        is_p = jnp.zeros((B, W), bool)
        slot_fraglen = jnp.zeros((B, W), jnp.int32)
        mpos = jnp.zeros((B, W), jnp.int32)
        mfwd = jnp.zeros((B, W), bool)
        slot_fmt = (3 << 1) | (jnp.where(fwd_hit, 2, 3) << 3)

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

    # fragment's observed library format: the first selected slot's
    # (deterministic under the canonical slot order); -1 when unmapped
    fsel = jnp.argmax(selected, axis=1)
    fmt_id = jnp.take_along_axis(slot_fmt, fsel[:, None], axis=1)[:, 0]
    fmt_id = jnp.where(mapped, fmt_id, jnp.int32(-1))

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
        "fmt_id": fmt_id,
        "have_compat": have_compat & mapped,
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
