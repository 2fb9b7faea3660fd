"""Multi-chip execution: data-parallel read mapping + collective merge.

The reference is a single-process, multi-threaded program whose only
"communication" is atomics and a concurrent hash
(SURVEY.md §2.4; include/EquivalenceClassBuilder.hpp:90-108).  The TPU
replacement (per §5/§7): the index is replicated per device, FASTQ
batches shard across the mesh's data axis, per-device statistics merge
with psum, and abundance updates run on the merged state.

`distributed_quant_step` is the full per-batch "training step" jitted
over the mesh via shard_map:

  1. map the sharded oriented lanes against the replicated index
  2. merge/compat/label-form per fragment (still sharded)
  3. per-fragment EM accumulation: gather alpha over each fragment's
     label members, normalize within the fragment, scatter-add — then
     psum across the data axis.  Running the EM update on per-fragment
     labels is mathematically identical to the collapsed update over
     unique classes (counts aggregate linearly), so this one jit is a
     genuine distributed quantification step.
  4. FLD histogram + mapping counters, psum-merged.

The production pipeline (quant.py) instead collapses labels per batch
and merges (label -> count) on the host so the final EM runs over the
exact collapsed classes; this step exists for multi-chip scaling of the
map+update path and as the driver-checked multichip entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..map.encode import make_oriented_lanes
from ..map.kernels import map_oriented_lanes
from ..map.pair import merge_and_collapse


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def _fragment_em_update(label, label_len, alpha, eff_lens, num_txps: int):
    """Uncollapsed EM accumulation over per-fragment labels.

    label: (B, W) int32 member txp ids, PAD=-1 beyond label_len.
    Returns the un-psummed partial alphaOut contribution of this shard.
    """
    B, W = label.shape
    valid = label >= 0
    safe = jnp.where(valid, label, 0)
    inv_el = 1.0 / jnp.maximum(eff_lens, 1.0)
    w = jnp.where(valid, inv_el[safe], 0.0)          # un-normalized 1/effLen
    wsum = w.sum(axis=1, keepdims=True)
    w = jnp.where(wsum > 0, w / jnp.where(wsum > 0, wsum, 1.0), 0.0)
    av = jnp.where(valid, alpha[safe], 0.0) * w
    denom = av.sum(axis=1, keepdims=True)
    singleton = label_len[:, None] == 1
    contrib = jnp.where(
        singleton,
        jnp.where(valid, 1.0, 0.0),
        jnp.where(denom > 0, av / jnp.where(denom > 0, denom, 1.0), 0.0),
    )
    return jax.ops.segment_sum(
        contrib.reshape(-1), safe.reshape(-1), num_segments=num_txps
    )


def eq_hash_count_table(h1, h2, mapped, *, bits: int = 16):
    """Fixed-shape eq-class count table for in-graph cross-host merging.

    Each mapped fragment's 64-bit label hash (h1, h2 — the same dual
    32-bit hash the host accumulator keys on, map/pair.py) indexes a
    2^bits-slot count table via its low bits; psum over the data axis
    then merges class counts across hosts WITHOUT materializing
    variable-length labels in-graph (the host path fetches exact labels
    once per distinct class; the reference's analog is the concurrent
    upsert in include/EquivalenceClassBuilder.hpp:90-108).  Returns
    (counts[2^bits] i32, checksum[2^bits] i32): the checksum slot holds
    the XOR-accumulated h2 of its occupants so collisions across hosts
    are detectable by the caller."""
    slot = jnp.where(mapped, h1 & jnp.int32((1 << bits) - 1), 0)
    ones = jnp.where(mapped, 1, 0)
    counts = jax.ops.segment_sum(ones, slot, num_segments=1 << bits)
    checksum = jax.ops.segment_sum(
        jnp.where(mapped, h2, 0), slot, num_segments=1 << bits
    )
    return counts.astype(jnp.int32), checksum.astype(jnp.int32)


def _wrap32(x) -> np.ndarray:
    return ((np.asarray(x, np.int64) + 2**31) % 2**32 - 2**31).astype(
        np.int32
    )


def expected_eq_table(h1, h2, counts, *, bits: int = 16):
    """Host-side ground-truth table from exact per-CLASS (h1, h2, count)
    triples (numpy, int32 wraparound) — what eq_hash_count_table's
    per-fragment accumulation must equal, label by label."""
    size = 1 << bits
    ct = np.zeros(size, np.int64)
    ck = np.zeros(size, np.int64)
    slot = np.asarray(h1, np.int64) & (size - 1)
    np.add.at(ct, slot, np.asarray(counts, np.int64))
    np.add.at(
        ck, slot,
        _wrap32(h2).astype(np.int64) * np.asarray(counts, np.int64),
    )
    return ct.astype(np.int32), _wrap32(ck)


def collision_suspect_slots(counts, checksum, rep_h2) -> np.ndarray:
    """The checksum detection path: slots whose accumulated h2 checksum
    is inconsistent with single-label occupancy at the representative
    h2 (checksum must equal wrap32(count * rep_h2)) — any mismatch
    proves two distinct labels share the slot (a low-bits h1
    collision), telling the caller to fall back to the exact host-side
    label merge for those classes."""
    counts = np.asarray(counts, np.int64)
    exp = _wrap32(counts * _wrap32(rep_h2).astype(np.int64))
    return np.nonzero((counts > 0) & (np.asarray(checksum) != exp))[0]


def distributed_quant_step(
    mesh: Mesh,
    text: dict,
    eff_lens,
    *,
    k: int,
    prefix_bases: int,
    cand_cap: int = 32,
    max_mmps: int = 4,
    max_steps: int = 8,
    max_frag_len: int = 1000,
    fmt_args=None,
    opts=None,
    use_hash: bool = False,
    ht_probes: int = 0,
    ht_bits: int = 0,
):
    """Build the jitted multi-chip per-batch step.

    Returns fn(codes1, lens1, codes2, lens2, alpha) ->
      (alpha_out, fld_hist, num_mapped, eq_counts, eq_checksum) — all
    replicated outputs; eq_counts/eq_checksum are the psum-merged hashed
    eq-class count table (see eq_hash_count_table).
    """
    from ..config import QuantOpts
    from ..libformat import parse_library_format

    opts = opts or QuantOpts()
    if fmt_args is None:
        expected = parse_library_format(opts.lib_type)
        orient = jnp.int32(int(expected.orientation))
        strand = jnp.int32(int(expected.strandedness))
        from ..libformat import MateStatus, compatible_hit_single

        se_flags = jnp.asarray([
            compatible_hit_single(expected, True, MateStatus.PAIRED_END_LEFT),
            compatible_hit_single(expected, False, MateStatus.PAIRED_END_LEFT),
            compatible_hit_single(expected, True, MateStatus.PAIRED_END_RIGHT),
            compatible_hit_single(expected, False, MateStatus.PAIRED_END_RIGHT),
            compatible_hit_single(expected, True, MateStatus.SINGLE_END),
            compatible_hit_single(expected, False, MateStatus.SINGLE_END),
        ])
    else:
        orient, strand, se_flags = fmt_args

    num_txps = int(eff_lens.shape[0])

    def shard_step(text, alpha, eff_lens, codes1, lens1, codes2, lens2):
        lanes1 = make_oriented_lanes(codes1, lens1, prefix_bases)
        lanes2 = make_oriented_lanes(codes2, lens2, prefix_bases)
        kw = dict(k=k, prefix_bases=prefix_bases, cand_cap=cand_cap,
                  max_mmps=max_mmps, max_steps=max_steps,
                  use_hash=use_hash, ht_probes=ht_probes, ht_bits=ht_bits)
        h1 = map_oriented_lanes(text, lanes1, **kw)
        h2 = map_oriented_lanes(text, lanes2, **kw)
        B = codes1.shape[0]

        def half(d, sl):
            return {kk: v[sl] for kk, v in d.items() if kk != "num_mapped_loci"}

        out = merge_and_collapse(
            half(h1, slice(0, B)), half(h1, slice(B, 2 * B)),
            half(h2, slice(0, B)), half(h2, slice(B, 2 * B)),
            lens1, lens2, orient, strand, se_flags,
            paired_end=True,
            cand_cap=cand_cap,
            max_read_occs=opts.max_read_occs,
            allow_orphans=opts.allow_orphans,
            allow_dovetail=opts.allow_dovetail,
            ignore_compat=opts.ignore_lib_compat,
            enforce_compat=opts.enforce_lib_compat,
            strict_intersect=opts.strict_intersect,
        )

        partial_alpha = _fragment_em_update(
            out["label"], out["label_len"], alpha, eff_lens, num_txps
        )
        alpha_out = jax.lax.psum(partial_alpha, "data")

        fl = jnp.where(
            out["unique_paired"] & (out["frag_len"] < max_frag_len),
            out["frag_len"], max_frag_len,
        )
        hist = jnp.bincount(fl, length=max_frag_len + 1)[:max_frag_len]
        fld = jax.lax.psum(hist, "data")
        n_mapped = jax.lax.psum(out["mapped"].sum(), "data")
        # in-graph eq-class count merge across the data axis (the
        # multi-host analog of the host-side mergeeq): hashed count
        # vectors ride one psum collective
        eq_counts, eq_check = eq_hash_count_table(
            out["h1"], out["h2"], out["mapped"]
        )
        eq_counts = jax.lax.psum(eq_counts, "data")
        eq_check = jax.lax.psum(eq_check, "data")
        return alpha_out, fld, n_mapped, eq_counts, eq_check

    fn = jax.jit(
        jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
    )

    def step(codes1, lens1, codes2, lens2, alpha_in):
        return fn(text, alpha_in, eff_lens, codes1, lens1, codes2, lens2)

    return step
