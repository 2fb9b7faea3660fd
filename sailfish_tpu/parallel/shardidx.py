"""Index sharding across the device mesh for >HBM transcriptomes.

The reference handles big transcriptomes on one node by switching to a
64-bit index in host RAM (`include/SailfishIndex.hpp:123-140`); on TPU
the binding constraint is per-chip HBM, so the TPU-native long-context
answer (SURVEY §5, BASELINE config 5) is to STRIPE THE INDEX over the
mesh: transcripts are split into D contiguous groups, each device builds
and holds the full index machinery (SA, packed text, separator
distances, k-mer hash) for ITS group only, and every read batch maps
against all shards in lockstep.

Correctness does not come from merging independent per-shard scans —
those would diverge (a shard with a shorter local match advances its
scan differently).  Instead the MMP scan itself is made globally
synchronous: `map.kernels.map_oriented_lanes(axis_name=...)` resolves
each step's hit decision with three (B2,)-vector collectives
(pmax of the per-shard max LCP, psum of the candidate-interval size for
the --maxReadOcc overflow rule, any-of for seed presence), so every
shard advances identically and the union of per-shard hits is exactly
the single-index hit set.  Collectives ride ICI; the per-step payload
is ~12 bytes/lane.

Shards are contiguous transcript ranges, so concatenating per-shard hit
slots in shard order preserves the global sort-by-transcript the
downstream pair/eq-class code expects; one final masked sort compacts
valid hits across the widened candidate axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..map.encode import make_oriented_lanes
from ..map.kernels import NEG, map_oriented_lanes

_PACK_PAD = 512  # packed16/sep_dist slack past text end (as pipeline)


def shard_ranges(num_txps: int, n_shards: int) -> list[tuple[int, int]]:
    """Contiguous [lo, hi) transcript ranges, balanced by count."""
    bounds = np.linspace(0, num_txps, n_shards + 1).astype(int)
    return [(int(bounds[d]), int(bounds[d + 1])) for d in range(n_shards)]


def build_index_shards(names, seqs, n_shards: int, k: int = 31,
                       prefix_bases: int = 10):
    """Build one standalone sub-index per contiguous transcript group.

    Each shard's SA / packed words / hash table cover only its own
    concatenated text — per-shard memory is ~1/D of the monolithic
    index, which is the point: a transcriptome whose index exceeds one
    chip's HBM fits when striped over D chips.

    The kernel's static parameters (prefix_bases, ht_bits) must be ONE
    value across the mesh, so prefix_bases is fixed and shards whose
    auto-sized hash table came out smaller than the largest are rebuilt
    at the common size."""
    from ..index.builder import build_index

    ranges = shard_ranges(len(seqs), n_shards)
    shards = [
        build_index(names[lo:hi], seqs[lo:hi], k=k,
                    prefix_bases=prefix_bases)
        for lo, hi in ranges
    ]
    if k >= 17:
        bits = [int(s.kmer_ht["ht_bits"]) for s in shards]
        want = max(bits)
        for d, s in enumerate(shards):
            if bits[d] != want:
                lo, hi = ranges[d]
                shards[d] = build_index(
                    names[lo:hi], seqs[lo:hi], k=k,
                    prefix_bases=prefix_bases, ht_min_bits=want,
                )
    return shards, ranges


def stack_shard_texts(shards, ranges) -> dict:
    """Per-shard XLA-kernel arrays, padded to the max shard size and
    stacked on a leading (D,) axis for shard_map placement; returns
    (arrays, meta) where meta carries the mesh-wide static kernel
    parameters (prefix_bases, ht_bits, ht_probes, num_txps).

    Padding is inert by construction: padded SA slots point at position
    0 with sep_dist 0 (LCP capped to 0 < k), padded hash buckets have
    cnt 0 (treated as empty), and the padded prefix-table tail repeats
    the end offset (empty intervals)."""
    D = len(shards)
    n_max = max(s.text_len for s in shards)
    t_max = max(s.num_transcripts for s in shards)
    use_hash = all(s.kmer_ht is not None for s in shards)
    if not use_hash and any(s.kmer_ht is not None for s in shards):
        raise ValueError("all shards must agree on k-mer-table presence")
    p_len = n_max + _PACK_PAD

    def pad1(a, n, fill, dtype):
        out = np.full(n, fill, dtype=dtype)
        out[: len(a)] = a
        return out

    sa = np.stack([pad1(s.sa, n_max, 0, np.int32) for s in shards])
    packed = np.stack(
        [pad1(s.packed16, p_len, 0, np.uint32) for s in shards]
    )
    sep = np.stack(
        [pad1(s.sep_dist, p_len, 0, np.uint8) for s in shards]
    )
    table = np.stack([
        pad1(s.table_lo, shards[0].table_lo.shape[0],
             s.table_lo[-1], np.int32)
        for s in shards
    ])
    txp_of_pos = np.stack(
        [pad1(s.txp_of_pos, n_max, 0, np.int32) for s in shards]
    )
    txp_offsets = np.stack(
        [pad1(s.txp_offsets, t_max, 0, np.int32) for s in shards]
    )
    out = {
        "sa": jnp.asarray(sa),
        "packed16": jnp.asarray(packed),
        "sep_dist": jnp.asarray(sep),
        "table_lo": jnp.asarray(table),
        "txp_of_pos": jnp.asarray(txp_of_pos),
        "txp_offsets": jnp.asarray(txp_offsets),
        "txp_base": jnp.asarray(
            np.array([lo for lo, _ in ranges], np.int32)
        ),
    }
    meta = {
        "prefix_bases": shards[0].prefix_bases,
        "num_txps": sum(s.num_transcripts for s in shards),
        "ht_bits": 0,
        "ht_probes": 0,
    }
    if {s.prefix_bases for s in shards} != {shards[0].prefix_bases}:
        raise ValueError("shards disagree on prefix_bases")
    if use_hash:
        # ht_bits is a static kernel parameter: one value mesh-wide
        # (build_index_shards equalizes); probes take the max — extra
        # rounds are no-ops once a shard's chain resolves
        bits = {int(s.kmer_ht["ht_bits"]) for s in shards}
        if len(bits) != 1:
            raise ValueError(
                f"shard hash tables disagree on ht_bits ({bits}); "
                "rebuild with build_index(ht_min_bits=...)"
            )
        meta["ht_bits"] = bits.pop()
        meta["ht_probes"] = max(
            int(s.kmer_ht["max_probes"]) for s in shards
        )
        s_max = max(s.kmer_ht["ht_key0"].shape[0] for s in shards)
        bw = shards[0].kmer_ht["ht_key0"].shape[1]

        def pad2(a, fill, dtype):
            out = np.full((s_max, bw), fill, dtype=dtype)
            out[: a.shape[0]] = a
            return out

        out.update({
            "ht_key0": jnp.asarray(np.stack(
                [pad2(s.kmer_ht["ht_key0"], 0, np.uint32) for s in shards]
            )),
            "ht_key1": jnp.asarray(np.stack(
                [pad2(s.kmer_ht["ht_key1"], 0, np.uint32) for s in shards]
            )),
            "ht_lo": jnp.asarray(np.stack(
                [pad2(s.kmer_ht["ht_lo"], 0, np.int32) for s in shards]
            )),
            "ht_cnt": jnp.asarray(np.stack(
                [pad2(s.kmer_ht["ht_cnt"], 0, np.int32) for s in shards]
            )),
        })
    return out, meta


def map_oriented_lanes_sharded(
    mesh: Mesh,
    stacked_text: dict,
    codes,
    lens,
    *,
    k: int,
    prefix_bases: int,
    cand_cap: int,
    max_mmps: int,
    max_steps: int,
    use_hash: bool,
    ht_probes: int = 0,
    ht_bits: int = 0,
    skip_jump: bool = True,
    axis: str = "idx",
):
    """Map oriented lanes against an index striped over `mesh[axis]`.

    Returns the same dict as the single-index kernel with the candidate
    axis widened to D*C: per-shard hit slots are all-gathered in shard
    order (contiguous transcript ranges keep global transcript order)
    and re-compacted with one masked sort."""
    D = mesh.shape[axis]

    def local(text, codes, lens):
        text = {kk: v[0] for kk, v in text.items()}
        lanes = make_oriented_lanes(codes, lens, prefix_bases)
        hits = map_oriented_lanes(
            text, lanes,
            k=k, prefix_bases=prefix_bases, cand_cap=cand_cap,
            max_mmps=max_mmps, max_steps=max_steps,
            use_hash=use_hash, ht_probes=ht_probes, ht_bits=ht_bits,
            skip_jump=skip_jump, axis_name=axis,
        )
        # (B2, C) per shard -> (B2, D*C) replicated, shard-major along
        # the widened axis (== global txp order for valid slots)
        txp = jax.lax.all_gather(hits["txp"], axis, axis=1)
        pos = jax.lax.all_gather(hits["pos"], axis, axis=1)
        vld = jax.lax.all_gather(hits["valid"], axis, axis=1)
        B2 = txp.shape[0]
        txp = txp.reshape(B2, -1)
        pos = pos.reshape(B2, -1)
        vld = vld.reshape(B2, -1)
        # compact valid hits to the front in (txp, pos) order
        key_t = jnp.where(vld, txp, NEG)
        _, s_pos, s_txp, s_vld = jax.lax.sort(
            (key_t, pos, txp, vld), dimension=1, num_keys=2,
            is_stable=True,
        )
        return {
            "txp": s_txp,
            "pos": s_pos,
            "valid": s_vld,
            "mlen": hits["mlen"],          # global (lockstep resolve)
            "overflow": hits["overflow"],  # global
            "num_mapped_loci": s_vld.sum(axis=1),
        }

    text_specs = {kk: P(axis) for kk in stacked_text}
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(text_specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_text, jnp.asarray(codes), jnp.asarray(lens))
