"""Sharded-index mapping (parallel/shardidx) vs the single-index kernel.

The >HBM long-context path stripes the index over the mesh and keeps
the MMP scan in lockstep with per-step collectives; these tests assert
the hit sets are IDENTICAL to the monolithic index on the virtual
8-device CPU mesh, for both seed paths (k-mer hash and prefix table)
and across shard counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sailfish_tpu.map.encode import make_oriented_lanes
from sailfish_tpu.map.kernels import map_oriented_lanes
from sailfish_tpu.parallel.shardidx import (
    build_index_shards,
    map_oriented_lanes_sharded,
    stack_shard_texts,
)

CAP = 16
MMPS = 4


def _world(seed=7, n_txps=12, paralogs=True):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, 600).astype(np.uint8)
    seqs, names = [], []
    for t in range(n_txps):
        s = rng.integers(0, 4, 300 + 37 * t).astype(np.uint8)
        if paralogs and t % 3 == 0:
            # shared segment ACROSS shards exercises the cross-shard
            # candidate union and the global overflow rule
            s[40:140] = base[:100]
        seqs.append(s)
        names.append(f"t{t}")
    return names, seqs


def _reads(seqs, n=64, readlen=60, seed=3, err=0.3):
    rng = np.random.default_rng(seed)
    L = (readlen + 7) // 8 * 8
    codes = np.full((n, L), 4, np.uint8)
    for i in range(n):
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        p = int(rng.integers(0, len(s) - readlen + 1))
        r = s[p : p + readlen].copy()
        if rng.random() < err:
            q = int(rng.integers(0, readlen))
            r[q] = (r[q] + 1) % 4
        codes[i, :readlen] = r
    lens = np.full(n, readlen, np.int32)
    return codes, lens


def _single_text(names, seqs, k):
    from sailfish_tpu.index.builder import build_index

    idx = build_index(names, seqs, k=k, prefix_bases=10)
    pad = np.zeros(512, dtype=np.uint32)
    pad8 = np.zeros(512, dtype=np.uint8)
    text = {
        "sa": jnp.asarray(idx.sa),
        "packed16": jnp.asarray(np.concatenate([idx.packed16, pad])),
        "sep_dist": jnp.asarray(np.concatenate([idx.sep_dist, pad8])),
        "table_lo": jnp.asarray(idx.table_lo),
        "txp_of_pos": jnp.asarray(idx.txp_of_pos),
        "txp_offsets": jnp.asarray(idx.txp_offsets),
    }
    if idx.kmer_ht is not None:
        ht = idx.kmer_ht
        text.update({
            "ht_key0": jnp.asarray(ht["ht_key0"]),
            "ht_key1": jnp.asarray(ht["ht_key1"]),
            "ht_lo": jnp.asarray(ht["ht_lo"]),
            "ht_cnt": jnp.asarray(ht["ht_cnt"]),
        })
    return idx, text


def _hit_sets(res, B2):
    txp = np.asarray(res["txp"])
    pos = np.asarray(res["pos"])
    vld = np.asarray(res["valid"])
    return [
        set(zip(txp[i][vld[i]].tolist(), pos[i][vld[i]].tolist()))
        for i in range(B2)
    ]


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("k", [31, 13])
def test_sharded_matches_single(n_shards, k):
    names, seqs = _world()
    codes, lens = _reads(seqs)
    idx, text = _single_text(names, seqs, k)
    use_hash = idx.kmer_ht is not None

    lanes = make_oriented_lanes(
        jnp.asarray(codes), jnp.asarray(lens), idx.prefix_bases
    )
    ref = map_oriented_lanes(
        text, lanes,
        k=k, prefix_bases=idx.prefix_bases, cand_cap=CAP,
        max_mmps=MMPS, max_steps=24,
        use_hash=use_hash,
        ht_probes=int(idx.kmer_ht["max_probes"]) if use_hash else 0,
        ht_bits=int(idx.kmer_ht["ht_bits"]) if use_hash else 0,
        skip_jump=False,
    )

    shards, ranges = build_index_shards(
        names, seqs, n_shards, k=k, prefix_bases=10
    )
    stacked, meta = stack_shard_texts(shards, ranges)
    devs = jax.devices()[:n_shards]
    mesh = jax.sharding.Mesh(np.array(devs), ("idx",))
    got = map_oriented_lanes_sharded(
        mesh, stacked, codes, lens,
        k=k, prefix_bases=meta["prefix_bases"], cand_cap=CAP,
        max_mmps=MMPS, max_steps=24,
        use_hash=use_hash,
        ht_probes=meta["ht_probes"], ht_bits=meta["ht_bits"],
        skip_jump=False,
    )

    B2 = codes.shape[0] * 2
    assert _hit_sets(got, B2) == _hit_sets(ref, B2)
    np.testing.assert_array_equal(
        np.asarray(got["mlen"]), np.asarray(ref["mlen"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["overflow"]), np.asarray(ref["overflow"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["num_mapped_loci"]),
        np.asarray(ref["num_mapped_loci"]),
    )


def test_sharded_overflow_rule_is_global():
    """A repeat family bigger than the cap must overflow globally even
    when each shard's slice stays under the cap."""
    rng = np.random.default_rng(5)
    seg = rng.integers(0, 4, 200).astype(np.uint8)
    seqs, names = [], []
    # CAP+8 near-identical transcripts spread over shards: the k-mer
    # interval for a read inside `seg` exceeds CAP only globally
    for t in range(CAP + 8):
        s = rng.integers(0, 4, 260).astype(np.uint8)
        s[20:220] = seg
        seqs.append(s)
        names.append(f"p{t}")
    codes, lens = _reads(seqs, n=16, readlen=60, seed=9, err=0.0)

    idx, text = _single_text(names, seqs, 31)
    lanes = make_oriented_lanes(
        jnp.asarray(codes), jnp.asarray(lens), idx.prefix_bases
    )
    kw = dict(
        k=31, prefix_bases=idx.prefix_bases, cand_cap=CAP,
        max_mmps=MMPS, max_steps=24, use_hash=True,
        ht_probes=int(idx.kmer_ht["max_probes"]),
        ht_bits=int(idx.kmer_ht["ht_bits"]), skip_jump=False,
    )
    ref = map_oriented_lanes(text, lanes, **kw)
    assert np.asarray(ref["overflow"]).any()  # the family overflows

    shards, ranges = build_index_shards(names, seqs, 4, k=31,
                                        prefix_bases=10)
    stacked, meta = stack_shard_texts(shards, ranges)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("idx",))
    kw.update(ht_probes=meta["ht_probes"], ht_bits=meta["ht_bits"])
    got = map_oriented_lanes_sharded(mesh, stacked, codes, lens, **kw)

    B2 = codes.shape[0] * 2
    np.testing.assert_array_equal(
        np.asarray(got["overflow"]), np.asarray(ref["overflow"])
    )
    assert _hit_sets(got, B2) == _hit_sets(ref, B2)


def test_sharded_escalation_matches_monolithic_wide():
    """--hitCapacityMax under a sharded index (round 5): overflow
    fragments re-map through the wide lockstep pass and the final
    classes equal a monolithic backend's at the same capacities.
    World: a 100bp segment shared by every 3rd transcript of 24 ->
    ~8 copies; cap 4 overflows on segment reads, cap_max 32 recovers
    the full candidate set (reference: unbounded enumeration with
    --maxReadOcc on the joint set, src/SailfishQuantify.cpp:217)."""
    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.index.builder import ShardedQuasiIndex, build_index
    from sailfish_tpu.io.fastq import FastqBatch
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend
    from sailfish_tpu.map.sharded import ShardedMapperBackend

    names, seqs = _world(seed=11, n_txps=24, paralogs=True)
    k = 31
    idx = build_index(names, seqs, k=k, prefix_bases=10)
    shards, ranges = build_index_shards(names, seqs, 4, k=k,
                                        prefix_bases=10)
    sidx = ShardedQuasiIndex(
        shards=shards, ranges=ranges, names=list(names),
        txp_lens=np.concatenate([s.txp_lens for s in shards]),
        k=k, prefix_bases=shards[0].prefix_bases,
    )

    n = 48
    rng = np.random.default_rng(5)
    L = 64
    codes1 = np.full((n, L), 4, np.uint8)
    codes2 = np.full((n, L), 4, np.uint8)
    rl = 60
    for i in range(n):
        t = int(rng.integers(0, len(seqs)))
        if i % 2 == 0:
            t = (t // 3) * 3  # bias onto the repeat family members
        s = seqs[t]
        fl = int(rng.integers(rl + 10, min(200, len(s))))
        p = int(rng.integers(0, len(s) - fl + 1))
        codes1[i, :rl] = s[p : p + rl]
        m2 = s[p + fl - rl : p + fl]
        codes2[i, :rl] = (3 - m2[::-1]) % 4
    lens = np.full(n, rl, np.int32)
    b1 = FastqBatch(codes=codes1, lens=lens)
    b2 = FastqBatch(codes=codes2, lens=lens)
    exp = parse_library_format("IU")

    kw = dict(batch_size=n, hit_capacity=4, hit_capacity_max=32,
              kernel="xla")
    mono = DeviceMapperBackend(idx, QuantOpts(**kw))
    shard = ShardedMapperBackend(sidx, QuantOpts(**kw))
    bm = mono.map_pe_batch(b1, b2, exp)
    bs = shard.map_pe_batch(b1, b2, exp)

    dm = dict(zip(bm.labels, map(int, bm.label_counts)))
    ds = dict(zip(bs.labels, map(int, bs.label_counts)))
    assert dm == ds
    np.testing.assert_array_equal(bm.mapped, bs.mapped)
    # the cap-4 first pass must actually have overflowed something
    # (otherwise this test exercises nothing)
    nar = DeviceMapperBackend(idx, QuantOpts(batch_size=n,
                                             hit_capacity=4,
                                             kernel="xla"))
    bn = nar.map_pe_batch(b1, b2, exp)
    assert int(bn.mapped.sum()) < int(bm.mapped.sum())
