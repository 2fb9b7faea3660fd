"""Production mapping backend over a sharded (>HBM) index.

`ShardedMapperBackend` plugs the lockstep sharded-index scan
(parallel/shardidx) into the standard quant pipeline: it presents the
same submit/finish interface as `DeviceMapperBackend` and reuses its
entire batch tail (orientation merge, pair intersection, eq-class
collapse, FLD reduction) unchanged — only `_map_lanes` is swapped for
the shard_map'd XLA kernel, with each orientation block widened from C
to D*C columns (one C-wide slab per shard, shard-major, which preserves
global transcript order because shards are contiguous ranges).

Index arrays are placed on the mesh with a PartitionSpec("idx")
NamedSharding before the first batch, so each device holds 1/D of the
index — the point of the exercise (BASELINE config 5: transcriptome
index exceeding one chip's HBM).

Unsupported with a sharded index (explicit error, not a silent drop):
sequence/GC bias correction (needs the whole text on one device).

Escalation (--hitCapacityMax) IS available (round 5): overflow
fragments re-map through a second lockstep sharded scan at the wide
capacity — a sibling backend sharing this one's mesh and device-
resident shard arrays (no extra HBM), exactly like the monolithic
path's wide second pass.  Reference behavior matched: unbounded
candidate enumeration with --maxReadOcc applied to the joint set
(src/SailfishQuantify.cpp:217,1143).
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import QuantOpts
from ..parallel.shardidx import (
    map_oriented_lanes_sharded,
    stack_shard_texts,
)
from .pipeline import DeviceMapperBackend

log = logging.getLogger("sailfish_tpu")


class ShardedMapperBackend(DeviceMapperBackend):
    # executable serialization of shard_map'd programs across processes
    # is untested on this backend; the sharded path keeps plain jit
    _aot_ok = False

    def __init__(self, sidx, opts: QuantOpts, mesh: Mesh | None = None,
                 _share_stacked=None):
        if opts.bias_correct or opts.gc_bias_correct:
            raise ValueError(
                "bias correction needs the whole transcriptome text on "
                "one device; it is not available with a sharded index"
            )
        if opts.kernel == "pallas":
            log.info("sharded index: using the XLA kernel "
                     "(the pallas scan is single-device)")
            opts = dataclasses.replace(opts, kernel="xla")
        D = sidx.num_shards
        if mesh is None:
            devs = jax.devices()
            if len(devs) < D:
                raise ValueError(
                    f"sharded index has {D} shards but only "
                    f"{len(devs)} devices are visible"
                )
            mesh = Mesh(np.array(devs[:D]), ("idx",))
        if mesh.shape["idx"] != D:
            raise ValueError(
                f"mesh axis 'idx' has {mesh.shape['idx']} devices; "
                f"index has {D} shards"
            )

        # DeviceMapperBackend state, minus everything that assumes a
        # monolithic QuasiIndex (bias text, big_sa, lazy XLA arrays)
        self.opts = opts
        self._pe_steps = {}
        self.k = sidx.k
        self.prefix_bases = sidx.prefix_bases
        self._index = sidx
        self._pallas_text = None
        self._pallas_n_text = None
        self._pallas_filt_bits = None
        self._pallas_w16_bits = 0
        self._pdt = jnp.int32
        self._text_dev = None
        self.bias_text = None
        self._bias_flags = (False, False)

        self._mesh = mesh
        if _share_stacked is not None:
            # escalation sibling: reuse the parent's device-resident
            # shard arrays (no second HBM copy, no second transfer)
            self._stacked, meta = _share_stacked
        else:
            stacked, meta = stack_shard_texts(sidx.shards, sidx.ranges)
            # place each index array striped over the mesh: device d
            # holds shard d only (the whole point — per-device HBM
            # sees 1/D)
            spec = NamedSharding(mesh, P("idx"))
            self._stacked = {
                kk: jax.device_put(v, spec) for kk, v in stacked.items()
            }
        self._stack_meta = meta
        self.use_hash = meta["ht_bits"] > 0
        self.ht_bits = meta["ht_bits"]
        self.ht_probes = meta["ht_probes"]
        self._tail_cap = D * opts.hit_capacity

    def _esc_backend(self):
        """Wide-capacity second pass over the SAME sharded index: a
        sibling backend on this mesh, sharing the device shard arrays,
        with hit_capacity = effective_hit_capacity().  The lockstep
        scan's union-of-shards hit set is exact at any capacity, so
        escalated fragments come back bit-identical to a monolithic
        wide pass (pinned by tests/test_shardidx.py)."""
        if getattr(self, "_escb", None) is None:
            opts2 = dataclasses.replace(
                self.opts,
                hit_capacity=self.opts.effective_hit_capacity(),
                hit_capacity_max=0,
                batch_size=self._ESC_ROWS,
            )
            self._escb = ShardedMapperBackend(
                self._index, opts2, mesh=self._mesh,
                _share_stacked=(self._stacked, self._stack_meta),
            )
        return self._escb

    # the sharded arrays ARE the text argument for the fused step
    def _text_arg(self):
        return self._stacked

    def _map_lanes(self, codes, lens, uniform_len=None, text=None,
                   packed=None):
        # `packed` (2-bit H2D words) feeds the single-device pack-domain
        # pallas/xscan path only; the lockstep sharded scan consumes the
        # unpacked per-position codes, so it is accepted and ignored.
        del packed
        opts = self.opts
        if text is None:
            text = self._text_arg()
        hits = map_oriented_lanes_sharded(
            self._mesh, text,
            jnp.asarray(codes), jnp.asarray(lens),
            k=self.k,
            prefix_bases=self.prefix_bases,
            cand_cap=opts.hit_capacity,
            max_mmps=opts.max_mmps,
            max_steps=opts.effective_scan_steps(codes.shape[1]),
            use_hash=self.use_hash,
            ht_probes=self.ht_probes,
            ht_bits=self.ht_bits,
            skip_jump=(opts.mmp_skip == "jump"),
        )
        B = codes.shape[0]

        def half(d, sl):
            return {kk: v[sl] for kk, v in d.items()
                    if kk != "num_mapped_loci"}

        return half(hits, slice(0, B)), half(hits, slice(B, 2 * B))
