"""Device mapping backend: host orchestration of the batched kernels.

Per batch ONE fused dispatch runs the whole device tail: oriented-lane
mapping (read1, read2) -> merge_and_collapse -> collapse_unique ->
scalar/FLD reductions (-> bias observation).  On a tunneled device each
dispatch costs a round trip, so fusing the tail and reducing stats on
device is worth more than any kernel micro-optimization.

The fast path (finish_batch_fast) then pulls only:
  * an 8-word scalar vector (counters) — the sync point,
  * the first bucket(U) rows of the (h1, h2, count, rep, len) unique
    matrix (~20 bytes per eq class in the batch),
  * the FLD histogram while the first-10k gate is still open,
  * exact label rows ONLY for hash keys never seen before in the run
    (steady state: none — the transfer decays to ~zero).
Within a batch, classes are merged by their 64-bit label hash; across
batches the accumulator is keyed by the same hash and stores the exact
label fetched at first sight.  A cross-batch collision of two distinct
labels on 64 bits (~n^2/2^65) would merge their counts; the full-detail
path (finish_batch, used by the differential tests) keys by exact label
bytes and is collision-free.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantOpts
from ..index.builder import QuasiIndex
from ..libformat import (
    LibraryFormat,
    MateStatus,
    compatible_hit_single,
)
from .encode import make_oriented_lanes
from .kernels import map_oriented_lanes
from .pair import collapse_unique, merge_and_collapse

_PACK_PAD = 512  # slack past text end for packed-word gathers


def _pack_reads(codes: np.ndarray):
    """2-bit base words + N bitmask for the H2D hop: ~3.6x fewer bytes
    on the wire than uint8 codes (the tunnel moves ~37MB/s; PCIe hosts
    also appreciate it). Code 4 (N / padding) packs as base 0 and is
    restored from the mask on device."""
    B, L = codes.shape
    lp = -(-L // 32) * 32
    b2 = np.zeros((B, lp), np.uint8)
    b2[:, :L] = codes & 3
    # two byte-wide folds: 2 bases/byte, then 4 bases/byte; the
    # little-endian u32 view then matches bit position 2*(j%16)
    t = b2[:, 0::2] | (b2[:, 1::2] << 2)
    t = t[:, 0::2] | (t[:, 1::2] << 4)
    pw = np.ascontiguousarray(t).view(np.uint32)
    nb = np.zeros((B, lp), np.uint8)
    nb[:, :L] = codes >= 4
    nm = np.packbits(nb, axis=1, bitorder="little").view(np.uint32)
    return pw, nm


def _unpack_reads(pw, nm, L: int):
    """Device-side inverse of _pack_reads (VPU shifts, fused by XLA)."""
    j = np.arange(L)
    base = (
        jnp.repeat(pw, 16, axis=1)[:, :L]
        >> jnp.asarray((2 * (j % 16)).astype(np.uint32))[None, :]
    ) & jnp.uint32(3)
    nbit = (
        jnp.repeat(nm, 32, axis=1)[:, :L]
        >> jnp.asarray((j % 32).astype(np.uint32))[None, :]
    ) & jnp.uint32(1)
    return jnp.where(nbit == 1, jnp.uint8(4), base.astype(jnp.uint8))


@dataclasses.dataclass
class BatchResult:
    """Full per-fragment mapping outcome of one batch (n valid
    fragments) — the differential-test interface."""
    n: int
    labels: list[tuple[int, ...]]
    label_counts: np.ndarray
    mapped: np.ndarray          # (n,) bool
    num_joint: np.ndarray       # (n,) int32
    num_fwd: int
    num_rc: int
    unique_paired: np.ndarray   # (n,) bool
    frag_lens: np.ndarray       # (n,) int32
    per_read: list | None = None  # refimpl backend: per-fragment
    # ReadMapping records (carries joint hits for bias observation)
    seq_samples: np.ndarray | None = None  # device backend: per-fragment
    # 6-mer context sample (-1 = none), file order
    gc_hist: np.ndarray | None = None      # device backend: (101,) GC obs
    fmt_counts: np.ndarray | None = None   # (64,) observed-libtype counts
    # (formatID-indexed; mapped fragments only)
    num_compat: int = 0                    # mapped fragments whose label
    # came from library-compatible hits


@dataclasses.dataclass
class BatchStats:
    """Reduced outcome of one batch (fast path): scalar counters plus
    lazy pulls for the rarely-needed detail (FLD gate crossing, bias)."""
    n: int
    num_mapped: int
    sum_joint: int
    ub_hits: int
    num_fwd: int
    num_rc: int
    fld_count: int                 # unique-paired obs (< maxFragLen)
    fmt_counts: np.ndarray         # (64,) observed-libtype counts
    num_compat: int                # mapped fragments with compat labels
    fld_hist: object               # () -> np.ndarray (max_frag_len,)
    fld_details: object            # () -> (frag_lens, unique_paired)
    seq_samples_fn: object = None  # () -> (n,) int32 | None
    gc_hist_fn: object = None      # () -> (101,) int32 | None


def _bucket(n: int) -> int:
    # floor of 1024: every distinct bucket is a separate compiled
    # slice/gather graph, and on a tunneled device even a trivial
    # compile is a ~0.5-1s round trip paid mid-run.  The padding cost
    # is a few KB of extra D2H — noise next to a compile.
    b = 1024
    while b < n:
        b *= 2
    return b


def _scatter(base, idx, vals):
    out = np.array(base)
    out[idx] = vals
    return out


@partial(jax.jit, static_argnames=("w",))
def _gather_rows_w(mat, idx, *, w: int):
    """Gather label rows and truncate to the widest live label before
    the D2H pull — labels are usually <=8 wide while the slot matrix is
    4C wide, so this cuts the transfer ~16x."""
    return jnp.take(mat, idx, axis=0)[:, :w]


@partial(jax.jit, static_argnames=("u",))
def _slice_rows(mat, *, u: int):
    return mat[:u]


@partial(
    jax.jit,
    static_argnames=(
        "paired_end", "cand_cap", "max_read_occs", "allow_orphans",
        "allow_dovetail", "ignore_compat", "enforce_compat",
        "strict_intersect", "max_frag_len", "seq_on", "gc_on",
    ),
)
def _fused_tail(
    h1f, h1r, h2f, h2r, l1, l2, orient, strand, se_flags, bias_text,
    *,
    paired_end, cand_cap, max_read_occs, allow_orphans, allow_dovetail,
    ignore_compat, enforce_compat, strict_intersect, max_frag_len,
    seq_on, gc_on,
):
    """merge + collapse + reductions under ONE jit (one dispatch)."""
    out = merge_and_collapse(
        h1f, h1r, h2f, h2r, l1, l2, orient, strand, se_flags,
        paired_end=paired_end, cand_cap=cand_cap,
        max_read_occs=max_read_occs, allow_orphans=allow_orphans,
        allow_dovetail=allow_dovetail, ignore_compat=ignore_compat,
        enforce_compat=enforce_compat, strict_intersect=strict_intersect,
        return_slots=(seq_on or gc_on),
    )
    uniq, num_u = collapse_unique(
        out["h1"], out["h2"], out["mapped"], out["label_len"]
    )
    fl = out["frag_len"]
    sel = out["unique_paired"] & (fl < max_frag_len)
    fldhist = jnp.bincount(
        jnp.where(sel, fl, max_frag_len), length=max_frag_len + 1
    )[:max_frag_len].astype(jnp.int32)
    i32 = jnp.int32
    # observed-libtype histogram (formatID-indexed, 6-bit codec ->
    # 64 bins); unmapped fragments (fmt_id == -1) fall in the spill bin
    fmthist = jnp.bincount(
        jnp.where(out["mapped"], out["fmt_id"], 64), length=65
    )[:64].astype(i32)
    # scalars[0:8] are the batch counters; [8:72] the fmt histogram —
    # packed into one vector so the per-batch sync stays a single pull
    scalars = jnp.concatenate([jnp.stack([
        out["mapped"].sum().astype(i32),
        out["num_joint"].sum().astype(i32),
        (out["num_joint"] > 0).sum().astype(i32),
        out["num_fwd"].sum().astype(i32),
        out["num_rc"].sum().astype(i32),
        num_u.astype(i32),
        sel.sum().astype(i32),
        out["have_compat"].sum().astype(i32),
    ]), fmthist,
        # [72]: fragments whose kernel candidate set overflowed the
        # static capacity (drives the wide-capacity escalation pass)
        out["overflow"].sum().astype(i32)[None]])
    res = {
        "scalars": scalars,
        "fldhist": fldhist,
        "uniq": uniq,
        "label": out["label"],
        "label_len": out["label_len"],
        "mapped": out["mapped"],
        "num_joint": out["num_joint"],
        "unique_paired": out["unique_paired"],
        "frag_len": fl,
        "overflow": out["overflow"],
    }
    if seq_on or gc_on:
        from ..stats.bias import bias_observe_device

        ss, gh = bias_observe_device(
            out["slots"], bias_text, l1, l2, gc_on=gc_on, seq_on=seq_on
        )
        res["seq_samples"] = ss
        res["gc_hist"] = gh
    return res


class DeviceMapperBackend:
    def __init__(self, index: QuasiIndex, opts: QuantOpts):
        if index.big_sa:
            # 64-bit index (text >= 2^31 bases, or force_big_sa): global
            # positions ride int64 through the XLA kernel's gather path
            # (the reference's analog: the 64-bit RapMap index selected
            # by include/SailfishIndex.hpp:123-140).  Requires x64; the
            # Pallas kernel is int32-only, so big indexes route to the
            # XLA kernel.
            import jax as _jax

            if not _jax.config.jax_enable_x64:
                _jax.config.update("jax_enable_x64", True)
            if opts.kernel == "pallas":
                import logging

                logging.getLogger("sailfish_tpu").info(
                    "big_sa index: pallas kernel is int32-only, using "
                    "the XLA kernel"
                )
                opts = dataclasses.replace(opts, kernel="xla")
        self.opts = opts
        self._pe_steps = {}  # (format_id, uniform_len...) -> jitted step
        self.k = index.k
        self.prefix_bases = index.prefix_bases
        self._index = index
        self._pallas_text = None
        self._pallas_n_text = None
        self._pallas_filt_bits = None
        self._pallas_w16_bits = 0
        self._xla2_text = None
        self._xla2_filt_bits = 0
        if opts.kernel == "xla2" and index.kmer_ht is None:
            # xla2's presence sweep needs the k-mer table's Bloom keys
            opts = dataclasses.replace(opts, kernel="xla")
            self.opts = opts
        # SA indices and global text positions are int32 normally,
        # int64 for big_sa indexes (kernels derive dtypes from these)
        pdt = jnp.int64 if index.big_sa else jnp.int32
        self._pdt = pdt
        # the XLA kernel's device arrays are materialized LAZILY (first
        # _text_arg with kernel=xla): on the pallas path they would
        # otherwise double the index's HBM footprint for nothing —
        # at GENCODE scale that is multiple GB
        self._text_dev = None
        self.bias_text = None
        self._bias_flags = (False, False)
        if opts.bias_correct or opts.gc_bias_correct:
            from .. import dna as _dna

            gc_excl = np.zeros(index.text_len + 1, dtype=np.int32)
            np.cumsum(
                (index.codes == _dna.G) | (index.codes == _dna.C),
                out=gc_excl[1:],
            )
            pad = np.zeros(_PACK_PAD, dtype=np.uint32)
            self.bias_text = {
                "packed16": jnp.asarray(
                    np.concatenate([index.packed16, pad])
                ),
                "gc_excl": jnp.asarray(gc_excl),
                "txp_offsets": jnp.asarray(index.txp_offsets, pdt),
                "txp_lens": jnp.asarray(index.txp_lens, jnp.int32),
            }
            if opts.gc_bias_correct and opts.gc_samp_factor > 1:
                from ..stats.bias import build_sampled_gc

                sgc = build_sampled_gc(index, opts.gc_samp_factor)
                self.bias_text.update({
                    "sgc_step": jnp.float32(sgc["step"]),
                    "sgc_sc": jnp.asarray(sgc["sc"], jnp.float32),
                    "sgc_samp_off": jnp.asarray(sgc["samp_off"], jnp.int32),
                    "sgc_n_samp": jnp.asarray(sgc["n_samp"], jnp.int32),
                    "sgc_gc_frac_len": jnp.asarray(
                        sgc["gc_frac_len"], jnp.float32
                    ),
                    "sgc_last_regular": jnp.asarray(
                        sgc["last_regular"], jnp.int32
                    ),
                })
            self._bias_flags = (opts.bias_correct, opts.gc_bias_correct)
        self.use_hash = index.kmer_ht is not None
        self.ht_bits = 0
        self.ht_probes = 0
        if self.use_hash:
            ht = index.kmer_ht
            self.ht_bits = int(ht["ht_bits"])
            self.ht_probes = int(ht["max_probes"])

    @property
    def text(self) -> dict:
        """XLA-kernel index arrays, device-resident (built on first use)."""
        if self._text_dev is None:
            index = self._index
            pdt = self._pdt
            pad = np.zeros(_PACK_PAD, dtype=np.uint32)
            pad8 = np.zeros(_PACK_PAD, dtype=np.uint8)
            self._text_dev = {
                "sa": jnp.asarray(index.sa, pdt),
                "packed16": jnp.asarray(
                    np.concatenate([index.packed16, pad])
                ),
                "sep_dist": jnp.asarray(
                    np.concatenate([index.sep_dist, pad8])
                ),
                "table_lo": jnp.asarray(index.table_lo, pdt),
                "txp_of_pos": jnp.asarray(index.txp_of_pos, jnp.int32),
                "txp_offsets": jnp.asarray(index.txp_offsets, pdt),
            }
            if self.use_hash:
                ht = index.kmer_ht
                self._text_dev.update({
                    "ht_key0": jnp.asarray(ht["ht_key0"]),
                    "ht_key1": jnp.asarray(ht["ht_key1"]),
                    "ht_lo": jnp.asarray(ht["ht_lo"], pdt),
                    "ht_cnt": jnp.asarray(ht["ht_cnt"], jnp.int32),
                })
        return self._text_dev

    @text.setter
    def text(self, value) -> None:
        self._text_dev = value

    # ---- library-format scalars for the compat kernels ----
    def _fmt_args(self, expected: LibraryFormat):
        se_flags = (
            compatible_hit_single(expected, True, MateStatus.PAIRED_END_LEFT),
            compatible_hit_single(expected, False, MateStatus.PAIRED_END_LEFT),
            compatible_hit_single(expected, True, MateStatus.PAIRED_END_RIGHT),
            compatible_hit_single(expected, False, MateStatus.PAIRED_END_RIGHT),
            compatible_hit_single(expected, True, MateStatus.SINGLE_END),
            compatible_hit_single(expected, False, MateStatus.SINGLE_END),
        )
        return (
            jnp.int32(int(expected.orientation)),
            jnp.int32(int(expected.strandedness)),
            jnp.asarray(se_flags),
        )

    def _text_arg(self):
        """The index-side device arrays for the active kernel, passed as
        explicit jit ARGUMENTS (never closure-captured: captured device
        arrays are serialized into the HLO as constants, and a ~300MB
        index inside the program body overflows remote-compile request
        limits and bloats every compile)."""
        if self.opts.kernel == "xla2":
            if getattr(self, "_xla2_text", None) is None:
                from ..index.kmerhash import build_kmer_bloom

                # a second, larger presence filter: it lives in HBM (one
                # gather per (lane, position)), so ~16 bits/key buys a
                # ~1-2% false-positive rate — each fp costs the xla2
                # kernel one wasted probe round for that lane
                bloom = build_kmer_bloom(
                    self._index.kmer_ht, max_bits_log2=30, bits_per_key=16
                )
                self._xla2_filt_bits = int(bloom["filt_bits_log2"])
                t2 = dict(self.text)
                t2["filt_words"] = jnp.asarray(
                    bloom["filt_rows"].reshape(-1).view(np.uint32)
                )
                # row-fused bucket layout: [key0, key1, lo, cnt] per
                # entry so one probe costs ONE row gather instead of
                # three (int32-SA indexes only; big_sa lo doesn't fit
                # a u32 lane and routes to the split-array path)
                ht = self._index.kmer_ht
                if ht["ht_lo"].dtype == np.int32:
                    t2["ht_fused"] = jnp.asarray(np.stack(
                        [ht["ht_key0"].view(np.uint32),
                         ht["ht_key1"].view(np.uint32),
                         ht["ht_lo"].view(np.uint32),
                         ht["ht_cnt"].view(np.uint32)],
                        axis=-1,
                    ).reshape(ht["ht_key0"].shape[0], -1))
                    # the fused rows REPLACE the split table on device
                    # (keeping both doubles multi-GB HBM at GENCODE
                    # scale); kernels2 falls back when keys are absent
                    for dead in ("ht_key0", "ht_key1", "ht_cnt"):
                        t2.pop(dead, None)
                    t2["ht_lo"] = jnp.zeros(0, jnp.int32)  # dtype token
                # fused per-position candidate metadata: one row gather
                # per candidate instead of the sep_dist/txp_of_pos/
                # txp_offsets chain (int32 indexes only)
                if self._index.sa.dtype == np.int32:
                    i5 = self._index
                    t2["pos_meta"] = jnp.asarray(np.stack(
                        [i5.sep_dist.astype(np.int32),
                         i5.txp_of_pos,
                         i5.txp_offsets.astype(np.int32)[i5.txp_of_pos]],
                        axis=-1,
                    ))
                    # aligned text words: txt_align[a] == packed16[16a];
                    # the LCP fetches one contiguous slice + funnel
                    # shift instead of D strided gathers
                    t2["txt_align"] = jnp.asarray(np.ascontiguousarray(
                        np.concatenate([
                            i5.packed16,
                            np.zeros(_PACK_PAD, np.uint32),
                        ])[::16]
                    ))
                    for dead in ("sep_dist", "txp_of_pos", "packed16"):
                        t2.pop(dead, None)
                self._xla2_text = t2
            return self._xla2_text
        if self.opts.kernel == "pallas":
            xlong = getattr(self, "_xlong", False)
            if self._pallas_text is None:
                from .pallas_kernel import prepare_pallas_text

                pt = prepare_pallas_text(
                    self._index, self.opts.hit_capacity,
                    # xlong (129..256bp reads): 24-word pk verify rows
                    pk_words=(24 if xlong else 16),
                    # built images cached next to the on-disk index
                    # (host build costs tens of seconds at scale)
                    cache_dir=(os.path.join(self.opts.index_dir,
                                            "pallas_cache")
                               if self.opts.index_dir else None),
                )
                # n_text / filt_bits are STATIC parameters of the pallas
                # kernel; keep them out of the traced pytree (a traced
                # scalar can't be captured by the kernel body)
                self._pallas_n_text = pt.pop("n_text")
                self._pallas_filt_bits = pt.pop("filt_bits")
                self._pallas_w16_bits = pt.pop("w16_bits")
                self._pallas_filtxl_bits = pt.pop("filtxl_bits", 0)
                self._pallas_text = pt
            if xlong:
                # the xlong residual runs the exact XLA kernel in-graph
                # and needs its index arrays alongside the pallas ones
                return {**self._pallas_text, "xla": self.text}
            return self._pallas_text
        return self.text

    def _map_lanes(self, codes: np.ndarray, lens: np.ndarray,
                   uniform_len: int | None = None, text: dict | None = None,
                   packed=None):
        opts = self.opts
        scan_budget = opts.effective_scan_steps(codes.shape[1])
        if text is None:
            text = self._text_arg()
        if opts.kernel == "pallas":
            from .pallas_kernel import map_oriented_lanes_pallas

            ul = uniform_len
            if ul is None and isinstance(lens, np.ndarray):
                live = lens[lens > 0]
                ul = (int(live[0])
                      if live.size and (live == live[0]).all() else None)
            if getattr(self, "_xlong", False):
                from .xlong import map_oriented_lanes_xlong

                text_xla = text.get("xla") if "xla" in text else self.text
                pt = {kk: v for kk, v in text.items() if kk != "xla"}
                hits = map_oriented_lanes_xlong(
                    pt, text_xla,
                    jnp.asarray(codes), jnp.asarray(lens),
                    packed=packed,
                    k=self.k,
                    prefix_bases=self.prefix_bases,
                    cand_cap=opts.hit_capacity,
                    max_mmps=opts.max_mmps,
                    max_steps=scan_budget,
                    ht_bits=self.ht_bits,
                    ht_probes=self.ht_probes,
                    skip_jump=(opts.mmp_skip == "jump"),
                    uniform_len=ul,
                    n_text=self._pallas_n_text,
                    w16_bits=self._pallas_w16_bits,
                    filtxl_bits=self._pallas_filtxl_bits,
                    tuning=opts,
                )
                B = codes.shape[0]

                def halfx(d, sl):
                    return {kk: v[sl] for kk, v in d.items()
                            if kk != "num_mapped_loci"}

                return (halfx(hits, slice(0, B)),
                        halfx(hits, slice(B, 2 * B)))
            hits = map_oriented_lanes_pallas(
                text,
                jnp.asarray(codes), jnp.asarray(lens),
                packed=packed,
                k=self.k,
                cand_cap=opts.hit_capacity,
                max_mmps=opts.max_mmps,
                max_steps=scan_budget,
                ht_bits=self.ht_bits,
                ht_probes=self.ht_probes,
                skip_jump=(opts.mmp_skip == "jump"),
                interpret=(jax.default_backend() == "cpu"),
                uniform_len=ul,
                n_text=self._pallas_n_text,
                filt_bits=self._pallas_filt_bits,
                w16_bits=self._pallas_w16_bits,
                filtxl_bits=self._pallas_filtxl_bits,
                tuning=opts,
            )
        elif opts.kernel == "xla2":
            from .kernels2 import map_oriented_lanes_xla2

            lanes = make_oriented_lanes(
                jnp.asarray(codes), jnp.asarray(lens), self.prefix_bases
            )
            hits = map_oriented_lanes_xla2(
                text, lanes,
                k=self.k,
                cand_cap=opts.hit_capacity,
                max_mmps=opts.max_mmps,
                max_steps=scan_budget,
                ht_probes=self.ht_probes,
                ht_bits=self.ht_bits,
                skip_jump=(opts.mmp_skip == "jump"),
                filt_bits=self._xla2_filt_bits,
                sweep_win=opts.xla2_sweep_win,
            )
        else:
            lanes = make_oriented_lanes(
                jnp.asarray(codes), jnp.asarray(lens), self.prefix_bases
            )
            hits = map_oriented_lanes(
                text, lanes,
                k=self.k,
                prefix_bases=self.prefix_bases,
                cand_cap=opts.hit_capacity,
                max_mmps=opts.max_mmps,
                max_steps=scan_budget,
                use_hash=self.use_hash,
                ht_probes=self.ht_probes,
                ht_bits=self.ht_bits,
                skip_jump=(opts.mmp_skip == "jump"),
                scan_shrink=opts.scan_shrink,
            )
        B = codes.shape[0]

        def half(d, sl):
            return {k: v[sl] for k, v in d.items() if k != "num_mapped_loci"}

        return half(hits, slice(0, B)), half(hits, slice(B, 2 * B))

    def _pad_batch(self, codes, lens):
        B = self.opts.batch_size
        n = codes.shape[0]
        if n == B:
            return codes, lens
        pc = np.full((B, codes.shape[1]), 4, dtype=np.uint8)
        pc[:n] = codes
        pl = np.zeros(B, dtype=np.int32)
        pl[:n] = lens
        return pc, pl

    def _tail(self, hits1, hits2, l1, l2, expected, *, paired_end: bool,
              bias_text: dict | None = None):
        opts = self.opts
        orient, strand, se_flags = self._fmt_args(expected)
        seq_on, gc_on = self._bias_flags
        if bias_text is None:
            bias_text = self.bias_text if (seq_on or gc_on) else {}
        return _fused_tail(
            hits1[0], hits1[1], hits2[0], hits2[1], l1, l2,
            orient, strand, se_flags,
            bias_text,
            paired_end=paired_end,
            # per-orientation hit-block width; the sharded-index backend
            # widens it to D*C (one C-wide slab per index shard)
            cand_cap=getattr(self, "_tail_cap", opts.hit_capacity),
            max_read_occs=opts.max_read_occs,
            allow_orphans=opts.allow_orphans,
            allow_dovetail=opts.allow_dovetail,
            ignore_compat=opts.ignore_lib_compat,
            enforce_compat=opts.enforce_lib_compat,
            strict_intersect=opts.strict_intersect,
            max_frag_len=opts.max_frag_len,
            seq_on=seq_on, gc_on=gc_on,
        )

    def _pull_uniq(self, res):
        """Sync on the batch, then pull the compacted unique-class rows
        (bucketed so at most log2(B) slice graphs ever compile)."""
        scal = np.asarray(res["scalars"])
        U = int(scal[5])
        upad = min(_bucket(max(U, 1)), res["uniq"].shape[0])
        uniq = np.asarray(_slice_rows(res["uniq"], u=upad))[:U]
        uv = uniq.view(np.uint32)
        keys = (uv[:, 0].astype(np.uint64) << np.uint64(32)) | uv[:, 1]
        return scal, uniq, keys

    def _fetch_labels(self, res, rep_idx, rep_lens):
        """Exact label tuples for the given representative fragments."""
        U = len(rep_idx)
        if not U:
            return []
        upad = _bucket(U)
        idx = np.zeros(upad, dtype=np.int32)
        idx[:U] = rep_idx
        wmax = int(rep_lens.max())
        # exactly two reachable gather widths (8 / full label width):
        # an intermediate wmax mid-run must not compile a fresh
        # _gather_rows_w graph — a ~0.5-1s tunneled-compile stall —
        # and the warmup only exercises these two shapes
        w = 8 if wmax <= 8 else res["label"].shape[1]
        w = min(w, res["label"].shape[1])
        rows = np.asarray(
            _gather_rows_w(res["label"], jnp.asarray(idx), w=w)
        )[:U]
        # bulk int conversion (tolist) beats per-element int() ~10x
        rowlist = rows[:, :wmax].tolist()
        return [tuple(row[:ln]) for row, ln in zip(rowlist, rep_lens)]

    # Submission is async (jax dispatch); the finishers are the only
    # sync points.  submit_*/finish_batch* let the driver run a one-deep
    # pipeline: device maps batch n+1 while the host folds batch n.
    # The whole batch (map read1 + map read2 + fused tail) traces into
    # ONE jitted dispatch — each dispatch is a full round trip on a
    # tunneled device.
    @staticmethod
    def _uniform_len(lens: np.ndarray):
        live = lens[lens > 0]
        return (int(live[0])
                if live.size and (live == live[0]).all() else None)

    def _bias_text_arg(self):
        seq_on, gc_on = self._bias_flags
        return self.bias_text if (seq_on or gc_on) else {}

    def _pe_step(self, expected: LibraryFormat, ul1, ul2, L1, L2,
                 args=None):
        key = (expected.format_id(), ul1, ul2, L1, L2)
        fn = self._pe_steps.get(key)
        if fn is None:
            # mate fusion: when both mates share a padded width, map
            # them in ONE _map_lanes call (rows: [m1; m2] x [fwd; rc]).
            # Halves the per-step fixed costs (lane compaction, scan
            # phases, kernel launch, dispatch) AND halves the traced
            # mapping graph — the mapping subgraph appears once in the
            # fused step instead of twice, which cuts compile time.
            fuse = L1 == L2

            def step(text, bias_text, p1, n1, l1, p2, n2, l2):
                c1 = _unpack_reads(p1, n1, L1)
                c2 = _unpack_reads(p2, n2, L2)
                if fuse:
                    B = c1.shape[0]
                    cc = jnp.concatenate([c1, c2], axis=0)
                    ll = jnp.concatenate([l1, l2])
                    uf = ul1 if ul1 == ul2 else None
                    pk = (jnp.concatenate([p1, p2], axis=0),
                          jnp.concatenate([n1, n2], axis=0))
                    fw, rc = self._map_lanes(cc, ll, uniform_len=uf,
                                             text=text, packed=pk)

                    def part(d, sl):
                        return {k: v[sl] for k, v in d.items()}

                    h1 = (part(fw, slice(0, B)), part(rc, slice(0, B)))
                    h2 = (part(fw, slice(B, 2 * B)),
                          part(rc, slice(B, 2 * B)))
                else:
                    h1 = self._map_lanes(c1, l1, uniform_len=ul1,
                                         text=text, packed=(p1, n1))
                    h2 = self._map_lanes(c2, l2, uniform_len=ul2,
                                         text=text, packed=(p2, n2))
                return self._tail(h1, h2, l1, l2, expected,
                                  paired_end=True, bias_text=bias_text)

            fn = self._maybe_aot(("pe",) + key, jax.jit(step), args)
            self._pe_steps[key] = fn
        return fn

    # ---- cross-process executable cache (utils/aot.py) ----
    # On the tunneled axon backend the jax persistent compile cache is
    # write-only, so every process would otherwise pay a full remote
    # trace+compile of the fused step (minutes, tunnel-weather
    # dependent).  With concrete example args available at submit time
    # we AOT-compile instead and persist the EXECUTABLE; a later
    # process deserializes it in milliseconds.
    _aot_ok = True

    def _aot_statics(self):
        o = self.opts
        env = tuple(sorted(
            (k, v) for k, v in os.environ.items() if k.startswith("SF_")
        ))
        return (
            o.hit_capacity, o.hit_capacity_max, o.max_mmps,
            o.max_scan_steps, o.mmp_skip, o.kernel, o.scan_shrink,
            o.xla2_sweep_win, o.batch_size, o.use_fastpath, o.use_xscan,
            o.lane_screen, o.lane_compact, o.packed_lanes,
            o.filt_access, o.xscan_t, o.xscan_f, o.xscan_t1, o.xscan_p2,
            o.xscan_schedule, o.strict_intersect, o.allow_dovetail,
            o.allow_orphans, o.ignore_lib_compat, o.enforce_lib_compat,
            o.max_frag_len, o.num_bias_samples, o.gc_samp_factor,
            self._bias_flags, self.k, self.prefix_bases, self.ht_bits,
            self.ht_probes, self._pallas_n_text, self._pallas_filt_bits,
            self._pallas_w16_bits,
            getattr(self, "_pallas_filtxl_bits", None),
            getattr(self, "_xlong", False), env,
        )

    def _maybe_aot(self, tag_key, jfn, args):
        from ..utils import aot

        if args is None or not self._aot_ok or not aot.enabled():
            return jfn
        tag = "-".join(str(x) for x in tag_key)
        statics = self._aot_statics()
        comp = aot.load(tag, statics, args)
        if comp is None:
            comp = aot.compile_and_save(jfn, tag, statics, args)
        return comp if comp is not None else jfn

    def prefetch_pe(self, b1, b2):
        """Start the H2D transfer of a padded batch WITHOUT dispatching
        compute.  device_put returns immediately; the copy proceeds
        while the device works on the previous batch — on a tunneled
        chip the raw transfer is ~hundreds of ms per 64k batch, so
        hiding it behind the mapping kernel matters.  Reads travel
        2-bit packed (+N bitmask) and unpack on device.  Pass the
        result to submit_pe in place of (b1, b2)."""
        c1, l1 = self._pad_batch(b1.codes, b1.lens)
        c2, l2 = self._pad_batch(b2.codes, b2.lens)
        pw1, nm1 = _pack_reads(c1)
        pw2, nm2 = _pack_reads(c2)
        return {
            "dev": (jax.device_put(pw1), jax.device_put(nm1),
                    jax.device_put(l1),
                    jax.device_put(pw2), jax.device_put(nm2),
                    jax.device_put(l2)),
            "n": b1.count,
            "batches": (b1, b2),
            "ul": (self._uniform_len(l1), self._uniform_len(l2)),
            "L": (c1.shape[1], c2.shape[1]),
        }

    def _check_kernel_width(self, Lmax: int):
        """The pallas scan kernel handles reads <= WINR (128) bases;
        129..256 take the pure-XLA xlong fast path (map/xlong.py: same
        screen/fastpath/xscan pipeline, exact-XLA residual) with wider
        pk verify rows; only > 256 swaps to the plain XLA kernel.  A
        dynamic re-pad (io/fastq re-decodes when a longer read appears)
        can grow the batch width past a boundary mid-run; boundary
        crossings drop the traced steps (stale entries close over the
        old text layout) and re-prepare the pallas text."""
        import logging

        log = logging.getLogger("sailfish_tpu")
        if self.opts.kernel != "pallas":
            return
        if Lmax > 256:
            log.warning(
                "batch width %d exceeds the xlong path's 256bp limit; "
                "switching to the XLA kernel", Lmax,
            )
            self.opts = dataclasses.replace(self.opts, kernel="xla")
            self._pe_steps = {}
            return
        if Lmax > 128 and self.opts.max_scan_steps > 0 \
                and self.opts.max_scan_steps < Lmax - self.k + 1:
            # the xlong xscan is exact only with the full (unbounded)
            # scan budget; a bounded budget is a debug config — take
            # the XLA kernel, which honors it at any width
            log.warning(
                "batch width %d with a bounded scan budget (%d): "
                "switching to the XLA kernel", Lmax,
                self.opts.max_scan_steps,
            )
            self.opts = dataclasses.replace(self.opts, kernel="xla")
            self._pe_steps = {}
            return
        if Lmax > 128 and not getattr(self, "_xlong", False):
            self._xlong = True
            self._pe_steps = {}
            if self._pallas_text is not None:
                # rebuilt on next _text_arg with 24-word pk verify rows
                self._pallas_text = None
            if not self._esc_enabled():
                # xlong residual spills ride the overflow -> escalation
                # remap; without escalation they would be dropped.
                # Enable the remap pass at the base capacity (true
                # cnt > C overflows still drop, same as before).
                log.info(
                    "xlong (reads > 128bp): enabling the overflow "
                    "remap pass at --hitCapacity %d",
                    self.opts.hit_capacity,
                )
                self.opts = dataclasses.replace(
                    self.opts,
                    hit_capacity_max=self.opts.hit_capacity,
                )

    def submit_pe(self, b1, b2=None, expected: LibraryFormat = None):
        if isinstance(b1, dict) and "dev" in b1:  # prefetched
            pf = b1
            if expected is None:
                expected = b2
            p1, n1, l1, p2, n2, l2 = pf["dev"]
            n = pf["n"]
            ul1, ul2 = pf["ul"]
            L1, L2 = pf["L"]
            ctx = (*pf["batches"], expected)
        else:
            n = b1.count
            pc1, pl1 = self._pad_batch(b1.codes, b1.lens)
            pc2, pl2 = self._pad_batch(b2.codes, b2.lens)
            ul1, ul2 = self._uniform_len(pl1), self._uniform_len(pl2)
            L1, L2 = pc1.shape[1], pc2.shape[1]
            pw1, nm1 = _pack_reads(pc1)
            pw2, nm2 = _pack_reads(pc2)
            p1, n1, l1 = jnp.asarray(pw1), jnp.asarray(nm1), jnp.asarray(pl1)
            p2, n2, l2 = jnp.asarray(pw2), jnp.asarray(nm2), jnp.asarray(pl2)
            ctx = (b1, b2, expected)
        self._check_kernel_width(max(L1, L2))
        sargs = (self._text_arg(), self._bias_text_arg(),
                 p1, n1, l1, p2, n2, l2)
        res = self._pe_step(expected, ul1, ul2, L1, L2, args=sargs)(
            *sargs)
        return (res, n, ctx)

    def _se_step(self, expected: LibraryFormat, ul1, L1, args=None):
        key = (expected.format_id(), ul1, L1, "se")
        fn = self._pe_steps.get(key)
        if fn is None:
            def step(text, bias_text, p1, n1, l1):
                c1 = _unpack_reads(p1, n1, L1)
                h1 = self._map_lanes(c1, l1, uniform_len=ul1, text=text,
                                     packed=(p1, n1))
                return self._tail(h1, h1, l1, l1, expected,
                                  paired_end=False, bias_text=bias_text)

            fn = self._maybe_aot(("se",) + key[:-1], jax.jit(step), args)
            self._pe_steps[key] = fn
        return fn

    def submit_se(self, b, expected: LibraryFormat):
        n = b.count
        c1, l1 = self._pad_batch(b.codes, b.lens)
        self._check_kernel_width(c1.shape[1])
        pw1, nm1 = _pack_reads(c1)
        sargs = (self._text_arg(), self._bias_text_arg(),
                 jnp.asarray(pw1), jnp.asarray(nm1), jnp.asarray(l1))
        res = self._se_step(expected, self._uniform_len(l1),
                            c1.shape[1], args=sargs)(*sargs)
        return (res, n, (b, None, expected))

    # escalation (wide-capacity second pass): fragments whose candidate
    # set overflowed the kernel's static hit_capacity are gathered and
    # re-mapped at effective_hit_capacity() so the device honors the
    # full --maxReadOcc envelope on repetitive references (the reference
    # keeps unbounded per-seed hit vectors and only enforces maxReadOcc
    # on the joint set: src/SailfishQuantify.cpp:217,1143).  The wide
    # pass routes through the XLA kernel (capacity is a traced shape
    # there, and the rare wide shapes stay off the pallas hot path).
    _ESC_ROWS = 1024

    def _esc_xla_image_bytes(self) -> int:
        """Host-side size of the XLA-kernel index images the device
        wide pass would upload NEXT TO the Pallas images."""
        idx = self._index
        total = (idx.sa.nbytes + idx.packed16.nbytes
                 + idx.sep_dist.nbytes + idx.table_lo.nbytes
                 + idx.txp_of_pos.nbytes + idx.txp_offsets.nbytes)
        if idx.kmer_ht is not None:
            ht = idx.kmer_ht
            total += (ht["ht_key0"].nbytes + ht["ht_key1"].nbytes
                      + ht["ht_lo"].nbytes + ht["ht_cnt"].nbytes)
        return total

    def _esc_use_host(self) -> bool:
        """Auto policy for the wide pass: the device XLA route needs a
        SECOND multi-GB set of index images on the chip when the main
        kernel is Pallas — at GENCODE scale (150Mb text) the two image
        sets together exceed a v5e's HBM and CRASH the TPU worker
        (observed 2026-08-20).  When the duplicate images would not
        comfortably fit, route overflow fragments to the host oracle
        instead: zero device memory, identical semantics at the same
        effective capacity (refimpl applies effective_hit_capacity()),
        and the overflow population is tiny by construction."""
        mode = getattr(self.opts, "escalation_backend", "auto")
        if mode in ("host", "device"):
            return mode == "host"
        if self.opts.kernel != "pallas":
            return False          # XLA images already resident — shared
        seq_on, gc_on = self._bias_flags
        if seq_on or gc_on:
            return False          # oracle result carries no bias pulls
        try:
            import jax as _jax

            stats = _jax.devices()[0].memory_stats() or {}
            limit = int(stats.get("bytes_limit", 0))
        except Exception:
            limit = 0
        if limit <= 0:
            # v5e usable HBM (allocator reported 15.75G when the
            # GENCODE compile OOM'd); CPU tests report a real limit
            limit = int(15.75 * (1 << 30))
        pallas_b = sum(
            int(np.prod(v.shape)) * v.dtype.itemsize
            for v in (self._pallas_text or {}).values()
            if hasattr(v, "shape")
        )
        # 6GiB slack: lane/batch working arrays, the wide XLA kernel's
        # sweep/sort temporaries, allocator fragmentation.  The error
        # asymmetry is extreme — a wrong "device" CRASHES the TPU
        # worker (observed at 12.26GiB of images on a 15.75GiB chip),
        # a wrong "host" costs milliseconds — so err toward host.
        need = self._esc_xla_image_bytes() + pallas_b + (6 << 30)
        return need > limit

    def _esc_enabled(self) -> bool:
        # >= (not >): the xlong path enables a same-capacity remap pass
        # for its residual spills (exact for them; true cnt > C
        # overflows still come back overflowed and drop as before)
        return (self.opts.hit_capacity_max > 0
                and self.opts.hit_capacity_max >= self.opts.hit_capacity)

    def _esc_backend(self):
        if getattr(self, "_escb", None) is None:
            if self._esc_use_host():
                self._escb = _HostEscalationBackend(self._index, self.opts)
                import logging

                logging.getLogger("sailfish_tpu").info(
                    "escalation: host-oracle wide pass (duplicate XLA "
                    "index images would not fit device memory)"
                )
                return self._escb
            opts2 = dataclasses.replace(
                self.opts,
                hit_capacity=self.opts.effective_hit_capacity(),
                hit_capacity_max=0,
                kernel="xla",
                batch_size=self._ESC_ROWS,
            )
            esc = DeviceMapperBackend(self._index, opts2)
            # share the parent's device-resident index arrays (the
            # constructor's own copies are dropped here)
            esc.text = self.text
            esc.bias_text = self.bias_text
            self._escb = esc
        return self._escb

    def _esc_pull_overflow(self, res, scal, n):
        if not self._esc_enabled() or int(scal[72]) == 0:
            return None
        mask = np.asarray(res["overflow"])[:n]
        idx = np.nonzero(mask)[0]
        return idx if len(idx) else None

    def _esc_chunks(self, ectx, idx):
        """Yield (chunk_idx, finished sub-token) pairs over the overflow
        fragments, _ESC_ROWS at a time."""
        from ..io.fastq import FastqBatch

        b1, b2, expected = ectx
        esc = self._esc_backend()
        for s in range(0, len(idx), self._ESC_ROWS):
            ci = idx[s:s + self._ESC_ROWS]
            sb1 = FastqBatch(b1.codes[ci], b1.lens[ci])
            if b2 is not None:
                sb2 = FastqBatch(b2.codes[ci], b2.lens[ci])
                tok = esc.submit_pe(sb1, sb2, expected)
            else:
                tok = esc.submit_se(sb1, expected)
            yield ci, esc, tok

    def finish_batch_fast(self, token, acc) -> BatchStats:
        """Fold the batch's eq classes into `acc` (a hash-keyed
        accumulator) and return reduced counters.  Labels are fetched
        from device only for hash keys `acc` has never seen."""
        res, n, ectx = token
        scal, uniq, keys = self._pull_uniq(res)
        counts = uniq[:, 2].astype(np.int64)
        new = acc.add_hashed(keys, counts)
        if new.any():
            labels = self._fetch_labels(res, uniq[new, 3], uniq[new, 4])
            acc.register_new(keys[new], labels, counts[new])
        seq_on, gc_on = self._bias_flags
        bs = BatchStats(
            n=n,
            num_mapped=int(scal[0]),
            sum_joint=int(scal[1]),
            ub_hits=int(scal[2]),
            num_fwd=int(scal[3]),
            num_rc=int(scal[4]),
            fld_count=int(scal[6]),
            fmt_counts=scal[8:72].astype(np.int64),
            num_compat=int(scal[7]),
            fld_hist=lambda: np.asarray(res["fldhist"]).astype(np.int64),
            fld_details=lambda: (
                np.asarray(res["frag_len"])[:n],
                np.asarray(res["unique_paired"])[:n],
            ),
            seq_samples_fn=(
                (lambda: np.asarray(res["seq_samples"])[:n])
                if seq_on else None
            ),
            gc_hist_fn=(
                (lambda: np.asarray(res["gc_hist"])) if gc_on else None
            ),
        )
        idx = self._esc_pull_overflow(res, scal, n)
        if idx is not None:
            # overflow fragments were dropped by the main pass (zero
            # hits, zero counters); the wide pass supplies their whole
            # contribution, so merging is pure addition — except the
            # per-fragment detail closures, which scatter the sub-
            # batch's rows back into file order.
            for ci, esc, tok in self._esc_chunks(ectx, idx):
                sub = esc.finish_batch_fast(tok, acc)
                bs.num_mapped += sub.num_mapped
                bs.sum_joint += sub.sum_joint
                bs.ub_hits += sub.ub_hits
                bs.num_fwd += sub.num_fwd
                bs.num_rc += sub.num_rc
                bs.fld_count += sub.fld_count
                bs.fmt_counts = bs.fmt_counts + sub.fmt_counts
                bs.num_compat += sub.num_compat
                bs.fld_hist = (
                    lambda a=bs.fld_hist, b=sub.fld_hist: a() + b()
                )

                def _details(a=bs.fld_details, b=sub.fld_details, ci=ci):
                    fls, up = a()
                    sf, su = b()
                    fls = fls.copy()
                    up = up.copy()
                    fls[ci] = sf
                    up[ci] = su
                    return fls, up

                bs.fld_details = _details
                if seq_on:
                    bs.seq_samples_fn = (
                        lambda a=bs.seq_samples_fn, b=sub.seq_samples_fn,
                        ci=ci: _scatter(a(), ci, b())
                    )
                if gc_on:
                    bs.gc_hist_fn = (
                        lambda a=bs.gc_hist_fn, b=sub.gc_hist_fn: a() + b()
                    )
        return bs

    def finish_batch(self, token) -> BatchResult:
        """Full-detail finish (differential tests): exact labels for
        every class plus per-fragment stat vectors."""
        res, n, ectx = token
        scal, uniq, _ = self._pull_uniq(res)
        labels = self._fetch_labels(res, uniq[:, 3], uniq[:, 4])
        seq_on, gc_on = self._bias_flags
        br = BatchResult(
            n=n,
            labels=labels,
            label_counts=uniq[:, 2].astype(np.int64),
            mapped=np.asarray(res["mapped"])[:n],
            num_joint=np.asarray(res["num_joint"])[:n],
            num_fwd=int(scal[3]),
            num_rc=int(scal[4]),
            fmt_counts=scal[8:72].astype(np.int64),
            num_compat=int(scal[7]),
            unique_paired=np.asarray(res["unique_paired"])[:n],
            frag_lens=np.asarray(res["frag_len"])[:n],
            seq_samples=(np.asarray(res["seq_samples"])[:n]
                         if seq_on else None),
            gc_hist=(np.asarray(res["gc_hist"]) if gc_on else None),
        )
        idx = self._esc_pull_overflow(res, scal, n)
        if idx is not None:
            # numpy views of device arrays are read-only; own them
            # before scattering the wide pass's rows back in
            for f in ("mapped", "num_joint", "unique_paired",
                      "frag_lens", "seq_samples"):
                v = getattr(br, f)
                if v is not None:
                    setattr(br, f, np.array(v))
            lab = {t: int(c) for t, c in zip(br.labels, br.label_counts)}
            for ci, esc, tok in self._esc_chunks(ectx, idx):
                sub = esc.finish_batch(tok)
                for t, c in zip(sub.labels, sub.label_counts):
                    lab[t] = lab.get(t, 0) + int(c)
                br.mapped[ci] = sub.mapped
                br.num_joint[ci] = sub.num_joint
                br.num_fwd += sub.num_fwd
                br.num_rc += sub.num_rc
                br.fmt_counts = br.fmt_counts + sub.fmt_counts
                br.num_compat += sub.num_compat
                br.unique_paired[ci] = sub.unique_paired
                br.frag_lens[ci] = sub.frag_lens
                if seq_on:
                    br.seq_samples[ci] = sub.seq_samples
                if gc_on:
                    br.gc_hist = br.gc_hist + sub.gc_hist
            br.labels = list(lab.keys())
            br.label_counts = np.array(list(lab.values()), dtype=np.int64)
        return br

    def map_pe_batch(self, b1, b2, expected: LibraryFormat) -> BatchResult:
        return self.finish_batch(self.submit_pe(b1, b2, expected))

    def map_se_batch(self, b, expected: LibraryFormat) -> BatchResult:
        return self.finish_batch(self.submit_se(b, expected))


class _HostEscalationBackend:
    """Wide-capacity second pass on the HOST oracle (refimpl).

    The device wide pass routes through the XLA kernel, whose index
    images (sa / packed16 / sep_dist / ht_* / txp_of_pos ...) are a
    SECOND multi-GB device allocation next to the Pallas images.  At
    GENCODE scale (150Mb text: ~6-7GB XLA images + ~5-6GB Pallas
    images) the pair exceeds a v5e's 16GB HBM and crashes the TPU
    worker.  Overflow fragments are rare (candidate sets wider than
    hit_capacity), so mapping them on the numpy oracle — the
    differential reference itself, applying the same
    effective_hit_capacity() envelope (refimpl/mapper.py:97) — costs
    milliseconds per batch and zero device memory.  Selected by
    QuantOpts.escalation_backend ("host", or "auto" when the duplicate
    images would not fit; see DeviceMapperBackend._esc_use_host).

    Reference behavior preserved: unbounded candidate enumeration with
    maxReadOcc enforced on the joint set only
    (/root/reference/src/SailfishQuantify.cpp:217,1143).
    """

    def __init__(self, index: QuasiIndex, opts: QuantOpts):
        from ..quant import RefMapperBackend

        self.opts = opts
        self._rb = RefMapperBackend(index, opts)

    def submit_pe(self, b1, b2, expected):
        return self._rb.map_pe_batch(b1, b2, expected)

    def submit_se(self, b, expected):
        return self._rb.map_se_batch(b, expected)

    def finish_batch(self, token) -> BatchResult:
        return token

    def finish_batch_fast(self, token, acc) -> BatchStats:
        br = token
        acc.add_many(br.labels, br.label_counts)
        mf = self.opts.max_frag_len
        fl = np.asarray(br.frag_lens)
        up = np.asarray(br.unique_paired)
        sel = up & (fl < mf)
        return BatchStats(
            n=br.n,
            num_mapped=int(br.mapped.sum()),
            sum_joint=int(br.num_joint.sum()),
            ub_hits=int((br.num_joint > 0).sum()),
            num_fwd=int(br.num_fwd),
            num_rc=int(br.num_rc),
            fld_count=int(sel.sum()),
            fmt_counts=br.fmt_counts.astype(np.int64),
            num_compat=int(br.num_compat),
            fld_hist=lambda: np.bincount(
                fl[sel].astype(np.int64), minlength=mf)[:mf],
            fld_details=lambda: (fl, up),
        )
