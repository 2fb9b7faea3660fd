"""Device mapping backend: host orchestration of the batched kernels.

Per batch: encode oriented lanes -> map_oriented_lanes (read1, read2) ->
merge_and_collapse -> collapse_batch, then a small D2H transfer:
per-fragment stat vectors plus ONLY the unique label rows of the batch
(gathered on device with bucketed padding to bound recompiles).  The
host merges (label -> count) into the EqClassAccumulator dict keyed by
the exact label bytes, so the 64-bit on-device label hash only has to be
collision-free within a batch for counting, and any cross-batch
collision is harmless.
"""

from __future__ import annotations

import dataclasses
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
from .pair import collapse_batch, merge_and_collapse

_PACK_PAD = 512  # slack past text end for packed-word gathers


@dataclasses.dataclass
class BatchResult:
    """Aggregated mapping outcome of one batch (n valid fragments)."""
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


def _bucket(n: int) -> int:
    b = 64
    while b < n:
        b *= 2
    return b


@jax.jit
def _gather_rows(mat, idx):
    return jnp.take(mat, idx, axis=0)


@partial(jax.jit, static_argnames=("w",))
def _gather_rows_w(mat, idx, *, w: int):
    """Gather label rows and truncate to the widest live label before
    the D2H pull — labels are usually <=8 wide while the slot matrix is
    4C wide, so this cuts the transfer ~16x."""
    return jnp.take(mat, idx, axis=0)[:, :w]


@jax.jit
def _pack_stats(out):
    """Pack per-fragment stats into one (B, 7) int32 matrix so the host
    pulls a single array per batch (tunnel roundtrips are expensive)."""
    return jnp.stack(
        [
            out["mapped"].astype(jnp.int32),
            out["num_joint"].astype(jnp.int32),
            out["num_fwd"].astype(jnp.int32),
            out["num_rc"].astype(jnp.int32),
            out["unique_paired"].astype(jnp.int32),
            out["frag_len"].astype(jnp.int32),
            out["label_len"].astype(jnp.int32),
        ],
        axis=1,
    )


@jax.jit
def _pack_collapse(is_first, group_count, order):
    return jnp.stack(
        [is_first.astype(jnp.int32), group_count.astype(jnp.int32), order],
        axis=1,
    )


class DeviceMapperBackend:
    def __init__(self, index: QuasiIndex, opts: QuantOpts):
        if index.big_sa:
            raise NotImplementedError(
                "64-bit suffix arrays are not yet supported on the device "
                "path; use --backend refimpl (index sharding lands with the "
                "multi-host path)"
            )
        self.opts = opts
        self.k = index.k
        self.prefix_bases = index.prefix_bases
        self._index = index
        self._pallas_text = None
        pad = np.zeros(_PACK_PAD, dtype=np.uint32)
        pad8 = np.zeros(_PACK_PAD, dtype=np.uint8)
        self.text = {
            "sa": jnp.asarray(index.sa, jnp.int32),
            "packed16": jnp.asarray(np.concatenate([index.packed16, pad])),
            "sep_dist": jnp.asarray(
                np.concatenate([index.sep_dist, pad8])
            ),
            "table_lo": jnp.asarray(index.table_lo, jnp.int32),
            "txp_of_pos": jnp.asarray(index.txp_of_pos, jnp.int32),
            "txp_offsets": jnp.asarray(index.txp_offsets, jnp.int32),
        }
        self.bias_text = None
        self._bias_flags = (False, False)
        if opts.bias_correct or opts.gc_bias_correct:
            from .. import dna as _dna

            gc_excl = np.zeros(index.text_len + 1, dtype=np.int32)
            np.cumsum(
                (index.codes == _dna.G) | (index.codes == _dna.C),
                out=gc_excl[1:],
            )
            self.bias_text = {
                "packed16": self.text["packed16"],
                "gc_excl": jnp.asarray(gc_excl),
                "txp_offsets": self.text["txp_offsets"],
                "txp_lens": jnp.asarray(index.txp_lens, jnp.int32),
            }
            self._bias_flags = (opts.bias_correct, opts.gc_bias_correct)
        self.use_hash = index.kmer_ht is not None
        self.ht_bits = 0
        self.ht_probes = 0
        if self.use_hash:
            ht = index.kmer_ht
            self.text.update({
                "ht_key0": jnp.asarray(ht["ht_key0"]),
                "ht_key1": jnp.asarray(ht["ht_key1"]),
                "ht_lo": jnp.asarray(ht["ht_lo"], jnp.int32),
                "ht_cnt": jnp.asarray(ht["ht_cnt"], jnp.int32),
            })
            self.ht_bits = int(ht["ht_bits"])
            self.ht_probes = int(ht["max_probes"])

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

    def _map_lanes(self, codes: np.ndarray, lens: np.ndarray):
        opts = self.opts
        if opts.kernel == "pallas":
            from .pallas_kernel import map_oriented_lanes_pallas

            if self._pallas_text is None:
                from .pallas_kernel import prepare_pallas_text

                self._pallas_text = prepare_pallas_text(
                    self._index, opts.hit_capacity
                )
            hits = map_oriented_lanes_pallas(
                self._pallas_text,
                jnp.asarray(codes), jnp.asarray(lens),
                k=self.k,
                cand_cap=opts.hit_capacity,
                max_mmps=opts.max_mmps,
                max_steps=opts.max_scan_steps,
                ht_bits=self.ht_bits,
                ht_probes=self.ht_probes,
                interpret=(jax.default_backend() == "cpu"),
            )
        else:
            lanes = make_oriented_lanes(
                jnp.asarray(codes), jnp.asarray(lens), self.prefix_bases
            )
            hits = map_oriented_lanes(
                self.text, lanes,
                k=self.k,
                prefix_bases=self.prefix_bases,
                cand_cap=opts.hit_capacity,
                max_mmps=opts.max_mmps,
                max_steps=opts.max_scan_steps,
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

    def _finish(self, out, n: int, lens1=None, lens2=None) -> BatchResult:
        seq_samples = gc_hist = None
        if self.bias_text is not None and "slots" in out:
            from ..stats.bias import bias_observe_device

            seq_on, gc_on = self._bias_flags
            ss, gh = bias_observe_device(
                out["slots"], self.bias_text, lens1, lens2,
                gc_on=gc_on, seq_on=seq_on,
            )
            seq_samples = np.asarray(ss)[:n]
            gc_hist = np.asarray(gh)
        cb = _pack_collapse(
            *collapse_batch(out["h1"], out["h2"], out["mapped"])
        )
        stats = np.asarray(_pack_stats(out))     # one D2H pull
        cb = np.asarray(cb)                      # one D2H pull
        is_first = cb[:, 0].astype(bool)
        group_count = cb[:, 1]
        order = cb[:, 2]
        label_len = stats[:, 6]

        rep_pos = np.nonzero(is_first)[0]
        rep_idx = order[rep_pos]
        counts = group_count[rep_pos]
        U = len(rep_idx)
        labels: list[tuple[int, ...]] = []
        if U:
            upad = _bucket(U)
            idx = np.zeros(upad, dtype=np.int32)
            idx[:U] = rep_idx
            rep_lens = label_len[rep_idx]
            wmax = int(rep_lens.max())
            w = min(_bucket(max(wmax, 1)) if wmax > 8 else 8,
                    out["label"].shape[1])
            rows = np.asarray(
                _gather_rows_w(out["label"], jnp.asarray(idx), w=w)
            )[:U]
            # bulk int conversion (tolist) beats per-element int() ~10x
            rowlist = rows[:, :wmax].tolist()
            labels = [
                tuple(row[:ln]) for row, ln in zip(rowlist, rep_lens)
            ]

        return BatchResult(
            n=n,
            labels=labels,
            label_counts=counts,
            mapped=stats[:n, 0].astype(bool),
            num_joint=stats[:n, 1],
            num_fwd=int(stats[:n, 2].sum()),
            num_rc=int(stats[:n, 3].sum()),
            unique_paired=stats[:n, 4].astype(bool),
            frag_lens=stats[:n, 5],
            seq_samples=seq_samples,
            gc_hist=gc_hist,
        )

    # Submission is async (jax dispatch); _finish is the only sync
    # point.  submit_pe/finish_batch let the driver run a one-deep
    # pipeline: device maps batch n+1 while the host folds batch n.
    def submit_pe(self, b1, b2, expected: LibraryFormat):
        opts = self.opts
        n = b1.count
        c1, l1 = self._pad_batch(b1.codes, b1.lens)
        c2, l2 = self._pad_batch(b2.codes, b2.lens)
        h1f, h1r = self._map_lanes(c1, l1)
        h2f, h2r = self._map_lanes(c2, l2)
        orient, strand, se_flags = self._fmt_args(expected)
        out = merge_and_collapse(
            h1f, h1r, h2f, h2r,
            jnp.asarray(l1), jnp.asarray(l2),
            orient, strand, se_flags,
            paired_end=True,
            cand_cap=opts.hit_capacity,
            max_read_occs=opts.max_read_occs,
            allow_orphans=opts.allow_orphans,
            allow_dovetail=opts.allow_dovetail,
            ignore_compat=opts.ignore_lib_compat,
            enforce_compat=opts.enforce_lib_compat,
            return_slots=self.bias_text is not None,
        )
        return (out, n, jnp.asarray(l1), jnp.asarray(l2))

    def finish_batch(self, token) -> BatchResult:
        out, n, l1, l2 = token
        return self._finish(out, n, l1, l2)

    def map_pe_batch(self, b1, b2, expected: LibraryFormat) -> BatchResult:
        return self.finish_batch(self.submit_pe(b1, b2, expected))

    def submit_se(self, b, expected: LibraryFormat):
        opts = self.opts
        n = b.count
        c1, l1 = self._pad_batch(b.codes, b.lens)
        h1f, h1r = self._map_lanes(c1, l1)
        orient, strand, se_flags = self._fmt_args(expected)
        out = merge_and_collapse(
            h1f, h1r, h1f, h1r,
            jnp.asarray(l1), jnp.asarray(l1),
            orient, strand, se_flags,
            paired_end=False,
            cand_cap=opts.hit_capacity,
            max_read_occs=opts.max_read_occs,
            allow_orphans=opts.allow_orphans,
            allow_dovetail=opts.allow_dovetail,
            ignore_compat=opts.ignore_lib_compat,
            enforce_compat=opts.enforce_lib_compat,
            return_slots=self.bias_text is not None,
        )
        return (out, n, jnp.asarray(l1), jnp.asarray(l1))

    def map_se_batch(self, b, expected: LibraryFormat) -> BatchResult:
        return self.finish_batch(self.submit_se(b, expected))
