"""Quantification pipeline driver — the analog of mainQuantify
(reference src/SailfishQuantify.cpp:1047-1441).

Stages:
  1. load index, init experiment state
  2. stream read batches, quasi-map, accumulate equivalence classes,
     FLD histogram and counters
  3. effective lengths from the FLD (or prior fallback)
  4. collapsed EM/VBEM to convergence
  5. write quant.sf + aux outputs; optional bootstrap / Gibbs sampling;
     optional gene-level rollup
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time

import numpy as np

from .config import QuantOpts
from .eqclass.classes import EqClassAccumulator
from .index.builder import QuasiIndex, load_index
from .infer.em import run_em
from .io.fastq import iter_fastq_batches, iter_paired_fastq_batches
from .libformat import LibraryFormat, ReadType, parse_library_format
from .output.genemap import generate_gene_level_estimates
from .output.writers import QuantWriter
from .stats.fld import effective_lengths_from_fld

log = logging.getLogger("sailfish_tpu")


@dataclasses.dataclass
class ExperimentState:
    """Analog of ReadExperiment (include/ReadExperiment.hpp:35-258)."""
    num_observed: int = 0
    num_mapped: int = 0
    num_frag_hits: int = 0
    upper_bound_hits: int = 0
    num_fwd: int = 0
    num_rc: int = 0
    remaining_fl_ops: int = 0
    fl_hist: np.ndarray | None = None
    # observed-libtype counters, formatID-indexed (the accounting the
    # reference's ReadLibrary::libTypeCounts_ declares but never feeds:
    # include/ReadLibrary.hpp:17-236)
    lib_fmt_counts: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(64, dtype=np.int64)
    )
    num_compat: int = 0


class RefMapperBackend:
    """Python/numpy mapping backend (refimpl) — correctness oracle.
    Produces the same BatchResult aggregates as the device backend."""

    def __init__(self, index: QuasiIndex, opts: QuantOpts):
        from .refimpl.mapper import RefMapper

        self.mapper = RefMapper(index, opts)

    def _wrap(self, results):
        from .map.pipeline import BatchResult

        label_counts: dict[tuple[int, ...], int] = {}
        for rm in results:
            if rm.label is not None:
                label_counts[rm.label] = label_counts.get(rm.label, 0) + 1
        fmt_counts = np.zeros(64, dtype=np.int64)
        num_compat = 0
        for rm in results:
            if rm.fmt_id >= 0:
                fmt_counts[rm.fmt_id] += 1
            num_compat += rm.compat
        return BatchResult(
            n=len(results),
            labels=list(label_counts.keys()),
            label_counts=np.array(list(label_counts.values()), dtype=np.int64),
            mapped=np.array([rm.label is not None for rm in results]),
            num_joint=np.array([rm.num_joint_hits for rm in results]),
            num_fwd=sum(rm.num_fwd for rm in results if rm.label is not None),
            num_rc=sum(rm.num_rc for rm in results if rm.label is not None),
            unique_paired=np.array([rm.unique_paired for rm in results]),
            frag_lens=np.array([rm.frag_len for rm in results], dtype=np.int64),
            per_read=results,
            fmt_counts=fmt_counts,
            num_compat=num_compat,
        )

    def map_pe_batch(self, b1, b2, expected: LibraryFormat):
        out = []
        for i in range(b1.count):
            r1 = b1.codes[i, : b1.lens[i]]
            r2 = b2.codes[i, : b2.lens[i]]
            out.append(self.mapper.map_fragment_pe(r1, r2, expected))
        return self._wrap(out)

    def map_se_batch(self, b, expected: LibraryFormat):
        out = []
        for i in range(b.count):
            r = b.codes[i, : b.lens[i]]
            out.append(self.mapper.map_fragment_se(r, expected))
        return self._wrap(out)

    # synchronous submit/finish (pipeline interface parity)
    def submit_pe(self, b1, b2, expected):
        return self.map_pe_batch(b1, b2, expected)

    def submit_se(self, b, expected):
        return self.map_se_batch(b, expected)

    def finish_batch(self, token):
        return token


def _accumulate_stats(bs, state: ExperimentState, max_frag_len: int):
    """Fold one BatchStats (device fast path) into the experiment state.
    Eq classes were already folded by finish_batch_fast; the FLD first-N
    gate normally consumes the device histogram wholesale and only pulls
    per-fragment detail for the one batch that crosses the N cap (exact
    file-order replay of src/SailfishQuantify.cpp:419-434)."""
    state.num_observed += bs.n
    state.num_frag_hits += bs.sum_joint
    state.upper_bound_hits += bs.ub_hits
    state.num_mapped += bs.num_mapped
    state.num_fwd += bs.num_fwd
    state.num_rc += bs.num_rc
    state.lib_fmt_counts += bs.fmt_counts
    state.num_compat += bs.num_compat
    if state.remaining_fl_ops > 0 and bs.fld_count:
        if bs.fld_count <= state.remaining_fl_ops:
            state.fl_hist += bs.fld_hist()
            state.remaining_fl_ops -= bs.fld_count
        else:
            fls, up = bs.fld_details()
            fls = fls[up]
            fls = fls[fls < max_frag_len][: state.remaining_fl_ops]
            if len(fls):
                state.fl_hist += np.bincount(fls, minlength=max_frag_len)
                state.remaining_fl_ops -= len(fls)


def _accumulate(br, state: ExperimentState, acc: EqClassAccumulator,
                max_frag_len: int):
    """Fold one BatchResult into the experiment state.  The FLD gating
    replays the reference's first-N-unique-paired-fragments rule in file
    order (src/SailfishQuantify.cpp:419-434)."""
    state.num_observed += br.n
    state.num_frag_hits += int(br.num_joint.sum())
    state.upper_bound_hits += int((br.num_joint > 0).sum())
    state.num_mapped += int(br.mapped.sum())
    state.num_fwd += br.num_fwd
    state.num_rc += br.num_rc
    if br.fmt_counts is not None:
        state.lib_fmt_counts += br.fmt_counts
    state.num_compat += br.num_compat
    acc.add_many(br.labels, br.label_counts)
    if state.remaining_fl_ops > 0:
        fls = br.frag_lens[br.unique_paired]
        fls = fls[fls < max_frag_len][: state.remaining_fl_ops]
        if len(fls):
            state.fl_hist += np.bincount(fls, minlength=max_frag_len)
            state.remaining_fl_ops -= len(fls)


def _write_quant_state(aux_path: str, state: ExperimentState) -> None:
    """Persist the non-eq-class half of a checkpoint (counters + FLD
    histogram) next to the eq dump, atomically.  With it a resume
    recovers the real fragment-length distribution instead of the prior
    fallback (the reference's disabled loadEquivClasses path could not:
    src/SailfishQuantify.cpp:1444-1495)."""
    doc = {
        "num_observed": int(state.num_observed),
        "num_mapped": int(state.num_mapped),
        "num_frag_hits": int(state.num_frag_hits),
        "upper_bound_hits": int(state.upper_bound_hits),
        "num_fwd": int(state.num_fwd),
        "num_rc": int(state.num_rc),
        "remaining_fl_ops": int(state.remaining_fl_ops),
        "fl_hist": [int(x) for x in state.fl_hist],
        "lib_fmt_counts": [int(x) for x in state.lib_fmt_counts],
        "num_compat": int(state.num_compat),
    }
    tmp = os.path.join(aux_path, "quant_state.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(aux_path, "quant_state.json"))


def _restore_quant_state(path: str, state: ExperimentState,
                         max_frag_len: int) -> None:
    with open(path) as fh:
        doc = json.load(fh)
    state.num_observed = int(doc["num_observed"])
    state.num_mapped = int(doc["num_mapped"])
    state.num_frag_hits = int(doc["num_frag_hits"])
    state.upper_bound_hits = int(doc["upper_bound_hits"])
    state.num_fwd = int(doc.get("num_fwd", 0))
    state.num_rc = int(doc.get("num_rc", 0))
    state.remaining_fl_ops = int(doc["remaining_fl_ops"])
    fc = np.asarray(doc.get("lib_fmt_counts", np.zeros(64)), dtype=np.int64)
    state.lib_fmt_counts = np.zeros(64, dtype=np.int64)
    state.lib_fmt_counts[: min(len(fc), 64)] = fc[:64]
    state.num_compat = int(doc.get("num_compat", 0))
    hist = np.asarray(doc["fl_hist"], dtype=np.int64)
    fl = np.zeros(max_frag_len, dtype=np.int64)
    n = min(len(hist), max_frag_len)
    fl[:n] = hist[:n]
    state.fl_hist = fl


def make_backend(index: QuasiIndex, opts: QuantOpts, backend: str):
    from .index.builder import ShardedQuasiIndex

    if isinstance(index, ShardedQuasiIndex):
        if backend != "device":
            raise ValueError(
                "a sharded index maps on the device mesh only "
                "(--backend device)"
            )
        from .map.sharded import ShardedMapperBackend

        return ShardedMapperBackend(index, opts)
    if backend == "refimpl":
        return RefMapperBackend(index, opts)
    if backend == "device":
        from .map.pipeline import DeviceMapperBackend

        return DeviceMapperBackend(index, opts)
    raise ValueError(f"unknown mapping backend: {backend}")


def run_quant(opts: QuantOpts, backend: str = "device",
              ordered_opts: list | None = None) -> dict:
    t_start = time.time()
    start_time = time.strftime("%a %b %d %H:%M:%S %Y")
    # ordered read libraries (reference extractReadLibraries,
    # src/SailfishUtils.cpp:103-153): each carries its own libType and
    # file groups; all feed one shared eq-class/FLD/bias state, like the
    # reference's sequential per-library processing loop
    libs = opts.read_libraries()
    lib_fmts = [parse_library_format(lib["fmt"]) for lib in libs]
    paired_flags = [f.type == ReadType.PAIRED_END for f in lib_fmts]
    paired = any(paired_flags)
    if not opts.resume_from_eq:
        for lib, pf in zip(libs, paired_flags):
            if pf and (not lib["m1"] or not lib["m2"]):
                raise ValueError(
                    "paired-end libType requires --mates1/--mates2")
            if not pf and not lib["um"]:
                raise ValueError(
                    "single-end libType requires --unmatedReads")
            if pf and len(lib["m1"]) != len(lib["m2"]):
                raise ValueError(
                    "--mates1 and --mates2 must list the same number "
                    "of files per library")
    if not (0 <= opts.shard_id < opts.num_shards):
        raise ValueError(
            f"shard_id {opts.shard_id} out of range for "
            f"{opts.num_shards} shards"
        )
    if opts.num_gibbs_samples > 0 and opts.num_bootstraps > 0:
        raise ValueError(
            "cannot perform both Gibbs sampling and bootstrapping; choose one"
        )
    if opts.bias_correct and opts.gc_bias_correct:
        raise ValueError(
            "enabling both sequence-specific and fragment GC bias correction "
            "simultaneously is not supported"
        )
    if opts.gc_bias_correct and not all(paired_flags):
        log.warning("fragment GC bias correction requires paired-end input; disabling")
        opts.gc_bias_correct = False

    log.info("loading index from %s", opts.index_dir)
    t_idx0 = time.time()
    index = load_index(opts.index_dir)
    t_index = time.time() - t_idx0
    names = index.names
    ref_lens = index.txp_lens.astype(np.int64)
    num_txps = len(names)

    writer = QuantWriter(opts.output_dir, opts.aux_dir)
    writer.write_cmd_info(ordered_opts or [])

    state = ExperimentState(
        remaining_fl_ops=opts.num_frag_samples,
        fl_hist=np.zeros(opts.max_frag_len, dtype=np.int64),
    )

    if opts.resume_from_eq:
        # checkpoint resume: inference + outputs from an eq-class dump
        # (the FLD cannot be recovered from the dump, so effective
        # lengths use the prior fallback — like the reference's disabled
        # loadEquivClasses path, src/SailfishQuantify.cpp:1444-1495)
        from .eqclass.io import find_eq_dump, read_eq_classes

        dump = find_eq_dump(opts.resume_from_eq, opts.aux_dir)
        log.info("resuming from eq-class checkpoint %s", dump)
        dump_names, eq = read_eq_classes(dump)
        if dump_names != names:
            raise ValueError(
                "eq-class dump transcript names do not match the index"
            )
        state_path = os.path.join(os.path.dirname(dump), "quant_state.json")
        if os.path.isfile(state_path):
            # full checkpoint: counters + FLD histogram survive the resume
            _restore_quant_state(state_path, state, opts.max_frag_len)
            log.info(
                "restored quant state (%d fragments, %d FLD observations)",
                state.num_observed,
                opts.num_frag_samples - state.remaining_fl_ops,
            )
        else:
            # bare dump (e.g. mergeeq output): counts only, prior FLD
            total = eq.total_count()
            state.num_observed = total
            state.num_mapped = total
            state.num_frag_hits = total
            state.upper_bound_hits = total
        return _infer_and_write(
            opts, index, names, ref_lens, num_txps, writer, state, eq,
            bias_state=None, start_time=start_time, t_start=t_start,
            t_map=0.0, t_index=t_index,
        )

    if opts.kernel == "auto":
        # resolve the mapping kernel for the actual backend + inputs:
        # the pallas hardware path wins ~11x over the XLA kernels on a
        # real TPU (2026-08-18 v5e race: 724ms vs 8,260ms per mate-call)
        # but handles reads <= 128bp only; everything else takes the
        # portable XLA kernel.  Streams are spooled here so the probe
        # doesn't consume them (the mapping loop re-materializes the
        # same paths as a no-op).
        import jax

        kern = "xla"
        if backend == "device" and jax.default_backend() == "tpu" \
                and not getattr(index, "big_sa", False):
            files = []
            for lib in libs:
                for key in ("m1", "m2", "um"):
                    lib[key] = [_materialize_stream(f) for f in lib[key]]
                    files.extend(lib[key])
            # <= 128bp: pallas scan kernel; 129..256bp: the pure-XLA
            # xlong fast path (screen + fastpath + xscan + exact-XLA
            # residual; map/xlong.py) — the pipeline routes by batch
            # width, both under kernel="pallas"
            if max(_probe_max_len(f) for f in files) <= 256:
                kern = "pallas"
        opts = dataclasses.replace(opts, kernel=kern)
        log.info("kernel auto -> %s", kern)
    mapper = make_backend(index, opts, backend)
    # device backend: reduced-stats fast path, eq classes keyed by the
    # 64-bit label hash with labels fetched once per distinct class
    use_fast = hasattr(mapper, "finish_batch_fast")
    if use_fast:
        from .eqclass.classes import HashedEqClassAccumulator

        acc = HashedEqClassAccumulator()
    else:
        acc = EqClassAccumulator()

    # bias model observations (device backend observes on-device; the
    # refimpl backend replays the reference's per-hit loop)
    bias_state = None
    if opts.bias_correct or opts.gc_bias_correct:
        from .stats.bias import BiasState

        bias_state = BiasState(opts)

    # One-deep pipeline: the device maps batch n+1 while the host folds
    # batch n (jax dispatch is async; finish_batch is the sync point).
    t_map0 = time.time()
    pending = None  # (token, observe_args)

    progress_every = 500_000  # reference progress cadence (:440-447)
    next_progress = progress_every
    next_ckpt = (
        opts.checkpoint_interval if opts.checkpoint_interval > 0 else None
    )
    aux_path = os.path.join(opts.output_dir, opts.aux_dir)

    def fold(pending):
        nonlocal next_progress, next_ckpt
        token, obs = pending
        if use_fast:
            bs = mapper.finish_batch_fast(token, acc)
            _accumulate_stats(bs, state, opts.max_frag_len)
            br = None
            if bias_state is not None:
                import types

                br = types.SimpleNamespace(
                    per_read=None,
                    seq_samples=(bs.seq_samples_fn()
                                 if bs.seq_samples_fn else None),
                    gc_hist=bs.gc_hist_fn() if bs.gc_hist_fn else None,
                )
        else:
            br = mapper.finish_batch(token)
            _accumulate(br, state, acc, opts.max_frag_len)
        if bias_state is not None:
            if obs[1] is not None:
                bias_state.observe_batch(index, obs[0], obs[1], br)
            else:
                bias_state.observe_batch_se(index, obs[0], br)
        if state.num_observed >= next_progress:
            next_progress += progress_every
            log.info(
                "processed %d fragments | hits: %d, hits per frag: %.2f",
                state.num_observed, state.num_frag_hits,
                state.num_frag_hits / max(1, state.num_observed),
            )
        if next_ckpt is not None and state.num_observed >= next_ckpt:
            next_ckpt = state.num_observed + opts.checkpoint_interval
            from .eqclass.io import write_eq_dump

            os.makedirs(aux_path, exist_ok=True)
            write_eq_dump(
                os.path.join(aux_path, "eq_classes.txt"), names,
                acc.finish(), atomic=True,
            )
            _write_quant_state(aux_path, state)
            log.info(
                "checkpoint: %d fragments, %d eq classes",
                state.num_observed, len(acc),
            )

    # multi-host data parallelism (SURVEY §2.4): round-robin batches
    # over shards, skipped INSIDE the decoder (other shards' batches
    # cost a line scan, not a parse+encode+map); each shard dumps eq
    # classes, rank 0 merges + resumes (see parallel/launcher.py for
    # the single-command form)
    shard = (opts.shard_id, opts.num_shards)
    use_prefetch = hasattr(mapper, "prefetch_pe")
    for lib, expected_l, pf_lib in zip(libs, lib_fmts, paired_flags):
        if pf_lib:
            for f1, f2 in zip(lib["m1"], lib["m2"]):
                f1 = _materialize_stream(f1)
                f2 = _materialize_stream(f2)
                ml = max(_probe_max_len(f1), _probe_max_len(f2))
                pf = None  # (prefetched-device-batch, observe_args)
                for b1, b2 in iter_paired_fastq_batches(
                    f1, f2, opts.batch_size, max_len=ml, shard=shard,
                    decode_threads=opts.num_threads,
                ):
                    if not use_prefetch:
                        token = mapper.submit_pe(b1, b2, expected_l)
                        if pending is not None:
                            fold(pending)
                        pending = (token, (b1, b2))
                        continue
                    # submit the batch whose H2D already ran under the
                    # previous compute, then start this batch's transfer
                    # under the submitted compute (the raw upload is
                    # hundreds of ms on a tunneled chip)
                    if pf is not None:
                        token = mapper.submit_pe(pf[0], expected_l)
                        nxt = (mapper.prefetch_pe(b1, b2), (b1, b2))
                        if pending is not None:
                            fold(pending)
                        pending = (token, pf[1])
                        pf = nxt
                    else:
                        pf = (mapper.prefetch_pe(b1, b2), (b1, b2))
                if pf is not None:
                    token = mapper.submit_pe(pf[0], expected_l)
                    if pending is not None:
                        fold(pending)
                    pending = (token, pf[1])
        else:
            for f in lib["um"]:
                f = _materialize_stream(f)
                for b in iter_fastq_batches(
                    f, opts.batch_size, max_len=_probe_max_len(f),
                    shard=shard
                ):
                    token = mapper.submit_se(b, expected_l)
                    if pending is not None:
                        fold(pending)
                    pending = (token, (b, None))
    if pending is not None:
        fold(pending)
    t_map = time.time() - t_map0
    log.info(
        "mapped %d/%d fragments (%.2f%%) in %.2fs (%.0f reads/s)",
        state.num_mapped, state.num_observed,
        100.0 * state.num_mapped / max(1, state.num_observed),
        t_map, state.num_observed / max(t_map, 1e-9),
    )

    eq = acc.finish()
    log.info("computed %d rich equivalence classes", eq.num_classes)

    if opts.map_only:
        # per-shard half of a multi-host run: persist the eq classes and
        # the counter/FLD state, skip inference (rank 0 merges + infers)
        from .eqclass.io import write_eq_dump

        os.makedirs(aux_path, exist_ok=True)
        write_eq_dump(
            os.path.join(aux_path, "eq_classes.txt"), names, eq,
            atomic=True,
        )
        _write_quant_state(aux_path, state)
        log.info(
            "mapOnly: wrote %d eq classes + state for %d fragments",
            eq.num_classes, state.num_observed,
        )
        return {
            "num_observed": state.num_observed,
            "num_mapped": state.num_mapped,
            "mapping_rate": state.num_mapped / max(1, state.num_observed),
            "num_eq_classes": eq.num_classes,
            "em_iterations": 0,
            "map_seconds": t_map,
            "total_seconds": time.time() - t_start,
        }

    return _infer_and_write(
        opts, index, names, ref_lens, num_txps, writer, state, eq,
        bias_state=bias_state, start_time=start_time, t_start=t_start,
        t_map=t_map, t_index=t_index, paired=paired,
    )


def _infer_and_write(opts, index, names, ref_lens, num_txps, writer, state,
                     eq, *, bias_state, start_time, t_start, t_map,
                     t_index=0.0, paired=True):
    """Shared inference + output tail of the pipeline (also the resume
    path's entry)."""
    # ---- effective lengths (src/SailfishQuantify.cpp:954-992) ----
    num_fld_obs = opts.num_frag_samples - state.remaining_fl_ops
    if opts.no_effective_length_correction:
        eff_lens = ref_lens.astype(np.float64)
        fld_hist = state.fl_hist.astype(np.int32)
    else:
        eff_lens, fld_hist = effective_lengths_from_fld(
            ref_lens,
            state.fl_hist,
            num_observed=num_fld_obs,
            num_required=opts.num_frag_samples,
            fld_mean=opts.fld_mean,
            fld_sd=opts.fld_sd,
            max_frag_len=opts.max_frag_len,
            use_unsmoothed=opts.use_unsmoothed_fld,
            paired_end=paired,
        )

    if opts.dump_eq:
        writer.write_equiv_counts(names, eq)
        # sibling state file -> a --resumeFromEq of this dump recovers
        # the real FLD and counters (not the prior fallback)
        _write_quant_state(writer.aux_path, state)

    # ---- EM (+ optional bias-corrected effective length refresh) ----
    t_em0 = time.time()
    if bias_state is not None and eq.num_classes > 0:
        from .stats.bias import run_em_with_bias

        em, eff_lens = run_em_with_bias(
            eq, eff_lens, ref_lens, index, bias_state, state, opts
        )
    else:
        em = run_em(
            eq,
            eff_lens,
            total_mapped=float(state.num_mapped),
            num_txps=num_txps,
            use_vbem=opts.use_vb_opt,
            rel_diff_tol=opts.em_tolerance,
            max_iter=opts.em_max_iter,
            dtype=opts.dtype,
        )
    t_em = time.time() - t_em0
    log.info(
        "EM finished: %d iterations in %.2fs (max rel diff %.4g)",
        em.num_iterations, t_em, em.max_rel_diff,
    )

    writer.write_abundances(
        names, ref_lens, eff_lens, em.alphas, float(state.num_mapped),
        no_eff_length_correction=opts.no_effective_length_correction,
    )

    expected_name = ";".join(
        parse_library_format(lib["fmt"]).name
        for lib in opts.read_libraries()
    )
    writer.write_lib_format_counts(
        expected_name, state.lib_fmt_counts, state.num_compat,
        state.num_mapped, state.num_observed,
    )
    if state.num_mapped and not opts.ignore_lib_compat:
        compat_frac = state.num_compat / state.num_mapped
        if compat_frac < 0.95:
            top = int(np.argmax(state.lib_fmt_counts))
            from .libformat import LibraryFormat as _LF

            log.warning(
                "only %.1f%% of mapped fragments were consistent with "
                "the expected library type (%s); the most common "
                "observed format was %s — double-check the -l/--libType "
                "argument (see lib_format_counts.json)",
                100.0 * compat_frac, expected_name, _LF.from_id(top).name,
            )

    rng = np.random.default_rng(opts.seed)
    from .stats.fld import EmpiricalDistribution

    emp = EmpiricalDistribution(
        np.arange(len(fld_hist), dtype=np.int64), fld_hist.astype(np.int64)
    )
    writer.write_meta(
        names=names,
        fld_hist=fld_hist,
        num_processed=state.num_observed,
        num_mapped=state.num_mapped,
        num_bootstraps=opts.num_bootstraps,
        num_gibbs_samples=opts.num_gibbs_samples,
        bias_correct=opts.bias_correct,
        start_time=start_time,
        fld_realized=emp.realize(rng),
        observed_seq_bias=(
            bias_state.read_bias_counts if bias_state is not None else None
        ),
        expected_seq_bias=(
            bias_state.expected_seq_bias if bias_state is not None else None
        ),
        observed_gc=(bias_state.observed_gc if bias_state is not None else None),
        expected_gc=(bias_state.expected_gc if bias_state is not None else None),
        timings={
            "index_load_seconds": round(t_index, 3),
            "mapping_seconds": round(t_map, 3),
            "inference_seconds": round(t_em, 3),
            "reads_per_sec": round(
                state.num_observed / max(t_map, 1e-9), 1
            ) if t_map else 0.0,
        },
    )

    if opts.num_gibbs_samples > 0 and eq.num_classes > 0:
        from .infer.gibbs import run_gibbs

        log.info("starting Gibbs sampler (%d samples)", opts.num_gibbs_samples)
        for sample in run_gibbs(
            eq, eff_lens, em.alphas, num_txps,
            num_samples=opts.num_gibbs_samples,
            total_mapped=float(state.num_mapped),
            seed=opts.seed,
        ):
            writer.write_bootstrap(np.asarray(sample, dtype=np.int32))
        log.info("finished Gibbs sampler")
    elif opts.num_bootstraps > 0 and eq.num_classes > 0:
        from .infer.bootstrap import run_bootstraps

        log.info("gathering %d bootstrap samples", opts.num_bootstraps)
        for alphas in run_bootstraps(
            eq, eff_lens, num_txps,
            num_bootstraps=opts.num_bootstraps,
            use_vbem=opts.use_vb_opt,
            rel_diff_tol=opts.em_tolerance,
            max_iter=opts.em_max_iter,
            seed=opts.seed,
            dtype=opts.dtype,
        ):
            writer.write_bootstrap(np.asarray(alphas, dtype=np.float64))
        log.info("finished bootstraps")
    writer.close()

    if opts.gene_map:
        generate_gene_level_estimates(
            opts.gene_map, opts.output_dir, opts.txp_aggregation_key
        )

    return {
        "num_observed": state.num_observed,
        "num_mapped": state.num_mapped,
        "mapping_rate": state.num_mapped / max(1, state.num_observed),
        "num_eq_classes": eq.num_classes,
        "em_iterations": em.num_iterations,
        "eff_lens": eff_lens,
        "alphas": em.alphas,
        "eq": eq,
        "names": names,
        "map_seconds": t_map,
        "em_seconds": t_em,
        "total_seconds": time.time() - t_start,
    }


def _materialize_stream(path: str) -> str:
    """Named pipes / process substitution (the reference accepts these,
    include/ReadLibrary.hpp:182-187) cannot be probed-then-reopened or
    restarted for a dynamic re-pad; spool such inputs to a temp file
    once so the normal multi-pass machinery applies unchanged."""
    import shutil
    import stat as _stat
    import tempfile

    try:
        mode = os.stat(path).st_mode
    except OSError:
        return path
    if not (_stat.S_ISFIFO(mode) or _stat.S_ISCHR(mode)):
        return path
    fd, spool = tempfile.mkstemp(prefix="sailfish_stream_",
                                 suffix=".fastq")
    log.info("spooling non-seekable input %s to %s", path, spool)
    with open(path, "rb") as src, os.fdopen(fd, "wb") as dst:
        shutil.copyfileobj(src, dst, 1 << 20)
    return spool


def _probe_max_len(path: str, probe_reads: int = 1024) -> int:
    """Static read length for the batch shape: probe the first few reads
    and round up to a multiple of 8 (padding is masked everywhere)."""
    from .io.fastq import _iter_fastq_seq_blocks

    m = 0
    for block in _iter_fastq_seq_blocks(path, probe_reads):
        m = max(m, max(len(s) for s in block))
        break
    return max(8, (m + 7) // 8 * 8)
