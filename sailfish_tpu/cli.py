"""Command-line interface: ``sailfish_tpu {index, quant}``.

Flag surface mirrors the reference CLI (src/Sailfish.cpp:92-184 dispatch;
src/SailfishIndexer.cpp:66-237; src/SailfishQuantify.cpp:1066-1153),
with TPU-specific additions (--backend, --batchSize).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

from . import __version__
from .config import QuantOpts


def _setup_logging(output_dir: str | None = None) -> None:
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stderr)]
    if output_dir:
        log_dir = os.path.join(output_dir, "logs")
        os.makedirs(log_dir, exist_ok=True)
        handlers.append(
            logging.FileHandler(os.path.join(log_dir, "sailfish_quant.log"))
        )
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(name)s] %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


def _add_index_parser(sub):
    p = sub.add_parser("index", help="build a quasi-mapping index")
    p.add_argument("-t", "--transcripts", required=True, help="transcriptome FASTA")
    p.add_argument("-o", "--out", required=True, help="output index directory")
    p.add_argument("-k", "--kmerSize", type=int, default=31,
                   help="k-mer size (odd, <= 31)")
    p.add_argument("--prefixBases", type=int, default=0,
                   help="prefix-table width in bases (0 = auto)")
    p.add_argument("-f", "--force", action="store_true",
                   help="rebuild even if the index exists")
    p.add_argument("--indexShards", type=int, default=0,
                   help="stripe the index into D standalone shards over "
                        "contiguous transcript ranges; quant then maps "
                        "with the index spread across a D-device mesh "
                        "(for transcriptomes whose index exceeds one "
                        "chip's HBM)")
    return p


def _add_quant_parser(sub):
    p = sub.add_parser("quant", help="quantify a sample")
    p.add_argument("-i", "--index", required=True)
    # -l may repeat: each occurrence starts a new read library whose
    # following -1/-2/-r groups attach to it (ordered-argv semantics of
    # the reference extractReadLibraries, src/SailfishUtils.cpp:103-153)
    p.add_argument("-l", "--libType", required=True, action="append")
    p.add_argument("-1", "--mates1", nargs="+", action="append",
                   default=[])
    p.add_argument("-2", "--mates2", nargs="+", action="append",
                   default=[])
    p.add_argument("-r", "--unmatedReads", nargs="+", action="append",
                   default=[])
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-g", "--geneMap", default="")
    p.add_argument("--txpAggregationKey", default="gene_id")
    p.add_argument("--auxDir", default="aux")
    p.add_argument("--dumpEq", action="store_true")
    p.add_argument("--checkpointInterval", type=int, default=0,
                   help="write an eq-class checkpoint (plus FLD/counter "
                   "state) every N processed fragments (0 = off); resume "
                   "with --resumeFromEq")
    p.add_argument("--resumeFromEq", default="",
                   help="resume from an eq_classes.txt checkpoint (file "
                   "or quant output dir): skip mapping, re-run inference")
    p.add_argument("--biasCorrect", action="store_true")
    p.add_argument("--gcBiasCorrect", action="store_true")
    p.add_argument("--gcSizeSamp", type=int, default=1)
    p.add_argument("--gcSpeedSamp", type=int, default=1)
    p.add_argument("--strictIntersect", action="store_true")
    p.add_argument("--unsmoothedFLD", action="store_true")
    p.add_argument("--maxFragLen", type=int, default=1000)
    p.add_argument("--ignoreLibCompat", action="store_true")
    p.add_argument("--enforceLibCompat", action="store_true")
    p.add_argument("--allowDovetail", action="store_true")
    p.add_argument("--discardOrphans", action="store_true")
    p.add_argument("--numBiasSamples", type=int, default=1000000)
    p.add_argument("--numFragSamples", type=int, default=10000)
    p.add_argument("--fldMean", type=int, default=200)
    p.add_argument("--fldSD", type=int, default=80)
    p.add_argument("-w", "--maxReadOcc", type=int, default=200)
    p.add_argument("--noEffectiveLengthCorrection", action="store_true")
    p.add_argument("--useVBOpt", action="store_true")
    p.add_argument("--numGibbsSamples", type=int, default=0)
    p.add_argument("--numBootstraps", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-p", "--numThreads", type=int, default=4,
                   help="host-side IO/decode workers")
    p.add_argument("--numShards", type=int, default=1,
                   help="multi-host data parallelism: total number of "
                   "read shards.  WITHOUT --shardId this command "
                   "launches all N shard processes locally, merges "
                   "their eq classes, and runs inference once (the "
                   "single-command form).  On a real pod, run one "
                   "process per host with --shardId i --mapOnly, then "
                   "mergeeq + quant --resumeFromEq")
    p.add_argument("--shardId", type=int, default=-1,
                   help="this host's shard index in [0, numShards); "
                   "omit to auto-launch all shards locally")
    p.add_argument("--mapOnly", action="store_true",
                   help="stop after mapping: write the eq-class dump + "
                   "quant state, skip inference and outputs (the "
                   "per-shard half of a multi-host run)")
    # TPU-specific
    p.add_argument("--backend", choices=["device", "refimpl"], default="device")
    p.add_argument("--kernel", choices=["auto", "xla", "xla2", "pallas"],
                   default="auto",
                   help="device mapping kernel: auto (pallas on a TPU "
                   "backend with reads <= 128bp, xla otherwise), xla "
                   "(portable), xla2 (round-compacted vectorized scan) "
                   "or pallas (TPU hardware path; reads <= 128bp)")
    p.add_argument("--batchSize", type=int, default=65536)
    p.add_argument("--dtype", choices=["float32", "float64"], default="")
    p.add_argument("--hitCapacity", type=int, default=64,
                   help="static per-orientation candidate capacity of the "
                   "device kernels; reads above it are dropped like "
                   "--maxReadOcc (unless --hitCapacityMax escalates them)")
    p.add_argument("--hitCapacityMax", type=int, default=1024,
                   help="escalation capacity: fragments whose candidate "
                   "set overflows --hitCapacity are re-mapped through a "
                   "wide-capacity second pass (XLA kernel) at this "
                   "capacity (0 = off).  The default (1024) covers the measured "
                   "repeat-element envelope (docs/PARITY.md #2; 256 "
                   "dropped 5% of fragments straddling a 400-copy "
                   "repeat); sharded indexes disable escalation with a "
                   "warning")
    p.add_argument("--xla2SweepWin", type=int, default=0,
                   help="kernel=xla2 sweep strategy: 0 = precompute Bloom "
                   "presence for all positions; N>0 = on-demand windowed "
                   "sweep gathering presence only for the next N positions "
                   "each active lane faces (identical results)")
    p.add_argument("--scanShrink", type=int, default=1,
                   help=">1: compact active lanes between MMP-scan steps, "
                   "shrinking width by this factor per step (faster, "
                   "bounded per-batch step budget)")
    p.add_argument("--mmpSkip", choices=["jump", "nip"], default="nip",
                   help="MMP advance rule: nip = the RapMap-style overlap "
                   "re-probe (reference parity, default), jump = restart "
                   "past the mismatch (faster, diverges on error-bearing "
                   "reads; see FIDELITY.md)")
    # advanced fast-path tuning (kernel=pallas production path; every
    # combination is bit-identical to defaults — the fast paths punt
    # conservatively to the exact kernel)
    adv = p.add_argument_group(
        "advanced mapping tuning (bit-identical output; trades fast-path "
        "coverage against the residual-kernel share)")
    adv.add_argument("--noFastPath", action="store_true",
                     help="disable the clean-lane fast path")
    adv.add_argument("--noXscan", action="store_true",
                     help="disable the vectorized NIP-scan state machine "
                     "(all residual lanes go through the pallas kernel)")
    adv.add_argument("--noLaneScreen", action="store_true",
                     help="disable the 16-mer Bloom lane screen")
    adv.add_argument("--noLaneCompact", action="store_true",
                     help="disable live-lane compaction")
    adv.add_argument("--noPackedLanes", action="store_true",
                     help="build lanes from per-base codes instead of "
                     "the 2-bit H2D words")
    adv.add_argument("--xscanT", type=int, default=7,
                     help="xscan full-event budget per lane")
    adv.add_argument("--xscanF", type=int, default=4,
                     help="xscan candidate slots (<= 8)")
    adv.add_argument("--xscanT1", type=int, default=2,
                     help="xscan light phase-A event budget")
    adv.add_argument("--xscanP2", type=int, default=2,
                     help="xscan phase-B compacted-prefix divisor")
    adv.add_argument("--xscanSchedule", default="2:1,4:1,8:3",
                     help="xscan phase-B narrowing schedule "
                     "'div:steps,...'")
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        prog="sailfish_tpu",
        description=f"sailfish_tpu v{__version__} — TPU-native "
        "alignment-free transcript quantification",
    )
    parser.add_argument("-v", "--version", action="version",
                        version=f"sailfish_tpu {__version__}")
    parser.add_argument("--no-version-check", action="store_true",
                        help="accepted for CLI parity; this build never "
                        "phones home")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_index_parser(sub)
    _add_quant_parser(sub)
    sub.add_parser("sf", help="print the logo")  # easter-egg parity
    # (reference src/Sailfish.cpp:73-85)
    pm = sub.add_parser(
        "mergeeq",
        help="merge eq-class dumps from sharded quant runs into one",
    )
    pm.add_argument("dumps", nargs="+",
                    help="eq_classes.txt files or quant output dirs")
    pm.add_argument("-o", "--output", required=True,
                    help="merged eq_classes.txt path")
    args = parser.parse_args(argv)

    if args.command == "index":
        return _main_index(args)
    if args.command == "quant":
        return _main_quant(args, argv)
    if args.command == "mergeeq":
        return _main_mergeeq(args)
    if args.command == "sf":
        sys.stderr.write(r"""
   _____       _ _______      __      __
  / ___/____ _(_) / __(_)____/ /_    / /_____  __  __
  \__ \/ __ `/ / / /_/ / ___/ __ \  / __/ __ \/ / / /
 ___/ / /_/ / / / __/ (__  ) / / / / /_/ /_/ / /_/ /
/____/\__,_/_/_/_/ /_/____/_/ /_/  \__/ .___/\__,_/
                                     /_/
""")
        return 0
    return 1


def _main_mergeeq(args) -> int:
    _setup_logging()
    from .eqclass.io import find_eq_dump, merge_eq_dumps, write_eq_dump

    paths = [find_eq_dump(d) for d in args.dumps]
    names, eq = merge_eq_dumps(paths)
    write_eq_dump(args.output, names, eq)
    logging.getLogger("sailfish_tpu").info(
        "merged %d dumps -> %d classes (%d fragments)",
        len(paths), eq.num_classes, eq.total_count(),
    )
    return 0


def _main_index(args) -> int:
    _setup_logging()
    log = logging.getLogger("sailfish_tpu")
    from .index.builder import build_index_from_fasta, save_index

    if args.kmerSize % 2 == 0:
        log.error("k-mer size must be odd (got %d)", args.kmerSize)
        return 1
    header = os.path.join(args.out, "header.json")
    if os.path.exists(header) and not args.force:
        log.info("index already exists at %s; use --force to rebuild", args.out)
        return 0
    t0 = time.time()
    if args.indexShards > 1:
        import numpy as np

        from .index.builder import ShardedQuasiIndex, save_sharded_index
        from .io.fasta import read_fasta
        from .parallel.shardidx import build_index_shards

        names, seqs = read_fasta(args.transcripts)
        shards, ranges = build_index_shards(
            names, seqs, args.indexShards, k=args.kmerSize,
            prefix_bases=(args.prefixBases or 10),
        )
        sidx = ShardedQuasiIndex(
            shards=shards, ranges=ranges, names=list(names),
            txp_lens=np.concatenate([s.txp_lens for s in shards]),
            k=args.kmerSize, prefix_bases=shards[0].prefix_bases,
        )
        save_sharded_index(sidx, args.out)
        log.info(
            "built %d-shard index over %d transcripts (%d bases) in %.2fs",
            args.indexShards, sidx.num_transcripts, sidx.text_len,
            time.time() - t0,
        )
        return 0
    idx = build_index_from_fasta(
        args.transcripts, k=args.kmerSize, prefix_bases=args.prefixBases
    )
    save_index(idx, args.out)
    log.info(
        "built index over %d transcripts (%d bases) in %.2fs",
        idx.num_transcripts, idx.text_len, time.time() - t0,
    )
    return 0


def extract_read_libraries(argv: list[str]) -> list[dict]:
    """Ordered-argv read-library extraction (the reference's
    extractReadLibraries, src/SailfishUtils.cpp:103-153): every
    -l/--libType occurrence starts a new library; subsequent
    -1/-2/-r file groups attach to the most recent one."""
    flagmap = {
        "-l": "fmt", "--libType": "fmt",
        "-1": "m1", "--mates1": "m1",
        "-2": "m2", "--mates2": "m2",
        "-r": "um", "--unmatedReads": "um",
    }
    libs: list[dict] = []
    cur: dict | None = None
    i = 0
    while i < len(argv):
        tok = argv[i]
        inline = None
        if tok.startswith("--") and "=" in tok:
            tok, inline = tok.split("=", 1)
        key = flagmap.get(tok)
        if key == "fmt":
            if inline is None:
                i += 1
                inline = argv[i] if i < len(argv) else ""
            cur = {"fmt": inline, "m1": [], "m2": [], "um": []}
            libs.append(cur)
        elif key is not None:
            if cur is None:
                raise ValueError(
                    f"{tok} appears before any -l/--libType; each read "
                    "library must start with its libType")
            if inline is not None:
                cur[key].append(inline)
            else:
                while i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                    i += 1
                    cur[key].append(argv[i])
        i += 1
    return libs


def _flatten_read_args(args, argv):
    """Normalize the append-style -l/-1/-2/-r argparse results: returns
    (lib_type, mates1, mates2, unmated, libraries) where libraries is
    [] for the single-library form (back-compat QuantOpts fields) and
    the ordered per-library list otherwise."""
    libtypes = args.libType if isinstance(args.libType, list) else [args.libType]
    m1 = [f for grp in args.mates1 for f in grp]
    m2 = [f for grp in args.mates2 for f in grp]
    um = [f for grp in args.unmatedReads for f in grp]
    if len(libtypes) <= 1:
        return libtypes[0], m1, m2, um, []
    libs = extract_read_libraries(argv)
    if len(libs) != len(libtypes):
        raise ValueError(
            "could not associate read files with libTypes from the "
            "argument order")
    return libtypes[0], m1, m2, um, libs


def _main_quant(args, argv) -> int:
    _setup_logging(args.output)

    lib_type, m1, m2, um, libraries = _flatten_read_args(args, argv)
    # launcher re-serialization + cmd_info echo see flat values
    args.libType = lib_type if not libraries else [
        lib["fmt"] for lib in libraries
    ]
    args.mates1, args.mates2, args.unmatedReads = m1, m2, um
    args.read_libraries_ = libraries

    # single-command multi-host form: --numShards N without --shardId
    # launches the shard subprocesses, merges, and infers once
    if args.numShards > 1 and args.shardId < 0:
        from .parallel.launcher import run_sharded_quant

        ordered = [("command", "quant")] + [
            (k, v) for k, v in vars(args).items()
            if k not in ("command", "read_libraries_")
        ]
        return run_sharded_quant(args, ordered)
    if args.shardId < 0:
        args.shardId = 0

    import jax

    # persistent compile cache: quant re-runs (and every subprocess in
    # the test suite) skip minutes of kernel recompilation
    try:
        cache = os.environ.get(
            "SAILFISH_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "sailfish_tpu", "jaxcache"),
        )
        if cache:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    platform = jax.default_backend()
    dtype = args.dtype or ("float64" if platform == "cpu" else "float32")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    opts = QuantOpts(
        index_dir=args.index,
        output_dir=args.output,
        aux_dir=args.auxDir,
        lib_type=lib_type,
        mates1=m1,
        mates2=m2,
        unmated_reads=um,
        libraries=libraries,
        max_read_occs=args.maxReadOcc,
        strict_intersect=args.strictIntersect,
        allow_dovetail=args.allowDovetail,
        allow_orphans=not args.discardOrphans,
        ignore_lib_compat=args.ignoreLibCompat,
        enforce_lib_compat=args.enforceLibCompat,
        max_frag_len=args.maxFragLen,
        num_frag_samples=args.numFragSamples,
        fld_mean=args.fldMean,
        fld_sd=args.fldSD,
        use_unsmoothed_fld=args.unsmoothedFLD,
        no_effective_length_correction=args.noEffectiveLengthCorrection,
        bias_correct=args.biasCorrect,
        gc_bias_correct=args.gcBiasCorrect,
        num_bias_samples=args.numBiasSamples,
        gc_samp_factor=args.gcSizeSamp,
        pdf_samp_factor=args.gcSpeedSamp,
        use_vb_opt=args.useVBOpt,
        num_gibbs_samples=args.numGibbsSamples,
        num_bootstraps=args.numBootstraps,
        dump_eq=args.dumpEq,
        checkpoint_interval=args.checkpointInterval,
        resume_from_eq=args.resumeFromEq,
        gene_map=args.geneMap,
        txp_aggregation_key=args.txpAggregationKey,
        batch_size=args.batchSize,
        num_threads=args.numThreads,
        num_shards=args.numShards,
        shard_id=args.shardId,
        map_only=args.mapOnly,
        seed=args.seed,
        dtype=dtype,
        hit_capacity=args.hitCapacity,
        hit_capacity_max=args.hitCapacityMax,
        scan_shrink=args.scanShrink,
        mmp_skip=args.mmpSkip,
        kernel=args.kernel,
        xla2_sweep_win=args.xla2SweepWin,
        use_fastpath=not args.noFastPath,
        use_xscan=not args.noXscan,
        lane_screen=not args.noLaneScreen,
        lane_compact=not args.noLaneCompact,
        packed_lanes=not args.noPackedLanes,
        xscan_t=args.xscanT,
        xscan_f=args.xscanF,
        xscan_t1=args.xscanT1,
        xscan_p2=args.xscanP2,
        xscan_schedule=args.xscanSchedule,
    )

    # echo the ordered invocation like cmd_info.json (reference :1263-1277)
    ordered = [("command", "quant")] + [
        (k, v) for k, v in vars(args).items()
        if k not in ("command", "read_libraries_")
    ]

    from .quant import run_quant

    stats = run_quant(opts, backend=args.backend, ordered_opts=ordered)
    logging.getLogger("sailfish_tpu").info(
        "done: %s", json.dumps({
            k: v for k, v in stats.items()
            if isinstance(v, (int, float, str))
        })
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
