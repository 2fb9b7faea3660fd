"""Single-command multi-host quantification launcher.

The reference scales with threads inside one process
(src/SailfishQuantify.cpp:1112 --numThreads); the TPU-native analog
scales with one PROCESS per host/chip, each mapping a round-robin shard
of the read batches (shard-aware decode: other shards' batches cost a
line scan, not a parse+encode+map — io/fastq.py), then a rank-0 merge
of eq-class dumps + counter/FLD state and ONE inference pass over the
merged classes.

`sailfish_tpu quant ... --numShards N` (without an explicit --shardId)
runs the whole flow on one machine: N shard subprocesses -> merge ->
inference -> final outputs in -o.  On a real multi-host pod, run the
same command per host with `--shardId i --mapOnly`, then merge with
`--resumeFromEq` (this module is exactly that recipe, automated).

Shard subprocesses default to the CPU backend unless SF_SHARD_PLATFORM
is set (e.g. to "axon"/"tpu" on real multi-chip hosts): a single-chip
dev box cannot grant the TPU to N processes at once.

Known divergence vs single-process runs: the fragment-length gate
(first --numFragSamples unique-paired fragments in FILE order,
src/SailfishQuantify.cpp:419-434) is applied per shard, so the merged
FLD can hold up to N x numFragSamples observations drawn round-robin
rather than exactly the file-order prefix (docs/PARITY.md #4).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

import numpy as np

log = logging.getLogger("sailfish_tpu")

# argparse dest -> CLI flag for re-serializing a parsed quant command
# into shard-subprocess argv (keep in sync with cli._add_quant_parser)
_FLAGS = {
    "index": "--index", "libType": "--libType", "mates1": "--mates1",
    "mates2": "--mates2", "unmatedReads": "--unmatedReads",
    "geneMap": "--geneMap", "txpAggregationKey": "--txpAggregationKey",
    "auxDir": "--auxDir", "dumpEq": "--dumpEq",
    "checkpointInterval": "--checkpointInterval",
    "resumeFromEq": "--resumeFromEq", "biasCorrect": "--biasCorrect",
    "gcBiasCorrect": "--gcBiasCorrect", "gcSizeSamp": "--gcSizeSamp",
    "gcSpeedSamp": "--gcSpeedSamp", "strictIntersect": "--strictIntersect",
    "unsmoothedFLD": "--unsmoothedFLD", "maxFragLen": "--maxFragLen",
    "ignoreLibCompat": "--ignoreLibCompat",
    "enforceLibCompat": "--enforceLibCompat",
    "allowDovetail": "--allowDovetail", "discardOrphans": "--discardOrphans",
    "numBiasSamples": "--numBiasSamples",
    "numFragSamples": "--numFragSamples", "fldMean": "--fldMean",
    "fldSD": "--fldSD", "maxReadOcc": "--maxReadOcc",
    "noEffectiveLengthCorrection": "--noEffectiveLengthCorrection",
    "useVBOpt": "--useVBOpt", "numGibbsSamples": "--numGibbsSamples",
    "numBootstraps": "--numBootstraps", "seed": "--seed",
    "numThreads": "--numThreads", "backend": "--backend",
    "kernel": "--kernel", "batchSize": "--batchSize", "dtype": "--dtype",
    "hitCapacity": "--hitCapacity", "scanShrink": "--scanShrink",
    "mmpSkip": "--mmpSkip",
}
_SKIP = {"command", "output", "numShards", "shardId", "mapOnly",
         "no_version_check"}


def _shard_argv(args, shard_dir: str, sid: int, n: int) -> list[str]:
    argv = [sys.executable, "-m", "sailfish_tpu.cli", "quant",
            "-o", shard_dir, "--numShards", str(n), "--shardId", str(sid),
            "--dumpEq", "--mapOnly"]
    lib_flags = {"libType", "mates1", "mates2", "unmatedReads"}
    libraries = getattr(args, "read_libraries_", None) or []
    if libraries:
        # multi-library: re-serialize in argv order so each shard's
        # ordered extraction reconstructs the same libraries
        for lib in libraries:
            argv.extend(["--libType", lib["fmt"]])
            for key, flag in (("m1", "--mates1"), ("m2", "--mates2"),
                              ("um", "--unmatedReads")):
                if lib[key]:
                    argv.append(flag)
                    argv.extend(str(x) for x in lib[key])
    for dest, flag in _FLAGS.items():
        v = getattr(args, dest, None)
        if dest in _SKIP or v in (None, "", [], False):
            continue
        if libraries and dest in lib_flags:
            continue
        if v is True:
            argv.append(flag)
        elif isinstance(v, list):
            argv.append(flag)
            argv.extend(str(x) for x in v)
        else:
            argv.extend([flag, str(v)])
    return argv


def _merge_states(paths: list[str], num_frag_samples: int) -> dict:
    keys = ("num_observed", "num_mapped", "num_frag_hits",
            "upper_bound_hits", "num_fwd", "num_rc")
    out = {k: 0 for k in keys}
    hist = None
    for p in paths:
        with open(p) as fh:
            doc = json.load(fh)
        for k in keys:
            out[k] += int(doc.get(k, 0))
        h = np.asarray(doc["fl_hist"], dtype=np.int64)
        hist = h if hist is None else hist + h
    obs = int(hist.sum()) if hist is not None else 0
    out["remaining_fl_ops"] = max(0, num_frag_samples - obs)
    out["fl_hist"] = [int(x) for x in (hist if hist is not None else [])]
    return out


def run_sharded_quant(args, ordered_opts) -> int:
    """Launch N shard subprocesses, merge their eq dumps + state, run
    inference once, and write final outputs into args.output."""
    n = args.numShards
    out_dir = args.output
    shards_root = os.path.join(out_dir, "_shards")
    os.makedirs(shards_root, exist_ok=True)

    env = dict(os.environ)
    platform = os.environ.get("SF_SHARD_PLATFORM", "cpu")
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""  # disable remote-TPU registration
    # SF_SHARD_CPU_PIN=1: pin shard i to core i (mod ncpu) — models a
    # pod where each shard owns its host's compute, so concurrent-shard
    # scaling measurements (tools/scaling_concurrent.py) aren't
    # confounded by XLA's per-process all-core thread pools
    pin = os.environ.get("SF_SHARD_CPU_PIN", "0") == "1"
    ncpu = os.cpu_count() or 1

    t0 = time.time()
    procs = []
    shard_dirs = []
    for sid in range(n):
        sdir = os.path.join(shards_root, f"shard{sid}")
        shard_dirs.append(sdir)
        argv = _shard_argv(args, sdir, sid, n)
        if pin:
            argv = ["taskset", "-c", str(sid % ncpu)] + argv
        log.info("launching shard %d/%d: %s", sid, n, " ".join(argv[4:]))
        procs.append(subprocess.Popen(argv, env=env))
    failed = []
    for sid, p in enumerate(procs):
        rc = p.wait()
        if rc != 0:
            failed.append(sid)
    if failed:
        raise RuntimeError(f"shards {failed} exited non-zero")
    t_map = time.time() - t0
    log.info("all %d shards finished mapping in %.2fs", n, t_map)

    # ---- rank-0 merge: eq dumps + counter/FLD state ----
    from ..eqclass.io import find_eq_dump, merge_eq_dumps, write_eq_dump

    aux = args.auxDir or "aux"
    dumps = [find_eq_dump(d, aux) for d in shard_dirs]
    names, eq = merge_eq_dumps(dumps)
    merged_aux = os.path.join(out_dir, aux)
    os.makedirs(merged_aux, exist_ok=True)
    write_eq_dump(os.path.join(merged_aux, "eq_classes.txt"), names, eq,
                  atomic=True)
    state = _merge_states(
        [os.path.join(os.path.dirname(d), "quant_state.json")
         for d in dumps],
        args.numFragSamples,
    )
    with open(os.path.join(merged_aux, "quant_state.json"), "w") as fh:
        json.dump(state, fh)
    log.info("merged %d shard dumps -> %d eq classes (%d fragments)",
             n, eq.num_classes, state["num_observed"])

    # ---- one inference pass over the merged classes ----
    from ..config import QuantOpts
    from ..quant import run_quant

    lib_type = args.libType
    if isinstance(lib_type, list):  # multi-library runs: first libType
        lib_type = lib_type[0]
    opts = QuantOpts(
        index_dir=args.index, output_dir=out_dir, aux_dir=aux,
        lib_type=lib_type, resume_from_eq=out_dir,
        max_frag_len=args.maxFragLen, num_frag_samples=args.numFragSamples,
        fld_mean=args.fldMean, fld_sd=args.fldSD,
        use_unsmoothed_fld=args.unsmoothedFLD,
        no_effective_length_correction=args.noEffectiveLengthCorrection,
        use_vb_opt=args.useVBOpt, num_gibbs_samples=args.numGibbsSamples,
        num_bootstraps=args.numBootstraps, dump_eq=args.dumpEq,
        gene_map=args.geneMap, txp_aggregation_key=args.txpAggregationKey,
        seed=args.seed, dtype=args.dtype or "float64",
    )
    stats = run_quant(opts, backend="device", ordered_opts=ordered_opts)
    log.info(
        "sharded quant done: %d shards, %d fragments mapped, %d classes",
        n, stats["num_mapped"], stats["num_eq_classes"],
    )
    return 0
