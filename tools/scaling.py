"""Multi-host scaling-efficiency measurement (BASELINE.md: >=80% at 2+
hosts).  Runs the SAME quantification sharded 1-way and N-way over real
FASTQ files and reports projected pod efficiency.

Shards run sequentially in one process (this box has ~4 cores; a real
pod gives every shard its own host), so per-shard wall clocks are
uncontended and pod wall clock is modeled as max_i(T_i):

    efficiency(N) = T_1 / (N * max_i T_i)

which also penalizes load imbalance exactly as a pod would.  The
mapping backend is the numpy oracle (refimpl) so times contain no jit
compile noise; what is being measured is the framework's sharding
overhead — shard-aware decode (skip, don't parse, foreign batches),
per-shard eq dumps, and the rank-0 merge.

Usage: JAX_PLATFORMS=cpu python tools/scaling.py [--reads N] [--shards N]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_fastq(path, mat):
    with open(path, "wb") as fh:
        for i, row in enumerate(mat):
            seq = BASES[row].tobytes()
            fh.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=20000)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--txps", type=int, default=200)
    args = ap.parse_args()

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.index.builder import build_index, save_index
    from sailfish_tpu.quant import run_quant

    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 4, 1200).astype(np.uint8)
            for _ in range(args.txps)]
    names = [f"t{i}" for i in range(args.txps)]
    idx = build_index(names, seqs, k=31)

    tmp = tempfile.mkdtemp(prefix="sf_scaling_")
    idx_dir = os.path.join(tmp, "idx")
    save_index(idx, idx_dir)

    # simulate PE reads
    n = args.reads
    readlen = 100
    lens = np.array([len(s) for s in seqs])
    offs = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    concat = np.concatenate(seqs)
    t = rng.integers(0, len(seqs), n)
    fl = np.minimum(rng.integers(150, 400, n), lens[t])
    p = (rng.random(n) * (lens[t] - fl + 1)).astype(np.int64)
    start = offs[t] + p
    m1 = concat[start[:, None] + np.arange(readlen)]
    m2 = (3 - concat[start[:, None] + (fl[:, None] - readlen)
                     + np.arange(readlen)][:, ::-1])
    r1 = os.path.join(tmp, "r1.fq")
    r2 = os.path.join(tmp, "r2.fq")
    write_fastq(r1, m1)
    write_fastq(r2, m2.astype(np.uint8))
    log(f"corpus: {args.txps} txps, {n} PE reads -> {tmp}")

    def run_shard(sid, nsh, out):
        opts = QuantOpts(
            index_dir=idx_dir, output_dir=out, lib_type="IU",
            mates1=[r1], mates2=[r2], batch_size=args.batch,
            num_shards=nsh, shard_id=sid, map_only=True, dump_eq=True,
        )
        stats = run_quant(opts, backend="refimpl")
        # the scaling quantity is the mapping phase (decode + skip-scan
        # + map + eq accumulation); index load is a per-host constant
        # amortized over run length on any real deployment
        return stats["map_seconds"], stats

    t1, s1 = run_shard(0, 1, os.path.join(tmp, "one"))
    log(f"1-shard: {t1:.2f}s, {s1['num_mapped']}/{s1['num_observed']} mapped")

    times = []
    mapped = 0
    observed = 0
    shard_dirs = []
    for sid in range(args.shards):
        out = os.path.join(tmp, f"s{sid}")
        shard_dirs.append(out)
        ti, si = run_shard(sid, args.shards, out)
        times.append(ti)
        mapped += si["num_mapped"]
        observed += si["num_observed"]
        log(f"shard {sid}/{args.shards}: {ti:.2f}s "
            f"({si['num_observed']} frags)")
    assert observed == s1["num_observed"], (observed, s1["num_observed"])
    assert mapped == s1["num_mapped"]

    # rank-0 merge cost (part of the sharded critical path)
    from sailfish_tpu.eqclass.io import find_eq_dump, merge_eq_dumps

    t0 = time.time()
    dumps = [find_eq_dump(d, "aux") for d in shard_dirs]
    _, eq = merge_eq_dumps(dumps)
    t_merge = time.time() - t0
    assert eq.total_count() == mapped

    t_max = max(times)
    eff = t1 / (args.shards * (t_max + t_merge))
    doc = {
        "metric": "scaling_efficiency",
        "shards": args.shards,
        "t_1shard_s": round(t1, 2),
        "t_shard_max_s": round(t_max, 2),
        "t_shard_mean_s": round(sum(times) / len(times), 2),
        "t_merge_s": round(t_merge, 2),
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.8, 4),
    }
    log(f"efficiency at {args.shards} shards: {eff:.1%} "
        f"(imbalance max/mean {t_max / (sum(times)/len(times)):.3f})")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
