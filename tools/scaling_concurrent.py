"""MEASURED concurrent scaling (VERDICT r2 item #5 — replaces the
modeled tools/scaling.py number): run the single-command launcher with
N truly concurrent shard subprocesses and wall-clock the WHOLE flow
(shard mapping + merge + final inference), against a 1-shard baseline.

Pod model: on a real pod each shard owns its host's compute, so both
configs pin each process to one core (SF_SHARD_CPU_PIN for the shards,
taskset for the baseline).  Efficiency = T1 / (N * TN).

Outputs one JSON line (SCALING_r03.json schema):
  {"metric": "scaling_efficiency_measured", "value": eff, ...}

Env knobs: SC_SHARDS (4), SC_READS (80000), SC_TXPS (2000),
SC_BATCH (8192), SC_DIR (/tmp/scaling_r03).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SC_SHARDS", 4))
READS = int(os.environ.get("SC_READS", 80_000))
TXPS = int(os.environ.get("SC_TXPS", 2000))
TXP_LEN = 800
READ_LEN = 100
BATCH = int(os.environ.get("SC_BATCH", 8192))
ROOT = os.environ.get("SC_DIR", "/tmp/scaling_r03")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BASES = "ACGT"


def build_world():
    os.makedirs(ROOT, exist_ok=True)
    fa = os.path.join(ROOT, "txps.fasta")
    r1 = os.path.join(ROOT, "r1.fastq")
    r2 = os.path.join(ROOT, "r2.fastq")
    if all(os.path.exists(p) for p in (fa, r1, r2)):
        log(f"reusing world in {ROOT}")
        return fa, r1, r2
    rng = np.random.default_rng(42)
    seqs = [rng.integers(0, 4, TXP_LEN).astype(np.uint8)
            for _ in range(TXPS)]
    with open(fa, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">t{i}\n" + "".join(BASES[c] for c in s) + "\n")
    lens = np.array([len(s) for s in seqs])
    offs = np.concatenate([[0], np.cumsum(lens)])
    concat = np.concatenate(seqs)
    t = rng.integers(0, TXPS, READS)
    fl = np.clip(rng.normal(250, 25, READS).astype(int), READ_LEN + 10,
                 TXP_LEN)
    p = (rng.random(READS) * (lens[t] - fl + 1)).astype(int)
    start = offs[t] + p
    i1 = start[:, None] + np.arange(READ_LEN)
    m1 = concat[i1]
    i2 = start[:, None] + (fl[:, None] - READ_LEN) + np.arange(READ_LEN)
    m2 = (3 - concat[i2][:, ::-1]).astype(np.uint8)
    for m in (m1, m2):
        mask = rng.random(m.shape) < 0.005
        m[mask] = (m[mask] + rng.integers(1, 4, int(mask.sum()))) % 4
    qual = "I" * READ_LEN
    lut = np.frombuffer(b"ACGT", np.uint8)
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(READS):
            f1.write(f"@f{i}\n" + lut[m1[i]].tobytes().decode() +
                     f"\n+\n{qual}\n")
            f2.write(f"@f{i}\n" + lut[m2[i]].tobytes().decode() +
                     f"\n+\n{qual}\n")
    log(f"world: {TXPS} txps, {READS} PE reads in {ROOT}")
    return fa, r1, r2


def run(argv, env=None, pin=None):
    if pin is not None:
        argv = ["taskset", "-c", str(pin)] + argv
    t0 = time.time()
    r = subprocess.run(argv, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(f"command failed: {' '.join(argv[:6])}")
    return dt


def main():
    fa, r1, r2 = build_world()
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "SF_SHARD_CPU_PIN": "1"})
    idx = os.path.join(ROOT, "idx")
    py = sys.executable
    if not os.path.exists(os.path.join(idx, "header.json")):
        dt = run([py, "-m", "sailfish_tpu.cli", "index", "-t", fa,
                  "-o", idx, "-k", "31"], env=env)
        log(f"index built in {dt:.1f}s")

    quant_common = ["-m", "sailfish_tpu.cli", "quant", "-i", idx,
                    "-l", "IU", "-1", r1, "-2", r2,
                    "--batchSize", str(BATCH)]

    # compile warmup (persistent cache): a tiny 1-shard run
    warm = os.path.join(ROOT, "warm")
    run([py] + quant_common + ["-o", warm, "--numShards", str(N),
                               "--shardId", "0", "--mapOnly", "--dumpEq"],
        env=env, pin=0)
    log("warmup (compile cache) done")

    # baseline: single process, one core
    t1 = run([py] + quant_common + ["-o", os.path.join(ROOT, "q1")],
             env=env, pin=0)
    log(f"1-shard baseline: {t1:.1f}s ({READS/t1:,.0f} frags/s)")

    # N concurrent shards through the launcher (pinned per core),
    # including merge + final inference
    tn = run([py] + quant_common + ["-o", os.path.join(ROOT, f"q{N}"),
                                    "--numShards", str(N)], env=env)
    log(f"{N}-shard launcher: {tn:.1f}s")

    eff = t1 / (N * tn)
    # sanity: results equivalent (same mapped totals)
    with open(os.path.join(ROOT, "q1", "aux", "meta_info.json")) as fh:
        m1 = json.load(fh)
    with open(os.path.join(ROOT, f"q{N}", "aux", "meta_info.json")) as fh:
        mn = json.load(fh)
    assert m1["num_processed"] == mn["num_processed"] == READS
    assert m1["num_mapped"] == mn["num_mapped"]
    doc = {
        "metric": "scaling_efficiency_measured",
        "value": round(eff, 4),
        "unit": "T1/(N*TN)",
        "shards": N,
        "concurrent": True,
        "reads": READS,
        "t1_s": round(t1, 2),
        "tn_s": round(tn, 2),
        "num_mapped": m1["num_mapped"],
        "note": "truly concurrent shard subprocesses via "
                "parallel/launcher.py, 1 core per shard (pod model), "
                "wall-clock incl. merge + final inference",
    }
    print(json.dumps(doc), flush=True)


if __name__ == "__main__":
    main()
