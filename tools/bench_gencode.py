"""GENCODE-scale benchmark (BASELINE.md config 2): ~200k transcripts
with gene-family isoform structure + 10M simulated PE reads, quantified
end-to-end on the production device pipeline.

The transcriptome is synthetic but structured like an annotation: genes
carry 6-20 exons (30-400bp); isoforms sample exon subsets, so family
members share most of their sequence — this exercises multi-mapping,
wide eq-class labels, and the candidate-capacity envelope the way a
real GENCODE index does (uniform-random transcriptomes do not: VERDICT
round-1 weak #7).

Outputs one JSON line per phase metric to stdout; narrative to stderr.

Env knobs:
  GB_TXPS    (200000)  transcript target
  GB_BASES   (150e6)   total transcriptome bases target
  GB_READS   (10e6)    PE fragments
  GB_BATCH   (65536)   device batch
  GB_CACHE   (/tmp/gencode_bench) world cache dir ("" = no cache)
  BENCH_CAP / BENCH_KERNEL as in bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TXPS = int(float(os.environ.get("GB_TXPS", 200_000)))
BASES = int(float(os.environ.get("GB_BASES", 150e6)))
READS = int(float(os.environ.get("GB_READS", 10e6)))
BATCH = int(os.environ.get("GB_BATCH", 65536))
READ_LEN = 100
ERR = 0.005
CAP = int(os.environ.get("BENCH_CAP", 32))
CAP_MAX = int(os.environ.get("BENCH_CAP_MAX", 256))
KERNEL = os.environ.get("BENCH_KERNEL", "pallas")
SWEEP = int(os.environ.get("BENCH_SWEEP", 0))
CACHE = os.environ.get("GB_CACHE", "/tmp/gencode_bench")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, extra=None):
    doc = {"metric": metric, "value": round(float(value), 2), "unit": unit}
    if extra:
        doc.update(extra)
    print(json.dumps(doc), flush=True)
    log("  ->", doc)


def build_transcriptome(rng):
    """Gene-family transcriptome: isoforms share sampled exon subsets."""
    log(f"building gene-family transcriptome (~{TXPS} txps, "
        f"~{BASES/1e6:.0f}Mb)")
    seqs, names = [], []
    total = 0
    gene = 0
    while len(seqs) < TXPS and total < BASES:
        # exon sizing chosen so the defaults (200k txps, 150Mb) hit both
        # caps together: ~8.5 exons x ~115b x 0.8 keep-rate ~ 780b/txp,
        # matching real GENCODE's ~750b median transcript
        n_ex = int(rng.integers(4, 14))
        exons = [rng.integers(0, 4, int(rng.integers(30, 201)))
                 .astype(np.uint8) for _ in range(n_ex)]
        n_iso = int(min(rng.integers(1, 9), TXPS - len(seqs)))
        for i in range(n_iso):
            keep = rng.random(n_ex) < 0.8
            keep[rng.integers(0, n_ex)] = True  # never empty
            s = np.concatenate([e for e, k in zip(exons, keep) if k])
            if len(s) < READ_LEN + 60:  # room for a fragment
                s = np.concatenate([s, rng.integers(0, 4, READ_LEN + 60)
                                    .astype(np.uint8)])
            seqs.append(s)
            names.append(f"g{gene}.i{i}")
            total += len(s)
        gene += 1
    log(f"  {len(seqs)} transcripts, {total/1e6:.1f}Mb, {gene} genes")
    return names, seqs


def get_world():
    from sailfish_tpu.index.builder import build_index, load_index, save_index

    rng = np.random.default_rng(7)
    idx = None
    key = f"{TXPS}_{BASES}"
    cdir = os.path.join(CACHE, key) if CACHE else ""
    names = seqs = None
    if cdir and os.path.exists(os.path.join(cdir, "header.json")):
        t0 = time.time()
        idx = load_index(cdir)
        log(f"loaded cached index {cdir} in {time.time()-t0:.1f}s")
        z = np.load(os.path.join(cdir, "world.npz"), allow_pickle=False)
        concat, offs, lens = z["concat"], z["offs"], z["lens"]
        emit("gencode_index_load_s", time.time() - t0, "s")
    else:
        names, seqs = build_transcriptome(rng)
        t0 = time.time()
        idx = build_index(names, seqs, k=31)
        dt = time.time() - t0
        log(f"index built in {dt:.1f}s (N={idx.text_len})")
        emit("gencode_index_build_s", dt, "s",
             {"text_mb": round(idx.text_len / 1e6, 1)})
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        offs = np.zeros(len(seqs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        concat = np.concatenate(seqs)
        if cdir:
            save_index(idx, cdir)
            np.savez(os.path.join(cdir, "world.npz"),
                     concat=concat, offs=offs, lens=lens)
    return idx, concat, offs[:-1], lens


def simulate_batch(rng, concat, offs, lens, n):
    """One batch of PE fragments (vectorized), expression ~ Zipf-ish."""
    L = (READ_LEN + 7) // 8 * 8
    t = rng.integers(0, len(lens), n)
    fl = np.clip(rng.normal(250, 25, n).astype(np.int64), READ_LEN + 10, 600)
    fl = np.minimum(fl, lens[t])
    p = (rng.random(n) * (lens[t] - fl + 1)).astype(np.int64)
    start = offs[t] + p
    i1 = start[:, None] + np.arange(READ_LEN)
    m1 = concat[i1]
    i2 = start[:, None] + (fl[:, None] - READ_LEN) + np.arange(READ_LEN)
    m2 = (3 - concat[i2][:, ::-1]).astype(np.uint8)
    for m in (m1, m2):
        mask = rng.random(m.shape) < ERR
        m[mask] = (m[mask] + rng.integers(1, 4, mask.sum())) % 4
    c1 = np.full((n, L), 4, np.uint8)
    c2 = np.full((n, L), 4, np.uint8)
    c1[:, :READ_LEN] = m1
    c2[:, :READ_LEN] = m2
    lens_out = np.full(n, READ_LEN, np.int32)
    return c1, c2, lens_out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    idx, concat, offs, lens = get_world()
    if os.environ.get("GB_BUILD_ONLY", "0") == "1":
        log("GB_BUILD_ONLY=1: world + index cached, exiting before device work")
        return
    log(f"backend={jax.default_backend()} kernel={KERNEL} batch={BATCH}")

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator
    from sailfish_tpu.io.fastq import FastqBatch
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    key = f"{TXPS}_{BASES}"
    idx_dir = os.path.join(CACHE, key) if CACHE else ""
    # paralog-world xscan coverage (all bit-exact-by-construction
    # knobs; capacity semantics stay at the CLI defaults 64/1024):
    #  * xscan_f=8 — a gene family of up to 8 isoforms puts cnt<=8 on
    #    most seeds; F=4 would punt nearly every lane to the kernel
    #    residual, overflow its prefix, and dump the batch on the
    #    escalation pass
    #  * front-loaded schedule — most lanes are still active entering
    #    phase B here (multi-candidate events defer out of light phase
    #    A), so the bench-world narrowing would spill them to punts
    opts = QuantOpts(batch_size=BATCH, hit_capacity=CAP,
                     hit_capacity_max=CAP_MAX, kernel=KERNEL,
                     xla2_sweep_win=SWEEP, index_dir=idx_dir,
                     xscan_f=8, xscan_schedule="1:3,2:2,4:2")
    backend = DeviceMapperBackend(idx, opts)
    expected = parse_library_format("IU")
    rng = np.random.default_rng(11)

    def run_batch(bat, acc):
        c1, c2, ln = bat
        tok = backend.submit_pe(FastqBatch(c1, ln), FastqBatch(c2, ln),
                                expected)
        return backend.finish_batch_fast(tok, acc)

    # warmup/compile
    t0 = time.time()
    bat = simulate_batch(rng, concat, offs, lens, BATCH)
    bs = run_batch(bat, HashedEqClassAccumulator())
    log(f"warmup (compile) {time.time()-t0:.1f}s; "
        f"mapped {bs.num_mapped}/{BATCH}")

    # timed mapping: simulation excluded (one-deep: simulate batch n+1
    # while the device maps batch n, then fold)
    n_batches = max(READS // BATCH, 1)
    acc = HashedEqClassAccumulator()
    mapped = total = 0
    map_time = 0.0
    nxt = simulate_batch(rng, concat, offs, lens, BATCH)
    for i in range(n_batches):
        bat = nxt
        t0 = time.time()
        tok = backend.submit_pe(FastqBatch(bat[0], bat[2]),
                                FastqBatch(bat[1], bat[2]), expected)
        map_time += time.time() - t0
        if i + 1 < n_batches:
            nxt = simulate_batch(rng, concat, offs, lens, BATCH)
        t0 = time.time()
        bs = backend.finish_batch_fast(tok, acc)
        map_time += time.time() - t0
        mapped += bs.num_mapped
        total += bs.n
        if (i + 1) % 16 == 0:
            log(f"  {i+1}/{n_batches} batches, "
                f"{total/max(map_time,1e-9):,.0f} frags/s, "
                f"{len(acc)} classes")
    rps = total / max(map_time, 1e-9)
    log(f"mapped {mapped}/{total} ({100*mapped/max(total,1):.1f}%) in "
        f"{map_time:.1f}s; {len(acc)} eq classes")
    emit("gencode_reads_per_sec", rps, "frags/s",
         {"mapped_pct": round(100 * mapped / max(total, 1), 2),
          "eq_classes": len(acc), "reads": total})

    # EM at realistic class counts
    eq = acc.finish()
    from sailfish_tpu.infer.em import run_em

    eff = np.maximum(idx.txp_lens.astype(np.float64) - 220.0, 1.0)
    t0 = time.time()
    em = run_em(eq, eff, float(mapped), idx.num_transcripts,
                dtype="float32", min_iter=50, max_iter=1000)
    warm = time.time() - t0
    t0 = time.time()
    em = run_em(eq, eff, float(mapped), idx.num_transcripts,
                dtype="float32", min_iter=50, max_iter=1000)
    em_dt = time.time() - t0
    log(f"EM: {em.num_iterations} iters in {em_dt:.2f}s "
        f"(compile+first {warm:.1f}s)")
    emit("gencode_em_iters_per_sec", em.num_iterations / max(em_dt, 1e-9),
         "iters/s", {"iterations": int(em.num_iterations),
                     "eq_classes": eq.num_classes})

    # posterior samplers at scale (BASELINE config 3)
    n_boot = int(os.environ.get("GB_BOOTSTRAPS", 0))
    if n_boot:
        from sailfish_tpu.infer.bootstrap import run_bootstraps

        t0 = time.time()
        n_done = sum(
            1 for _ in run_bootstraps(
                eq, eff, idx.num_transcripts, num_bootstraps=n_boot,
                dtype="float32",
            )
        )
        dt = time.time() - t0
        emit("gencode_bootstraps_per_sec", n_done / max(dt, 1e-9),
             "replicates/s", {"replicates": n_done,
                              "eq_classes": eq.num_classes})
    n_gibbs = int(os.environ.get("GB_GIBBS", 0))
    if n_gibbs:
        from sailfish_tpu.infer.gibbs import run_gibbs

        t0 = time.time()
        n_done = sum(
            1 for _ in run_gibbs(
                eq, eff, em.alphas, idx.num_transcripts,
                num_samples=n_gibbs, total_mapped=float(mapped),
            )
        )
        dt = time.time() - t0
        emit("gencode_gibbs_samples_per_sec", n_done / max(dt, 1e-9),
             "samples/s", {"samples": n_done,
                           "eq_classes": eq.num_classes})


if __name__ == "__main__":
    main()
