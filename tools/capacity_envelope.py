"""Hit-capacity envelope measurement (VERDICT r2 item #7, docs/PARITY.md #2).

The reference enumerates EVERY SA candidate of an MMP before applying
the --maxReadOcc 200 fragment filter (src/SailfishQuantify.cpp:217);
the device kernels cap per-probe candidates at --hitCapacity with
escalation to --hitCapacityMax (256 default).  The at-risk set is
fragments with ANY exact-k-mer interval wider than the escalation cap
whose FINAL occupancy is nevertheless <= 200 — the reference keeps
them, the repo drops them.  This tool measures that set on the
paralog-heavy gene-family transcriptome (tools/bench_gencode.py
world), where shared exons make wide intervals common — the worst
realistic case.

Run (CPU): JAX_PLATFORMS=cpu python tools/capacity_envelope.py
Env: CE_FRAGS (5000), CE_CAPS (64,256,1024), GB_* world knobs.
Emits one JSON line; paste the numbers into docs/PARITY.md #2.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAGS = int(os.environ.get("CE_FRAGS", 5000))
CAPS = [int(x) for x in os.environ.get("CE_CAPS", "64,256,1024").split(",")]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class ProbeSizeMapper:
    """RefMapper._mmps with UNBOUNDED candidate enumeration and
    per-probe interval-size recording (mirror of refimpl/mapper.py
    _mmps minus the capacity branch)."""

    def __init__(self, idx, opts):
        from sailfish_tpu.refimpl.mapper import RefMapper

        self.ref = RefMapper(idx, opts)
        self.ref.cand_cap = None  # unbounded
        self.idx = idx
        self.opts = opts

    def max_interval(self, read) -> int:
        """Largest exact-k-mer SA interval over the probed positions of
        the NIP scan (both the probes that hit and those that miss on
        true codes)."""
        idx, opts = self.idx, self.opts
        ref = self.ref
        k, P = idx.k, idx.prefix_bases
        L = len(read)
        i = 0
        steps = 0
        budget = opts.effective_scan_steps(L)
        mx = 0
        nm = 0
        while i + k <= L and steps < budget and nm < opts.max_mmps:
            steps += 1
            window = read[i : i + P]
            if np.any(window >= 4):
                i += 1
                continue
            lo, hi = idx.prefix_interval(window)
            if hi <= lo:
                i += 1
                continue
            cand_gpos = np.asarray(ref._sa[lo:hi], dtype=np.int64)
            a_lcps = np.array(
                [ref._asub_lcp(read, i, g) for g in cand_gpos]
            )
            cand_gpos = cand_gpos[a_lcps >= k]
            mx = max(mx, len(cand_gpos))
            if len(cand_gpos) == 0:
                i += 1
                continue
            lcps = np.array([ref._lcp(read, i, g) for g in cand_gpos])
            lstar = int(lcps.max()) if len(lcps) else 0
            if lstar < k:
                i += 1
                continue
            nm += 1
            i += max(1, lstar - k + 1)
        return mx


def main_repeat_device():
    """Worst-case stress: a 300bp repeat element planted in 10% of
    transcripts (Alu-like), so reads overlapping it see exact-k
    intervals in the hundreds.  The at-risk set is measured on the
    DEVICE path directly: fragments that map at an effectively
    unbounded escalation capacity (2048) but are dropped at the
    production 256 — the exact reference-keeps/repo-drops delta."""
    import jax.numpy as jnp

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.index.builder import build_index
    from sailfish_tpu.io.fastq import FastqBatch
    from sailfish_tpu.libformat import parse_library_format
    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    rng = np.random.default_rng(5)
    n_txp, txp_len = 4000, 1000
    element = rng.integers(0, 4, 300).astype(np.uint8)
    seqs = []
    planted = 0
    for i in range(n_txp):
        s = rng.integers(0, 4, txp_len).astype(np.uint8)
        if rng.random() < 0.10:
            off = int(rng.integers(0, txp_len - 300))
            s[off : off + 300] = element
            planted += 1
        seqs.append(s)
    idx = build_index([f"t{i}" for i in range(n_txp)], seqs, k=31)
    log(f"repeat world: {n_txp} txps, element in {planted}")

    B = int(os.environ.get("CE_FRAGS", 2048))
    lens = np.array([len(s) for s in seqs])
    offs = np.concatenate([[0], np.cumsum(lens)])
    concat = np.concatenate(seqs)
    t = rng.integers(0, n_txp, B)
    fl = np.clip(rng.normal(250, 25, B).astype(int), 110, 600)
    p = (rng.random(B) * (lens[t] - fl + 1)).astype(int)
    start = offs[t] + p
    m1 = concat[start[:, None] + np.arange(100)]
    m2 = (3 - concat[start[:, None] + (fl[:, None] - 100)
                     + np.arange(100)][:, ::-1]).astype(np.uint8)
    L = 104
    c1 = np.full((B, L), 4, np.uint8)
    c2 = np.full((B, L), 4, np.uint8)
    c1[:, :100], c2[:, :100] = m1, m2
    rl = np.full(B, 100, np.int32)
    expected = parse_library_format("IU")

    res = {"metric": "hit_capacity_envelope_repeat", "frags": B,
           "world": f"{n_txp} txps, 300bp element x{planted}"}
    mapped = {}
    for cap in (256, 2048):
        opts = QuantOpts(batch_size=B, hit_capacity=64,
                         hit_capacity_max=cap, kernel="xla")
        bk = DeviceMapperBackend(idx, opts)
        br = bk.map_pe_batch(FastqBatch(c1, rl), FastqBatch(c2, rl),
                             expected)
        mapped[cap] = np.asarray(br.mapped)
        res[f"mapped_cap{cap}"] = int(mapped[cap].sum())
        log(f"cap {cap}: mapped {int(mapped[cap].sum())}/{B}")
    at_risk = mapped[2048] & ~mapped[256]
    res["dropped_at_256_kept_at_2048"] = int(at_risk.sum())
    res["dropped_at_256_kept_at_2048_frac"] = round(
        float(at_risk.mean()), 6)
    print(json.dumps(res), flush=True)


def main():
    if os.environ.get("CE_MODE", "") == "repeat":
        return main_repeat_device()
    os.environ.setdefault("GB_CACHE", "/tmp/gencode_bench")
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    import bench_gencode as gb

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.libformat import parse_library_format

    idx, concat, offs, lens = gb.get_world()
    rng = np.random.default_rng(99)
    c1, c2, rl = gb.simulate_batch(rng, concat, offs, lens, FRAGS)
    opts = QuantOpts(hit_capacity=10**9, hit_capacity_max=10**9)
    pm = ProbeSizeMapper(idx, opts)
    expected = parse_library_format("IU")

    from sailfish_tpu import dna

    maxint = np.zeros(FRAGS, np.int64)
    occ = np.zeros(FRAGS, np.int64)
    mapped = np.zeros(FRAGS, bool)
    t0 = time.time()
    for f in range(FRAGS):
        m1 = c1[f, : rl[f]]
        m2 = c2[f, : rl[f]]
        mi = 0
        for r in (m1, dna.revcomp(m1), m2, dna.revcomp(m2)):
            mi = max(mi, pm.max_interval(r))
        maxint[f] = mi
        rm = pm.ref.map_fragment_pe(m1, m2, expected)
        mapped[f] = rm.label is not None
        occ[f] = len(rm.label) if rm.label is not None else 0
        if (f + 1) % 500 == 0:
            log(f"  {f+1}/{FRAGS} ({(f+1)/(time.time()-t0):.0f} frags/s)")
    dt = time.time() - t0
    res = {
        "metric": "hit_capacity_envelope",
        "frags": FRAGS,
        "world": f"{idx.num_transcripts} txps gene-family",
        "mapped_unbounded": int(mapped.sum()),
        "sec": round(dt, 1),
    }
    for cap in CAPS:
        over = maxint > cap
        at_risk = over & mapped & (occ <= 200)
        res[f"frac_interval_gt_{cap}"] = round(float(over.mean()), 6)
        res[f"dropped_but_reference_keeps_cap{cap}"] = int(at_risk.sum())
        res[f"dropped_but_reference_keeps_cap{cap}_frac"] = round(
            float(at_risk.mean()), 6
        )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
