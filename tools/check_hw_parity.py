"""On-hardware mapping-parity check: the production device path (pallas
kernel + clean-lane fast path + xscan + dynamic-grid residual, exactly
as the CLI runs it) versus the numpy oracle, label-for-label.

The CPU test suite runs the pallas kernel in interpret mode, which
exercises the semantics but NOT the hardware-only mechanisms (Mosaic
DMA/rotate lowering, the dynamic-grid launch + stale-row masking, the
VMEM Bloom row loads).  This tool runs the REAL compiled path on the
attached TPU and asserts bit-identical equivalence-class tables against
refimpl.mapper on a paralog-rich corpus with sequencing errors and Ns.

Usage: python tools/check_hw_parity.py  [--reads N] [--cap C]
Writes one JSON line to stdout: {"ok": bool, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--cap-max", type=int, default=0,
                    help="escalation capacity (0 = off)")
    ap.add_argument("--readlen", type=int, default=100,
                    help=">128 exercises the xlong long-read path")
    ap.add_argument("--err", type=float, default=0.005)
    ap.add_argument("--n-rate", type=float, default=0.001)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, ".")
    from tools.fidelity import build_transcriptome, simulate_reads

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.index.builder import build_index
    from sailfish_tpu.libformat import parse_library_format

    rng = np.random.default_rng(7)
    names, seqs = build_transcriptome(rng)
    idx = build_index(names, seqs, k=31)
    log(f"transcriptome: {len(seqs)} txps, {idx.text_len} bases; "
        f"backend={jax.default_backend()}")

    b1, b2, _ = simulate_reads(seqs, args.reads, rng, err=args.err,
                               readlen=args.readlen,
                               flmin=max(150, args.readlen + 20))
    # sprinkle Ns (code 4) into live read positions — exercises the
    # has-N punt lanes through fastpath/xscan/kernel
    for b in (b1, b2):
        mask = rng.random(b.codes.shape) < args.n_rate
        mask &= np.arange(b.codes.shape[1])[None, :] < b.lens[:, None]
        b.codes[mask] = 4

    expected = parse_library_format("IU")
    opts_kw = dict(batch_size=args.reads, hit_capacity=args.cap,
                   hit_capacity_max=args.cap_max, max_read_occs=200)

    from sailfish_tpu.quant import RefMapperBackend

    t0 = time.time()
    obk = RefMapperBackend(idx, QuantOpts(**opts_kw))
    obr = obk.map_pe_batch(b1, b2, expected)
    od = {}
    for lbl, c in zip(obr.labels, obr.label_counts):
        od[lbl] = od.get(lbl, 0) + int(c)
    log(f"oracle: {int(obr.mapped.sum())}/{args.reads} mapped, "
        f"{len(od)} classes in {time.time()-t0:.0f}s")

    from sailfish_tpu.map.pipeline import DeviceMapperBackend

    t0 = time.time()
    dbk = DeviceMapperBackend(idx, QuantOpts(kernel="pallas", **opts_kw))
    dbr = dbk.map_pe_batch(b1, b2, expected)
    dd = {}
    for lbl, c in zip(dbr.labels, dbr.label_counts):
        dd[lbl] = dd.get(lbl, 0) + int(c)
    log(f"device: {int(dbr.mapped.sum())}/{args.reads} mapped, "
        f"{len(dd)} classes in {time.time()-t0:.0f}s (incl. compile)")

    ok = (od == dd) and (int(obr.mapped.sum()) == int(dbr.mapped.sum()))
    if not ok:
        only_o = {k: v for k, v in od.items() if dd.get(k) != v}
        only_d = {k: v for k, v in dd.items() if od.get(k) != v}
        log(f"DIVERGENCE: {len(only_o)} oracle-side / "
            f"{len(only_d)} device-side differing classes")
        for k in list(only_o)[:10]:
            log(f"  oracle {k}: {only_o[k]} vs device {dd.get(k, 0)}")
        for k in list(only_d)[:10]:
            log(f"  device {k}: {only_d[k]} vs oracle {od.get(k, 0)}")
    print(json.dumps({
        "ok": bool(ok),
        "backend": jax.default_backend(),
        "reads": args.reads,
        "mapped_oracle": int(obr.mapped.sum()),
        "mapped_device": int(dbr.mapped.sum()),
        "classes_oracle": len(od),
        "classes_device": len(dd),
        "frag_lens_identical": bool(
            (obr.frag_lens == dbr.frag_lens).all()
        ),
        "cap": args.cap,
        "cap_max": args.cap_max,
        "readlen": args.readlen,
        "err": args.err,
        "xlong": bool(args.readlen > 128),
        "dyngrid": os.environ.get("SF_DYNGRID", "1"),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
