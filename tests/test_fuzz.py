"""Randomized differential testing: device backend vs the numpy oracle
across libtypes, flags, read lengths, and edge-case read content."""

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend

from conftest import to_batch


def as_dict(br):
    return dict(zip(br.labels, (int(c) for c in br.label_counts)))


SCENARIOS = [
    # (libtype, opts overrides, err_rate, seed)
    ("ISF", {}, 0.3, 101),
    ("OU", {"allow_dovetail": True}, 0.2, 102),
    ("IU", {"ignore_lib_compat": True}, 0.5, 103),
    ("MU", {"enforce_lib_compat": True}, 0.2, 104),
]


@pytest.mark.parametrize("lib,overrides,err,seed", SCENARIOS)
def test_device_matches_oracle_fuzz(toy_world, lib, overrides, err, seed):
    opts = QuantOpts(batch_size=96, hit_capacity=32, **overrides)
    ref = RefMapperBackend(toy_world["idx"], opts)
    dev = DeviceMapperBackend(toy_world["idx"], opts)
    exp = parse_library_format(lib)
    r1, r2, _ = toy_world["sim"](96, err_rate=err, seed=seed)
    rng = np.random.default_rng(seed)
    # edge content: garbage reads, N runs, very short fragments
    for i in range(0, 96, 11):
        r1[i] = rng.integers(0, 4, 50).astype(np.uint8)
    for i in range(5, 96, 17):
        r2[i][20:25] = 4
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd), (lib, overrides)
    np.testing.assert_array_equal(br.mapped, bd.mapped)
    np.testing.assert_array_equal(br.num_joint, bd.num_joint)
    assert (br.num_fwd, br.num_rc) == (bd.num_fwd, bd.num_rc)
    np.testing.assert_array_equal(
        br.frag_lens[br.unique_paired], bd.frag_lens[bd.unique_paired]
    )


def test_device_matches_oracle_varied_lengths(toy_world):
    """Mixed read lengths within one batch."""
    opts = QuantOpts(batch_size=64, hit_capacity=32)
    ref = RefMapperBackend(toy_world["idx"], opts)
    dev = DeviceMapperBackend(toy_world["idx"], opts)
    exp = parse_library_format("IU")
    rng = np.random.default_rng(7)
    seqs = toy_world["seqs"]
    r1, r2 = [], []
    for i in range(64):
        t = i % len(seqs)
        s = seqs[t]
        rl = int(rng.integers(32, 56))
        fl = int(rng.integers(rl + 10, 200))
        p = int(rng.integers(0, len(s) - fl))
        from sailfish_tpu import dna

        r1.append(s[p : p + rl].copy())
        r2.append(dna.revcomp(s[p + fl - rl : p + fl]).copy())
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd)
    np.testing.assert_array_equal(br.mapped, bd.mapped)


def test_paralog_family_crosses_hit_capacity():
    """Repetitive-reference differential test (VERDICT round-1 #3): 56
    near-identical paralogs mean a read's SA interval far exceeds a
    small hit_capacity.  Device and oracle must agree EXACTLY across
    the capacity boundary — both apply the same per-probe candidate
    envelope (reads whose interval overflows are dropped like
    > --maxReadOcc, config.py hit_capacity) — and with a capacity that
    covers the family, multi-mapping reads must survive with the full
    family in their label (reference keeps anything up to maxReadOcc,
    src/SailfishQuantify.cpp:217,1143)."""
    from sailfish_tpu import dna
    from sailfish_tpu.index.builder import build_index

    rng = np.random.default_rng(42)
    anc = rng.integers(0, 4, 800).astype(np.uint8)
    seqs, names = [], []
    for c in range(56):  # > 2x the small capacity below
        s = anc.copy()
        # ~0.3% divergence: a few private SNPs per copy
        for p in rng.integers(0, len(s), 3):
            s[p] = (s[p] + 1 + rng.integers(0, 3)) % 4
        seqs.append(s)
        names.append(f"par{c}")
    # plus unique background transcripts
    for i in range(8):
        seqs.append(rng.integers(0, 4, 900).astype(np.uint8))
        names.append(f"bg{i}")
    idx = build_index(names, seqs, k=31)

    exp = parse_library_format("IU")
    r1, r2 = [], []
    for i in range(64):
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        fl = int(rng.integers(160, 300))
        p = int(rng.integers(0, len(s) - fl))
        frag = s[p : p + fl]
        r1.append(frag[:50].copy())
        r2.append(dna.revcomp(frag[-50:]).copy())
    b1, b2 = to_batch(r1), to_batch(r2)

    results = {}
    for cap in (16, 64):  # 16 < family size < 64
        opts = QuantOpts(batch_size=64, hit_capacity=cap)
        ref = RefMapperBackend(idx, opts)
        dev = DeviceMapperBackend(idx, opts)
        br = ref.map_pe_batch(b1, b2, exp)
        bd = dev.map_pe_batch(b1, b2, exp)
        assert as_dict(br) == as_dict(bd), cap
        np.testing.assert_array_equal(br.mapped, bd.mapped)
        np.testing.assert_array_equal(br.num_joint, bd.num_joint)
        results[cap] = br
    # the boundary is actually crossed: the small capacity drops
    # family reads that the big capacity keeps with wide labels
    assert results[16].mapped.sum() < results[64].mapped.sum()
    wide = max(len(lbl) for lbl in results[64].labels)
    assert wide > 16

    # --- escalation pass: narrow primary capacity + wide second pass
    # must equal the single wide pass exactly (overflow fragments are
    # gathered and re-mapped at hit_capacity_max through the XLA
    # kernel, so the device honors the full --maxReadOcc envelope
    # without paying wide shapes on the hot path) ---
    opts_esc = QuantOpts(batch_size=64, hit_capacity=16,
                         hit_capacity_max=64)
    dev_esc = DeviceMapperBackend(idx, opts_esc)
    be = dev_esc.map_pe_batch(b1, b2, exp)
    bw = results[64]
    assert as_dict(be) == as_dict(bw)
    np.testing.assert_array_equal(be.mapped, bw.mapped)
    np.testing.assert_array_equal(be.num_joint, bw.num_joint)
    np.testing.assert_array_equal(be.unique_paired, bw.unique_paired)
    np.testing.assert_array_equal(be.frag_lens, bw.frag_lens)
    assert (be.num_fwd, be.num_rc) == (bw.num_fwd, bw.num_rc)
    np.testing.assert_array_equal(be.fmt_counts, bw.fmt_counts)
    assert be.num_compat == bw.num_compat

    # fast path (hash-keyed accumulator) with escalation agrees too
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator

    acc = HashedEqClassAccumulator()
    bs = dev_esc.finish_batch_fast(
        dev_esc.submit_pe(b1, b2, exp), acc
    )
    assert bs.num_mapped == int(bw.mapped.sum())
    assert bs.sum_joint == int(bw.num_joint.sum())
    assert dict(acc._counts) == as_dict(bw)
    fls, up = bs.fld_details()
    np.testing.assert_array_equal(fls, bw.frag_lens)
    np.testing.assert_array_equal(up, bw.unique_paired)


def test_host_escalation_matches_wide_pass():
    """escalation_backend="host": the wide second pass on the numpy
    oracle must equal the single wide device pass exactly — same
    effective capacity envelope (refimpl/mapper.py applies
    effective_hit_capacity()), zero device memory.  This is the
    GENCODE-scale route: the device wide pass would upload a second
    multi-GB set of XLA index images next to the Pallas ones and crash
    a 16GB-HBM chip (map/pipeline._esc_use_host)."""
    from sailfish_tpu import dna
    from sailfish_tpu.index.builder import build_index
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator

    rng = np.random.default_rng(43)
    anc = rng.integers(0, 4, 800).astype(np.uint8)
    seqs, names = [], []
    for c in range(56):
        s = anc.copy()
        for p in rng.integers(0, len(s), 3):
            s[p] = (s[p] + 1 + rng.integers(0, 3)) % 4
        seqs.append(s)
        names.append(f"par{c}")
    for i in range(8):
        seqs.append(rng.integers(0, 4, 900).astype(np.uint8))
        names.append(f"bg{i}")
    idx = build_index(names, seqs, k=31)

    exp = parse_library_format("IU")
    r1, r2 = [], []
    for i in range(64):
        t = int(rng.integers(0, len(seqs)))
        s = seqs[t]
        fl = int(rng.integers(160, 300))
        p = int(rng.integers(0, len(s) - fl))
        frag = s[p : p + fl]
        r1.append(frag[:50].copy())
        r2.append(dna.revcomp(frag[-50:]).copy())
    b1, b2 = to_batch(r1), to_batch(r2)

    wide = DeviceMapperBackend(
        idx, QuantOpts(batch_size=64, hit_capacity=64)
    ).map_pe_batch(b1, b2, exp)

    opts_h = QuantOpts(batch_size=64, hit_capacity=16,
                       hit_capacity_max=64, escalation_backend="host")
    dev_h = DeviceMapperBackend(idx, opts_h)
    bh = dev_h.map_pe_batch(b1, b2, exp)
    assert as_dict(bh) == as_dict(wide)
    np.testing.assert_array_equal(bh.mapped, wide.mapped)
    np.testing.assert_array_equal(bh.num_joint, wide.num_joint)
    np.testing.assert_array_equal(bh.unique_paired, wide.unique_paired)
    np.testing.assert_array_equal(bh.frag_lens, wide.frag_lens)
    assert (bh.num_fwd, bh.num_rc) == (wide.num_fwd, wide.num_rc)
    np.testing.assert_array_equal(bh.fmt_counts, wide.fmt_counts)
    assert bh.num_compat == wide.num_compat

    # fast path: counters + accumulator + FLD details all match
    acc = HashedEqClassAccumulator()
    bs = dev_h.finish_batch_fast(dev_h.submit_pe(b1, b2, exp), acc)
    assert bs.num_mapped == int(wide.mapped.sum())
    assert bs.sum_joint == int(wide.num_joint.sum())
    assert bs.ub_hits == int((wide.num_joint > 0).sum())
    assert dict(acc._counts) == as_dict(wide)
    fls, up = bs.fld_details()
    np.testing.assert_array_equal(fls, wide.frag_lens)
    np.testing.assert_array_equal(up, wide.unique_paired)
    mf = opts_h.max_frag_len
    sel = wide.unique_paired & (wide.frag_lens < mf)
    np.testing.assert_array_equal(
        bs.fld_hist(),
        np.bincount(wide.frag_lens[sel].astype(np.int64),
                    minlength=mf)[:mf])
    assert bs.fld_count == int(sel.sum())
