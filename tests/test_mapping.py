"""Quasi-mapping: device kernels vs the numpy oracle (refimpl), plus
semantic checks against simulation truth."""

import numpy as np
import pytest

from sailfish_tpu import dna
from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend
from sailfish_tpu.refimpl.mapper import RefMapper

from conftest import to_batch


def as_dict(br):
    return dict(zip(br.labels, (int(c) for c in br.label_counts)))


@pytest.fixture(scope="module")
def backends(toy_world):
    opts = QuantOpts(batch_size=256)
    return (
        RefMapperBackend(toy_world["idx"], opts),
        DeviceMapperBackend(toy_world["idx"], opts),
        opts,
    )


def test_refimpl_finds_truth(toy_world):
    mapper = RefMapper(toy_world["idx"])
    exp = parse_library_format("IU")
    r1, r2, truth = toy_world["sim"](100, err_rate=0.0, seed=3)
    for m1, m2, (t, p, fl) in zip(r1, r2, truth):
        rm = mapper.map_fragment_pe(m1, m2, exp)
        assert rm.label is not None
        assert t in rm.label
        if rm.unique_paired:
            assert rm.frag_len == fl


def test_device_matches_refimpl_pe(toy_world, backends):
    ref, dev, opts = backends
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](256, err_rate=0.4, seed=4)
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd)
    assert np.array_equal(br.mapped, bd.mapped)
    assert np.array_equal(br.num_joint, bd.num_joint)
    assert np.array_equal(br.unique_paired, bd.unique_paired)
    assert np.array_equal(
        br.frag_lens[br.unique_paired], bd.frag_lens[bd.unique_paired]
    )
    assert (br.num_fwd, br.num_rc) == (bd.num_fwd, bd.num_rc)
    # observed-libtype accounting agrees format-for-format
    assert np.array_equal(br.fmt_counts, bd.fmt_counts)
    assert br.num_compat == bd.num_compat
    assert br.fmt_counts.sum() == bd.mapped.sum()


def test_device_matches_refimpl_se(toy_world, backends):
    ref, dev, opts = backends
    exp = parse_library_format("U")
    r1, r2, _ = toy_world["sim"](256, err_rate=0.4, seed=5)
    # mix fwd mates and rc mates as single-end input
    reads = r1[:128] + r2[128:]
    b = to_batch(reads)
    br = ref.map_se_batch(b, exp)
    bd = dev.map_se_batch(b, exp)
    assert as_dict(br) == as_dict(bd)
    assert np.array_equal(br.mapped, bd.mapped)
    assert (br.num_fwd, br.num_rc) == (bd.num_fwd, bd.num_rc)
    assert np.array_equal(br.fmt_counts, bd.fmt_counts)
    assert br.num_compat == bd.num_compat


def test_device_matches_refimpl_stranded(toy_world, backends):
    ref, dev, opts = backends
    exp = parse_library_format("ISF")
    r1, r2, _ = toy_world["sim"](128, err_rate=0.2, seed=6)
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd)
    # swapped mates: ISF expects mate1 sense; swapping makes them ISR
    br2 = ref.map_pe_batch(b2, b1, exp)
    bd2 = dev.map_pe_batch(b2, b1, exp)
    assert as_dict(br2) == as_dict(bd2)


def test_unmappable_reads(toy_world, backends):
    ref, dev, opts = backends
    exp = parse_library_format("IU")
    rng = np.random.default_rng(9)
    # random garbage reads: overwhelmingly unmappable
    reads = [rng.integers(0, 4, 50).astype(np.uint8) for _ in range(64)]
    b = to_batch(reads)
    br = ref.map_se_batch(b, parse_library_format("U"))
    bd = dev.map_se_batch(b, parse_library_format("U"))
    assert as_dict(br) == as_dict(bd)
    assert np.array_equal(br.mapped, bd.mapped)


def test_reads_with_n_bases(toy_world, backends):
    ref, dev, opts = backends
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.0, seed=8)
    # inject N (SEP) bases
    for i in range(0, 64, 3):
        r1[i][10] = dna.SEP
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd)


def test_orphan_discard(toy_world):
    opts = QuantOpts(batch_size=64, allow_orphans=False)
    ref = RefMapperBackend(toy_world["idx"], opts)
    dev = DeviceMapperBackend(toy_world["idx"], opts)
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.0, seed=10)
    # corrupt half the mate2 reads so they can't map -> orphans
    rng = np.random.default_rng(11)
    for i in range(0, 64, 2):
        r2[i] = rng.integers(0, 4, 50).astype(np.uint8)
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd)
    assert np.array_equal(br.mapped, bd.mapped)


def test_fast_path_matches_detail(toy_world, backends):
    """finish_batch_fast (hash-keyed accumulator, reduced stats) must
    agree with the full-detail finish_batch on classes and counters,
    across multiple batches so the known-hash (no label fetch) branch is
    exercised."""
    from sailfish_tpu.eqclass.classes import HashedEqClassAccumulator

    _, dev, opts = backends
    exp = parse_library_format("IU")
    acc = HashedEqClassAccumulator()
    detail = {}
    tot = dict(num_mapped=0, sum_joint=0, ub_hits=0, num_fwd=0, num_rc=0)
    fld = np.zeros(opts.max_frag_len, dtype=np.int64)
    fld_n = 0
    for seed in (11, 12, 11):
        r1, r2, _ = toy_world["sim"](256, err_rate=0.3, seed=seed)
        b1, b2 = to_batch(r1), to_batch(r2)
        br = dev.map_pe_batch(b1, b2, exp)
        for lbl, c in zip(br.labels, br.label_counts):
            detail[lbl] = detail.get(lbl, 0) + int(c)
        bs = dev.finish_batch_fast(dev.submit_pe(b1, b2, exp), acc)
        tot["num_mapped"] += bs.num_mapped
        tot["sum_joint"] += bs.sum_joint
        tot["ub_hits"] += bs.ub_hits
        tot["num_fwd"] += bs.num_fwd
        tot["num_rc"] += bs.num_rc
        fld += bs.fld_hist()
        fld_n += bs.fld_count
        fls, up = bs.fld_details()
        sel = fls[up]
        assert bs.fld_count == int((sel < opts.max_frag_len).sum())
        assert bs.num_mapped == int(br.mapped.sum())
        assert bs.sum_joint == int(br.num_joint.sum())
        assert bs.ub_hits == int((br.num_joint > 0).sum())
        assert (bs.num_fwd, bs.num_rc) == (br.num_fwd, br.num_rc)
        assert np.array_equal(bs.fmt_counts, br.fmt_counts)
        assert bs.num_compat == br.num_compat
    assert dict(acc._counts) == detail
    assert fld_n == int(fld.sum())


def test_big_sa_device_path(toy_world):
    """Forced 64-bit (big_sa) index: the device path must run with
    int64 SA/position arrays and match both the oracle and the int32
    device mapping exactly (the reference's 64-bit RapMap index,
    include/SailfishIndex.hpp:123-140, is behaviorally identical to the
    32-bit one below 2^31 bases — so the scaled-down forced mode is a
    faithful differential test)."""
    from sailfish_tpu.index.builder import build_index

    idx64 = build_index(
        toy_world["names"], toy_world["seqs"], k=31, force_big_sa=True
    )
    assert idx64.big_sa
    opts = QuantOpts(batch_size=128)
    ref = RefMapperBackend(idx64, opts)
    dev64 = DeviceMapperBackend(idx64, opts)
    dev32 = DeviceMapperBackend(toy_world["idx"], QuantOpts(batch_size=128))
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](128, err_rate=0.3, seed=21)
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev64.map_pe_batch(b1, b2, exp)
    b32 = dev32.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd) == as_dict(b32)
    assert np.array_equal(br.mapped, bd.mapped)
    assert np.array_equal(
        br.frag_lens[br.unique_paired], bd.frag_lens[bd.unique_paired]
    )


def test_big_sa_pallas_falls_back(toy_world):
    """kernel='pallas' on a big_sa index must transparently route to the
    XLA kernel (the pallas kernel is int32-only) and still match the
    oracle."""
    from sailfish_tpu.index.builder import build_index

    idx64 = build_index(
        toy_world["names"], toy_world["seqs"], k=31, force_big_sa=True
    )
    opts = QuantOpts(batch_size=64, kernel="pallas")
    dev = DeviceMapperBackend(idx64, opts)
    assert dev.opts.kernel == "xla"
    ref = RefMapperBackend(idx64, QuantOpts(batch_size=64))
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.2, seed=22)
    b1, b2 = to_batch(r1), to_batch(r2)
    assert as_dict(ref.map_pe_batch(b1, b2, exp)) == as_dict(
        dev.map_pe_batch(b1, b2, exp)
    )


def test_strict_intersect_orphan_recovery(toy_world):
    """Chimeric fragments (mate1 from one transcript, mate2 from a
    disjoint one): the default fuzzy merge leaves them unmapped while
    --strictIntersect reports BOTH ends' hits as orphans (reference
    src/SailfishQuantify.cpp:204-213 + the --strictIntersect help text);
    device and oracle must agree under both rules."""
    exp = parse_library_format("IU")
    seqs = toy_world["seqs"]
    rng = np.random.default_rng(11)
    r1, r2 = [], []
    for i in range(16):
        a, b = 1, 4  # transcripts without the shared segment
        sa, sb = seqs[a], seqs[b]
        p = int(rng.integers(0, len(sa) - 50))
        q = int(rng.integers(0, len(sb) - 50))
        r1.append(sa[p : p + 50].copy())
        r2.append(dna.revcomp(sb[q : q + 50]).copy())
    b1, b2 = to_batch(r1), to_batch(r2)

    for strict in (False, True):
        opts = QuantOpts(batch_size=16, strict_intersect=strict)
        ref = RefMapperBackend(toy_world["idx"], opts)
        dev = DeviceMapperBackend(toy_world["idx"], opts)
        br = ref.map_pe_batch(b1, b2, exp)
        bd = dev.map_pe_batch(b1, b2, exp)
        assert as_dict(br) == as_dict(bd)
        assert np.array_equal(br.mapped, bd.mapped)
        if strict:
            # both ends' transcripts show up as a joint orphan label
            assert br.mapped.all()
            assert all(1 in lbl and 4 in lbl for lbl in br.labels)
        else:
            assert not br.mapped.any()


def test_pallas_width_guard_routes_wide_batches(toy_world):
    """A batch wider than the pallas kernel's 128bp window routes to
    the xlong fast path (129..256; round 5 — no more silent swap to the
    ~11x slower XLA kernel), and only a batch wider than 256 swaps to
    the XLA kernel.  Both must produce the XLA backend's hit sets."""
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.2, seed=9)
    b1, b2 = to_batch(r1, max_len=136), to_batch(r2, max_len=136)

    pal = DeviceMapperBackend(toy_world["idx"], QuantOpts(
        batch_size=64, kernel="pallas"))
    xla = DeviceMapperBackend(toy_world["idx"], QuantOpts(
        batch_size=64, kernel="xla"))
    bp = pal.map_pe_batch(b1, b2, exp)
    assert pal.opts.kernel == "pallas" and pal._xlong  # no cliff
    bx = xla.map_pe_batch(b1, b2, exp)
    assert as_dict(bp) == as_dict(bx)
    assert np.array_equal(bp.mapped, bx.mapped)

    # > 256: the xlong window ends; the guard swaps to the XLA kernel
    b1w, b2w = to_batch(r1, max_len=264), to_batch(r2, max_len=264)
    pal2 = DeviceMapperBackend(toy_world["idx"], QuantOpts(
        batch_size=64, kernel="pallas"))
    bp2 = pal2.map_pe_batch(b1w, b2w, exp)
    assert pal2.opts.kernel == "xla"
    bx2 = xla.map_pe_batch(b1w, b2w, exp)
    assert as_dict(bp2) == as_dict(bx2)
