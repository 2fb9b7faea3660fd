"""xla2 (round-compacted scan) vs the sequential XLA kernel and oracle.

The xla2 kernel must be bit-identical to map/kernels.py on every input:
same hit sets, mlen, and overflow flags — the rounds/sweep/tiering are
pure reorganizations of the same per-position semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.index.builder import build_index
from sailfish_tpu.index.kmerhash import build_kmer_bloom
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.encode import make_oriented_lanes
from sailfish_tpu.map.kernels import map_oriented_lanes
from sailfish_tpu.map.kernels2 import map_oriented_lanes_xla2
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend

from conftest import to_batch


def _xla2_text(dev, bits_per_key=16, fused=False):
    bloom = build_kmer_bloom(
        dev._index.kmer_ht, max_bits_log2=30, bits_per_key=bits_per_key
    )
    t2 = dict(dev.text)
    t2["filt_words"] = jnp.asarray(
        bloom["filt_rows"].reshape(-1).view(np.uint32)
    )
    if fused:
        ht = dev._index.kmer_ht
        t2["ht_fused"] = jnp.asarray(np.stack(
            [ht["ht_key0"].view(np.uint32),
             ht["ht_key1"].view(np.uint32),
             ht["ht_lo"].view(np.uint32),
             ht["ht_cnt"].view(np.uint32)],
            axis=-1,
        ).reshape(ht["ht_key0"].shape[0], -1))
        i5 = dev._index
        t2["pos_meta"] = jnp.asarray(np.stack(
            [i5.sep_dist.astype(np.int32),
             i5.txp_of_pos,
             i5.txp_offsets.astype(np.int32)[i5.txp_of_pos]],
            axis=-1,
        ))
        t2["txt_align"] = jnp.asarray(np.ascontiguousarray(
            np.concatenate([i5.packed16, np.zeros(512, np.uint32)])[::16]
        ))
    return t2, int(bloom["filt_bits_log2"])


def _run_both(dev, codes, lens, *, cand_cap, max_mmps, max_steps,
              skip_jump=False, fused=False, **x2kw):
    text2, fbits = _xla2_text(dev, fused=fused)
    lanes = make_oriented_lanes(
        jnp.asarray(codes), jnp.asarray(lens), dev.prefix_bases
    )
    res2 = map_oriented_lanes_xla2(
        text2, lanes, k=dev.k, cand_cap=cand_cap, max_mmps=max_mmps,
        max_steps=max_steps, ht_probes=dev.ht_probes, ht_bits=dev.ht_bits,
        skip_jump=skip_jump, filt_bits=fbits, **x2kw,
    )
    res1 = map_oriented_lanes(
        dev.text, lanes, k=dev.k, prefix_bases=dev.prefix_bases,
        cand_cap=cand_cap, max_mmps=max_mmps, max_steps=max_steps,
        use_hash=True, ht_probes=dev.ht_probes, ht_bits=dev.ht_bits,
        skip_jump=skip_jump,
    )
    return res1, res2


def _assert_equal(res1, res2):
    v1 = np.asarray(res1["valid"])
    v2 = np.asarray(res2["valid"])
    np.testing.assert_array_equal(v1, v2)
    for key in ("txp", "pos"):
        a = np.asarray(res1[key])
        b = np.asarray(res2[key])
        np.testing.assert_array_equal(a[v1], b[v2])
    np.testing.assert_array_equal(
        np.asarray(res1["mlen"]), np.asarray(res2["mlen"])
    )
    np.testing.assert_array_equal(
        np.asarray(res1["overflow"]), np.asarray(res2["overflow"])
    )


def _sim_batch(toy_world, n, rng, err_rate=0.3, readlen=50, L=56):
    codes = np.full((n, L), 4, np.uint8)
    lens = np.full(n, readlen, np.int32)
    seqs = toy_world["seqs"]
    for i in range(n):
        s = seqs[int(rng.integers(0, len(seqs)))]
        p = int(rng.integers(0, len(s) - readlen))
        m = s[p : p + readlen].copy()
        if rng.random() < err_rate:
            for _ in range(int(rng.integers(1, 4))):
                q = int(rng.integers(0, readlen))
                m[q] = (m[q] + 1) % 4
        if i % 11 == 0:
            m[int(rng.integers(0, readlen))] = 4  # N
        if i % 17 == 0:
            m[:] = rng.integers(0, 4, readlen)  # garbage (unmappable)
        codes[i, :readlen] = m
    return codes, lens


@pytest.mark.parametrize("sweep,fused", [(0, False), (1, False),
                                         (3, True), (8, True)])
def test_xla2_matches_xla_kernel(toy_world, sweep, fused):
    dev = DeviceMapperBackend(toy_world["idx"], QuantOpts())
    rng = np.random.default_rng(11)
    codes, lens = _sim_batch(toy_world, 96, rng)
    for skip in (False, True):
        res1, res2 = _run_both(
            dev, codes, lens, cand_cap=16, max_mmps=4, max_steps=56,
            skip_jump=skip, sweep_win=sweep, fused=fused,
        )
        _assert_equal(res1, res2)


def test_xla2_tiny_buffers_still_exact(toy_world):
    """Deferral correctness: tiny round/tail/wide buffers change only
    speed, never results."""
    dev = DeviceMapperBackend(toy_world["idx"], QuantOpts())
    rng = np.random.default_rng(13)
    codes, lens = _sim_batch(toy_world, 64, rng, err_rate=0.6)
    for sweep in (0, 2):
        res1, res2 = _run_both(
            dev, codes, lens, cand_cap=8, max_mmps=3, max_steps=56,
            n_rounds=2, floor_width=16, wide_div=128, tail_width=16,
            sweep_win=sweep,
        )
        _assert_equal(res1, res2)


def test_xla2_paralogs_and_overflow():
    """Near-identical transcripts: wide candidate sets exercise the
    wide tier and the overflow rule across the cap boundary."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 500).astype(np.uint8)
    seqs = []
    for t in range(24):
        s = base.copy()
        for _ in range(t % 5):
            q = int(rng.integers(0, len(s)))
            s[q] = (s[q] + 1) % 4
        seqs.append(s)
    idx = build_index([f"p{i}" for i in range(24)], seqs, k=31)
    dev = DeviceMapperBackend(idx, QuantOpts())
    codes = np.full((32, 56), 4, np.uint8)
    lens = np.full(32, 50, np.int32)
    for i in range(32):
        p = int(rng.integers(0, 450))
        codes[i, :50] = seqs[i % 24][p : p + 50]
    for cap in (4, 8, 32):
        for sweep in (0, 8):
            res1, res2 = _run_both(
                dev, codes, lens, cand_cap=cap, max_mmps=4, max_steps=56,
                sweep_win=sweep,
            )
            _assert_equal(res1, res2)


def test_xla2_backend_matches_oracle(toy_world):
    opts2 = QuantOpts(batch_size=128, hit_capacity=16, kernel="xla2",
                      xla2_sweep_win=8)
    opts_r = QuantOpts(batch_size=128, hit_capacity=16)
    dev = DeviceMapperBackend(toy_world["idx"], opts2)
    ref = RefMapperBackend(toy_world["idx"], opts_r)
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](128, err_rate=0.3, seed=37)
    b1, b2 = to_batch(r1), to_batch(r2)
    bp = dev.map_pe_batch(b1, b2, exp)
    br = ref.map_pe_batch(b1, b2, exp)
    dp = dict(zip(bp.labels, map(int, bp.label_counts)))
    dr = dict(zip(br.labels, map(int, br.label_counts)))
    assert dp == dr
    np.testing.assert_array_equal(bp.mapped, br.mapped)
    np.testing.assert_array_equal(
        bp.frag_lens[bp.unique_paired], br.frag_lens[br.unique_paired]
    )
    np.testing.assert_array_equal(bp.fmt_counts, br.fmt_counts)
    # single-end through the same backends (exercises submit_se
    # packing + the xla2 kernel on mixed-orientation lanes)
    exp_se = parse_library_format("U")
    reads = r1[:64] + r2[64:128]
    bs = to_batch(reads)
    sp = dev.map_se_batch(bs, exp_se)
    sr = ref.map_se_batch(bs, exp_se)
    assert dict(zip(sp.labels, map(int, sp.label_counts))) == \
        dict(zip(sr.labels, map(int, sr.label_counts)))
    np.testing.assert_array_equal(sp.mapped, sr.mapped)


def test_xla2_small_k():
    """k=17 (key1 carries a single top base) exercises the packed-word
    seeding edge; k<17 indexes have no k-mer hash, so the backend must
    fall back from xla2 to the binary-search XLA kernel cleanly."""
    rng = np.random.default_rng(21)
    seqs = [rng.integers(0, 4, 300).astype(np.uint8) for _ in range(6)]
    idx = build_index([f"s{i}" for i in range(6)], seqs, k=17)
    dev = DeviceMapperBackend(idx, QuantOpts())
    codes = np.full((48, 40), 4, np.uint8)
    lens = np.full(48, 36, np.int32)
    for i in range(48):
        p = int(rng.integers(0, 260))
        m = seqs[i % 6][p : p + 36].copy()
        if i % 4 == 0:
            q = int(rng.integers(0, 36))
            m[q] = (m[q] + 1) % 4
        codes[i, :36] = m
    for sweep in (0, 8):
        res1, res2 = _run_both(
            dev, codes, lens, cand_cap=8, max_mmps=4, max_steps=40,
            sweep_win=sweep, fused=(sweep > 0),
        )
        _assert_equal(res1, res2)
    # no hash table at k=15: xla2 falls back to the XLA kernel
    idx15 = build_index([f"s{i}" for i in range(6)], seqs, k=15)
    bk = DeviceMapperBackend(idx15, QuantOpts(kernel="xla2"))
    assert bk.opts.kernel == "xla"
