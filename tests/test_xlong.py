"""Long-read (>128bp) mapping: the xlong fast path (map/xlong.py).

Reference capability pinned: RapMap handles arbitrary read lengths
(/root/reference/src/SailfishQuantify.cpp:105-452) — there must be no
behavior cliff at 128bp, and no silent kernel swap."""

import numpy as np
import jax.numpy as jnp
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.encode import make_oriented_lanes
from sailfish_tpu.map.kernels import map_oriented_lanes
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend

from conftest import to_batch


def _label_dict(br):
    return dict(zip(br.labels, map(int, br.label_counts)))


def test_xlong_backend_matches_oracle_150bp(toy_world):
    """150bp PE (the dominant modern Illumina config) through the
    device backend must produce the oracle's eq classes exactly —
    via the xlong fast path, not a silent XLA-kernel swap."""
    opts_p = QuantOpts(batch_size=128, hit_capacity=16, kernel="pallas")
    opts_r = QuantOpts(batch_size=128, hit_capacity=16)
    dev = DeviceMapperBackend(toy_world["idx"], opts_p)
    ref = RefMapperBackend(toy_world["idx"], opts_r)
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](
        128, readlen=150, flmin=170, flmax=350, err_rate=0.3, seed=41)
    b1, b2 = to_batch(r1, max_len=160), to_batch(r2, max_len=160)
    bp = dev.map_pe_batch(b1, b2, exp)
    # the cliff is gone: the backend stayed on the fast path
    assert dev.opts.kernel == "pallas"
    assert getattr(dev, "_xlong", False)
    br = ref.map_pe_batch(b1, b2, exp)
    assert _label_dict(bp) == _label_dict(br)
    np.testing.assert_array_equal(bp.mapped, br.mapped)
    np.testing.assert_array_equal(
        bp.frag_lens[bp.unique_paired], br.frag_lens[br.unique_paired]
    )


def test_xlong_matches_xla_kernel_direct(toy_world):
    """Function-level differential: xlong vs the plain XLA kernel on
    mixed-length long reads with errors and Ns."""
    from sailfish_tpu.map.pallas_kernel import prepare_pallas_text
    from sailfish_tpu.map.xlong import map_oriented_lanes_xlong

    idx = toy_world["idx"]
    dev = DeviceMapperBackend(idx, QuantOpts())
    rng = np.random.default_rng(17)
    B, L = 64, 192
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        s = toy_world["seqs"][i % len(toy_world["seqs"])]
        U = int(rng.integers(130, 185))
        p = int(rng.integers(0, len(s) - U))
        m = s[p : p + U].copy()
        if i % 3 == 0:
            q = int(rng.integers(0, U))
            m[q] = (m[q] + 1) % 4
        if i % 7 == 0:
            m[int(rng.integers(0, U))] = 4  # N base
        if i % 5 == 0:
            m = (3 - m[::-1]).astype(np.uint8)
            m[m > 3] = 4
        codes[i, :U] = m
        lens[i] = U
    codes[B - 2 :] = 4
    lens[B - 2 :] = 0

    pt = prepare_pallas_text(idx, cand_cap=16, pk_words=24)
    n_text = pt.pop("n_text")
    pt.pop("filt_bits")
    w16_bits = pt.pop("w16_bits")
    filtxl_bits = pt.pop("filtxl_bits")
    res_l = map_oriented_lanes_xlong(
        pt, dev.text, jnp.asarray(codes), jnp.asarray(lens),
        k=idx.k, prefix_bases=idx.prefix_bases, cand_cap=16,
        max_mmps=4, max_steps=L, ht_bits=dev.ht_bits,
        ht_probes=dev.ht_probes, n_text=n_text, w16_bits=w16_bits,
        filtxl_bits=filtxl_bits,
    )
    lanes = make_oriented_lanes(jnp.asarray(codes), jnp.asarray(lens),
                                idx.prefix_bases)
    res_x = map_oriented_lanes(
        dev.text, lanes, k=idx.k, prefix_bases=idx.prefix_bases,
        cand_cap=16, max_mmps=4, max_steps=L, use_hash=True,
        ht_probes=dev.ht_probes, ht_bits=dev.ht_bits, skip_jump=False,
    )
    va, vb = np.asarray(res_l["valid"]), np.asarray(res_x["valid"])
    np.testing.assert_array_equal(va, vb)
    for key in ("txp", "pos"):
        a, b = np.asarray(res_l[key]), np.asarray(res_x[key])
        np.testing.assert_array_equal(a[va], b[vb], err_msg=key)
    np.testing.assert_array_equal(
        np.asarray(res_l["mlen"]), np.asarray(res_x["mlen"]))
    np.testing.assert_array_equal(
        np.asarray(res_l["overflow"]), np.asarray(res_x["overflow"]))


def test_xlong_spill_escalates_exactly(toy_world, monkeypatch):
    """A tiny residual prefix forces xlong spills; the overflow ->
    escalation remap must recover the oracle's classes exactly."""
    monkeypatch.setenv("SF_XLONG_PK", "8")  # floor: 64 rows
    opts_p = QuantOpts(batch_size=96, hit_capacity=16,
                       hit_capacity_max=32, kernel="pallas")
    opts_r = QuantOpts(batch_size=96, hit_capacity=16,
                       hit_capacity_max=32)
    dev = DeviceMapperBackend(toy_world["idx"], opts_p)
    ref = RefMapperBackend(toy_world["idx"], opts_r)
    exp = parse_library_format("IU")
    # high error rate -> many xscan punts -> residual overflows 64 rows
    r1, r2, _ = toy_world["sim"](
        96, readlen=150, flmin=170, flmax=350, err_rate=0.9, seed=43)
    b1, b2 = to_batch(r1, max_len=160), to_batch(r2, max_len=160)
    bp = dev.map_pe_batch(b1, b2, exp)
    br = ref.map_pe_batch(b1, b2, exp)
    assert _label_dict(bp) == _label_dict(br)
    np.testing.assert_array_equal(bp.mapped, br.mapped)


def test_xlong_se_matches_oracle(toy_world):
    opts_p = QuantOpts(batch_size=64, hit_capacity=16, kernel="pallas")
    opts_r = QuantOpts(batch_size=64, hit_capacity=16)
    dev = DeviceMapperBackend(toy_world["idx"], opts_p)
    ref = RefMapperBackend(toy_world["idx"], opts_r)
    exp = parse_library_format("U")
    r1, _, _ = toy_world["sim"](
        64, readlen=150, flmin=170, flmax=350, err_rate=0.3, seed=47)
    b = to_batch(r1, max_len=160)
    bp = dev.map_se_batch(b, exp)
    br = ref.map_se_batch(b, exp)
    assert _label_dict(bp) == _label_dict(br)
    np.testing.assert_array_equal(bp.mapped, br.mapped)
