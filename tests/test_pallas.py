"""Pallas mapping kernel vs the XLA kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.encode import make_oriented_lanes
from sailfish_tpu.map.kernels import map_oriented_lanes
from sailfish_tpu.map.pallas_kernel import (
    map_oriented_lanes_pallas,
    prepare_pallas_text,
)
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend

from conftest import to_batch


def test_pallas_matches_xla_kernel(toy_world):
    idx = toy_world["idx"]
    dev = DeviceMapperBackend(idx, QuantOpts())
    rng = np.random.default_rng(3)
    B, L = 64, 56
    codes = np.full((B, L), 4, np.uint8)
    lens = np.full(B, 50, np.int32)
    for i in range(B):
        s = toy_world["seqs"][i % len(toy_world["seqs"])]
        p = int(rng.integers(0, len(s) - 50))
        m = s[p : p + 50].copy()
        if i % 3 == 0:
            q = int(rng.integers(0, 50))
            m[q] = (m[q] + 1) % 4
        if i % 7 == 0:
            m[10] = 4  # N base
        codes[i, :50] = m
    pt = prepare_pallas_text(idx, cand_cap=16)
    res_p = map_oriented_lanes_pallas(
        pt, jnp.asarray(codes), jnp.asarray(lens),
        k=idx.k, cand_cap=16, max_mmps=4, max_steps=4,
        ht_bits=dev.ht_bits, ht_probes=dev.ht_probes, interpret=True,
    )
    lanes = make_oriented_lanes(jnp.asarray(codes), jnp.asarray(lens),
                                idx.prefix_bases)
    res_x = map_oriented_lanes(
        dev.text, lanes, k=idx.k, prefix_bases=idx.prefix_bases,
        cand_cap=16, max_mmps=4, max_steps=4, use_hash=True,
        ht_probes=dev.ht_probes, ht_bits=dev.ht_bits,
    )
    va, vb = np.asarray(res_p["valid"]), np.asarray(res_x["valid"])
    np.testing.assert_array_equal(va, vb)
    for key in ("txp", "pos"):
        a, b = np.asarray(res_p[key]), np.asarray(res_x[key])
        np.testing.assert_array_equal(a[va], b[vb])
    np.testing.assert_array_equal(
        np.asarray(res_p["mlen"]), np.asarray(res_x["mlen"])
    )
    np.testing.assert_array_equal(
        np.asarray(res_p["overflow"]), np.asarray(res_x["overflow"])
    )


def test_pallas_backend_matches_oracle(toy_world):
    """Full backend with kernel='pallas' equals the numpy oracle."""
    opts_p = QuantOpts(batch_size=128, hit_capacity=16, kernel="pallas")
    opts_r = QuantOpts(batch_size=128, hit_capacity=16)
    dev = DeviceMapperBackend(toy_world["idx"], opts_p)
    ref = RefMapperBackend(toy_world["idx"], opts_r)
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](128, err_rate=0.3, seed=31)
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


def test_packed_lane_build_matches_codes_path(toy_world, monkeypatch):
    """The pack-domain lane build from H2D 2-bit words (packed=...)
    must produce bit-identical mapping output to the u8-codes lane
    build, including N reads, errors, uniform-length RC flip, and the
    xscan production config (full scan budget)."""
    from sailfish_tpu.map.pipeline import _pack_reads

    idx = toy_world["idx"]
    dev = DeviceMapperBackend(idx, QuantOpts())
    rng = np.random.default_rng(11)
    B, L = 64, 56
    U = 50
    codes = np.full((B, L), 4, np.uint8)
    lens = np.full(B, U, np.int32)
    for i in range(B):
        s = toy_world["seqs"][i % len(toy_world["seqs"])]
        p = int(rng.integers(0, len(s) - U))
        m = s[p : p + U].copy()
        if i % 3 == 0:
            q = int(rng.integers(0, U))
            m[q] = (m[q] + 1) % 4
        if i % 7 == 0:
            m[int(rng.integers(0, U))] = 4  # N base
        if i % 5 == 0:  # revcomp reads exercise the RC lane block
            m = (3 - m[::-1]).astype(np.uint8)
            m[m > 3] = 4
        codes[i, :U] = m
    # a couple of dead padding rows like _pad_batch produces
    codes[B - 2 :] = 4
    lens[B - 2 :] = 0
    pw, nm = _pack_reads(codes)
    pt = prepare_pallas_text(idx, cand_cap=16)
    kw = dict(
        k=idx.k, cand_cap=16, max_mmps=4, max_steps=L,
        ht_bits=dev.ht_bits, ht_probes=dev.ht_probes, interpret=True,
        uniform_len=U,
    )
    monkeypatch.setenv("SF_PACKED_LANES", "1")
    res_p = map_oriented_lanes_pallas(
        pt, jnp.asarray(codes), jnp.asarray(lens),
        packed=(jnp.asarray(pw), jnp.asarray(nm)), **kw,
    )
    res_c = map_oriented_lanes_pallas(
        pt, jnp.asarray(codes), jnp.asarray(lens), **kw,
    )
    for key in ("valid", "txp", "pos", "mlen", "overflow",
                "num_mapped_loci"):
        a, b = np.asarray(res_p[key]), np.asarray(res_c[key])
        if key in ("txp", "pos"):
            va = np.asarray(res_p["valid"])
            np.testing.assert_array_equal(a[va], b[va], err_msg=key)
        else:
            np.testing.assert_array_equal(a, b, err_msg=key)


def test_prepare_pallas_text_disk_cache(toy_world, tmp_path):
    """The prepared-arrays disk cache round-trips bit-identically and
    invalidates on pk_words / index changes."""
    idx = toy_world["idx"]
    cd = str(tmp_path / "pc")
    a = prepare_pallas_text(idx, cand_cap=16, cache_dir=cd)
    files = list((tmp_path / "pc").glob("pallas_pk16_*.npz"))
    assert len(files) == 1
    b = prepare_pallas_text(idx, cand_cap=16, cache_dir=cd)  # load path
    for k in ("text_rows", "sa_rows", "ht_rows", "filt_rows",
              "w16_rows", "pk_rows", "ht16", "filtxl_rows", "sa_ov"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    for k in ("n_text", "filt_bits", "filtxl_bits", "w16_bits"):
        assert a[k] == b[k]
    prepare_pallas_text(idx, cand_cap=16, pk_words=24, cache_dir=cd)
    assert len(list((tmp_path / "pc").glob("pallas_pk24_*.npz"))) == 1
