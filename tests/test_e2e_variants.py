"""End-to-end variants: single-end quant, VBEM, unsmoothed FLD, and
backend agreement on each."""

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.quant import run_quant


def _opts(index_dir, out, sample, **kw):
    base = dict(
        index_dir=index_dir,
        output_dir=out,
        lib_type="IU",
        mates1=[sample["reads1"]],
        mates2=[sample["reads2"]],
        batch_size=4096,
        dtype="float64",
    )
    base.update(kw)
    return QuantOpts(**base)


def test_single_end_quant(sample_data, sample_index, tmp_path):
    _, index_dir = sample_index
    res = {}
    for backend in ("device", "refimpl"):
        opts = _opts(
            index_dir, str(tmp_path / backend), sample_data,
            lib_type="U", mates1=[], mates2=[],
            unmated_reads=[sample_data["reads1"]],
        )
        res[backend] = run_quant(opts, backend=backend)
    assert res["device"]["num_mapped"] == res["refimpl"]["num_mapped"] == 10000
    np.testing.assert_allclose(
        res["device"]["alphas"], res["refimpl"]["alphas"], rtol=1e-9
    )
    # SE path uses the normal-prior FLD for effective lengths
    eff = res["device"]["eff_lens"]
    assert np.all(eff < 10000) and np.all(eff > 0)


def test_vbem_quant(sample_data, sample_index, tmp_path):
    _, index_dir = sample_index
    opts = _opts(index_dir, str(tmp_path / "vb"), sample_data, use_vb_opt=True)
    res = run_quant(opts, backend="device")
    assert res["num_mapped"] == 10000
    # VBEM estimates are close to EM on well-identified data
    alphas = res["alphas"]
    assert abs(alphas.sum() - 10000) < 50  # prior adds ~0.01/txp


def test_unsmoothed_fld_quant(sample_data, sample_index, tmp_path):
    # sample_data yields ~6.8k unique-paired observations; lower the
    # requirement so the empirical FLD path (not the prior fallback)
    # is exercised
    _, index_dir = sample_index
    opts = _opts(
        index_dir, str(tmp_path / "us"), sample_data,
        use_unsmoothed_fld=True, num_frag_samples=2000,
    )
    res = run_quant(opts, backend="device")
    assert res["num_mapped"] == 10000
    smoothed = run_quant(
        _opts(index_dir, str(tmp_path / "sm"), sample_data,
              num_frag_samples=2000),
        backend="device",
    )
    # same mapping, different effective-length model
    assert res["num_eq_classes"] == smoothed["num_eq_classes"]
    assert not np.allclose(res["eff_lens"], smoothed["eff_lens"])


def test_ignore_and_enforce_compat(sample_data, sample_index, tmp_path):
    _, index_dir = sample_index
    res_ign = run_quant(
        _opts(index_dir, str(tmp_path / "ig"), sample_data,
              ignore_lib_compat=True),
        backend="device",
    )
    assert res_ign["num_mapped"] == 10000
    # MSF expects both mates on the same strand — never true of proper
    # inward pairs; enforcing it discards everything and the run errors
    # out like the reference (optimize() failure -> exit)
    with pytest.raises(RuntimeError, match="no transcripts"):
        run_quant(
            _opts(index_dir, str(tmp_path / "en"), sample_data,
                  lib_type="MSF", enforce_lib_compat=True),
            backend="device",
        )


def test_kernel_auto_quant(sample_data, sample_index, tmp_path):
    """kernel="auto" resolves per backend/inputs (XLA kernel on this
    CPU test platform) and quantifies identically to an explicit
    kernel choice."""
    _, index_dir = sample_index
    res_a = run_quant(_opts(index_dir, str(tmp_path / "a"), sample_data,
                            kernel="auto"))
    res_x = run_quant(_opts(index_dir, str(tmp_path / "x"), sample_data,
                            kernel="xla"))
    assert res_a["num_mapped"] == res_x["num_mapped"]
    np.testing.assert_array_equal(res_a["alphas"], res_x["alphas"])
