"""Checkpoint/resume via the eq-class dump, and cross-shard merge."""

import os

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.eqclass.io import merge_eq_dumps, read_eq_classes
from sailfish_tpu.quant import run_quant


@pytest.fixture(scope="module")
def dumped_run(sample_data, sample_index, tmp_path_factory):
    _, index_dir = sample_index
    out = str(tmp_path_factory.mktemp("dump"))
    opts = QuantOpts(
        index_dir=index_dir,
        output_dir=out,
        lib_type="IU",
        mates1=[sample_data["reads1"]],
        mates2=[sample_data["reads2"]],
        batch_size=4096,
        dump_eq=True,
        dtype="float64",
    )
    stats = run_quant(opts, backend="device")
    return index_dir, out, stats


def test_resume_from_dump(dumped_run, tmp_path):
    index_dir, out, stats = dumped_run
    opts = QuantOpts(
        index_dir=index_dir,
        output_dir=str(tmp_path / "resumed"),
        lib_type="IU",
        resume_from_eq=out,
        dtype="float64",
    )
    res = run_quant(opts)
    assert res["num_mapped"] == stats["num_mapped"]
    assert res["num_eq_classes"] == stats["num_eq_classes"]
    # same classes -> same EM fixed point up to the FLD difference
    # (resume uses the prior FLD); with the sample's ~6.8k unique-paired
    # observations the original run also used the prior, so equality is
    # exact here
    np.testing.assert_allclose(res["alphas"], stats["alphas"], rtol=1e-9)
    assert os.path.exists(tmp_path / "resumed" / "quant.sf")


def test_read_eq_roundtrip(dumped_run):
    index_dir, out, stats = dumped_run
    names, eq = read_eq_classes(os.path.join(out, "aux", "eq_classes.txt"))
    assert len(names) == 15
    assert eq.num_classes == stats["num_eq_classes"]
    assert eq.total_count() == stats["num_mapped"]


def test_merge_eq_dumps(dumped_run, tmp_path):
    index_dir, out, stats = dumped_run
    dump = os.path.join(out, "aux", "eq_classes.txt")
    names, merged = merge_eq_dumps([dump, dump])
    orig_names, orig = read_eq_classes(dump)
    assert names == orig_names
    assert merged.num_classes == orig.num_classes
    assert merged.total_count() == 2 * orig.total_count()
    # labels identical, counts doubled
    np.testing.assert_array_equal(merged.members, orig.members)
    np.testing.assert_array_equal(merged.counts, 2 * orig.counts)


def test_mergeeq_cli(dumped_run, tmp_path):
    from sailfish_tpu.cli import main

    index_dir, out, stats = dumped_run
    merged_path = str(tmp_path / "merged" / "eq_classes.txt")
    rc = main(["mergeeq", out, out, "-o", merged_path])
    assert rc == 0
    names, eq = read_eq_classes(merged_path)
    assert eq.total_count() == 2 * stats["num_mapped"]
