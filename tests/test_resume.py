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


def test_sharded_runs_merge_to_single_run(sample_data, sample_index, tmp_path):
    """Two half-input quant runs + mergeeq + resume == one full run (the
    multi-host flow: per-host shards dump classes, rank 0 merges and
    re-infers)."""
    _, index_dir = sample_index

    # split the sample fastqs in half
    def split(path, stem):
        lines = open(path).read().splitlines(keepends=False)
        half = (len(lines) // 8) * 4  # whole records
        a = tmp_path / f"{stem}_a.fq"
        b = tmp_path / f"{stem}_b.fq"
        a.write_text("\n".join(lines[:half]) + "\n")
        b.write_text("\n".join(lines[half:]) + "\n")
        return str(a), str(b)

    r1a, r1b = split(sample_data["reads1"], "r1")
    r2a, r2b = split(sample_data["reads2"], "r2")

    outs = []
    for tag, m1, m2 in (("a", r1a, r2a), ("b", r1b, r2b)):
        opts = QuantOpts(
            index_dir=index_dir, output_dir=str(tmp_path / f"shard_{tag}"),
            lib_type="IU", mates1=[m1], mates2=[m2], batch_size=4096,
            dump_eq=True, dtype="float64",
        )
        run_quant(opts, backend="device")
        outs.append(str(tmp_path / f"shard_{tag}"))

    merged = tmp_path / "merged_eq.txt"
    from sailfish_tpu.cli import main

    assert main(["mergeeq", outs[0], outs[1], "-o", str(merged)]) == 0

    res_merged = run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(tmp_path / "from_merge"),
        lib_type="IU", resume_from_eq=str(merged), dtype="float64",
    ))

    # single full run for comparison (prior FLD path to match resume)
    res_full = run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(tmp_path / "full"),
        lib_type="IU", mates1=[sample_data["reads1"]],
        mates2=[sample_data["reads2"]], batch_size=4096, dtype="float64",
    ), backend="device")

    assert res_merged["num_mapped"] == res_full["num_mapped"] == 10000
    assert res_merged["num_eq_classes"] == res_full["num_eq_classes"]
    np.testing.assert_allclose(
        res_merged["alphas"], res_full["alphas"], rtol=1e-9
    )


def test_resume_restores_quant_state(dumped_run, tmp_path):
    """dump_eq now writes a sibling quant_state.json; a resume restores
    the real counters and FLD histogram instead of approximating them
    from the dump's total count."""
    index_dir, out, stats = dumped_run
    assert os.path.exists(os.path.join(out, "aux", "quant_state.json"))
    res = run_quant(QuantOpts(
        index_dir=index_dir,
        output_dir=str(tmp_path / "resumed_state"),
        lib_type="IU",
        resume_from_eq=out,
        dtype="float64",
    ))
    assert res["num_observed"] == stats["num_observed"]
    assert res["num_mapped"] == stats["num_mapped"]
    np.testing.assert_allclose(res["alphas"], stats["alphas"], rtol=1e-12)
    # the resumed run re-derives identical effective lengths (same FLD)
    np.testing.assert_allclose(res["eff_lens"], stats["eff_lens"], rtol=1e-12)


def test_streaming_checkpoint_and_resume(sample_data, sample_index, tmp_path):
    """--checkpointInterval writes restartable mid-run checkpoints; a
    resume from one quantifies the prefix seen so far."""
    _, index_dir = sample_index
    out = str(tmp_path / "ckpt")
    run_quant(QuantOpts(
        index_dir=index_dir, output_dir=out, lib_type="IU",
        mates1=[sample_data["reads1"]], mates2=[sample_data["reads2"]],
        batch_size=1024, checkpoint_interval=2048, dtype="float64",
    ), backend="device")
    # checkpoints fire at >=2048 then every 2048: last at 8192 of 10000
    assert os.path.exists(os.path.join(out, "aux", "eq_classes.txt"))
    assert os.path.exists(os.path.join(out, "aux", "quant_state.json"))
    import json as _json

    st = _json.load(open(os.path.join(out, "aux", "quant_state.json")))
    assert st["num_observed"] == 8192

    res = run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(tmp_path / "ckpt_resumed"),
        lib_type="IU", resume_from_eq=out, dtype="float64",
    ))
    assert res["num_observed"] == 8192
    assert res["num_mapped"] <= 8192
    assert os.path.exists(tmp_path / "ckpt_resumed" / "quant.sf")


def test_meta_has_timings(dumped_run):
    import json as _json

    _, out, _ = dumped_run
    meta = _json.load(open(os.path.join(out, "aux", "meta_info.json")))
    t = meta["quant_timings"]
    assert t["mapping_seconds"] > 0
    assert t["index_load_seconds"] >= 0
    assert t["inference_seconds"] >= 0
    assert t["reads_per_sec"] > 0


def test_shard_flags_merge_to_single_run(sample_data, sample_index, tmp_path):
    """--numShards/--shardId round-robin batch sharding: two shard runs +
    mergeeq reproduce the full run without manual FASTQ splitting."""
    _, index_dir = sample_index
    outs = []
    for sid in (0, 1):
        opts = QuantOpts(
            index_dir=index_dir, output_dir=str(tmp_path / f"s{sid}"),
            lib_type="IU", mates1=[sample_data["reads1"]],
            mates2=[sample_data["reads2"]], batch_size=2048,
            num_shards=2, shard_id=sid, dump_eq=True, dtype="float64",
        )
        run_quant(opts, backend="device")
        outs.append(str(tmp_path / f"s{sid}"))

    from sailfish_tpu.cli import main

    merged = tmp_path / "merged_eq.txt"
    assert main(["mergeeq", outs[0], outs[1], "-o", str(merged)]) == 0
    names, eq = read_eq_classes(str(merged))
    assert eq.total_count() == 10000

    res = run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(tmp_path / "sharded_merge"),
        lib_type="IU", resume_from_eq=str(merged), dtype="float64",
    ))
    full = run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(tmp_path / "sharded_full"),
        lib_type="IU", mates1=[sample_data["reads1"]],
        mates2=[sample_data["reads2"]], batch_size=2048, dtype="float64",
    ), backend="device")
    assert res["num_eq_classes"] == full["num_eq_classes"]
    np.testing.assert_allclose(res["alphas"], full["alphas"], rtol=1e-9)


def test_shard_id_out_of_range(sample_index, sample_data, tmp_path):
    _, index_dir = sample_index
    with pytest.raises(ValueError, match="shard_id"):
        run_quant(QuantOpts(
            index_dir=index_dir, output_dir=str(tmp_path / "bad"),
            lib_type="IU", mates1=[sample_data["reads1"]],
            mates2=[sample_data["reads2"]], num_shards=2, shard_id=2,
        ))
