"""Multi-host sharding: shard-aware decode (skip, don't parse, other
shards' batches), shard partition correctness, state merge, and the
single-command launcher (subprocess shards -> mergeeq -> one inference
pass).  The reference scales via threads in one process
(src/SailfishQuantify.cpp:1112); the TPU-native analog is one process
per host over round-robin batch shards (SURVEY §2.4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from sailfish_tpu.io.fastq import (
    iter_fastq_batches,
    iter_paired_fastq_batches,
)
from tests.test_io import collect, mkseq, write_fastq


class TestShardIterators:
    def test_shards_partition_the_file(self, tmp_path):
        rng = np.random.default_rng(0)
        seqs = [mkseq(rng, 40) for _ in range(1000)]
        p = write_fastq(tmp_path / "r.fq", seqs)
        full = collect(iter_fastq_batches(p, 100, 40))
        n = 3
        per_shard = [
            collect(iter_fastq_batches(p, 100, 40, shard=(s, n)))
            for s in range(n)
        ]
        # round-robin: shard s owns batch indices s, s+n, ...
        for s, bs in enumerate(per_shard):
            expect = full[s::n]
            assert len(bs) == len(expect)
            for got, exp in zip(bs, expect):
                np.testing.assert_array_equal(got.codes, exp.codes)
                np.testing.assert_array_equal(got.lens, exp.lens)
        total = sum(b.count for bs in per_shard for b in bs)
        assert total == 1000

    def test_paired_shards_partition(self, tmp_path):
        rng = np.random.default_rng(1)
        seqs1 = [mkseq(rng, 36) for _ in range(500)]
        seqs2 = [mkseq(rng, 36) for _ in range(500)]
        p1 = write_fastq(tmp_path / "r1.fq", seqs1)
        p2 = write_fastq(tmp_path / "r2.fq", seqs2)
        full = collect(iter_paired_fastq_batches(p1, p2, 64, 36))
        n = 4
        counts = 0
        for s in range(n):
            bs = collect(
                iter_paired_fastq_batches(p1, p2, 64, 36, shard=(s, n))
            )
            expect = full[s::n]
            assert len(bs) == len(expect)
            for (g1, g2), (e1, e2) in zip(bs, expect):
                np.testing.assert_array_equal(g1.codes, e1.codes)
                np.testing.assert_array_equal(g2.codes, e2.codes)
            counts += sum(b1.count for b1, _ in bs)
        assert counts == 500

    def test_paired_shard_mismatched_files_raise(self, tmp_path):
        rng = np.random.default_rng(2)
        p1 = write_fastq(tmp_path / "a.fq", [mkseq(rng, 30)] * 300)
        p2 = write_fastq(tmp_path / "b.fq", [mkseq(rng, 30)] * 280)
        with pytest.raises(ValueError, match="different read counts"):
            collect(
                iter_paired_fastq_batches(p1, p2, 64, 30, shard=(1, 2))
            )

    def test_decode_threads_match_serial(self, tmp_path):
        rng = np.random.default_rng(3)
        seqs1 = [mkseq(rng, 32) for _ in range(400)]
        seqs2 = [mkseq(rng, 32) for _ in range(400)]
        p1 = write_fastq(tmp_path / "r1.fq", seqs1)
        p2 = write_fastq(tmp_path / "r2.fq", seqs2)
        ser = collect(iter_paired_fastq_batches(p1, p2, 128, 32))
        par = collect(
            iter_paired_fastq_batches(p1, p2, 128, 32, decode_threads=2)
        )
        assert len(ser) == len(par)
        for (a1, a2), (b1, b2) in zip(ser, par):
            np.testing.assert_array_equal(a1.codes, b1.codes)
            np.testing.assert_array_equal(a2.codes, b2.codes)


class TestStateMerge:
    def test_merge_states_sums_counters_and_hist(self, tmp_path):
        from sailfish_tpu.parallel.launcher import _merge_states

        docs = []
        for i in range(3):
            doc = {
                "num_observed": 100 * (i + 1),
                "num_mapped": 90 * (i + 1),
                "num_frag_hits": 10,
                "upper_bound_hits": 5,
                "num_fwd": 3,
                "num_rc": 2,
                "remaining_fl_ops": 0,
                "fl_hist": [i, 2 * i, 1],
            }
            p = tmp_path / f"s{i}.json"
            p.write_text(json.dumps(doc))
            docs.append(str(p))
        out = _merge_states(docs, num_frag_samples=100)
        assert out["num_observed"] == 600
        assert out["num_mapped"] == 540
        assert out["fl_hist"] == [3, 6, 3]
        assert out["remaining_fl_ops"] == 100 - 12


@pytest.mark.slow
class TestLauncherE2E:
    def test_single_command_sharded_quant(self, tmp_path, sample_data):
        """`quant --numShards 2` (no --shardId) must launch both shard
        processes, merge, infer once, and match the unsharded run's eq
        classes exactly."""
        r1, r2, index_dir, unsharded_eq = sample_data
        out = tmp_path / "q"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        cmd = [
            sys.executable, "-m", "sailfish_tpu.cli", "quant",
            "-i", index_dir, "-l", "IU", "-1", r1, "-2", r2,
            "-o", str(out), "--numShards", "2", "--batchSize", "128",
            "--backend", "refimpl", "--dumpEq",
        ]
        rc = subprocess.run(cmd, env=env, cwd="/root/repo",
                            capture_output=True, text=True, timeout=900)
        assert rc.returncode == 0, rc.stderr[-2000:]
        eq_path = out / "aux" / "eq_classes.txt"
        assert eq_path.exists()
        got = sorted(eq_path.read_text().splitlines())
        want = sorted(unsharded_eq.read_text().splitlines())
        assert got == want
        assert (out / "quant.sf").exists()
        # per-shard artifacts kept for debugging
        assert (out / "_shards" / "shard0" / "aux" /
                "eq_classes.txt").exists()


@pytest.fixture(scope="module")
def sample_data(tmp_path_factory):
    """500-read subset of the bundled sample_data + a prebuilt index and
    an unsharded refimpl eq dump to compare against."""
    import tarfile

    root = tmp_path_factory.mktemp("sfdata")
    with tarfile.open("/root/reference/sample_data.tgz") as tf:
        tf.extractall(root)
    sd = root / "sample_data"
    r1 = root / "r1.fq"
    r2 = root / "r2.fq"
    for src, dst in ((sd / "reads_1.fastq", r1), (sd / "reads_2.fastq", r2)):
        with open(src, "rb") as fin, open(dst, "wb") as fout:
            for _ in range(2000):
                line = fin.readline()
                if not line:
                    break
                fout.write(line)

    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.index.builder import (
        build_index_from_fasta, save_index,
    )
    from sailfish_tpu.quant import run_quant

    idx = build_index_from_fasta(str(sd / "transcripts.fasta"), k=31)
    index_dir = root / "idx"
    save_index(idx, str(index_dir))

    out = root / "ref_run"
    opts = QuantOpts(
        index_dir=str(index_dir), output_dir=str(out), lib_type="IU",
        mates1=[str(r1)], mates2=[str(r2)], batch_size=128,
        dump_eq=True, map_only=True,
    )
    run_quant(opts, backend="refimpl")
    return str(r1), str(r2), str(index_dir), out / "aux" / "eq_classes.txt"
