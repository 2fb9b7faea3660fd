"""End-to-end sharded-index quant through the public CLI surface.

Builds the reference sample-data index both monolithic and 4-way
sharded, quantifies the same reads through both, and requires
byte-identical quant.sf and eq_classes.txt — the >HBM path is not
allowed to change results at all.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    PALLAS_AXON_POOL_IPS="",
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)


def _run(*args):
    r = subprocess.run(
        [sys.executable, "-m", "sailfish_tpu.cli", *args],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r


@pytest.fixture(scope="module")
def reads(sample_data, tmp_path_factory):
    root = tmp_path_factory.mktemp("shcli")
    for m in (1, 2):
        with open(sample_data[f"reads{m}"]) as src, \
                open(root / f"r{m}.fq", "w") as dst:
            for i, line in enumerate(src):
                if i >= 1200:  # 300-read subset keeps the test fast
                    break
                dst.write(line)
    return root


def test_sharded_cli_quant_identical(sample_data, reads, tmp_path):
    fasta = sample_data["fasta"]
    _run("index", "-t", fasta, "-o", str(tmp_path / "idx"), "-k", "31")
    _run("index", "-t", fasta, "-o", str(tmp_path / "idx4"), "-k", "31",
         "--indexShards", "4")

    common = ["-l", "IU", "-1", str(reads / "r1.fq"),
              "-2", str(reads / "r2.fq"), "--backend", "device",
              "--dumpEq"]
    _run("quant", "-i", str(tmp_path / "idx"), "-o",
         str(tmp_path / "q"), *common)
    _run("quant", "-i", str(tmp_path / "idx4"), "-o",
         str(tmp_path / "q4"), *common)

    for rel in ("quant.sf", "aux/eq_classes.txt"):
        a = (tmp_path / "q" / rel).read_bytes()
        b = (tmp_path / "q4" / rel).read_bytes()
        assert a == b, f"{rel} differs between monolithic and sharded"
