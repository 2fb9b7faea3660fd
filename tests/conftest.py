"""Test configuration: force real-CPU JAX with a virtual 8-device mesh.

The image's sitecustomize force-registers the remote axon TPU backend;
clearing PALLAS_AXON_POOL_IPS (before jax import) disables it so tests
run on local CPU.  x64 is enabled so the EM golden comparisons run in
float64 like the reference's doubles.
"""

import os
import tarfile

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The image's sitecustomize may have force-registered the remote axon TPU
# backend before this file runs (it overrides the JAX_PLATFORMS env var);
# the config update below wins regardless and pins all test compute to
# the local CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache is intentionally NOT enabled
# for the test suite.  With it on, mixed-config runs of the pallas
# wrapper hit a wrong-executable cache read ("Execution supplied 9
# buffers but compiled program expected 17") and intermittent segfaults
# inside the cache writer — the cache key appears not to fully cover
# pallas custom-call payloads in this jax build.  Production entry
# points (cli.py, bench.py) keep their caches; they run one
# configuration per process.
if os.environ.get("SF_TEST_CACHE", "0") == "1":
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jaxcache-tests")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SAMPLE_TGZ = "/root/reference/sample_data.tgz"


@pytest.fixture(scope="session")
def sample_data(tmp_path_factory):
    """Extract the reference's bundled sample data (15 transcripts,
    2x10k 50bp PE reads with truth in read names)."""
    root = tmp_path_factory.mktemp("sample")
    with tarfile.open(SAMPLE_TGZ) as tf:
        tf.extractall(root)
    d = root / "sample_data"
    return {
        "fasta": str(d / "transcripts.fasta"),
        "reads1": str(d / "reads_1.fastq"),
        "reads2": str(d / "reads_2.fastq"),
    }


@pytest.fixture(scope="session")
def sample_index(sample_data, tmp_path_factory):
    from sailfish_tpu.index.builder import build_index_from_fasta, save_index

    idx = build_index_from_fasta(sample_data["fasta"], k=31)
    out = tmp_path_factory.mktemp("idx")
    save_index(idx, str(out))
    return idx, str(out)


@pytest.fixture(scope="session")
def toy_world():
    """Small random transcriptome + simulated PE reads with a shared
    segment to exercise multi-mapping."""
    from sailfish_tpu import dna
    from sailfish_tpu.index.builder import build_index

    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, 2000).astype(np.uint8)
    seqs = []
    for t in range(8):
        s = rng.integers(0, 4, 400 + 100 * t).astype(np.uint8)
        if t % 3 == 0:
            s[50:150] = base[:100]
        seqs.append(s)
    names = [f"t{i}" for i in range(8)]
    idx = build_index(names, seqs, k=31)

    def sim(n, readlen=50, flmin=120, flmax=300, err_rate=0.3, seed=1):
        r = np.random.default_rng(seed)
        r1, r2, truth = [], [], []
        for _ in range(n):
            t = int(r.integers(0, len(seqs)))
            s = seqs[t]
            fl = int(r.integers(flmin, min(flmax, len(s))))
            p = int(r.integers(0, len(s) - fl + 1))
            frag = s[p : p + fl]
            m1 = frag[:readlen].copy()
            m2 = dna.revcomp(frag[-readlen:]).copy()
            if r.random() < err_rate:
                q = int(r.integers(0, readlen))
                m1[q] = (m1[q] + 1) % 4
            r1.append(m1)
            r2.append(m2)
            truth.append((t, p, fl))
        return r1, r2, truth

    return {"idx": idx, "names": names, "seqs": seqs, "sim": sim}


def to_batch(reads, max_len=56):
    from sailfish_tpu.io.fastq import FastqBatch

    n = len(reads)
    codes = np.full((n, max_len), 4, np.uint8)
    lens = np.zeros(n, np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
        lens[i] = len(r)
    return FastqBatch(codes=codes, lens=lens)
