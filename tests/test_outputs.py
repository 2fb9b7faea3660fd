"""Output formats: GTF gene map, SAM nibble codec, bootstrap/Gibbs file
layouts, gene rollup math, and the CLI driven as a real subprocess."""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_gtf_gene_map(tmp_path):
    from sailfish_tpu.output.genemap import transcript_gene_map_from_gtf

    gtf = tmp_path / "ann.gtf"
    gtf.write_text(
        '#comment line\n'
        'chr1\thavana\ttranscript\t1\t100\t.\t+\t.\t'
        'gene_id "G1"; transcript_id "T1"; gene_name "ALPHA";\n'
        'chr1\thavana\texon\t1\t50\t.\t+\t.\t'
        'gene_id "G1"; transcript_id "T1";\n'
        'chr2\thavana\ttranscript\t1\t200\t.\t-\t.\t'
        'gene_id "G2"; transcript_id "T2"; gene_name "BETA";\n'
    )
    tgm = transcript_gene_map_from_gtf(str(gtf))
    assert tgm.gene_name("T1") == "G1"
    assert tgm.gene_name("T2") == "G2"
    assert tgm.gene_name("unknown") == "unknown"  # fallback to own name
    tgm2 = transcript_gene_map_from_gtf(str(gtf), key="gene_name")
    assert tgm2.gene_name("T1") == "ALPHA"
    assert tgm2.num_genes == 2


def test_sam_nibble_codec():
    from sailfish_tpu.utils.sam import (
        decode_sequence_from_sam,
        encode_sequence_in_sam,
    )

    s = "ACGTN"
    packed = encode_sequence_in_sam(s)
    # A=1 C=2 -> 0x12; G=4 T=8 -> 0x48; N=15 pad0 -> 0xF0
    assert list(packed) == [0x12, 0x48, 0xF0]
    assert decode_sequence_from_sam(packed, 5) == s


def test_bootstrap_file_layout(sample_data, sample_index, tmp_path):
    """aux/bootstrap/bootstraps.gz must be raw concatenated float64
    vectors (reference GZipWriter::writeBootstrap, :250-284) and
    names.tsv.gz tab-separated transcript names."""
    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.quant import run_quant

    _, index_dir = sample_index
    out = tmp_path / "bs"
    run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(out), lib_type="IU",
        mates1=[sample_data["reads1"]], mates2=[sample_data["reads2"]],
        batch_size=4096, num_bootstraps=4, dtype="float64",
    ), backend="device")
    raw = gzip.open(out / "aux" / "bootstrap" / "bootstraps.gz", "rb").read()
    mat = np.frombuffer(raw, dtype=np.float64).reshape(4, 15)
    np.testing.assert_allclose(mat.sum(axis=1), 10000, rtol=1e-6)
    names = gzip.open(out / "aux" / "bootstrap" / "names.tsv.gz", "rt").read()
    assert len(names.strip().split("\t")) == 15
    meta = json.load(open(out / "aux" / "meta_info.json"))
    assert meta["samp_type"] == "bootstrap"
    assert meta["num_bootstraps"] == 4


def test_gibbs_file_layout(sample_data, sample_index, tmp_path):
    """Gibbs samples are raw int32 count vectors; samp_type = gibbs."""
    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.quant import run_quant

    _, index_dir = sample_index
    out = tmp_path / "gb"
    run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(out), lib_type="IU",
        mates1=[sample_data["reads1"]], mates2=[sample_data["reads2"]],
        batch_size=4096, num_gibbs_samples=3, dtype="float64",
    ), backend="device")
    raw = gzip.open(out / "aux" / "bootstrap" / "bootstraps.gz", "rb").read()
    mat = np.frombuffer(raw, dtype=np.int32).reshape(3, 15)
    assert (mat.sum(axis=1) == 10000).all()
    meta = json.load(open(out / "aux" / "meta_info.json"))
    assert meta["samp_type"] == "gibbs"


def test_cli_subprocess(sample_data, tmp_path):
    """Drive the real command line end to end (index + quant)."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    idx = tmp_path / "idx"
    out = tmp_path / "q"
    r = subprocess.run(
        [sys.executable, "-m", "sailfish_tpu.cli", "index",
         "-t", sample_data["fasta"], "-o", str(idx), "-k", "31"],
        env=env, capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "sailfish_tpu.cli", "quant",
         "-i", str(idx), "-l", "IU",
         "-1", sample_data["reads1"], "-2", sample_data["reads2"],
         "-o", str(out), "--batchSize", "4096", "--dumpEq"],
        env=env, capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = open(out / "quant.sf").read().splitlines()
    assert lines[0].startswith("Name\tLength")
    assert len(lines) == 16
    assert os.path.exists(out / "aux" / "eq_classes.txt")
    assert os.path.exists(out / "cmd_info.json")
    assert os.path.exists(out / "logs" / "sailfish_quant.log")
