"""Multi-library quant runs and FASTA-format read input.

Reference behaviors covered:
  * ordered-argv read libraries, each with its own libType
    (src/SailfishUtils.cpp:103-153 extractReadLibraries;
    include/ReadLibrary.hpp:17-236)
  * FASTA or FASTQ read files through the same parser
    (src/SailfishQuantify.cpp:62-64 whole_sequence_parser)
"""

import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

from sailfish_tpu.cli import extract_read_libraries
from sailfish_tpu.config import QuantOpts
from sailfish_tpu.io.fastq import (
    iter_fastq_batches,
    sniff_read_format,
)
from sailfish_tpu.quant import run_quant


def _fastq_to_fasta(src, dst, wrap=0):
    """Rewrite a FASTQ file as FASTA (optionally line-wrapped)."""
    with open(src) as fi, open(dst, "w") as fo:
        while True:
            h = fi.readline()
            if not h:
                break
            seq = fi.readline().strip()
            fi.readline()
            fi.readline()
            fo.write(">" + h[1:])
            if wrap:
                for i in range(0, len(seq), wrap):
                    fo.write(seq[i : i + wrap] + "\n")
            else:
                fo.write(seq + "\n")


def test_extract_read_libraries_ordered():
    argv = [
        "quant", "-i", "idx", "-l", "IU", "-1", "a1.fq", "b1.fq",
        "-2", "a2.fq", "b2.fq", "-l", "U", "-r", "c.fq",
        "-o", "out",
    ]
    libs = extract_read_libraries(argv)
    assert len(libs) == 2
    assert libs[0] == {"fmt": "IU", "m1": ["a1.fq", "b1.fq"],
                       "m2": ["a2.fq", "b2.fq"], "um": []}
    assert libs[1] == {"fmt": "U", "m1": [], "m2": [], "um": ["c.fq"]}


def test_extract_read_libraries_requires_leading_libtype():
    with pytest.raises(ValueError):
        extract_read_libraries(["-1", "a.fq", "-l", "IU"])


def test_sniff_and_fasta_batches(sample_data, tmp_path):
    fa = str(tmp_path / "reads.fasta")
    _fastq_to_fasta(sample_data["reads1"], fa, wrap=17)
    assert sniff_read_format(fa) == "fasta"
    assert sniff_read_format(sample_data["reads1"]) == "fastq"
    fq_batches = list(iter_fastq_batches(
        sample_data["reads1"], batch_size=4096, max_len=56))
    fa_batches = list(iter_fastq_batches(fa, batch_size=4096, max_len=56))
    assert len(fq_batches) == len(fa_batches)
    for bq, ba in zip(fq_batches, fa_batches):
        np.testing.assert_array_equal(bq.codes, ba.codes)
        np.testing.assert_array_equal(bq.lens, ba.lens)


def test_fasta_gz_roundtrip(sample_data, tmp_path):
    fa = str(tmp_path / "reads.fasta")
    _fastq_to_fasta(sample_data["reads1"], fa)
    gz = fa + ".gz"
    with open(fa, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    assert sniff_read_format(gz) == "fasta"
    b1 = list(iter_fastq_batches(fa, batch_size=65536, max_len=56))
    b2 = list(iter_fastq_batches(gz, batch_size=65536, max_len=56))
    np.testing.assert_array_equal(b1[0].codes, b2[0].codes)


def test_fasta_reads_quant_matches_fastq(sample_index, sample_data,
                                         tmp_path):
    """A PE quant over FASTA-converted reads must byte-match the FASTQ
    run's quant.sf (same sequences, same mapping)."""
    _, sample_index = sample_index
    fa1 = str(tmp_path / "r1.fasta")
    fa2 = str(tmp_path / "r2.fasta")
    _fastq_to_fasta(sample_data["reads1"], fa1, wrap=60)
    _fastq_to_fasta(sample_data["reads2"], fa2, wrap=60)

    def quant(m1, m2, out):
        opts = QuantOpts(
            index_dir=sample_index, output_dir=str(tmp_path / out),
            lib_type="IU", mates1=[m1], mates2=[m2],
            batch_size=4096, dtype="float64",
        )
        run_quant(opts, backend="device")
        with open(tmp_path / out / "quant.sf") as fh:
            return fh.read()

    q_fq = quant(sample_data["reads1"], sample_data["reads2"], "q_fq")
    q_fa = quant(fa1, fa2, "q_fa")
    assert q_fq == q_fa


def test_multilib_pe_plus_se_quant(sample_index, sample_data, tmp_path):
    """Two-library run (IU paired + U single from mate-1 reads): the
    totals must equal the sum of both libraries, and every fragment of
    each library must be counted."""
    _, sample_index = sample_index
    opts = QuantOpts(
        index_dir=sample_index, output_dir=str(tmp_path / "q2"),
        libraries=[
            {"fmt": "IU", "m1": [sample_data["reads1"]],
             "m2": [sample_data["reads2"]], "um": []},
            {"fmt": "U", "m1": [], "m2": [],
             "um": [sample_data["reads1"]]},
        ],
        batch_size=4096, dtype="float64",
    )
    stats = run_quant(opts, backend="device")
    assert stats["num_observed"] == 20000  # 10k pairs + 10k singles
    assert stats["num_mapped"] == 20000
    # merged inference produced a well-formed quant.sf
    with open(tmp_path / "q2" / "quant.sf") as fh:
        lines = fh.read().strip().split("\n")
    assert len(lines) == 16  # header + 15 transcripts
    tpm = sum(float(l.split("\t")[3]) for l in lines[1:])
    assert abs(tpm - 1e6) < 1.0
    import json

    with open(tmp_path / "q2" / "lib_format_counts.json") as fh:
        doc = json.load(fh)
    assert doc["expected_format"].count(";") == 1


def test_multilib_cli_end_to_end(sample_index, sample_data, tmp_path):
    """The CLI accepts the reference's ordered multi-library argv."""
    _, sample_index = sample_index
    out = str(tmp_path / "qcli")
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    r = subprocess.run(
        [sys.executable, "-m", "sailfish_tpu.cli", "quant",
         "-i", sample_index, "-l", "IU",
         "-1", sample_data["reads1"], "-2", sample_data["reads2"],
         "-l", "U", "-r", sample_data["reads1"],
         "-o", out, "--batchSize", "4096"],
        env=env, capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "quant.sf"))
    import json

    with open(os.path.join(out, "aux", "meta_info.json")) as fh:
        meta = json.load(fh)
    assert meta["num_processed"] == 20000
