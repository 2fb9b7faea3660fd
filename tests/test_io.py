"""Read-IO robustness: dynamic re-padding for late long reads, CRLF
input, malformed-record detection, paired-file mismatch, and decode-
thread exception propagation (reference behavior: the jellyfish parser
errors out, src/SailfishQuantify.cpp:893-899; we must never silently
truncate or silently stop early)."""

import gzip
import os

import numpy as np
import pytest

from sailfish_tpu.io.fastq import (
    _encode_block,
    _iter_fastq_seq_blocks,
    iter_fastq_batches,
    iter_paired_fastq_batches,
)
from sailfish_tpu.io.native import native_available, native_decode_fastq


def write_fastq(path, seqs, crlf=False, gz=False):
    eol = b"\r\n" if crlf else b"\n"
    buf = b"".join(
        b"@r%d%s%s%s+%s%s%s"
        % (i, eol, s, eol, eol, b"I" * len(s), eol)
        for i, s in enumerate(seqs)
    )
    if gz:
        with gzip.open(path, "wb") as fh:
            fh.write(buf)
    else:
        with open(path, "wb") as fh:
            fh.write(buf)
    return str(path)


ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def mkseq(rng, n):
    return bytes(rng.choice(ACGT, n))


@pytest.fixture(params=["native", "python"])
def use_native(request):
    if request.param == "native" and not native_available():
        pytest.skip("_native.so not built")
    return request.param == "native"


def collect(it):
    out = []
    for b in it:
        out.append(b)
    return out


class TestRepad:
    def test_long_read_late_in_file(self, tmp_path, use_native):
        """A 104bp read at position 5000 of a 48bp file must come out
        full length, not clipped to the probed width."""
        rng = np.random.default_rng(0)
        seqs = [mkseq(rng, 48) for _ in range(6000)]
        long_seq = mkseq(rng, 104)
        seqs[5000] = long_seq
        p = write_fastq(tmp_path / "r.fq", seqs)
        batches = collect(
            iter_fastq_batches(p, 512, max_len=48, use_native=use_native)
        )
        assert sum(b.count for b in batches) == 6000
        # find the long read: global index 5000 -> batch 9, row 392
        b = batches[5000 // 512]
        row = 5000 % 512
        assert b.codes.shape[1] >= 104
        assert int(b.lens[row]) == 104
        from sailfish_tpu import dna

        assert dna.decode(b.codes[row, :104]).encode() == long_seq
        # every other read still 48bp and correctly decoded
        b0 = batches[0]
        assert (np.asarray(b0.lens) == 48).all()
        assert dna.decode(b0.codes[17, :48]).encode() == seqs[17]

    def test_long_read_paired_other_mate(self, tmp_path, use_native):
        """Long read in mate2 only: both streams re-pad together and
        stay fragment-aligned."""
        rng = np.random.default_rng(1)
        s1 = [mkseq(rng, 40) for _ in range(700)]
        s2 = [mkseq(rng, 40) for _ in range(700)]
        s2[650] = mkseq(rng, 72)
        p1 = write_fastq(tmp_path / "r1.fq", s1)
        p2 = write_fastq(tmp_path / "r2.fq", s2)
        pairs = collect(
            iter_paired_fastq_batches(
                p1, p2, 256, max_len=40, use_native=use_native
            )
        )
        assert sum(b1.count for b1, _ in pairs) == 700
        b1, b2 = pairs[650 // 256]
        row = 650 % 256
        assert int(b2.lens[row]) == 72
        assert b1.codes.shape[1] == b2.codes.shape[1] >= 72
        from sailfish_tpu import dna

        assert dna.decode(b2.codes[row, :72]).encode() == s2[650]
        assert dna.decode(b1.codes[row, :40]).encode() == s1[650]


class TestErrors:
    def test_malformed_mid_file_raises(self, tmp_path, use_native):
        rng = np.random.default_rng(2)
        p = tmp_path / "bad.fq"
        good = b"".join(
            b"@r%d\n%s\n+\nIIII\n" % (i, mkseq(rng, 4)) for i in range(600)
        )
        with open(p, "wb") as fh:
            fh.write(good)
            fh.write(b"not-a-header\nACGT\n+\nIIII\n")
        with pytest.raises(IOError):
            collect(
                iter_fastq_batches(
                    str(p), 256, max_len=8, use_native=use_native
                )
            )

    def test_paired_count_mismatch_raises(self, tmp_path, use_native):
        rng = np.random.default_rng(3)
        s1 = [mkseq(rng, 30) for _ in range(512)]  # exact batch multiple
        s2 = s1 + [mkseq(rng, 30) for _ in range(100)]
        p1 = write_fastq(tmp_path / "m1.fq", s1)
        p2 = write_fastq(tmp_path / "m2.fq", s2)
        with pytest.raises(ValueError, match="different read counts"):
            collect(
                iter_paired_fastq_batches(
                    p1, p2, 256, max_len=32, use_native=use_native
                )
            )

    def test_paired_count_mismatch_partial_batch(self, tmp_path, use_native):
        rng = np.random.default_rng(4)
        s1 = [mkseq(rng, 30) for _ in range(300)]
        s2 = s1[:250]
        p1 = write_fastq(tmp_path / "m1.fq", s1)
        p2 = write_fastq(tmp_path / "m2.fq", s2)
        with pytest.raises(ValueError, match="different read counts"):
            collect(
                iter_paired_fastq_batches(
                    p1, p2, 256, max_len=32, use_native=use_native
                )
            )


class TestCRLF:
    def test_crlf_matches_lf(self, tmp_path, use_native):
        """CRLF files must decode exactly like LF files (no trailing \\r
        counted as an N base) on both decoders."""
        rng = np.random.default_rng(5)
        seqs = [mkseq(rng, 36) for _ in range(400)]
        plf = write_fastq(tmp_path / "lf.fq", seqs)
        pcr = write_fastq(tmp_path / "crlf.fq", seqs, crlf=True)
        blf = collect(
            iter_fastq_batches(plf, 128, max_len=40, use_native=use_native)
        )
        bcr = collect(
            iter_fastq_batches(pcr, 128, max_len=40, use_native=use_native)
        )
        assert len(blf) == len(bcr)
        for a, b in zip(blf, bcr):
            assert np.array_equal(a.codes, b.codes)
            assert np.array_equal(a.lens, b.lens)


@pytest.mark.skipif(not native_available(), reason="_native.so not built")
class TestNativeSkip:
    def test_skip_reads(self, tmp_path):
        rng = np.random.default_rng(6)
        seqs = [mkseq(rng, 24) for _ in range(1000)]
        p = write_fastq(tmp_path / "s.fq", seqs, gz=True)
        it = native_decode_fastq(p, 128, 24, skip_reads=777)
        got = collect(it)
        assert sum(b.count for b in got) == 223
        from sailfish_tpu import dna

        assert dna.decode(got[0].codes[0, :24]).encode() == seqs[777]

    def test_skip_past_eof_raises(self, tmp_path):
        rng = np.random.default_rng(7)
        p = write_fastq(
            tmp_path / "s.fq", [mkseq(rng, 24) for _ in range(50)]
        )
        with pytest.raises(IOError, match="cannot skip"):
            collect(native_decode_fastq(p, 16, 24, skip_reads=100))

    def test_true_length_reported(self, tmp_path):
        rng = np.random.default_rng(8)
        seqs = [mkseq(rng, 60), mkseq(rng, 20)]
        p = write_fastq(tmp_path / "t.fq", seqs)
        (b,) = collect(native_decode_fastq(p, 16, 32))
        assert list(b.lens) == [60, 20]  # true lens, codes clipped to 32


def test_python_fallback_skip(tmp_path):
    rng = np.random.default_rng(9)
    seqs = [mkseq(rng, 24) for _ in range(100)]
    p = write_fastq(tmp_path / "s.fq", seqs)
    blocks = list(_iter_fastq_seq_blocks(p, 32, skip_reads=90))
    assert sum(len(b) for b in blocks) == 10
    assert blocks[0][0] == seqs[90]
    b = _encode_block(blocks[0], 24)
    assert (np.asarray(b.lens) == 24).all()


def test_fifo_input_quant(tmp_path):
    """Named-pipe inputs (reference include/ReadLibrary.hpp:182-187):
    quant spools non-seekable streams and produces identical results."""
    import subprocess
    import threading

    from sailfish_tpu.quant import _materialize_stream

    rng = np.random.default_rng(11)
    seqs = [mkseq(rng, 40) for _ in range(64)]
    reg = write_fastq(tmp_path / "reg.fq", seqs)
    fifo = str(tmp_path / "stream.fq")
    os.mkfifo(fifo)

    def feed():
        with open(reg, "rb") as src, open(fifo, "wb") as dst:
            dst.write(src.read())

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    spooled = _materialize_stream(fifo)
    t.join(10)
    assert spooled != fifo
    with open(spooled, "rb") as fh_a, open(reg, "rb") as fh_b:
        assert fh_a.read() == fh_b.read()
    os.unlink(spooled)
    # regular files pass through untouched
    assert _materialize_stream(str(reg)) == str(reg)
