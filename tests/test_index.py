"""Index construction: suffix-array order, prefix-table intervals,
serialization round trip, 32/64-bit selection."""

import numpy as np
import pytest

from sailfish_tpu import dna
from sailfish_tpu.index.builder import (
    build_index,
    build_suffix_array,
    load_index,
    save_index,
)


def brute_suffix_array(text: np.ndarray) -> np.ndarray:
    n = len(text)
    suf = sorted(range(n), key=lambda i: text[i:].tobytes())
    return np.array(suf)


def test_suffix_array_matches_bruteforce():
    rng = np.random.default_rng(3)
    for n in (1, 2, 17, 100, 257):
        text = rng.integers(0, 4, n).astype(np.uint8)
        got = build_suffix_array(text)
        want = brute_suffix_array(text)
        assert np.array_equal(got, want), n


def test_suffix_array_repetitive_text():
    text = dna.encode("AAAAAAAAAAAAAAAAAAAA")
    got = build_suffix_array(text)
    # suffixes of A^n sort longest-last? "A" < "AA" < "AAA": shortest first
    assert np.array_equal(got, np.arange(len(text))[::-1])


def test_build_index_structures(toy_world):
    idx = toy_world["idx"]
    T = idx.num_transcripts
    assert idx.text_len == sum(len(s) for s in toy_world["seqs"]) + T
    # every transcript's bases present at its offset
    for t in range(T):
        o = idx.txp_offsets[t]
        L = idx.txp_lens[t]
        assert np.array_equal(idx.codes[o : o + L], toy_world["seqs"][t])
        assert idx.codes[o + L] == dna.SEP
        assert idx.txp_of_pos[o] == t
        assert idx.txp_of_pos[o + L] == t

    # SA is a permutation sorted under A-substituted text
    sub = np.where(idx.codes >= 4, 0, idx.codes)
    assert sorted(idx.sa) == list(range(idx.text_len))
    sa = idx.sa
    for j in range(0, idx.text_len - 1, 37):
        a = sub[sa[j] : sa[j] + 40].tobytes()
        b = sub[sa[j + 1] : sa[j + 1] + 40].tobytes()
        assert a <= b


def test_prefix_table_intervals(toy_world):
    idx = toy_world["idx"]
    P = idx.prefix_bases
    sub = np.where(idx.codes >= 4, 0, idx.codes)
    rng = np.random.default_rng(5)
    for _ in range(50):
        p = int(rng.integers(0, idx.text_len - P))
        lo, hi = idx.prefix_interval(idx.codes[p : p + P])
        members = set(int(idx.sa[j]) for j in range(lo, hi))
        assert p in members
        # all members share the substituted prefix
        want = sub[p : p + P].tobytes()
        for m in list(members)[:10]:
            assert sub[m : m + P].tobytes() == want


def test_save_load_roundtrip(tmp_path, toy_world):
    idx = toy_world["idx"]
    save_index(idx, str(tmp_path))
    idx2 = load_index(str(tmp_path))
    assert idx2.k == idx.k
    assert idx2.names == idx.names
    for f in ("codes", "sa", "packed16", "sep_dist", "table_lo",
              "txp_of_pos", "txp_offsets", "txp_lens"):
        assert np.array_equal(getattr(idx, f), getattr(idx2, f)), f
    assert (idx.kmer_ht is None) == (idx2.kmer_ht is None)
    if idx.kmer_ht is not None:
        for f in ("ht_key0", "ht_key1", "ht_lo", "ht_cnt"):
            assert np.array_equal(idx.kmer_ht[f], idx2.kmer_ht[f]), f
        assert idx.kmer_ht["ht_bits"] == idx2.kmer_ht["ht_bits"]
        assert idx.kmer_ht["max_probes"] == idx2.kmer_ht["max_probes"]


def test_even_k_rejected():
    with pytest.raises(ValueError):
        build_index(["t"], [dna.encode("ACGT" * 30)], k=30)
