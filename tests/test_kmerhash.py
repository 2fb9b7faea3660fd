"""k-mer hash table: exact lookup of every k-mer in the text."""

import numpy as np

from sailfish_tpu import dna
from sailfish_tpu.index.kmerhash import (
    mix_hash_u32,
    sep_distances,
    suffix_keys,
)


def _lookup(ht, key0, key1):
    mask = (1 << ht["ht_bits"]) - 1
    h = int(mix_hash_u32(np.uint32(key0), np.uint32(key1))) & mask
    for _ in range(ht["max_probes"]):
        for j in range(ht["ht_cnt"].shape[1]):
            if ht["ht_cnt"][h, j] == 0:
                return None
            if ht["ht_key0"][h, j] == key0 and ht["ht_key1"][h, j] == key1:
                return int(ht["ht_lo"][h, j]), int(ht["ht_cnt"][h, j])
        h = (h + 1) & mask
    return None


def test_kmer_table_contains_all_kmers(toy_world):
    idx = toy_world["idx"]
    assert idx.kmer_ht is not None
    ht = idx.kmer_ht
    k = idx.k
    key0s, key1s = suffix_keys(idx.packed16, idx.sa, k)
    sub = np.where(idx.codes >= 4, 0, idx.codes)
    rng = np.random.default_rng(0)
    # every sampled suffix's k-mer resolves to an interval containing it
    for j in rng.integers(0, idx.text_len, 300):
        res = _lookup(ht, int(key0s[j]), int(key1s[j]))
        assert res is not None
        lo, cnt = res
        assert lo <= j < lo + cnt
        # interval members share the (A-substituted, A-padded) key —
        # suffixes shorter than k pad with A by design; their LCP is
        # later capped by sep_dist so they can never become false hits
        for m in (lo, lo + cnt - 1):
            assert key0s[m] == key0s[j] and key1s[m] == key1s[j]
        if lo > 0:
            assert (key0s[lo - 1], key1s[lo - 1]) != (key0s[j], key1s[j])
        if lo + cnt < idx.text_len:
            assert (key0s[lo + cnt], key1s[lo + cnt]) != (key0s[j], key1s[j])


def test_kmer_table_rejects_absent_kmer(toy_world):
    idx = toy_world["idx"]
    # a k-mer crafted to (almost surely) not exist: alternating pattern
    pat = dna.encode("ACGT" * 8)[: idx.k]
    w = dna.pack_words_u32(np.pad(pat, (0, 32)))
    key0, key1 = int(w[0]), int(w[16]) >> (2 * (32 - idx.k))
    res = _lookup(idx.kmer_ht, key0, key1)
    if res is not None:  # if it does exist, interval must be real
        lo, cnt = res
        assert cnt > 0


def test_sep_distances():
    codes = dna.encode("ACGT")
    codes = np.concatenate([codes, [4], dna.encode("GG"), [4]])
    d = sep_distances(codes)
    assert list(d) == [4, 3, 2, 1, 0, 2, 1, 0]


def test_sep_distances_saturation():
    codes = np.zeros(1000, dtype=np.uint8)
    codes[-1] = 4
    d = sep_distances(codes)
    assert d[0] == 255  # saturates
    assert d[998] == 1 and d[999] == 0


def test_word16_bloom_no_false_negatives(toy_world):
    from sailfish_tpu.index.kmerhash import (
        build_word16_bloom, filter_hash2_u32,
    )

    idx = toy_world["idx"]
    bl = build_word16_bloom(idx.packed16, idx.text_len)
    words = bl["w16_words"].view(np.uint32)
    wmask = np.uint32((1 << bl["w16_bits"]) // 32 - 1)

    def present(w):
        # single-word layout: word index from mix_hash, both bits from
        # filter_hash2 fields (must match the lane screen's jnp probe)
        w = np.asarray(w, np.uint32)
        wi = mix_hash_u32(w, np.uint32(0)) & wmask
        h2 = filter_hash2_u32(w, np.uint32(0))
        v = words[wi.astype(np.int64)]
        b1 = (v >> (h2 & np.uint32(31))) & np.uint32(1)
        b2 = (v >> ((h2 >> np.uint32(5)) & np.uint32(31))) & np.uint32(1)
        return (b1 & b2) == 1

    # every true text word must be present (the lane screen's safety)
    assert present(idx.packed16[: idx.text_len]).all()
    # random foreign words are mostly absent (the screen's usefulness)
    rng = np.random.default_rng(3)
    fp = present(rng.integers(0, 2**32, 4096, dtype=np.uint32)).mean()
    assert fp < 0.5


def test_kmer_bloom_single_word_no_false_negatives(toy_world):
    """The sweep filter's single-word layout (word from mix_hash, both
    bits from disjoint fields of filter_hash2) must cover every k-mer
    key actually in the table — a false negative would silently drop
    mappings in the kernel's fast-forward."""
    from sailfish_tpu.index.kmerhash import build_kmer_bloom, filter_hash2_u32

    idx = toy_world["idx"]
    ht = idx.kmer_ht
    bl = build_kmer_bloom(ht)
    words = bl["filt_rows"].ravel().view(np.uint32)
    wmask = np.uint32((1 << bl["filt_bits_log2"]) // 32 - 1)

    occ = ht["ht_cnt"].ravel() > 0
    k0 = ht["ht_key0"].ravel()[occ]
    k1 = ht["ht_key1"].ravel()[occ]
    w = mix_hash_u32(k0, k1) & wmask
    h2 = filter_hash2_u32(k0, k1)
    v = words[w.astype(np.int64)]
    hit = (((v >> (h2 & np.uint32(31)))
            & (v >> ((h2 >> np.uint32(5)) & np.uint32(31))))
           & np.uint32(1)) == 1
    assert hit.all()

    # random foreign keys are mostly absent (the filter's usefulness)
    rng = np.random.default_rng(0)
    fk0 = rng.integers(0, 1 << 32, 4000, dtype=np.uint32)
    fk1 = rng.integers(0, 1 << 32, 4000, dtype=np.uint32)
    w = mix_hash_u32(fk0, fk1) & wmask
    h2 = filter_hash2_u32(fk0, fk1)
    v = words[w.astype(np.int64)]
    hit = (((v >> (h2 & np.uint32(31)))
            & (v >> ((h2 >> np.uint32(5)) & np.uint32(31))))
           & np.uint32(1)) == 1
    assert hit.mean() < 0.35


def test_insertion_cascade_lookup_property():
    """The vectorized cascade must keep the linear-probe lookup
    contract on any layout: every inserted key findable within
    max_probes starting at its home bucket, stopping early only at a
    bucket with an empty slot; absent keys provably absent.  Tiny
    tables (min_bits=2) force the wraparound continuation."""
    from sailfish_tpu.index.kmerhash import (
        BUCKET, build_kmer_table, mix_hash_u32,
    )
    from sailfish_tpu import dna

    rng = np.random.default_rng(3)
    for trial, (nbases, min_bits) in enumerate(
        [(60, 2), (120, 2), (400, 3), (5000, 0), (20000, 0)]
    ):
        codes = rng.integers(0, 4, nbases).astype(np.uint8)
        p16 = dna.pack_words_u32(codes, sub=0)
        order = np.argsort(
            [bytes(codes[i:]) for i in range(nbases)], kind="stable"
        )
        sa = np.asarray(order, np.int32)
        k = 21
        ht = build_kmer_table(p16, sa, k, min_bits=min_bits)
        S = ht["ht_key0"].shape[0]
        key0 = p16[sa]
        pad = np.zeros(32, np.uint32)
        key1 = np.concatenate([p16, pad])[sa + 16] >> np.uint32(
            2 * (32 - k))
        # oracle: first SA row per distinct (key0, key1)
        seen = {}
        for i in range(len(sa)):
            kk = (int(key0[i]), int(key1[i]))
            seen.setdefault(kk, i)

        def lookup(a, b):
            h = int(mix_hash_u32(np.uint32(a), np.uint32(b))) & (S - 1)
            for _ in range(ht["max_probes"]):
                row_cnt = ht["ht_cnt"][h]
                for j in range(BUCKET):
                    if row_cnt[j] > 0 and ht["ht_key0"][h, j] == a \
                            and ht["ht_key1"][h, j] == b:
                        return int(ht["ht_lo"][h, j]), int(row_cnt[j])
                if (row_cnt == 0).any():
                    return None
                h = (h + 1) & (S - 1)
            return None

        for (a, b), lo in seen.items():
            got = lookup(a, b)
            assert got is not None, (trial, a, b)
            assert got[0] == lo
        # absent keys: flip bits of present ones
        miss = 0
        for (a, b) in list(seen)[:50]:
            a2 = a ^ 0x5
            if (a2, b) not in seen:
                assert lookup(a2, b) is None
                miss += 1
        assert miss > 0
