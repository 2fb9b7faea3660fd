"""Hand-derived mapping fixtures (PARITY_SAMPLE.md §2).

Round-2 VERDICT: device == oracle was thoroughly tested but oracle ==
reference was asserted, not demonstrated (the reference binary cannot
be built here — no network; see PARITY_SAMPLE.md §1).  These fixtures
break that circularity as far as this environment allows: every
EXPECTED value below is a literal constant derived on paper from the
published scan rules (RapMap SACollector maximal-mappable-prefix
search with the NIP overlap re-probe; reference call sites
src/SailfishQuantify.cpp:192-213), never computed by the oracle.  Each
case asserts the same constants against THREE independent
implementations: the numpy oracle, the XLA kernel, and the Pallas
kernel (interpret mode).

Scan rules used in the derivations (k = 31 throughout):
  * probe position i: candidates = SA interval of the exact k-mer
    read[i:i+k] (A-substituted codes); empty -> miss, i += 1, one step
  * true-code LCPs over the candidates; lstar = max; lstar < k -> miss
  * lstar >= k -> MMP (i, lstar, argmax candidates); advance
    NIP: i += max(1, lstar-k+1)   JUMP: i += lstar + 1
  * candidate interval larger than the capacity -> overflow flag,
    i += 1
  * scan while i + k <= len, steps < budget, MMPs < max_mmps
  * final hits: loci implied by MMP1 (txp, pos - qpos), intersected
    with every later MMP's implied loci; per-txp smallest pos
Every structural assumption behind a derivation (k-mer uniqueness,
planted-duplicate locations, absence of error-spanning k-mers in the
A-substituted text universe) is asserted mechanically before mapping.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sailfish_tpu import dna
from sailfish_tpu.config import QuantOpts
from sailfish_tpu.index.builder import build_index
from sailfish_tpu.map.encode import make_oriented_lanes
from sailfish_tpu.map.kernels import map_oriented_lanes
from sailfish_tpu.map.pallas_kernel import (
    map_oriented_lanes_pallas,
    prepare_pallas_text,
)
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.refimpl.mapper import RefMapper

K = 31


def _asub(c):
    return np.where(c >= 4, 0, c).astype(np.uint8)


def _kmer_positions(idx, kmer):
    """All positions of `kmer` in the index's A-substituted text
    universe (the oracle's candidate universe, incl. sep-spanning
    windows)."""
    text = _asub(np.asarray(idx.codes))
    kk = _asub(np.asarray(kmer))
    n, m = len(text), len(kk)
    if n < m:
        return np.array([], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(text, m)
    return np.nonzero((win == kk[None, :]).all(axis=1))[0]


def _assert_present_at(idx, kmer, positions):
    got = _kmer_positions(idx, kmer)
    assert sorted(got.tolist()) == sorted(positions), (got, positions)


def _assert_absent(idx, kmer):
    assert len(_kmer_positions(idx, kmer)) == 0


def _map_all_impls(idx, read, *, cand_cap=16, max_mmps=4, max_steps=128,
                   skip_jump=False):
    """Map one read through oracle + XLA kernel + Pallas kernel;
    return (oracle_hits, fwd_hitset_xla, rc_hitset_xla,
    fwd_hitset_pallas, rc_hitset_pallas, overflow_flags).
    Kernel hit sets are {(txp, pos), ...} per orientation lane."""
    opts = QuantOpts(hit_capacity=cand_cap, hit_capacity_max=0,
                     mmp_skip="jump" if skip_jump else "nip",
                     max_mmps=max_mmps, max_scan_steps=max_steps)
    ref = RefMapper(idx, opts)
    fw_hits, of_f = ref._orient_hits(read, True)
    rc_hits, of_r = ref._orient_hits(dna.revcomp(read), False)

    B = 4  # LB=8 lanes => B2=8: batch the read with copies
    L = int(np.ceil(len(read) / 8) * 8)
    codes = np.full((B, L), 4, np.uint8)
    codes[:, : len(read)] = read
    lens = np.full(B, len(read), np.int32)
    dev = DeviceMapperBackend(idx, opts)

    def hitset(res, lane):
        v = np.asarray(res["valid"])[lane]
        t = np.asarray(res["txp"])[lane]
        p = np.asarray(res["pos"])[lane]
        return set(zip(t[v].tolist(), p[v].tolist()))

    lanes = make_oriented_lanes(jnp.asarray(codes), jnp.asarray(lens),
                                idx.prefix_bases)
    rx = map_oriented_lanes(
        dev.text, lanes, k=idx.k, prefix_bases=idx.prefix_bases,
        cand_cap=cand_cap, max_mmps=max_mmps, max_steps=max_steps,
        use_hash=True, ht_probes=dev.ht_probes, ht_bits=dev.ht_bits,
        skip_jump=skip_jump,
    )
    pt = prepare_pallas_text(idx, cand_cap=cand_cap)
    rp = map_oriented_lanes_pallas(
        pt, jnp.asarray(codes), jnp.asarray(lens),
        k=idx.k, cand_cap=cand_cap, max_mmps=max_mmps,
        max_steps=max_steps, ht_bits=dev.ht_bits,
        ht_probes=dev.ht_probes, interpret=True, skip_jump=skip_jump,
    )
    ovf = (bool(np.asarray(rx["overflow"])[0]),
           bool(np.asarray(rx["overflow"])[B]),
           bool(np.asarray(rp["overflow"])[0]),
           bool(np.asarray(rp["overflow"])[B]))
    return ((fw_hits, of_f, rc_hits, of_r),
            hitset(rx, 0), hitset(rx, B),
            hitset(rp, 0), hitset(rp, B), ovf)


def _oracle_set(hits):
    return {(h.txp, h.pos) for h in hits.values()}


def _case_rng(case: int):
    """Each case gets its own deterministic stream so tests are
    order-independent (the structural asserts then hold regardless of
    which subset runs)."""
    return np.random.default_rng(20260819 + case)


def _random_txp(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


def test_case_a_exact_unique_read():
    """Read = T0[37:137], T0 random 400bp with all 31-mers unique.
    Derivation: probe i=0 -> unique candidate at global pos 37, true
    LCP = 100 = read length -> MMP1=(0,100,{37}); NIP advance
    i = 0 + max(1, 100-31+1) = 70; 70+31 = 101 > 100 -> scan ends.
    Expected: exactly one hit (T0, pos 37), mlen 100."""
    rng = _case_rng(0)
    t0 = _random_txp(rng, 400)
    idx = build_index(["T0"], [t0], k=K)
    read = t0[37:137].copy()
    # assumptions: every probed k-mer unique at its own position
    _assert_present_at(idx, read[0:K], [37])
    # RC orientation finds nothing
    for j in range(0, 100 - K + 1):
        _assert_absent(idx, dna.revcomp(read)[j : j + K])

    (orc, xf, xr, pf, pr, ovf) = _map_all_impls(idx, read)
    expected = {(0, 37)}
    assert _oracle_set(orc[0]) == expected and not orc[1]
    assert _oracle_set(orc[2]) == set() and not orc[3]
    assert xf == expected and pf == expected
    assert xr == set() and pr == set()
    assert not any(ovf)
    assert orc[0][0].mlen == 100


def test_case_b_one_mid_read_error():
    """Read = T0[50:150] with base 40 flipped.  Derivation:
    MMP1: i=0 candidates {50}, true LCP stops at col 40 -> (0,40,{50}).
    NIP: i = max(1, 40-31+1) = 10.  Every k-mer at i in [10,40] covers
    the flipped base (i <= 40 < i+31) and is asserted absent -> 31
    misses.  i=41: read[41:72] = T0[91:122] unique -> LCP = 59 (to read
    end) -> MMP2=(41,59,{91}).  Advance 41+29=70; 70+31>100 ends.
    Intersection: MMP1 locus (T0, 50-0); MMP2 implies (T0, 91-41=50) ->
    survives.  Expected hit (T0, 50), mlen 40 (first MMP)."""
    rng = _case_rng(1)
    t0 = _random_txp(rng, 400)
    idx = build_index(["T0"], [t0], k=K)
    read = t0[50:150].copy()
    read[40] = (read[40] + 1) % 4
    _assert_present_at(idx, read[0:K], [50])
    for i in range(10, 41):
        _assert_absent(idx, read[i : i + K])
    _assert_present_at(idx, read[41 : 41 + K], [91])

    (orc, xf, xr, pf, pr, ovf) = _map_all_impls(idx, read)
    expected = {(0, 50)}
    assert _oracle_set(orc[0]) == expected
    assert xf == expected and pf == expected
    assert orc[0][0].mlen == 40
    assert not any(ovf)


def test_case_c_error_near_read_end():
    """Error at col 70 of a 100bp read: MMP1=(0,70,{p}); NIP i=40;
    k-mers at 40..69 all cover col 70 (i+31 > 70) and are absent; at
    i=70, 70+31=101 > 100 -> scan ends with a single MMP.
    Expected: hit (T0, 60), mlen 70."""
    rng = _case_rng(2)
    t0 = _random_txp(rng, 400)
    idx = build_index(["T0"], [t0], k=K)
    read = t0[60:160].copy()
    read[70] = (read[70] + 2) % 4
    _assert_present_at(idx, read[0:K], [60])
    for i in range(40, 70):
        _assert_absent(idx, read[i : i + K])

    (orc, xf, xr, pf, pr, ovf) = _map_all_impls(idx, read)
    expected = {(0, 60)}
    assert _oracle_set(orc[0]) == expected
    assert xf == expected and pf == expected
    assert orc[0][0].mlen == 70


def test_case_d_multimapping_two_transcripts():
    """The read's 100bp planted verbatim in T0 at 30 and T1 at 111.
    MMP1: candidates both copies, LCP 100 each -> best = both.  Scan
    ends (i=70).  Expected hits {(T0,30),(T1,111)}; eq label would be
    (0,1)."""
    rng = _case_rng(3)
    src = _random_txp(rng, 100)
    t0 = _random_txp(rng, 300)
    t1 = _random_txp(rng, 300)
    t0[30:130] = src
    t1[111:211] = src
    idx = build_index(["T0", "T1"], [t0, t1], k=K)
    off1 = 300 + 1  # builder places one separator between transcripts?
    # derive T1's global offset mechanically instead of assuming:
    off1 = int(idx.txp_offsets[1])
    _assert_present_at(idx, src[0:K], [30, off1 + 111])

    (orc, xf, xr, pf, pr, ovf) = _map_all_impls(idx, src)
    expected = {(0, 30), (1, 111)}
    assert _oracle_set(orc[0]) == expected
    assert xf == expected and pf == expected
    assert not any(ovf)


def test_case_e_capacity_overflow_and_recovery():
    """W = a 31-mer planted at five sites in T0 (positions 10, 60, 110,
    160, 210); the read equals T0[160:260] (site 4 of 5, full match).
    With capacity >= 5: MMP1 i=0 has 5 candidates, LCPs (31,31,31,100,
    31) -> lstar=100, best={site at 160} -> hit (T0,160), no overflow.
    With capacity 4: the 5-candidate interval overflows -> flag, i=1;
    read[1:32] is unique to site 160+1 (continuations differ) ->
    MMP=(1,99,{161}) -> hit (T0, 161-1=160) STILL FOUND, overflow
    flag set."""
    rng = _case_rng(4)
    t0 = _random_txp(rng, 320)
    W = _random_txp(rng, K)
    sites = [10, 60, 110, 160, 210]
    for s in sites:
        t0[s : s + K] = W
    # force the non-read sites' continuations to differ from site
    # 160's, so read[1:32] (= W[1:] + t0[191]) is unique to 161 — a
    # random continuation collides 1-in-4 per site
    for s in (10, 60, 110, 210):
        if t0[s + K] == t0[160 + K]:
            t0[s + K] = (t0[160 + K] + 1) % 4
    idx = build_index(["T0"], [t0], k=K)
    read = t0[160:260].copy()
    _assert_present_at(idx, read[0:K], sites)
    _assert_present_at(idx, read[0:32], [160])
    _assert_present_at(idx, read[1 : 1 + K], [161])

    (orc, xf, xr, pf, pr, ovf) = _map_all_impls(idx, read, cand_cap=16)
    expected = {(0, 160)}
    assert _oracle_set(orc[0]) == expected and not orc[1]
    assert xf == expected and pf == expected
    assert not any(ovf)

    (orc4, xf4, _, pf4, _, ovf4) = _map_all_impls(idx, read, cand_cap=4)
    assert _oracle_set(orc4[0]) == expected and orc4[1]  # overflow
    assert xf4 == expected and pf4 == expected
    assert all(o for o in (ovf4[0], ovf4[2]))  # fwd lanes flag overflow


def test_case_f_nip_vs_jump_divergence():
    """THE rule-distinguishing case.  Read = T0[80:180] with base 40
    flipped so that read[15:46] becomes EXACTLY a 31-mer planted in T1
    (an 'error recreates another transcript's k-mer' event).

    NIP derivation: MMP1=(0,40,{T0@80}).  i=10; 10..14 absent (k-mers
    cover col 40, not the planted window); i=15: read[15:46] present
    in T1 only -> true LCP 31 (T1 continuation differs at read col 46)
    -> MMP2=(15,31,{T1@q}).  Intersection {(T0,80)} vs {(T1,q-15)} ->
    EMPTY.  NIP final: NO hits.

    JUMP derivation: after MMP1, i = 40+1 = 41; read[41:72] is pure
    post-error T0 sequence -> MMP2'=(41,59,{T0@121}) -> implies
    (T0, 121-41=80) -> intersection survives.  JUMP final: {(T0,80)}.

    The two rules give DIFFERENT answers, each derived by hand; all
    three implementations must reproduce their own rule's answer."""
    rng = _case_rng(5)
    t0 = _random_txp(rng, 400)
    t1 = _random_txp(rng, 300)
    idx0 = build_index(["T0"], [t0], k=K)  # to pick the error freely
    read = t0[80:180].copy()
    read[40] = (read[40] + 1) % 4
    # plant the errored window read[15:46] into T1 at 100
    t1[100 : 100 + K] = read[15:46]
    # ensure T1's continuation differs from read col 46
    if t1[100 + K] == read[46]:
        t1[100 + K] = (read[46] + 1) % 4
    idx = build_index(["T0", "T1"], [t0, t1], k=K)
    off1 = int(idx.txp_offsets[1])
    _assert_present_at(idx, read[0:K], [80])
    for i in list(range(10, 15)) + list(range(16, 41)):
        _assert_absent(idx, read[i : i + K])
    _assert_present_at(idx, read[15:46], [off1 + 100])
    _assert_present_at(idx, read[41:72], [121])

    # NIP: no hits
    (orc, xf, xr, pf, pr, _) = _map_all_impls(idx, read, skip_jump=False)
    assert _oracle_set(orc[0]) == set()
    assert xf == set() and pf == set()
    # JUMP: the T0 hit survives
    (orcj, xfj, _, pfj, _, _) = _map_all_impls(idx, read, skip_jump=True)
    expected = {(0, 80)}
    assert _oracle_set(orcj[0]) == expected
    assert xfj == expected and pfj == expected


def test_case_g_pe_geometry():
    """PE fixture: mate1 = T0[25:125], mate2 = revcomp(T0[175:275]).
    Under IU: mate1 maps forward at 25, mate2 maps RC at 175; observed
    orientation inward-unstranded-compatible; fragment length =
    (175+100) - 25 = 250."""
    rng = _case_rng(6)
    from sailfish_tpu.libformat import parse_library_format

    t0 = _random_txp(rng, 400)
    idx = build_index(["T0"], [t0], k=K)
    m1 = t0[25:125].copy()
    m2 = dna.revcomp(t0[175:275].copy())
    ref = RefMapper(idx, QuantOpts())
    rm = ref.map_fragment_pe(m1, m2, parse_library_format("IU"))
    assert rm.label == (0,)
    assert rm.unique_paired
    assert rm.frag_len == 250

    dev = DeviceMapperBackend(idx, QuantOpts(batch_size=8))
    B, L = 8, 104
    c1 = np.full((B, L), 4, np.uint8)
    c2 = np.full((B, L), 4, np.uint8)
    c1[:, :100] = m1
    c2[:, :100] = m2
    from sailfish_tpu.io.fastq import FastqBatch

    br = dev.map_pe_batch(
        FastqBatch(c1, np.full(B, 100, np.int32)),
        FastqBatch(c2, np.full(B, 100, np.int32)),
        parse_library_format("IU"),
    )
    assert list(br.labels) == [(0,)]
    assert int(br.label_counts[0]) == B
    assert br.unique_paired.all()
    assert (br.frag_lens == 250).all()
