"""Randomized differential testing: device backend vs the numpy oracle
across libtypes, flags, read lengths, and edge-case read content."""

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend

from conftest import to_batch


def as_dict(br):
    return dict(zip(br.labels, (int(c) for c in br.label_counts)))


SCENARIOS = [
    # (libtype, opts overrides, err_rate, seed)
    ("ISF", {}, 0.3, 101),
    ("OU", {"allow_dovetail": True}, 0.2, 102),
    ("IU", {"ignore_lib_compat": True}, 0.5, 103),
    ("MU", {"enforce_lib_compat": True}, 0.2, 104),
]


@pytest.mark.parametrize("lib,overrides,err,seed", SCENARIOS)
def test_device_matches_oracle_fuzz(toy_world, lib, overrides, err, seed):
    opts = QuantOpts(batch_size=96, hit_capacity=32, **overrides)
    ref = RefMapperBackend(toy_world["idx"], opts)
    dev = DeviceMapperBackend(toy_world["idx"], opts)
    exp = parse_library_format(lib)
    r1, r2, _ = toy_world["sim"](96, err_rate=err, seed=seed)
    rng = np.random.default_rng(seed)
    # edge content: garbage reads, N runs, very short fragments
    for i in range(0, 96, 11):
        r1[i] = rng.integers(0, 4, 50).astype(np.uint8)
    for i in range(5, 96, 17):
        r2[i][20:25] = 4
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd), (lib, overrides)
    np.testing.assert_array_equal(br.mapped, bd.mapped)
    np.testing.assert_array_equal(br.num_joint, bd.num_joint)
    assert (br.num_fwd, br.num_rc) == (bd.num_fwd, bd.num_rc)
    np.testing.assert_array_equal(
        br.frag_lens[br.unique_paired], bd.frag_lens[bd.unique_paired]
    )


def test_device_matches_oracle_varied_lengths(toy_world):
    """Mixed read lengths within one batch."""
    opts = QuantOpts(batch_size=64, hit_capacity=32)
    ref = RefMapperBackend(toy_world["idx"], opts)
    dev = DeviceMapperBackend(toy_world["idx"], opts)
    exp = parse_library_format("IU")
    rng = np.random.default_rng(7)
    seqs = toy_world["seqs"]
    r1, r2 = [], []
    for i in range(64):
        t = i % len(seqs)
        s = seqs[t]
        rl = int(rng.integers(32, 56))
        fl = int(rng.integers(rl + 10, 200))
        p = int(rng.integers(0, len(s) - fl))
        from sailfish_tpu import dna

        r1.append(s[p : p + rl].copy())
        r2.append(dna.revcomp(s[p + fl - rl : p + fl]).copy())
    b1, b2 = to_batch(r1), to_batch(r2)
    br = ref.map_pe_batch(b1, b2, exp)
    bd = dev.map_pe_batch(b1, b2, exp)
    assert as_dict(br) == as_dict(bd)
    np.testing.assert_array_equal(br.mapped, bd.mapped)
