"""Advanced-tuning knobs (QuantOpts fields, formerly SF_* env vars).

Every combination must be bit-identical to defaults: the fast paths
(clean-lane fastpath, xscan, lane screen/compaction, packed lanes) are
coverage/performance levers that punt conservatively to the exact
kernel, never semantics levers.  Reference behavior at stake: the hit
sets of processReadsQuasi (src/SailfishQuantify.cpp:192-213).
"""

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.pipeline import DeviceMapperBackend

from conftest import to_batch


def _label_counts(idx, opts, b1, b2, exp):
    bk = DeviceMapperBackend(idx, opts)
    br = bk.map_pe_batch(b1, b2, exp)
    return (dict(zip(br.labels, map(int, br.label_counts))),
            np.asarray(br.mapped))


COMBOS = [
    dict(use_fastpath=False),
    dict(use_xscan=False),
    dict(lane_screen=False, packed_lanes=False),
    dict(xscan_t=3, xscan_f=2, xscan_t1=0, xscan_p2=1,
         xscan_schedule="2:2"),
]


def test_knob_combos_bit_identical(toy_world):
    idx = toy_world["idx"]
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](96, err_rate=0.25, seed=91)
    b1, b2 = to_batch(r1), to_batch(r2)

    base_opts = QuantOpts(kernel="pallas", batch_size=96, hit_capacity=16)
    want, want_map = _label_counts(idx, base_opts, b1, b2, exp)

    import dataclasses

    for combo in COMBOS:
        opts = dataclasses.replace(base_opts, **combo)
        got, got_map = _label_counts(idx, opts, b1, b2, exp)
        assert got == want, combo
        np.testing.assert_array_equal(got_map, want_map, err_msg=str(combo))


def test_env_var_is_debug_override(toy_world, monkeypatch):
    """An explicitly-set SF_* env var wins over the QuantOpts value
    (debug override), and the result is still bit-identical."""
    idx = toy_world["idx"]
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.25, seed=92)
    b1, b2 = to_batch(r1), to_batch(r2)

    base = QuantOpts(kernel="pallas", batch_size=64, hit_capacity=16)
    want, _ = _label_counts(idx, base, b1, b2, exp)

    import dataclasses

    # opts say fastpath OFF, env says ON -> env (debug) wins; either
    # way the output matches defaults
    monkeypatch.setenv("SF_FASTPATH", "1")
    got, _ = _label_counts(
        idx, dataclasses.replace(base, use_fastpath=False), b1, b2, exp)
    assert got == want


def test_cli_parses_advanced_flags():
    import argparse

    from sailfish_tpu.cli import _add_quant_parser

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command")
    _add_quant_parser(sub)
    args = parser.parse_args([
        "quant", "-i", "idx", "-l", "IU", "-1", "a.fq", "-2", "b.fq",
        "-o", "out", "--noXscan", "--xscanT", "5",
        "--xscanSchedule", "4:2",
    ])
    assert args.noXscan and args.xscanT == 5
    assert args.xscanSchedule == "4:2"
    assert not args.noFastPath
