"""Cross-process executable cache (utils/aot.py).

CPU-disabled by default (local compiles are fast); these tests force it
on via SF_AOT_CACHE=1 with an isolated cache dir and pin that (1) a
fresh backend loads the cached executable instead of recompiling and
produces bit-identical output, and (2) a source-fingerprint / statics
change misses the cache."""

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.pipeline import DeviceMapperBackend

from conftest import to_batch


@pytest.fixture()
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SF_AOT_CACHE", "1")
    monkeypatch.setenv("SAILFISH_TPU_EXE_CACHE", str(tmp_path / "exe"))
    return tmp_path / "exe"


def _map(idx, b1, b2, exp, **kw):
    bk = DeviceMapperBackend(idx, QuantOpts(batch_size=64,
                                            hit_capacity=16, **kw))
    br = bk.map_pe_batch(b1, b2, exp)
    return bk, dict(zip(br.labels, map(int, br.label_counts)))


def test_aot_roundtrip_bit_identical(toy_world, aot_env):
    idx = toy_world["idx"]
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.25, seed=77)
    b1, b2 = to_batch(r1), to_batch(r2)

    bk1, want = _map(idx, b1, b2, exp)
    files = list(aot_env.glob("pe-*.pkl"))
    assert len(files) == 1, "expected one cached PE executable"

    # fresh backend, same config -> must LOAD (same key); identical out
    bk2, got = _map(idx, b1, b2, exp)
    assert got == want
    assert list(aot_env.glob("pe-*.pkl")) == files  # no second entry

    from sailfish_tpu.utils import aot

    # a statics change (different capacity) misses and writes a new one
    bk3, _ = _map(idx, b1, b2, exp)
    assert len(list(aot_env.glob("pe-*.pkl"))) == 1
    bk4 = DeviceMapperBackend(idx, QuantOpts(batch_size=64,
                                             hit_capacity=8))
    bk4.map_pe_batch(b1, b2, exp)
    assert len(list(aot_env.glob("pe-*.pkl"))) == 2


def test_aot_corrupt_entry_recovers(toy_world, aot_env):
    idx = toy_world["idx"]
    exp = parse_library_format("IU")
    r1, r2, _ = toy_world["sim"](64, err_rate=0.25, seed=78)
    b1, b2 = to_batch(r1), to_batch(r2)
    _, want = _map(idx, b1, b2, exp)
    (f,) = aot_env.glob("pe-*.pkl")
    f.write_bytes(b"garbage")
    _, got = _map(idx, b1, b2, exp)  # falls back + rewrites
    assert got == want
