"""Byte-level output-format conformance vs the reference writers.

The reference emits its outputs through GZipWriter
(/root/reference/src/GZipWriter.cpp:51-291) using the vendored
2016-era cppformat, whose default double spec is '%g' (6 significant
digits: include/spdlog/details/format.h:2904 `type = 'g'`).  These
tests pin the exact field order, separators, number formatting, and
gzip payload dtypes so tximport-style downstream readers of the
reference's files parse ours unchanged.
"""

import gzip
import json
import re

import numpy as np
import pytest

from sailfish_tpu.output.writers import _fmt


@pytest.fixture(scope="module")
def quant_out(sample_data, sample_index, tmp_path_factory):
    from sailfish_tpu.config import QuantOpts
    from sailfish_tpu.quant import run_quant

    _, index_dir = sample_index
    out = tmp_path_factory.mktemp("conf")
    run_quant(QuantOpts(
        index_dir=index_dir, output_dir=str(out), lib_type="IU",
        mates1=[sample_data["reads1"]], mates2=[sample_data["reads2"]],
        batch_size=4096, dump_eq=True,
    ), backend="device")
    return out


def test_double_format_matches_cppformat_g():
    """fmt::print("{}", double) in the vendored cppformat is printf %g
    with 6 significant digits; Python's %.6g implements the same C99
    rules (shortest %e/%f choice, trailing-zero trim, >=2 exponent
    digits)."""
    cases = {
        0.0: "0",
        1.0: "1",
        0.5: "0.5",
        2.0 / 3.0: "0.666667",
        966.953: "966.953",
        999999.4: "999999",
        999999.5: "1e+06",
        1234567.0: "1.23457e+06",
        1e-5: "1e-05",
        123.4000001: "123.4",
        10000.0: "10000",
    }
    for v, want in cases.items():
        assert _fmt(v) == want, (v, _fmt(v), want)


def test_quant_sf_layout(quant_out):
    """quant.sf: exact header, 5 tab-separated columns, integer Length,
    %g-formatted doubles, TPM summing to 1e6
    (GZipWriter::writeAbundances :214-245)."""
    lines = (quant_out / "quant.sf").read_text().splitlines()
    assert lines[0] == "Name\tLength\tEffectiveLength\tTPM\tNumReads"
    assert len(lines) == 1 + 15
    gre = r"-?(\d+(\.\d+)?|\d(\.\d+)?e[+-]\d{2,})"
    row = re.compile(rf"^\S+\t\d+\t{gre}\t{gre}\t{gre}$")
    tpms = []
    for ln in lines[1:]:
        assert row.match(ln), ln
        name, length, efflen, tpm, reads = ln.split("\t")
        # every double field is its own %.6g rendering (no extra digits)
        for field in (efflen, tpm, reads):
            assert _fmt(float(field)) == field, ln
        tpms.append(float(tpm))
    assert abs(sum(tpms) - 1e6) < 1.0


def test_eq_classes_txt_layout(quant_out):
    """aux/eq_classes.txt: numTxps, numClasses, names, then per-class
    'size<TAB>tid<TAB>...<TAB>count' rows — the reference writes a TAB
    after the size and after EVERY member tid (GZipWriter.cpp:82-87),
    so count is the final tab-separated token."""
    raw = (quant_out / "aux" / "eq_classes.txt").read_text()
    lines = raw.splitlines()
    num_txps = int(lines[0])
    num_classes = int(lines[1])
    assert num_txps == 15
    names = lines[2 : 2 + num_txps]
    assert all(n and not n[0].isdigit() for n in names)
    rows = lines[2 + num_txps :]
    assert len(rows) == num_classes
    total = 0
    for r in rows:
        toks = r.split("\t")
        size = int(toks[0])
        assert len(toks) == size + 2, r  # size, members..., count
        tids = [int(t) for t in toks[1 : 1 + size]]
        assert all(0 <= t < num_txps for t in tids)
        total += int(toks[-1])
    assert total == 10000  # all sample_data fragments map


def test_meta_info_field_order_and_types(quant_out):
    """meta_info.json carries the reference's fields in its emission
    order (GZipWriter.cpp:163-190); extensions come after."""
    meta = json.load(open(quant_out / "aux" / "meta_info.json"))
    ref_order = [
        "sf_version", "samp_type", "frag_dist_length", "bias_correct",
        "num_bias_bins", "num_targets", "num_bootstraps",
        "num_processed", "num_mapped", "percent_mapped", "call",
        "start_time",
    ]
    assert list(meta.keys())[: len(ref_order)] == ref_order
    assert isinstance(meta["samp_type"], str)
    assert isinstance(meta["bias_correct"], bool)
    assert isinstance(meta["percent_mapped"], float)
    assert meta["call"] == "quant"
    assert meta["num_bias_bins"] == 4096
    assert meta["num_targets"] == 15
    assert meta["num_processed"] == 10000


def test_aux_gz_payload_dtypes(quant_out):
    """The aux distribution dumps are gzipped raw vectors with the
    reference's element types (GZipWriter.cpp:140-161 via
    writeVectorToFile): fld int32 (realize() samples, length maxVal+1),
    expected bias/gc float64, observed bias/gc int32."""
    aux = quant_out / "aux"

    def load(name, dtype):
        return np.frombuffer(gzip.open(aux / name, "rb").read(), dtype)

    fld = load("fld.gz", np.int32)
    assert fld.sum() == 10000  # realize() draws 10k samples
    assert (fld >= 0).all()
    eb = load("expected_bias.gz", np.float64)
    ob = load("observed_bias.gz", np.int32)
    assert len(eb) == 4096 and len(ob) == 4096  # 4^6 six-mer bins
    eg = load("expected_gc.gz", np.float64)
    og = load("observed_gc.gz", np.int32)
    assert len(eg) == 101 and len(og) == 101
    assert np.isfinite(eb).all() and np.isfinite(eg).all()


def test_cmd_info_echo_order(tmp_path):
    """cmd_info.json: sf_version first, then the invocation's options
    in given order (SailfishQuantify.cpp:1263-1277 serializes the
    parsed vm in insertion order)."""
    from sailfish_tpu.output.writers import QuantWriter

    w = QuantWriter(str(tmp_path))
    w.write_cmd_info([
        ("index", "/idx"), ("libType", "IU"), ("mates1", "/r1.fq"),
        ("mates2", "/r2.fq"), ("output", "/out"),
    ])
    doc = json.load(open(tmp_path / "cmd_info.json"))
    keys = list(doc.keys())
    assert keys == ["sf_version", "index", "libType", "mates1",
                    "mates2", "output"]
    assert doc["libType"] == "IU"
