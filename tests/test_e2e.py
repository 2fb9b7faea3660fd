"""End-to-end quant on the reference's bundled sample data — the analog
of the reference's SimpleTest (cmake/SimpleTest.cmake) but with golden
value checks: device backend must equal the numpy oracle exactly, and
the results must be consistent with the simulation truth encoded in the
read names."""

import json
import os

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.quant import run_quant


@pytest.fixture(scope="module")
def quant_result(sample_data, sample_index, tmp_path_factory):
    _, index_dir = sample_index
    out = tmp_path_factory.mktemp("quant")
    opts = QuantOpts(
        index_dir=index_dir,
        output_dir=str(out),
        lib_type="IU",
        mates1=[sample_data["reads1"]],
        mates2=[sample_data["reads2"]],
        batch_size=4096,
        dump_eq=True,
        dtype="float64",
    )
    stats = run_quant(opts, backend="device")
    return stats, str(out)


def test_outputs_exist(quant_result):
    _, out = quant_result
    for f in ("quant.sf", "cmd_info.json", "aux/meta_info.json",
              "aux/eq_classes.txt", "aux/fld.gz", "aux/expected_bias.gz",
              "aux/observed_bias.gz", "aux/expected_gc.gz",
              "aux/observed_gc.gz", "lib_format_counts.json"):
        assert os.path.exists(os.path.join(out, f)), f


def test_lib_format_counts(quant_result):
    """Observed-libtype accounting: sample_data is a clean IU library,
    so every mapped fragment observes a TOWARD format and the
    compatible fraction is 1.0."""
    import json

    stats, out = quant_result
    with open(os.path.join(out, "lib_format_counts.json")) as fh:
        doc = json.load(fh)
    assert doc["expected_format"] == "IU"
    assert doc["num_assigned_fragments"] == stats["num_mapped"]
    assert doc["compatible_fraction"] == 1.0
    assert sum(doc["observed_formats"].values()) == stats["num_mapped"]
    # IU-compatible observations are ISF/ISR (toward, either strand)
    assert set(doc["observed_formats"]) <= {"ISF", "ISR"}


def test_mapping_rate_and_classes(quant_result):
    stats, _ = quant_result
    # golden values pinned from the oracle implementation (and identical
    # on the device path): all 10k fragments map; 21 eq classes
    assert stats["num_observed"] == 10000
    assert stats["num_mapped"] == 10000
    assert stats["num_eq_classes"] == 21


def test_quant_sf_format_and_tpm(quant_result):
    _, out = quant_result
    with open(os.path.join(out, "quant.sf")) as fh:
        header = fh.readline().rstrip("\n")
        assert header == "Name\tLength\tEffectiveLength\tTPM\tNumReads"
        rows = [line.split("\t") for line in fh]
    assert len(rows) == 15
    tpm = np.array([float(r[3]) for r in rows])
    counts = np.array([float(r[4]) for r in rows])
    assert abs(tpm.sum() - 1e6) < 1.0
    assert abs(counts.sum() - 10000) < 0.1


def test_alphas_match_truth(quant_result, sample_data):
    """EM estimates should correlate strongly with the true per-
    transcript read counts encoded in the read names."""
    stats, _ = quant_result
    truth = {}
    with open(sample_data["reads1"]) as fh:
        for i, line in enumerate(fh):
            if i % 4 == 0:
                t = line.split(":")[1]
                truth[t] = truth.get(t, 0) + 1
    names = stats["names"]
    tvec = np.array([truth.get(n, 0) for n in names], dtype=float)
    est = stats["alphas"]
    corr = np.corrcoef(tvec, est)[0, 1]
    assert corr > 0.999
    # transcripts whose reads all map uniquely (appear only in
    # singleton classes) must recover truth essentially exactly; the
    # multi-mapped isoforms may legitimately deviate (EM splits
    # ambiguous classes by effective length, not by the simulator's
    # split)
    eq = stats["eq"]
    multi = set()
    for i in range(eq.num_classes):
        lab = eq.members[eq.offsets[i] : eq.offsets[i + 1]]
        if len(lab) > 1:
            multi.update(int(t) for t in lab)
    for t in range(len(names)):
        if t not in multi and tvec[t] > 0:
            assert abs(est[t] - tvec[t]) / tvec[t] < 0.005, names[t]


def test_meta_info(quant_result):
    _, out = quant_result
    with open(os.path.join(out, "aux/meta_info.json")) as fh:
        meta = json.load(fh)
    assert meta["num_processed"] == 10000
    assert meta["num_mapped"] == 10000
    assert meta["percent_mapped"] == 100.0
    assert meta["num_targets"] == 15
    assert meta["samp_type"] == "none"


def test_eq_classes_dump_format(quant_result):
    _, out = quant_result
    with open(os.path.join(out, "aux/eq_classes.txt")) as fh:
        lines = fh.read().splitlines()
    num_txps = int(lines[0])
    num_classes = int(lines[1])
    assert num_txps == 15 and num_classes == 21
    names = lines[2 : 2 + num_txps]
    assert len(set(names)) == 15
    total = 0
    for line in lines[2 + num_txps :]:
        toks = line.split("\t")
        size = int(toks[0])
        assert len(toks) == size + 2
        total += int(toks[-1])
    assert total == 10000


def test_gene_level_rollup(quant_result, tmp_path):
    _, out = quant_result
    # trivial 2-gene map over the 15 transcripts
    with open(os.path.join(out, "quant.sf")) as fh:
        fh.readline()
        names = [line.split("\t")[0] for line in fh]
    gm = tmp_path / "t2g.tsv"
    with open(gm, "w") as fh:
        for i, n in enumerate(names):
            fh.write(f"{n}\tgene{i % 2}\n")
    from sailfish_tpu.output.genemap import generate_gene_level_estimates

    path = generate_gene_level_estimates(str(gm), out)
    rows = [l.split("\t") for l in open(path) if not l.startswith("Name")]
    assert len(rows) == 2
    tpms = sum(float(r[3]) for r in rows)
    assert abs(tpms - 1e6) < 1.0
