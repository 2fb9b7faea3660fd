"""Bias models: device observation vs the oracle's per-hit replay, and
sanity of the bias-corrected effective-length recomputation."""

import numpy as np
import pytest

from sailfish_tpu.config import QuantOpts
from sailfish_tpu.libformat import parse_library_format
from sailfish_tpu.map.pipeline import DeviceMapperBackend
from sailfish_tpu.quant import RefMapperBackend
from sailfish_tpu.stats.bias import BiasState, update_effective_lengths
from sailfish_tpu.stats.fld import EmpiricalDistribution

from conftest import to_batch


def _observe(world, opts, backend_cls):
    idx = world["idx"]
    exp = parse_library_format("IU")
    if backend_cls is RefMapperBackend:
        backend = RefMapperBackend(idx, opts)
    else:
        backend = DeviceMapperBackend(idx, opts)
    bias = BiasState(opts)
    r1, r2, _ = world["sim"](256, err_rate=0.1, seed=21)
    b1, b2 = to_batch(r1), to_batch(r2)
    br = backend.map_pe_batch(b1, b2, exp)
    bias.observe_batch(idx, b1, b2, br)
    return bias


@pytest.mark.parametrize("flags", [
    dict(bias_correct=True),
    dict(gc_bias_correct=True),
])
def test_device_observation_matches_oracle(toy_world, flags):
    opts_r = QuantOpts(batch_size=256, **flags)
    opts_d = QuantOpts(batch_size=256, **flags)
    br = _observe(toy_world, opts_r, RefMapperBackend)
    bd = _observe(toy_world, opts_d, DeviceMapperBackend)
    np.testing.assert_array_equal(br.observed_gc, bd.observed_gc)
    np.testing.assert_array_equal(br.read_bias_counts, bd.read_bias_counts)
    assert br.remaining_bias_samples == bd.remaining_bias_samples


def test_update_effective_lengths_uniform_data(toy_world):
    """With (pseudocount-only) flat observed bias, corrected effective
    lengths stay in a sane range and expressed transcripts get values
    between unprocessedLen and refLen-ish."""
    idx = toy_world["idx"]
    opts = QuantOpts(bias_correct=True)
    bias = BiasState(opts)
    # observed = expected-ish: feed many uniform samples
    rng = np.random.default_rng(0)
    bias.read_bias_counts += rng.integers(40, 60, 4096)

    T = idx.num_transcripts
    ref_lens = idx.txp_lens.astype(np.float64)
    eff_in = np.maximum(ref_lens - 180.0, 1.0)
    alphas = np.full(T, 100.0)
    fld = np.zeros(1000, dtype=np.int64)
    fld[180] = 500
    fld[220] = 500
    emp = EmpiricalDistribution(np.arange(1000), fld)
    eff_out = update_effective_lengths(
        opts, idx, bias, (emp.pdfvals, emp.cdfvals), eff_in, alphas,
        num_fwd=600, num_rc=400,
    )
    assert eff_out.shape == (T,)
    assert np.all(eff_out > 0)
    # corrected lengths bounded by the transcript length
    assert np.all(eff_out <= ref_lens + 1)


def test_update_effective_lengths_skips_inactive(toy_world):
    idx = toy_world["idx"]
    opts = QuantOpts(bias_correct=True)
    bias = BiasState(opts)
    T = idx.num_transcripts
    ref_lens = idx.txp_lens.astype(np.float64)
    eff_in = np.maximum(ref_lens - 150.0, 1.0)
    alphas = np.zeros(T)
    alphas[0] = 50.0
    fld = np.zeros(1000, dtype=np.int64)
    fld[150] = 1000
    emp = EmpiricalDistribution(np.arange(1000), fld)
    eff_out = update_effective_lengths(
        opts, idx, bias, (emp.pdfvals, emp.cdfvals), eff_in, alphas,
        num_fwd=1, num_rc=1,
    )
    # inactive transcripts keep their input effective length
    np.testing.assert_allclose(eff_out[1:], eff_in[1:])


def test_e2e_bias_device(sample_data, sample_index, tmp_path):
    """--biasCorrect and --gcBiasCorrect run end-to-end on the device
    backend and agree with the oracle backend."""
    from sailfish_tpu.quant import run_quant

    _, index_dir = sample_index
    results = {}
    for backend in ("device", "refimpl"):
        opts = QuantOpts(
            index_dir=index_dir,
            output_dir=str(tmp_path / f"q_{backend}"),
            lib_type="IU",
            mates1=[sample_data["reads1"]],
            mates2=[sample_data["reads2"]],
            batch_size=4096,
            gc_bias_correct=True,
            dtype="float64",
        )
        results[backend] = run_quant(opts, backend=backend)
    a = results["device"]["alphas"]
    b = results["refimpl"]["alphas"]
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        results["device"]["eff_lens"], results["refimpl"]["eff_lens"],
        rtol=1e-9,
    )


# ---------- sampled GC prefixes (--gcSizeSamp) ----------

def _gc_interp_scalar(sgc, t, p, ref_len):
    """Direct scalar port of Transcript::gcCountInterp_
    (include/Transcript.hpp:124-155) for cross-checking the vectorized
    implementation, quirk and all."""
    import math

    off = int(sgc["samp_off"][t])
    n = int(sgc["n_samp"][t])
    sc = sgc["sc"]
    if p == ref_len - 1:
        return float(sc[off + n - 1])
    frac_p = p / sgc["step"]
    samp_ind = math.floor(frac_p)
    if samp_ind >= sgc["last_regular"][t]:
        nxt = n - 1
        frac_next = sgc["gc_frac_len"][t]
    else:
        nxt = samp_ind + 1
        frac_next = float(nxt)
    lam = (frac_p - samp_ind) / (frac_next - samp_ind)
    return lam * sc[off + samp_ind] + (1.0 - lam) * sc[off + nxt]


def test_sampled_gc_interp_matches_scalar_port(toy_world):
    from sailfish_tpu.stats.bias import build_sampled_gc, gc_count_interp

    idx = toy_world["idx"]
    rng = np.random.default_rng(3)
    for step in (2, 5, 7):
        sgc = build_sampled_gc(idx, step)
        ts = rng.integers(0, idx.num_transcripts, 200)
        rls = idx.txp_lens[ts].astype(np.int64)
        ps = (rng.random(200) * rls).astype(np.int64)
        want = np.array([
            _gc_interp_scalar(sgc, int(t), int(p), int(rl))
            for t, p, rl in zip(ts, ps, rls)
        ])
        got = gc_count_interp(sgc, ts, ps, rls)
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sampled_gc_reversed_lerp_quirk(toy_world):
    """The reference's gcCountInterp_ weights the PREVIOUS sample by
    lambda — so at an exact sample position (lambda == 0) it returns
    the NEXT sample's count, an off-by-one vs the exact inclusive
    prefix.  We reproduce that quirk deliberately (behavior parity over
    arithmetic correction): at step=1 every position is a sample, so
    interp(p) == inclusive_count(p + 1) for p < RefLength-1, and
    interp(RefLength-1) == total (the special-cased last position)."""
    from sailfish_tpu import dna
    from sailfish_tpu.stats.bias import build_sampled_gc, gc_count_interp

    idx = toy_world["idx"]
    sgc = build_sampled_gc(idx, 1)
    rng = np.random.default_rng(5)
    for _ in range(50):
        t = int(rng.integers(0, idx.num_transcripts))
        o = int(idx.txp_offsets[t])
        L = int(idx.txp_lens[t])
        seq = idx.codes[o : o + L]
        incl = np.cumsum((seq == dna.G) | (seq == dna.C))
        p = int(rng.integers(0, L))
        got = float(gc_count_interp(sgc, t, p, L))
        want = float(incl[p + 1]) if p < L - 1 else float(incl[L - 1])
        assert got == want, (t, p, L)


def test_device_observation_matches_oracle_sampled_gc(toy_world):
    """--gcSizeSamp 4: the sampled-interp observation path agrees
    between the device kernel and the oracle's per-hit replay."""
    flags = dict(gc_bias_correct=True, gc_samp_factor=4)
    br = _observe(toy_world, QuantOpts(batch_size=256, **flags),
                  RefMapperBackend)
    bd = _observe(toy_world, QuantOpts(batch_size=256, **flags),
                  DeviceMapperBackend)
    np.testing.assert_array_equal(br.observed_gc, bd.observed_gc)


def test_update_effective_lengths_sampled_gc(toy_world):
    """The sampled expected-GC pass runs end-to-end and yields sane
    lengths.  No numeric closeness to the exact pass is asserted:
    sampling is an approximation by design (the reference trades
    fidelity for memory at gcSizeSamp > 1), and the accept gate
    (eff > unprocessedLen) is a threshold that can flip on toy data."""
    idx = toy_world["idx"]
    outs = {}
    for step in (1, 4):
        opts = QuantOpts(gc_bias_correct=True, gc_samp_factor=step)
        bias = BiasState(opts)
        rng = np.random.default_rng(1)
        bias.observed_gc += rng.integers(10, 50, 101)
        T = idx.num_transcripts
        ref_lens = idx.txp_lens.astype(np.float64)
        eff_in = np.maximum(ref_lens - 180.0, 1.0)
        alphas = np.full(T, 100.0)
        fld = np.zeros(1000, dtype=np.int64)
        fld[180] = 500
        fld[220] = 500
        emp = EmpiricalDistribution(np.arange(1000), fld)
        outs[step] = update_effective_lengths(
            opts, idx, bias, (emp.pdfvals, emp.cdfvals), eff_in, alphas,
            num_fwd=600, num_rc=400,
        )
    ref_lens = idx.txp_lens.astype(np.float64)
    for step in (1, 4):
        assert np.all(outs[step] > 0)
        assert np.all(outs[step] <= ref_lens + 1)
