"""Sequence-specific and fragment-GC bias modeling.

Ports, with exact semantics:
  * ReadKmerDist<6>::update — observed read-start 6-mer contexts
    (reference include/ReadKmerDist.hpp:33-73): for a fwd hit the RC
    6-mer starting 2 bases BEFORE the read start; for an rc hit the FWD
    6-mer starting 4 bases before the (right-side) start; pseudocount 1
    per bin; one successful sample per fragment, global budget
    --numBiasSamples (src/SailfishQuantify.cpp:270-287)
  * observed fragment GC histogram — for EVERY paired joint hit with
    0 < start and start+fragLen < RefLength, bin lrint(100 * gc /
    (len+1)) where gc counts positions (start, start+fragLen]
    (the closed-prefix quirk of Transcript::gcFrac,
    include/Transcript.hpp:85-95; src/SailfishQuantify.cpp:372-389)
  * sailfish::utils::updateEffectiveLengths — kallisto-style expected
    k-mer / GC distributions from current abundances and the FLD,
    per-position factors, bias-corrected effective lengths
    (src/SailfishUtils.cpp:611-926)

The expected-distribution and factor passes are vectorized over the
concatenated transcriptome (numpy, float64) — they run at most three
times per quant (iterations 50/500/1000, src/CollapsedEMOptimizer.cpp:816).
"""

from __future__ import annotations

import numpy as np

from .. import dna
from ..config import QuantOpts
from ..libformat import MateStatus

K_BIAS = 6          # ReadKmerDist<6>
NUM_KMER_BINS = 4 ** K_BIAS
TRUNC = K_BIAS      # reference `trunc = K` (:696)
MIN_ALPHA = 1e-8


def build_sampled_gc(index, step: int) -> dict:
    """Sampled per-transcript inclusive GC prefixes — the --gcSizeSamp
    memory/speed trade (reference Transcript::computeGCContentSampled_,
    include/Transcript.hpp:156-181): every `step`-th inclusive count is
    stored, plus a final sample at RefLength-1 when the last regular
    sample falls short of it.

    Returns numpy arrays usable from numpy AND jax (gc_count_interp):
      sc[S]           float64 sampled inclusive counts, all txps packed
      samp_off[T]     int64 first sample index of each transcript
      n_samp[T]       int64 samples per transcript
      gc_frac_len[T]  float64 (RefLength-1)/step
      last_regular[T] int64 ceil(gc_frac_len)
    """
    L = index.txp_lens.astype(np.int64)
    T = len(L)
    offsets = index.txp_offsets.astype(np.int64)
    is_gc = ((index.codes == dna.G) | (index.codes == dna.C)).astype(np.int64)
    cum = np.cumsum(is_gc)
    excl = cum - is_gc  # exclusive global prefix

    n_reg = (L + step - 1) // step
    extra = (((n_reg - 1) * step) < (L - 1)).astype(np.int64)
    n_samp = n_reg + extra
    samp_off = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(n_samp, out=samp_off[1:])
    tot = int(samp_off[-1])

    t_of = np.repeat(np.arange(T, dtype=np.int64), n_samp)
    j_of = np.arange(tot, dtype=np.int64) - samp_off[t_of]
    is_final = (extra[t_of] == 1) & (j_of == n_samp[t_of] - 1)
    local = np.where(is_final, L[t_of] - 1, j_of * step)
    gpos = offsets[t_of] + local
    # per-transcript INCLUSIVE count at `local`
    sc = (excl[np.clip(gpos + 1, 0, len(excl) - 1)]
          - excl[offsets[t_of]]).astype(np.float64)
    sc[gpos + 1 >= len(excl)] = (cum[-1] - excl[offsets[t_of]])[
        gpos + 1 >= len(excl)
    ]
    gc_frac_len = (L - 1).astype(np.float64) / step
    last_regular = np.ceil(gc_frac_len).astype(np.int64)
    return {
        "step": step,
        "sc": sc,
        "samp_off": samp_off[:-1],
        "n_samp": n_samp,
        "gc_frac_len": gc_frac_len,
        "last_regular": last_regular,
    }


def gc_count_interp(sgc: dict, t, p, ref_len, xp=np):
    """Transcript::gcCountInterp_ (include/Transcript.hpp:124-155),
    ported verbatim INCLUDING its reversed-lerp quirk: the weight
    `lambda` (the fraction of the way toward the NEXT sample) multiplies
    the PREVIOUS sample's count, so values interpolate backwards between
    samples.  Reproduced deliberately — behavior parity beats fixing the
    reference's arithmetic.  Vectorized; xp is numpy or jax.numpy;
    t/p/ref_len are same-shaped integer arrays (or scalars)."""
    sc = sgc["sc"]
    idt = xp.asarray(sgc["samp_off"]).dtype
    off = xp.asarray(sgc["samp_off"])[t]
    n = xp.asarray(sgc["n_samp"])[t]
    last_reg = xp.asarray(sgc["last_regular"])[t]
    frac_len = xp.asarray(sgc["gc_frac_len"])[t]
    sc = xp.asarray(sc)
    hi = sc.shape[0] - 1

    frac_p = xp.asarray(p, sc.dtype) / sgc["step"]
    samp_ind = xp.floor(frac_p)
    use_last = samp_ind >= xp.asarray(last_reg, sc.dtype)
    next_ind = xp.where(use_last, n - 1, samp_ind.astype(idt) + 1)
    frac_next = xp.where(use_last, frac_len, next_ind.astype(sc.dtype))
    denom = frac_next - samp_ind
    lam = (frac_p - samp_ind) / xp.where(denom != 0, denom, 1.0)
    si = xp.clip(off + samp_ind.astype(idt), 0, hi)
    ni = xp.clip(off + next_ind, 0, hi)
    v = lam * sc[si] + (1.0 - lam) * sc[ni]
    # p == RefLength-1: the final sample's value, no interpolation
    return xp.where(xp.asarray(p) == xp.asarray(ref_len) - 1,
                    sc[xp.clip(off + n - 1, 0, hi)], v)


def gc_frac_sampled(sgc: dict, t, s, e, ref_len, xp=np):
    """Transcript::gcFrac for the sampled path (gcStep_ > 1,
    include/Transcript.hpp:85-95): interpolated counts at both closed
    endpoints, lrint rounding."""
    gc = (gc_count_interp(sgc, t, e, ref_len, xp)
          - gc_count_interp(sgc, t, s, ref_len, xp))
    return xp.rint(100.0 * gc / (xp.asarray(e) - xp.asarray(s) + 1))


class BiasState:
    """Observation-side state (the ReadExperiment bias fields)."""

    def __init__(self, opts: QuantOpts):
        self.opts = opts
        self.read_bias_counts = np.ones(NUM_KMER_BINS, dtype=np.int64)
        self.observed_gc = np.zeros(101, dtype=np.int64)
        self.remaining_bias_samples = opts.num_bias_samples
        self.expected_seq_bias = np.ones(NUM_KMER_BINS, dtype=np.float64)
        self.expected_gc = np.ones(101, dtype=np.float64)
        self._gc_prefix_cache: dict[int, np.ndarray] = {}
        self._sgc = None  # sampled-GC tables (gc_samp_factor > 1)

    # ---------- helpers ----------

    def _txp_seq(self, index, t: int) -> np.ndarray:
        o = int(index.txp_offsets[t])
        return index.codes[o : o + int(index.txp_lens[t])]

    def _gc_inclusive_prefix(self, index, t: int) -> np.ndarray:
        """GCCount_[i] = # G/C in [0, i] (inclusive), per transcript."""
        cached = self._gc_prefix_cache.get(t)
        if cached is None:
            seq = self._txp_seq(index, t)
            cached = np.cumsum((seq == dna.G) | (seq == dna.C))
            self._gc_prefix_cache[t] = cached
        return cached

    def _sampled_gc(self, index) -> dict:
        if self._sgc is None:
            self._sgc = build_sampled_gc(index, self.opts.gc_samp_factor)
        return self._sgc

    def gc_frac(self, index, t: int, s: int, e: int) -> int:
        if self.opts.gc_samp_factor > 1:
            fr = gc_frac_sampled(
                self._sampled_gc(index), t, s, e, int(index.txp_lens[t])
            )
            return int(np.clip(fr, 0, 100))
        gcc = self._gc_inclusive_prefix(index, t)
        gc = int(gcc[e]) - int(gcc[s])
        return int(np.rint(100.0 * gc / (e - s + 1)))

    # ---------- observation (refimpl / oracle path) ----------

    def observe_fragment(self, index, rm, len1: int, len2: int) -> None:
        """Observe one mapped fragment's joint hits (PE path).

        Mirrors the per-hit loop at src/SailfishQuantify.cpp:260-393.
        """
        opts = self.opts
        need_seq = opts.bias_correct and self.remaining_bias_samples > 0
        for h in rm.joint:
            t = h.txp
            ref_len = int(index.txp_lens[t])
            read_len = h.read_len or len1
            if need_seq:
                start_pos = h.pos if h.fwd else h.pos + read_len
                if 0 < start_pos < ref_len:
                    if self._read_bias_update(index, t, start_pos, h.fwd):
                        self.remaining_bias_samples -= 1
                        need_seq = False
            if (
                opts.gc_bias_correct
                and h.mate_status == MateStatus.PAIRED_END_PAIRED
            ):
                start = min(h.pos, h.mate_pos)
                stop = start + h.frag_len
                if start > 0 and stop < ref_len:
                    self.observed_gc[self.gc_frac(index, t, start, stop)] += 1

    def _read_bias_update(self, index, t: int, p: int, fwd: bool) -> bool:
        """ReadKmerDist::update (include/ReadKmerDist.hpp:33-73)."""
        seq = self._txp_seq(index, t)
        end = len(seq)
        if fwd:
            # window [p-2, p-2+6) must fit: p >= 2 and p-2+6 < end
            if p >= 2 and (p - 2 + K_BIAS) < end:
                w = seq[p - 2 : p - 2 + K_BIAS]
                idx = dna.kmer_index_rc(w, K_BIAS)
                if idx < 0:
                    return False
                self.read_bias_counts[idx] += 1
                return True
        else:
            if p >= 4 and (p - 4 + K_BIAS) < end:
                w = seq[p - 4 : p - 4 + K_BIAS]
                idx = dna.kmer_index(w, K_BIAS)
                if idx < 0:
                    return False
                self.read_bias_counts[idx] += 1
                return True
        return False

    def observe_batch(self, index, b1, b2, br) -> None:
        """Batch observation (PE) — refimpl per_read path or the device
        backend's precomputed (seq_samples, gc_hist)."""
        if getattr(br, "per_read", None) is not None:
            for i, rm in enumerate(br.per_read):
                if rm.joint:  # reference observes every joint hit
                    self.observe_fragment(
                        index, rm, int(b1.lens[i]), int(b2.lens[i])
                    )
            return
        self._consume_device_obs(br)

    def observe_batch_se(self, index, b, br) -> None:
        if getattr(br, "per_read", None) is not None:
            for i, rm in enumerate(br.per_read):
                if rm.joint:
                    self.observe_fragment(index, rm, int(b.lens[i]), 0)
            return
        self._consume_device_obs(br)

    def _consume_device_obs(self, br) -> None:
        """Fold the device backend's per-batch bias observations in file
        order (seq samples respect the global --numBiasSamples budget)."""
        if getattr(br, "gc_hist", None) is not None:
            self.observed_gc += br.gc_hist.astype(np.int64)
        samples = getattr(br, "seq_samples", None)
        if samples is not None and self.opts.bias_correct:
            ok = samples[samples >= 0]
            if self.remaining_bias_samples > 0:
                take = ok[: self.remaining_bias_samples]
                if len(take):
                    self.read_bias_counts += np.bincount(
                        take, minlength=NUM_KMER_BINS
                    )
                    self.remaining_bias_samples -= len(take)


def bias_observe_device(slots, bias_text, lens1, lens2, *, gc_on: bool,
                        seq_on: bool):
    """Device-side bias observation over joint-hit slots.

    Mirrors the per-hit loop (src/SailfishQuantify.cpp:260-393):
      * seq bias: the FIRST joint hit whose context window fits yields
        one 6-mer sample per fragment (budget gating happens on host)
      * GC: every valid paired slot with 0 < start and stop < RefLength
        contributes one observation

    Returns (seq_sample (B,) int32 with -1 = none, gc_hist (101,) int32).
    """
    import jax
    import jax.numpy as jnp

    packed16 = bias_text["packed16"]
    gc_excl = bias_text["gc_excl"]          # int32[N+1] exclusive prefix
    txp_offsets = bias_text["txp_offsets"]  # int32[T]
    txp_lens = bias_text["txp_lens"]        # int32[T]

    txp = slots["txp"]
    pos = slots["pos"]
    fwd = slots["fwd"]
    status = slots["status"]
    valid = slots["valid"]
    B, W = txp.shape

    from ..map.pair import PAIRED, RIGHT

    read_len = jnp.where(
        status == RIGHT, lens2[:, None], lens1[:, None]
    ).astype(jnp.int32)
    ref_len = txp_lens[txp]
    off = txp_offsets[txp]

    seq_sample = jnp.full(B, -1, jnp.int32)
    if seq_on:
        start_pos = jnp.where(fwd, pos, pos + read_len)
        in_ref = (start_pos > 0) & (start_pos < ref_len)
        # fwd hit: RC 6-mer at start-2; rc hit: FWD 6-mer at start-4
        w_off = jnp.where(fwd, 2, 4)
        fits = jnp.where(
            fwd,
            (start_pos >= 2) & (start_pos - 2 + K_BIAS < ref_len),
            (start_pos >= 4) & (start_pos - 4 + K_BIAS < ref_len),
        )
        ok = valid & in_ref & fits
        g = jnp.clip(off + start_pos - w_off, 0,
                     packed16.shape[0] - 1)
        fwd6 = (packed16[g] >> jnp.uint32(20)).astype(jnp.int32)
        # reverse complement of a 6-mer index
        rc6 = jnp.zeros_like(fwd6)
        for j in range(K_BIAS):
            base = (fwd6 >> (2 * (K_BIAS - 1 - j))) & 3
            rc6 = rc6 | ((3 - base) << (2 * j))
        kidx = jnp.where(fwd, rc6, fwd6)
        # first qualifying hit in merged jointHits order = ascending
        # (txp, slot) — slots are block-ordered (left before right), not
        # txp-sorted, so order by explicit key.  txp*W stays in int32 for
        # txp < 2^31/W (~4M transcripts at W=512).
        okey = jnp.where(ok, txp * W + jnp.arange(W, dtype=jnp.int32)[None, :],
                         jnp.int32(2**31 - 1))
        first = jnp.argmin(okey, axis=1)
        has = ok.any(axis=1)
        seq_sample = jnp.where(
            has,
            jnp.take_along_axis(kidx, first[:, None], axis=1)[:, 0],
            -1,
        )

    gc_hist = jnp.zeros(101, jnp.int32)
    if gc_on:
        is_p = status == PAIRED
        start = jnp.minimum(pos, slots["mpos"])
        stop = start + slots["frag_len"]
        ok = valid & is_p & (start > 0) & (stop < ref_len)
        if "sgc_sc" in bias_text:
            # sampled+interpolated counts (--gcSizeSamp > 1), the device
            # twin of gc_frac_sampled
            sgc = {
                "step": bias_text["sgc_step"],
                "sc": bias_text["sgc_sc"],
                "samp_off": bias_text["sgc_samp_off"],
                "n_samp": bias_text["sgc_n_samp"],
                "gc_frac_len": bias_text["sgc_gc_frac_len"],
                "last_regular": bias_text["sgc_last_regular"],
            }
            st = jnp.where(ok, txp, 0)
            gc = (gc_count_interp(sgc, st, stop, ref_len, xp=jnp)
                  - gc_count_interp(sgc, st, start, ref_len, xp=jnp)
                  ).astype(jnp.float32)
        else:
            gs = jnp.clip(off + start + 1, 0, gc_excl.shape[0] - 1)
            ge = jnp.clip(off + stop + 1, 0, gc_excl.shape[0] - 1)
            gc = (gc_excl[ge] - gc_excl[gs]).astype(jnp.float32)
        frac = jnp.rint(
            100.0 * gc / jnp.maximum(stop - start + 1, 1).astype(jnp.float32)
        ).astype(jnp.int32)
        frac = jnp.clip(frac, 0, 100)
        gc_hist = jnp.bincount(
            jnp.where(ok, frac, 101).reshape(-1), length=102
        )[:101].astype(jnp.int32)
    return seq_sample, gc_hist


def update_effective_lengths(
    opts: QuantOpts,
    index,
    bias: BiasState,
    fld_pdf_cdf,            # (pdf, cdf) float64 arrays over fragment length
    eff_lens_in: np.ndarray,
    alphas: np.ndarray,
    num_fwd: int,
    num_rc: int,
) -> np.ndarray:
    """Port of sailfish::utils::updateEffectiveLengths
    (src/SailfishUtils.cpp:611-926), vectorized over the concatenated
    transcriptome."""
    pdf, cdf = fld_pdf_cdf
    num_mappings = num_fwd + num_rc
    if num_mappings == 0:
        return eff_lens_in
    if opts.gc_bias_correct and opts.bias_correct:
        return eff_lens_in  # reference refuses the combination (:636-641)

    prob_fwd = num_fwd / num_mappings
    prob_rc = num_rc / num_mappings

    codes = index.codes
    N = len(codes)
    T = index.num_transcripts
    ref_lens = index.txp_lens.astype(np.int64)
    offsets = index.txp_offsets
    txp_of_pos = index.txp_of_pos

    eff_in = np.asarray(eff_lens_in, dtype=np.float64)
    elen_int = eff_in.astype(np.int64)
    unprocessed = np.maximum(0, ref_lens - elen_int)
    contribution = np.where(
        (alphas >= MIN_ALPHA) & (unprocessed > 0), alphas / eff_in, 0.0
    )

    def cdf_at(x):
        x = np.asarray(x, dtype=np.int64)
        return np.where(
            x < len(cdf), cdf[np.clip(x, 0, len(cdf) - 1)], 1.0
        ) * (x >= 0)

    # per-position arrays over the concatenated text
    tpos = txp_of_pos.astype(np.int64)
    local_i = np.arange(N, dtype=np.int64) - offsets[tpos]
    rl_pos = ref_lens[tpos]
    contrib_pos = contribution[tpos]

    expected_seq = np.ones(NUM_KMER_BINS, dtype=np.float64)
    expected_gc = np.ones(101, dtype=np.float64)

    fwd6 = rc6 = None
    if opts.bias_correct:
        fwd6_all = dna.rolling_kmer_indices(codes, K_BIAS)
        fwd6 = np.full(N, -1, dtype=np.int64)
        fwd6[: len(fwd6_all)] = fwd6_all
        # RC index of the same window
        valid = fwd6 >= 0
        rc6 = np.full(N, -1, dtype=np.int64)
        rc6[valid] = _rc_kmer_indices(fwd6[valid], K_BIAS)

        # ---- expected seq dist (pass A, :728-784) ----
        # fwd direction: window at i (i <= refLen - trunc - 1), RC 6-mer,
        # fragStartPos = i + 2, maxFragLen = refLen - fragStartPos + 1
        m = (local_i <= rl_pos - TRUNC - 1) & (rc6 >= 0) & (contrib_pos > 0)
        max_fl = rl_pos - (local_i + 2) + 1
        m_fwd = m & (max_fl >= 0) & (max_fl < rl_pos)
        np.add.at(
            expected_seq,
            rc6[m_fwd],
            prob_fwd * contrib_pos[m_fwd] * cdf_at(max_fl[m_fwd]),
        )
        # rc direction: FWD 6-mer at i, fragStartPos = i + 4,
        # maxFragLen = fragStartPos + 1
        max_fl_rc = (local_i + 4) + 1
        m_rc = m & (max_fl_rc >= 0) & (max_fl_rc < rl_pos)
        np.add.at(
            expected_seq,
            fwd6[m_rc],
            prob_rc * contrib_pos[m_rc] * cdf_at(max_fl_rc[m_rc]),
        )

    fld_low, fld_high = 0, 1
    gc_incl = None
    if opts.gc_bias_correct:
        # fldLow/fldHigh: cdf crossing 0.005 / 0.995 (:672-684)
        fld_low = int(np.argmax(cdf >= 0.005)) if (cdf >= 0.005).any() else 0
        fld_high = int(np.argmax(cdf >= 0.995)) if (cdf >= 0.995).any() else 1
        gc_samp = max(1, opts.pdf_samp_factor)
        # inclusive GC prefix over concatenated text, reset per transcript
        is_gc = ((codes == dna.G) | (codes == dna.C)).astype(np.int64)
        cum = np.cumsum(is_gc)
        excl = cum - is_gc
        gc_incl = cum - excl[offsets[tpos]]  # inclusive prefix within txp

        if opts.gc_samp_factor > 1:
            # sampled+interpolated gcFrac (--gcSizeSamp; the reference
            # dispatches on gcStep_ inside Transcript::gcFrac,
            # include/Transcript.hpp:85-95, so EVERY gcFrac call —
            # observation and expected-GC — uses the sampled tables)
            sgc = build_sampled_gc(index, opts.gc_samp_factor)

            def gc_frac_vec(gs, ge):
                t = tpos[gs]
                fr = gc_frac_sampled(
                    sgc, t, gs - offsets[t], ge - offsets[t], ref_lens[t]
                )
                return np.clip(fr, 0, 100).astype(np.int64)
        else:
            def gc_frac_vec(gs, ge):
                """gcFrac over global positions (same transcript assumed)."""
                gc = gc_incl[ge] - gc_incl[gs]
                return np.rint(100.0 * gc / (ge - gs + 1)).astype(np.int64)

        # ---- expected GC dist (pass A, :747-759) ----
        m_pos = (local_i <= rl_pos - TRUNC - 1) & (contrib_pos > 0)
        prev_mass = cdf_at(np.zeros(1))[0]
        prev = np.full(N, prev_mass)
        for fl in range(fld_low, fld_high + 1, gc_samp):
            ge_local = local_i + fl - 1
            ok = m_pos & (ge_local < rl_pos)
            if not ok.any():
                break
            gidx = np.nonzero(ok)[0]
            fr = gc_frac_vec(gidx, gidx + fl - 1)
            w = contrib_pos[gidx] * (cdf_at(fl) - prev[gidx])
            np.add.at(expected_gc, fr, w)
            prev[gidx] = cdf_at(fl)

    # ---- priors and normalization (:789-804) ----
    read_norm = float(bias.read_bias_counts.sum())
    txome_norm = float(expected_seq.sum())
    seq_prior = 0.0
    if opts.bias_correct:
        pmass = float(NUM_KMER_BINS)
        # guard the degenerate no-observations case (read_norm == pmass
        # from pseudocounts alone; the reference would divide by zero)
        seq_prior = ((pmass / max(read_norm - pmass, 1.0)) * txome_norm) / pmass

    gc_read_norm = float(bias.observed_gc.sum())
    gc_txome_norm = float(expected_gc.sum())
    gc_prior = 0.0
    if opts.gc_bias_correct:
        pmass = 101.0
        gc_prior = (
            (pmass / max(gc_read_norm - pmass, 1.0)) * gc_txome_norm
        ) / 101.0

    # ---- pass B: per-position factors -> effective lengths (:806-924) ----
    eff_out = eff_in.copy()
    active = (alphas >= MIN_ALPHA) & (unprocessed > 0)

    seq_factor_pos = np.zeros(N, dtype=np.float64)
    if opts.bias_correct:
        ratio = bias.read_bias_counts / (expected_seq + seq_prior)
        m = (local_i <= rl_pos - TRUNC - 1) & active[tpos]
        # fwd: contributes at fragStartPos = i+2 when 0 <= i+2 < refLen
        mf = m & (rc6 >= 0) & (local_i + 2 >= 0) & (local_i + 2 < rl_pos)
        np.add.at(
            seq_factor_pos,
            np.nonzero(mf)[0] + 2,
            prob_fwd * ratio[rc6[mf]] * cdf_at(rl_pos[mf] - (local_i[mf] + 2) + 1),
        )
        # rc: contributes at fragStartPos = i+4
        mr = m & (fwd6 >= 0) & (local_i + 4 >= 0) & (local_i + 4 < rl_pos)
        np.add.at(
            seq_factor_pos,
            np.nonzero(mr)[0] + 4,
            prob_rc * ratio[fwd6[mr]] * cdf_at((local_i[mr] + 4) + 1),
        )

    gc_factor_pos = np.zeros(N, dtype=np.float64)
    if opts.gc_bias_correct:
        gratio = bias.observed_gc / (gc_prior + expected_gc)
        m_pos = (local_i <= rl_pos - TRUNC - 1) & active[tpos]
        gc_samp = max(1, opts.pdf_samp_factor)
        prev = np.full(N, cdf_at(np.zeros(1))[0])
        for fl in range(fld_low, fld_high + 1, gc_samp):
            ok = m_pos & (local_i + fl - 1 < rl_pos)
            if not ok.any():
                break
            gidx = np.nonzero(ok)[0]
            fr = gc_frac_vec(gidx, gidx + fl - 1)
            sp = gratio[fr] * (cdf_at(fl) - prev[gidx])
            prev[gidx] = cdf_at(fl)
            np.add.at(gc_factor_pos, gidx, sp * prob_fwd)
            np.add.at(gc_factor_pos, gidx + fl - 1, sp * prob_rc)

    # reduce per-position factors to per-transcript effective lengths
    if opts.bias_correct and opts.gc_bias_correct:
        prod = seq_factor_pos * gc_factor_pos
        eff = np.bincount(tpos, weights=prod, minlength=T)
        eff *= (txome_norm / read_norm) * (gc_txome_norm / gc_read_norm)
    elif opts.bias_correct:
        eff = np.bincount(tpos, weights=seq_factor_pos, minlength=T)
        eff *= txome_norm / read_norm
    elif opts.gc_bias_correct:
        eff = np.bincount(tpos, weights=gc_factor_pos, minlength=T)
        eff *= gc_txome_norm / gc_read_norm
    else:
        return eff_in

    accept = active & (unprocessed > 0) & (eff > unprocessed)
    eff_out[accept] = eff[accept]

    bias.expected_seq_bias = expected_seq
    bias.expected_gc = expected_gc
    return eff_out


def _rc_kmer_indices(idx: np.ndarray, k: int) -> np.ndarray:
    """Vectorized reverse-complement of 2-bit k-mer indices."""
    idx = np.asarray(idx, dtype=np.int64)
    out = np.zeros_like(idx)
    for j in range(k):
        base = (idx >> (2 * (k - 1 - j))) & 3
        out |= (3 - base) << (2 * j)
    return out


def run_em_with_bias(eq, eff_lens, ref_lens, index, bias: BiasState, state,
                     opts: QuantOpts):
    """EM with effective-length recomputation at iterations 50/500/1000
    (src/CollapsedEMOptimizer.cpp:814-840), run as host-controlled
    segments around the jitted EM.  The recompute happens exactly when
    the reference's loop would reach those iterations unconverged; class
    weights refresh from the new effective lengths (updateEqClassWeights,
    :527-555) on the next segment."""
    import numpy as np

    from .fld import EmpiricalDistribution

    num_txps = index.num_transcripts
    total_mapped = float(state.num_mapped)
    fld_hist = state.fl_hist
    emp = EmpiricalDistribution(
        np.arange(len(fld_hist), dtype=np.int64), fld_hist.astype(np.int64)
    )
    pdf_cdf = (emp.pdfvals, emp.cdfvals)

    eff = np.asarray(eff_lens, dtype=np.float64)
    # uniform active init (src/CollapsedEMOptimizer.cpp:774-803)
    active = np.zeros(num_txps, dtype=bool)
    active[np.unique(eq.members)] = True
    alphas = np.where(active, total_mapped / max(1, active.sum()), 0.0)

    segments = [(50, 50), (0, 450), (0, 500), (0, opts.em_max_iter - 1000)]
    total_iters = 0
    em = None
    for si, (min_it, max_it) in enumerate(segments):
        em = _resume_em(eq, eff, alphas, num_txps, opts, min_it, max_it)
        alphas = em.alphas_raw
        total_iters += em.num_iterations
        if em.converged or si == len(segments) - 1:
            break
        eff = update_effective_lengths(
            opts, index, bias, pdf_cdf, eff, alphas,
            state.num_fwd, state.num_rc,
        )
    em.num_iterations = total_iters
    return em, eff


def _resume_em(eq, eff, alphas_in, num_txps, opts: QuantOpts, min_it, max_it):
    """Continue the EM from given alphas (used between bias segments)."""
    import jax.numpy as jnp
    import jax

    from ..infer.em import EMResult, _optimize_jit, class_weights

    jdtype = jnp.float64 if (
        opts.dtype == "float64" and jax.config.read("jax_enable_x64")
    ) else jnp.float32
    weights = class_weights(eq, eff)
    com = eq.class_of_member()
    singleton = eq.class_sizes() == 1
    it, alpha, converged, max_rel = _optimize_jit(
        jnp.asarray(eq.members, jnp.int32),
        jnp.asarray(com, jnp.int32),
        jnp.asarray(eq.counts, jdtype),
        jnp.asarray(weights, jdtype),
        jnp.asarray(singleton),
        jnp.asarray(alphas_in, jdtype),
        num_txps=num_txps,
        use_vbem=opts.use_vb_opt,
        min_iter=min_it,
        max_iter=max_it,
        rel_diff_tol=opts.em_tolerance,
        alpha_check_cutoff=1e-2,
    )
    import numpy as np

    alphas = np.array(alpha, dtype=np.float64)
    cutoff = (0.01 + 1e-8) if opts.use_vb_opt else 1e-8
    res = EMResult(
        alphas=alphas.copy(),
        num_iterations=int(it),
        max_rel_diff=float(max_rel),
        converged=bool(converged),
    )
    res.alphas_raw = alphas.copy()
    res.alphas[res.alphas <= cutoff] = 0.0
    return res
