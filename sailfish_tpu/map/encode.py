"""Device-side read encoding: oriented lanes + packed query words.

For a batch of B reads we build 2B "oriented lanes": lane b is the read
as given (fwd), lane B+b its reverse complement (rc).  For each lane we
precompute, at every query position i:

  pw_a[?, i]   uint32 — 16 bases packed 2-bit starting at i, with
               non-ACGT (N / padding) substituted as A; earliest base in
               the most significant bits (lexicographic order — matches
               the index's packed16 convention, sailfish_tpu/dna.py)
  qpref[?, i]  int32  — the P-base prefix value (pw_a >> 2(16-P))
  bad_dist[?, i] int32 — distance from i to the next non-ACGT base in
               the lane (N or padding), i.e. the number of real read
               bases available at i.  True LCPs are capped by this and
               by the index's sep_dist, so A-substituted packed-word
               comparisons can never cross an N, the read end, or a
               transcript boundary.
  valid16[?, i] bool  — no non-ACGT base in [i, i+16)

All arrays are padded so positions up to L-1 are addressable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SEP = 4

# complement lookup: A<->T, C<->G, SEP->SEP
_COMP = jnp.array([3, 2, 1, 0, 4], dtype=jnp.uint8)


def _pack_words(codes: jnp.ndarray, sub: int) -> jnp.ndarray:
    """codes (B2, L) uint8 -> packed 16-base words (B2, L) uint32 with
    non-ACGT substituted by `sub`; windows extending past L behave as if
    padded with `sub`."""
    b2, L = codes.shape
    c = jnp.where(codes >= 4, jnp.uint8(sub), codes).astype(jnp.uint32)
    pad = jnp.full((b2, 16), sub, dtype=jnp.uint32)
    cp = jnp.concatenate([c, pad], axis=1)
    acc = jnp.zeros((b2, L), dtype=jnp.uint32)
    for j in range(16):
        acc = (acc << jnp.uint32(2)) | cp[:, j : j + L]
    return acc


@partial(jax.jit, static_argnames=("prefix_bases",))
def make_oriented_lanes(codes: jnp.ndarray, lens: jnp.ndarray, prefix_bases: int):
    """(B, L) uint8 reads -> dict of (2B, ...) oriented-lane arrays."""
    B, L = codes.shape
    lens = lens.astype(jnp.int32)
    # reverse complement, left-aligned
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lens[:, None] - 1 - j
    rc = jnp.take_along_axis(codes, jnp.clip(src, 0, L - 1).astype(jnp.int32), axis=1)
    rc = jnp.where(src >= 0, _COMP[rc], jnp.uint8(SEP))
    oc = jnp.concatenate([codes, rc], axis=0)          # (2B, L)
    olens = jnp.concatenate([lens, lens], axis=0)

    pw_a = _pack_words(oc, sub=0)   # non-ACGT -> A
    qpref = (pw_a >> jnp.uint32(2 * (16 - prefix_bases))).astype(jnp.int32)

    # distance to next non-ACGT (N or padding); suffix scan right-to-left
    bad = oc >= 4
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    next_bad = jnp.where(bad, pos, L)
    next_bad = jax.lax.cummin(next_bad, axis=1, reverse=True)
    bad_dist = next_bad - pos

    cbad = jnp.concatenate(
        [jnp.zeros((2 * B, 1), jnp.int32), jnp.cumsum(bad.astype(jnp.int32), axis=1)],
        axis=1,
    )
    pad16 = jnp.concatenate(
        [cbad, jnp.broadcast_to(cbad[:, -1:], (2 * B, 16))], axis=1
    )
    valid16 = (pad16[:, 16 : 16 + L] - cbad[:, :L]) == 0
    validP = (
        pad16[:, prefix_bases : prefix_bases + L] - cbad[:, :L]
    ) == 0

    return {
        "codes": oc,
        "lens": olens,
        "pw_a": pw_a,
        "qpref": qpref,
        "bad_dist": bad_dist,
        "valid16": valid16,
        "validP": validP,
    }


def lanes_from_oriented(oc: jnp.ndarray, olens: jnp.ndarray,
                        prefix_bases: int):
    """Lane dict for rows that are ALREADY oriented (fwd/rc mixed, e.g.
    a compacted residual prefix of the xlong path) — the same per-lane
    arrays make_oriented_lanes builds, without the rc duplication."""
    H, L = oc.shape
    olens = olens.astype(jnp.int32)
    pw_a = _pack_words(oc, sub=0)
    qpref = (pw_a >> jnp.uint32(2 * (16 - prefix_bases))).astype(jnp.int32)

    bad = oc >= 4
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    next_bad = jnp.where(bad, pos, L)
    next_bad = jax.lax.cummin(next_bad, axis=1, reverse=True)
    bad_dist = next_bad - pos

    cbad = jnp.concatenate(
        [jnp.zeros((H, 1), jnp.int32),
         jnp.cumsum(bad.astype(jnp.int32), axis=1)], axis=1,
    )
    pad16 = jnp.concatenate(
        [cbad, jnp.broadcast_to(cbad[:, -1:], (H, 16))], axis=1
    )
    valid16 = (pad16[:, 16 : 16 + L] - cbad[:, :L]) == 0
    validP = (
        pad16[:, prefix_bases : prefix_bases + L] - cbad[:, :L]
    ) == 0

    return {
        "codes": oc,
        "lens": olens,
        "pw_a": pw_a,
        "qpref": qpref,
        "bad_dist": bad_dist,
        "valid16": valid16,
        "validP": validP,
    }
