"""Library-format tests — the analog of the reference's
LibraryTypeTests (tests/LibraryTypeTests.cpp): formatID encode/decode
round trip over all 12 named formats and the PE compatibility matrix."""

import pytest

from sailfish_tpu.libformat import (
    LibraryFormat,
    MateStatus,
    ReadOrientation,
    ReadStrandedness,
    ReadType,
    all_named_formats,
    compatible_hit_paired,
    compatible_hit_single,
    hit_type,
    parse_library_format,
)


def test_format_id_roundtrip_all_named():
    for name, fmt in all_named_formats().items():
        assert LibraryFormat.from_id(fmt.format_id()) == fmt
        assert parse_library_format(name) == fmt
        assert parse_library_format(name.lower()) == fmt


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        parse_library_format("XQ")


def test_pe_compat_matrix():
    """compatible_hit_paired over all (expected, observed) pairs of PE
    formats: same orientation required; U accepts any strandedness."""
    pe = {n: f for n, f in all_named_formats().items()
          if f.type == ReadType.PAIRED_END}
    for en, ef in pe.items():
        for on, of in pe.items():
            got = compatible_hit_paired(ef, of)
            want = (ef.orientation == of.orientation) and (
                ef.strandedness == ReadStrandedness.U
                or ef.strandedness == of.strandedness
            )
            assert got == want, (en, on)


def test_hit_type_classification():
    # ISF: read1 fwd upstream of read2 rc
    t = hit_type(10, True, 50, 150, False, 50)
    assert (t.orientation, t.strandedness) == (
        ReadOrientation.TOWARD, ReadStrandedness.SA)
    # OSF: read1 fwd downstream
    t = hit_type(300, True, 50, 100, False, 50)
    assert (t.orientation, t.strandedness) == (
        ReadOrientation.AWAY, ReadStrandedness.SA)
    # ISR
    t = hit_type(150, False, 50, 10, True, 50)
    assert (t.orientation, t.strandedness) == (
        ReadOrientation.TOWARD, ReadStrandedness.AS)
    # MSF / MSR
    t = hit_type(10, True, 50, 100, True, 50)
    assert (t.orientation, t.strandedness) == (
        ReadOrientation.SAME, ReadStrandedness.S)
    t = hit_type(10, False, 50, 100, False, 50)
    assert (t.orientation, t.strandedness) == (
        ReadOrientation.SAME, ReadStrandedness.A)


def test_hit_type_dovetail_stretch():
    # slight dovetail: read1 fwd starts just past read2's start
    t = hit_type(105, True, 50, 100, False, 50, can_dovetail=True)
    assert t.orientation == ReadOrientation.TOWARD
    t = hit_type(105, True, 50, 100, False, 50, can_dovetail=False)
    assert t.orientation == ReadOrientation.AWAY


def test_compatible_hit_single_iu():
    iu = parse_library_format("IU")
    for fwd in (True, False):
        assert compatible_hit_single(iu, fwd, MateStatus.PAIRED_END_LEFT)
        assert compatible_hit_single(iu, fwd, MateStatus.PAIRED_END_RIGHT)


def test_compatible_hit_single_stranded():
    # Reference quirk (src/SailfishUtils.cpp:157-211): the orphan
    # predicate only accepts strandedness U, S or A — the PE-specific
    # SA/AS values (ISF/ISR/OSF/OSR) are never compatible as orphans.
    isf = parse_library_format("ISF")
    for fwd in (True, False):
        assert not compatible_hit_single(isf, fwd, MateStatus.PAIRED_END_LEFT)
        assert not compatible_hit_single(isf, fwd, MateStatus.PAIRED_END_RIGHT)
    # MSF (strandedness S): SAME orientation — both mates must be sense
    msf = parse_library_format("MSF")
    assert compatible_hit_single(msf, True, MateStatus.PAIRED_END_LEFT)
    assert not compatible_hit_single(msf, False, MateStatus.PAIRED_END_LEFT)
    assert compatible_hit_single(msf, True, MateStatus.PAIRED_END_RIGHT)
    assert not compatible_hit_single(msf, False, MateStatus.PAIRED_END_RIGHT)
    sf = parse_library_format("SF")
    assert compatible_hit_single(sf, True, MateStatus.SINGLE_END)
    assert not compatible_hit_single(sf, False, MateStatus.SINGLE_END)
