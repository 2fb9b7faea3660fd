"""SAM 4-bit ("nibble") sequence codec.

Port of the reference's barely-used SailfishStringUtils
(src/SailfishStringUtils.cpp:6-18): two bases pack into one byte using
the SAM spec's 4-bit base codes (=ACMGRSVTWYHKDBN -> 0..15), high nibble
first; odd-length sequences pad the final low nibble with 0.
"""

from __future__ import annotations

import numpy as np

# SAM spec nibble values: =:0 A:1 C:2 M:3 G:4 R:5 S:6 V:7 T:8 W:9 Y:10
# H:11 K:12 D:13 B:14 N:15
_NIBBLE = np.full(256, 15, dtype=np.uint8)  # default N
for _i, _ch in enumerate("=ACMGRSVTWYHKDBN"):
    _NIBBLE[ord(_ch)] = _i
    _NIBBLE[ord(_ch.lower())] = _i


def encode_sequence_in_sam(seq: str | bytes) -> np.ndarray:
    """ASCII sequence -> packed 4-bit array (uint8, ceil(len/2) bytes)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    nib = _NIBBLE[np.frombuffer(seq, dtype=np.uint8)]
    if len(nib) % 2:
        nib = np.concatenate([nib, np.zeros(1, dtype=np.uint8)])
    return (nib[0::2] << 4) | nib[1::2]


def decode_sequence_from_sam(packed: np.ndarray, length: int) -> str:
    """Inverse of encode_sequence_in_sam."""
    alphabet = "=ACMGRSVTWYHKDBN"
    out = []
    for b in packed:
        out.append(alphabet[(int(b) >> 4) & 0xF])
        out.append(alphabet[int(b) & 0xF])
    return "".join(out[:length])
