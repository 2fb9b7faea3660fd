"""ctypes loader for the native C++ IO/runtime helpers.

The shared library (sailfish_tpu/_native.so) is built from native/ by
`python setup_native.py` (make-style; see native/build.sh).  Everything
here degrades gracefully to the pure-numpy fallbacks when the library is
absent, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    # int64 sf_fastq_open(const char* path)
    lib.sf_fastq_open.argtypes = [ctypes.c_char_p]
    lib.sf_fastq_open.restype = ctypes.c_int64
    # int64 sf_fastq_next_batch(handle, uint8* codes, int32* lens,
    #                           int64 batch, int64 maxlen) -> nreads (0=eof)
    lib.sf_fastq_next_batch.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.sf_fastq_next_batch.restype = ctypes.c_int64
    lib.sf_fastq_close.argtypes = [ctypes.c_int64]
    lib.sf_fastq_close.restype = None
    if hasattr(lib, "sf_fastq_skip"):
        lib.sf_fastq_skip.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.sf_fastq_skip.restype = ctypes.c_int64
    # suffix array: void sf_build_sa(const uint8* text, int64 n, int32* sa)
    if hasattr(lib, "sf_build_sa"):
        lib.sf_build_sa.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sf_build_sa.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def native_decode_fastq(path: str, batch_size: int, max_len: int,
                        skip_reads: int = 0):
    """Iterator of FastqBatch via the C++ decoder, or None if unavailable.

    The returned batches carry TRUE read lengths in `lens` (which may
    exceed `max_len`); the caller is responsible for detecting overflow
    and re-padding.  Raises IOError on malformed records (instead of
    treating them as EOF).
    """
    lib = _lib()
    if lib is None:
        return None
    if skip_reads and not hasattr(lib, "sf_fastq_skip"):
        return None
    handle = lib.sf_fastq_open(path.encode())
    if handle < 0:
        raise IOError(f"native fastq open failed: {path}")

    from .fastq import FastqBatch

    def gen() -> Iterator["FastqBatch"]:
        try:
            if skip_reads:
                got = lib.sf_fastq_skip(handle, skip_reads)
                if got < 0:
                    raise IOError(f"malformed FASTQ record in {path}")
                if got != skip_reads:
                    raise IOError(
                        f"{path}: cannot skip {skip_reads} reads "
                        f"(file has only {got})"
                    )
            while True:
                codes = np.empty((batch_size, max_len), dtype=np.uint8)
                lens = np.empty(batch_size, dtype=np.int32)
                n = lib.sf_fastq_next_batch(
                    handle,
                    codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    batch_size,
                    max_len,
                )
                if n < 0:
                    raise IOError(f"malformed FASTQ record in {path}")
                if n == 0:
                    break
                yield FastqBatch(codes=codes[:n], lens=lens[:n])
        finally:
            lib.sf_fastq_close(handle)

    return gen()


def native_build_sa(text: np.ndarray) -> Optional[np.ndarray]:
    """SA-IS suffix array via C++, or None if unavailable.

    `text` is uint8 codes (values < 250); returns int32 suffix array of
    len(text) entries.
    """
    lib = _lib()
    if lib is None or not hasattr(lib, "sf_build_sa"):
        return None
    text = np.ascontiguousarray(text, dtype=np.uint8)
    sa = np.empty(len(text), dtype=np.int32)
    rc = lib.sf_build_sa(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(text),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return sa
