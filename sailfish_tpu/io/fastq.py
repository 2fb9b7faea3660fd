"""Host-side FASTQ streaming into fixed-shape device batches.

The reference streams 1000-read jobs through jellyfish parser threads
(src/SailfishQuantify.cpp:73,893-899).  The TPU analog produces large
fixed-shape uint8 batches (padded to a static read length) so the whole
batch maps in one jitted call; a background thread double-buffers decode
against device compute.

A native C++ decoder (native/fastq_decode.cpp, loaded via ctypes) is used
when available; the numpy fallback is pure Python + vectorized numpy.
"""

from __future__ import annotations

import dataclasses
import gzip
import threading
import queue as _queue
from typing import Iterator

import numpy as np

from .. import dna
from .native import native_decode_fastq


@dataclasses.dataclass
class FastqBatch:
    """A fixed-shape batch of encoded reads.

    codes:  uint8[n, max_len]  (0..3; SEP=4 padding / N bases)
    lens:   int32[n]           true read lengths
    count:  number of valid reads (n rows are all valid; the *device*
            batch may later be padded to batch_size with count tracking)
    """

    codes: np.ndarray
    lens: np.ndarray

    @property
    def count(self) -> int:
        return int(self.codes.shape[0])


def _open_maybe_gz(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb", buffering=1 << 22)


def _iter_fastq_seq_blocks(path: str, reads_per_block: int) -> Iterator[list[bytes]]:
    """Yield lists of raw sequence lines (bytes, no newline)."""
    block: list[bytes] = []
    with _open_maybe_gz(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().rstrip()
            fh.readline()  # '+'
            fh.readline()  # quals
            block.append(seq)
            if len(block) >= reads_per_block:
                yield block
                block = []
    if block:
        yield block


def _encode_block(block: list[bytes], max_len: int) -> FastqBatch:
    n = len(block)
    lens = np.fromiter((min(len(s), max_len) for s in block), dtype=np.int32, count=n)
    joined = b"".join(s[:max_len] for s in block)
    flat = dna.encode(joined)
    codes = np.full((n, max_len), dna.SEP, dtype=np.uint8)
    # scatter via split positions
    ends = np.cumsum(lens)
    starts = ends - lens
    # vectorized ragged copy: build row/col index arrays
    total = int(ends[-1]) if n else 0
    if total:
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(total) - np.repeat(starts, lens)
        codes[rows, cols] = flat
    return FastqBatch(codes=codes, lens=lens)


def iter_fastq_batches(
    path: str, batch_size: int, max_len: int, prefetch: int = 2,
    use_native: bool = True,
) -> Iterator[FastqBatch]:
    """Stream single-end batches with background decode."""

    def produce(q: _queue.Queue):
        try:
            it = native_decode_fastq(path, batch_size, max_len) if use_native else None
            if it is None:
                it = (
                    _encode_block(b, max_len)
                    for b in _iter_fastq_seq_blocks(path, batch_size)
                )
            for batch in it:
                q.put(batch)
        finally:
            q.put(None)

    q: _queue.Queue = _queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item


def iter_paired_fastq_batches(
    path1: str, path2: str, batch_size: int, max_len: int, prefetch: int = 2,
    use_native: bool = True,
) -> Iterator[tuple[FastqBatch, FastqBatch]]:
    """Stream paired-end batches (mate1, mate2) with background decode."""

    def produce(q: _queue.Queue):
        try:
            it1 = it2 = None
            if use_native:
                it1 = native_decode_fastq(path1, batch_size, max_len)
                it2 = native_decode_fastq(path2, batch_size, max_len)
            if it1 is None or it2 is None:
                it1 = (
                    _encode_block(b, max_len)
                    for b in _iter_fastq_seq_blocks(path1, batch_size)
                )
                it2 = (
                    _encode_block(b, max_len)
                    for b in _iter_fastq_seq_blocks(path2, batch_size)
                )
            for b1, b2 in zip(it1, it2):
                if b1.count != b2.count:
                    raise ValueError(
                        "paired FASTQ files have different read counts"
                    )
                q.put((b1, b2))
        finally:
            q.put(None)

    q: _queue.Queue = _queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
