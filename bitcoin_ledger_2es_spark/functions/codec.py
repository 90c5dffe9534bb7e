"""Delta-gap + varint posting compression (SURVEY.md C5, IIR ch.5).

Fully numpy-vectorized LEB128: encode loops over *byte positions* (<= 10
iterations for uint64), never over values, so it runs at memory bandwidth
inside Arrow worker batches. Invariant under test: decode(encode(x)) == x
for all uint64 inputs.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array into a bytes blob."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = a.size
    if n == 0:
        return b""
    # varint byte length of each value: 1 + number of thresholds <= value
    nbytes = np.ones(n, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (a >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        chunk = (a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7  # continuation bit
        out[starts[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varints` -> uint64 array.

    Like the encoder, loops over *byte positions* (<= 10 for uint64),
    never over values: position j ORs byte ``starts+j`` of every value
    that has one. (The previous per-byte ``np.add.at`` scatter +
    searchsorted cost ~4x this on the query kernels' decode-bound
    profile.)"""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # mask+widen only the gathered bytes, never the whole stream (a full
    # uint64 expansion would write 8x the stream size per decode)
    vals = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
    extra = ends - starts  # continuation bytes beyond the first
    max_extra = int(extra.max()) if extra.size else 0
    for j in range(1, max_extra + 1):
        m = extra >= j
        vals[m] |= (b[starts[m] + j] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return vals


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (without encoding)."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(a.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (a >= t).astype(np.int64)
    return nbytes


def encode_doc_gaps(doc_ids: np.ndarray) -> bytes:
    """Delta-gap encode a sorted int64 doc_id array.

    gaps[0] is omitted (the block row stores first_doc_id explicitly);
    gaps[i] = doc_ids[i] - doc_ids[i-1] for i >= 1.
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size <= 1:
        return b""
    gaps = np.diff(d).astype(np.uint64)
    return encode_varints(gaps)


def decode_doc_gaps(buf: bytes, first_doc_id: int, n_docs: int) -> np.ndarray:
    """Inverse of :func:`encode_doc_gaps` -> sorted int64 doc_id array."""
    out = np.empty(n_docs, dtype=np.int64)
    if n_docs == 0:
        return out
    out[0] = first_doc_id
    if n_docs > 1:
        gaps = decode_varints(buf).astype(np.int64)
        out[1:] = first_doc_id + np.cumsum(gaps)
    return out


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode a block's positions stream -> absolute token positions, one
    value per occurrence, concatenated in posting order.

    Layout (Lucene-style): per posting, tf varints — the first is the
    absolute first position, the rest are gaps. ``tfs`` (occurrences per
    posting) drives the per-posting segmentation; the cumsum is segmented
    by subtracting the running total at each posting start.
    """
    vals = decode_varints(buf).astype(np.int64)
    if vals.size == 0:
        return vals
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    cs = np.cumsum(vals)
    starts = np.concatenate(([0], np.cumsum(t)))[:-1]
    base = np.zeros(t.size, dtype=np.int64)
    if t.size > 1:
        base[1:] = cs[starts[1:] - 1]
    return cs - np.repeat(base, t)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return encode_varints(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varints(buf).astype(np.int64)
