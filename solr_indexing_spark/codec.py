"""Posting-block codec: VByte (LEB128-style varint) over numpy arrays.

The reference delegates posting storage to Solr (commented BulkIndexing,
solrIndexCreation.ts:876-882); this is the from-scratch half per
BASELINE.json north_star: "delta+varint (VByte) compressed docID gaps with
per-block skip pointers and block-max score caps".

Encoding: little-endian 7-bit groups; high bit set ⇒ continuation byte
follows (protobuf/LEB128 convention). Both encode and decode are vectorized —
the per-element loop runs over *byte positions* (≤10), not values, so
encoding a 128-gap block touches numpy ops only.
"""

from __future__ import annotations

import numpy as np

_MAX_WIDTH = 10  # ceil(64/7)


def _encode_core(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(values uint64) → (byte stream uint8, per-value start offsets)."""
    # bytes needed per value: 1 + number of 7-bit shifts still nonzero
    nb = np.ones(a.size, dtype=np.int64)
    for shift in range(7, 64, 7):
        nb += (a >= np.uint64(1 << shift)).astype(np.int64)
    starts = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        chunk = (a[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7  # 0x80 if more bytes
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out, starts


def vbyte_encode(values: np.ndarray | list[int]) -> bytes:
    """Encode non-negative int64/uint64 values to a VByte byte string."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    if a.ndim != 1:
        raise ValueError("vbyte_encode expects a 1-D array")
    out, _ = _encode_core(a)
    return out.tobytes()


def vbyte_encode_chunked(
    values: np.ndarray, counts: np.ndarray
) -> list[bytes]:
    """Encode a concatenation of groups in ONE vectorized pass and return
    each group's byte string.

    ``values`` is the concatenated stream; ``counts[i]`` is group i's value
    count (zeros allowed → b""). Equivalent to
    ``[vbyte_encode(g) for g in groups]`` but without per-group numpy-call
    overhead — the difference between ~40µs and ~1µs per posting block,
    which dominates an index build with millions of blocks.
    """
    a = np.asarray(values, dtype=np.uint64)
    counts = np.asarray(counts, dtype=np.int64)
    if a.size == 0:
        return [b""] * len(counts)
    out, starts = _encode_core(a)
    total = out.tobytes()
    bounds = np.append(starts, len(total))
    vstart = np.cumsum(counts) - counts
    vend = vstart + counts
    return [
        total[bounds[vstart[i]] : bounds[vend[i]]] for i in range(len(counts))
    ]


def vbyte_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a VByte byte string to uint64 values."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for k in range(int(widths.max())):
        mask = widths > k
        vals[mask] |= (b[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> tuple[int, bytes]:
    """Sorted docIDs → (first_id, vbyte(gaps of the remaining n-1))."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    if ids.size == 0:
        raise ValueError("empty block")
    gaps = np.diff(ids)
    return int(ids[0]), vbyte_encode(gaps.astype(np.uint64))


def delta_decode(first_id: int, gaps_buf: bytes, n: int) -> np.ndarray:
    """(first_id, vbyte gaps, n) → sorted docIDs (int64, length n)."""
    out = np.empty(n, dtype=np.int64)
    out[0] = first_id
    if n > 1:
        gaps = vbyte_decode(gaps_buf).astype(np.int64)
        np.cumsum(gaps, out=gaps)
        out[1:] = first_id + gaps
    return out
