"""Vectorized LEB128 varint encode/decode (numpy, no Python loops).

Used by the posting-list codec (``state/segment.py``): docID gaps, term
frequencies and doc lengths are interleaved varint streams. This is the
engine's analog of freezing the reference's dynamic ``AdjList`` into the
CSR ``StaticAdjList`` (``/root/reference/src/adj/adjstatic.jl:25-46``)
— variable-length per-key lists flattened into one compressed byte
array plus offsets.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_varints", "encode_varints_raw", "decode_varints", "varint_sizes"]

_MAX_VARINT_BYTES = 10  # 64-bit values


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (uint64 in → int64 out)."""
    v = np.asarray(values, dtype=np.uint64)
    # number of 7-bit groups = ceil(bit_length / 7), minimum 1
    bits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 is unsafe for large ints; use a shift loop over
    # the fixed 10 possible sizes instead (vectorized, 10 iterations).
    tmp = v.copy()
    for _ in range(_MAX_VARINT_BYTES):
        still = tmp > 0
        bits[still] += 1
        tmp >>= np.uint64(7)
    bits[~nz] = 1
    return bits


def encode_varints_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array as LEB128, returning the raw byte array plus
    the per-value byte offsets (``byte_before``, length ``len(values)+1``
    with a trailing total) — the grouped encoder slices per-group payloads
    out of one stream with these, no per-group encode call."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    sizes = varint_sizes(v)
    byte_before = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(sizes, out=byte_before[1:])
    out = np.empty(int(byte_before[-1]), dtype=np.uint8)
    starts = byte_before[:-1]
    # fill byte-by-byte over the (≤10) byte slots — vectorized across values
    rem = v.copy()
    for slot in range(int(sizes.max())):
        mask = sizes > slot
        pos = starts[mask] + slot
        chunk = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = sizes[mask] > (slot + 1)
        chunk[more] |= 0x80
        out[pos] = chunk
        rem[mask] >>= np.uint64(7)
    return out, byte_before


def encode_varints(values: np.ndarray) -> bytes:
    """Encode a uint64 array as a concatenated LEB128 byte stream."""
    return encode_varints_raw(values)[0].tobytes()


def decode_varints(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream back to a uint64 array.

    ``count`` (when given) is validated against the decoded length.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        out = np.empty(0, dtype=np.uint64)
    else:
        term = (b & 0x80) == 0              # terminator byte per value
        n = int(term.sum())
        if n == 0:
            raise ValueError("varint stream truncated: no terminator byte")
        # group index of each byte
        gidx = np.zeros(len(b), dtype=np.int64)
        gidx[1:] = np.cumsum(term[:-1])
        # position of each byte within its group
        starts_of_groups = np.empty(n, dtype=np.int64)
        starts_of_groups[0] = 0
        starts_of_groups[1:] = np.flatnonzero(term)[:-1] + 1
        pos = np.arange(len(b), dtype=np.int64) - starts_of_groups[gidx]
        # per-byte contributions summed per group: reduceat over the
        # group starts (~10× faster than the np.add.at scatter this
        # replaced — the pack-build hot kernel at multi-M postings)
        contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
            np.uint64(7) * pos.astype(np.uint64)
        )
        out = np.add.reduceat(contrib, starts_of_groups)
    if count is not None and len(out) != count:
        raise ValueError(f"varint stream decoded {len(out)} values, expected {count}")
    return out
