from __future__ import annotations

import numpy as np
import pytest

from similaritysearch_jl_ray.functions.varint import decode_varints, encode_varints, varint_sizes


def test_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    buf = encode_varints(vals)
    out = decode_varints(buf, count=len(vals))
    assert (out == vals).all()


def test_sizes():
    vals = np.array([0, 127, 128, 2**14 - 1, 2**14, 2**63], dtype=np.uint64)
    assert varint_sizes(vals).tolist() == [1, 1, 2, 2, 3, 10]


def test_roundtrip_random():
    rng = np.random.default_rng(3)
    for _ in range(10):
        n = int(rng.integers(0, 5000))
        mag = rng.choice([1 << 7, 1 << 14, 1 << 30, 1 << 62])
        vals = rng.integers(0, int(mag), size=n).astype(np.uint64)
        out = decode_varints(encode_varints(vals), count=n)
        assert (out == vals).all()


def test_count_mismatch_raises():
    with pytest.raises(ValueError):
        decode_varints(encode_varints(np.array([1, 2], dtype=np.uint64)), count=3)


def test_empty():
    assert encode_varints(np.empty(0, np.uint64)) == b""
    assert len(decode_varints(b"")) == 0
