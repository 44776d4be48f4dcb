"""Scalar quantization — the reference's SQu8/SQu4/SQu2 family
(``/root/reference/src/sq/u8.jl:5-21``, ``u4.jl:4-32``, ``u2.jl:3-42``)
as vectorized numpy codecs.

Per-vector affine quantization: codes = round((v - min) / c) packed to
8/4/2 bits, with per-vector ``(min, c)`` dequant params (the
reference's ``SQMinC``, ``src/sq/sq.jl:10-13``); plus the sampled
global-u8 variant (``gu8.jl:13-41``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["sq_encode", "sq_decode", "sq_global_u8_params"]

_LEVELS = {8: 255, 4: 15, 2: 3}


def sq_encode(mat: np.ndarray, bits: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n, d) float → (packed codes, mins, cs). Codes are bit-packed
    along the feature axis (4-bit: two per byte; 2-bit: four per byte)."""
    levels = _LEVELS[bits]
    m = np.asarray(mat, dtype=np.float64)
    mins = m.min(axis=1)
    maxs = m.max(axis=1)
    cs = np.where(maxs > mins, (maxs - mins) / levels, 1.0)
    codes = np.clip(np.round((m - mins[:, None]) / cs[:, None]), 0, levels).astype(np.uint8)
    if bits == 8:
        packed = codes
    elif bits == 4:
        if codes.shape[1] % 2:
            codes = np.pad(codes, ((0, 0), (0, 1)))
        packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
    else:  # 2 bits
        pad = (-codes.shape[1]) % 4
        if pad:
            codes = np.pad(codes, ((0, 0), (0, pad)))
        packed = (
            codes[:, 0::4]
            | (codes[:, 1::4] << 2)
            | (codes[:, 2::4] << 4)
            | (codes[:, 3::4] << 6)
        ).astype(np.uint8)
    return packed, mins, cs


def sq_decode(packed: np.ndarray, mins: np.ndarray, cs: np.ndarray, bits: int, dim: int) -> np.ndarray:
    if bits == 8:
        codes = packed.astype(np.float64)
    elif bits == 4:
        codes = np.empty((packed.shape[0], packed.shape[1] * 2), dtype=np.float64)
        codes[:, 0::2] = packed & 0x0F
        codes[:, 1::2] = packed >> 4
    else:
        codes = np.empty((packed.shape[0], packed.shape[1] * 4), dtype=np.float64)
        codes[:, 0::4] = packed & 0x03
        codes[:, 1::4] = (packed >> 2) & 0x03
        codes[:, 2::4] = (packed >> 4) & 0x03
        codes[:, 3::4] = (packed >> 6) & 0x03
    codes = codes[:, :dim]
    return codes * cs[:, None] + mins[:, None]


def sq_global_u8_params(mat: np.ndarray, sample: int = 2**14, seed: int = 7) -> tuple[float, float]:
    """Global (min, c) from sampled quantiles (gu8.jl:13-41): clamp to
    the 1st/99th percentile of a fixed-seed sample."""
    rng = np.random.default_rng(seed)
    flat = np.asarray(mat, dtype=np.float64).ravel()
    take = flat if len(flat) <= sample else rng.choice(flat, sample, replace=False)
    lo, hi = np.quantile(take, [0.01, 0.99])
    return float(lo), float((hi - lo) / 255.0 if hi > lo else 1.0)
