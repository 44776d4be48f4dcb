"""Oracle-compatible decimal rounding.

DuckDB's ``round(x, n)`` rounds half AWAY from zero; Python's
``round``/``np.round`` round half to even. Every oracle-facing float
the engine emits goes through :func:`round6` so exact .5 boundaries
(e.g. ratios with power-of-two denominators like 1/128) hash equal on
both sides.
"""

from __future__ import annotations

import numpy as np

from ..config import SCORE_ROUND_DECIMALS

__all__ = ["round6"]

_SCALE = 10.0 ** SCORE_ROUND_DECIMALS


def round6(x):
    """Half-away-from-zero rounding to 6 decimals (scalar or array)."""
    a = np.asarray(x, dtype=np.float64)
    out = np.floor(np.abs(a) * _SCALE + 0.5) / _SCALE * np.where(a < 0, -1.0, 1.0)
    if np.isscalar(x) or a.ndim == 0:
        return float(out)
    return out
