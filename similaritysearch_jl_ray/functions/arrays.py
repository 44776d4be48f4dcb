"""Tiny shared array kernels."""

from __future__ import annotations

import numpy as np

__all__ = ["in_sorted"]


def in_sorted(haystack: np.ndarray, needles: np.ndarray):
    """``(positions, mask)`` — for each needle its ``searchsorted``
    position into the sorted ``haystack`` CLAMPED into range, and
    whether the element there equals the needle. The one
    membership-against-sorted idiom used across serving, facets and
    dedup — centralizing the end-of-array clamp that every hand-rolled
    copy had to re-derive."""
    if not len(haystack):
        return (
            np.zeros(len(needles), dtype=np.int64),
            np.zeros(len(needles), dtype=bool),
        )
    pos = np.searchsorted(haystack, needles)
    pos_c = np.minimum(pos, len(haystack) - 1)
    return pos_c, haystack[pos_c] == needles
