"""BM25 scoring kernels (numpy, float64).

The per-(query, doc) score kernel plays the role of the reference's
distance kernels (``/root/reference/src/dist/vecs.jl:26-177``): a
vectorized "evaluate" applied to whole posting arrays at once. Sign
convention follows the reference's ``NegativeDistanceHack``
(``src/dist/hacks.jl:13-22``): the top-k queue orders by ``-score``.
"""

from __future__ import annotations

import numpy as np

from ..config import Bm25Params, DEFAULT_BM25

__all__ = ["idf", "tf_norm", "term_scores"]


def idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """Lucene-style idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return np.log1p((n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(
    tfs: np.ndarray,
    doclens: np.ndarray,
    avgdl: float,
    params: Bm25Params = DEFAULT_BM25,
) -> np.ndarray:
    """tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl)) in float64."""
    tf = np.asarray(tfs, dtype=np.float64)
    dl = np.asarray(doclens, dtype=np.float64)
    denom = tf + params.k1 * (1.0 - params.b + params.b * dl / avgdl)
    return tf * (params.k1 + 1.0) / denom


def term_scores(
    tfs: np.ndarray,
    doclens: np.ndarray,
    df: float,
    n_docs: float,
    avgdl: float,
    params: Bm25Params = DEFAULT_BM25,
) -> np.ndarray:
    """Per-posting partial score for one term: idf(t) * tf_norm."""
    return float(idf(df, n_docs)) * tf_norm(tfs, doclens, avgdl, params)
