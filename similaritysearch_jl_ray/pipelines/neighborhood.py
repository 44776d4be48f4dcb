"""Neighborhood filters — the reference's static-pruning family
(``/root/reference/src/searchgraph/neighborhood.jl:89-137``, HSP core
``src/hsp.jl:9-34``), the SAT/DistalSAT/KCenters rules that shrink a
candidate neighbor list to a spatially diverse subset.

The reference applies them during graph construction
(``find_neighborhood!``); this engine has no navigable graph (exact
BM25/posting design, SURVEY.md §2.5), so they surface the same way
``hsp_queries`` does — as POST-FILTERS over a query's knn candidate
list:

* ``sat`` (proximal) — scan candidates ascending by distance, always
  keep the nearest; keep p iff no already-kept c has
  ``d(p, c) < d(p, q)`` (``hsp_proximal_neighborhood_filter!``,
  hsp.jl:66-81; the probabilistic near-dup branch is replaced by the
  deterministic rule — documented deviation, same cover geometry).
* ``distal_sat`` — same rule scanning farthest-first, seeded with the
  farthest candidate (``hsp_distal_neighborhood_filter!``,
  hsp.jl:83-95).
* ``kcenters`` — min(16, ceil(log2(n))) centers of the candidate set
  by farthest-first traversal (``KCentersNeighborhood``,
  neighborhood.jl:127-137), seeded at the nearest candidate
  (deterministic stand-in for the reference's random fft start, as in
  pipelines/ann.fft).

Distribution: candidates come from the streamed ``knn_search``; the
filter touches only (queries × k) rows and the embedding rows it
needs, gathered with one isin-pushdown read — the small side by
construction.
"""

from __future__ import annotations

import math

import numpy as np

from .ann import knn_search

__all__ = ["neighborhood_filter", "register_neighborhood_filter", "NEIGHBORHOOD_FILTERS"]


def _d(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(((a - b) ** 2).sum()))


def _sat(q, ids, dists, by_id, order):
    """Shared SAT scan: `order` indexes candidates in scan order."""
    kept: list[int] = []
    for pos, j in enumerate(order):
        p = by_id[int(ids[j])]
        if pos == 0:
            kept.append(int(ids[j]))
            continue
        dcp = float(dists[j])
        if any(_d(p, by_id[c]) < dcp for c in kept):
            continue
        kept.append(int(ids[j]))
    return kept


def _kcenters(ids, by_id, n_centers):
    """Farthest-first centers over the candidate subset, seeded at the
    first candidate (rank order); max-dist argmax ties break by scan
    position (stable argmax), mirroring fft's deterministic seeding."""
    vecs = np.stack([by_id[int(i)] for i in ids])
    centers = [0]
    nnd = np.sqrt(((vecs - vecs[0]) ** 2).sum(axis=1))
    while len(centers) < min(n_centers, len(ids)):
        cand = int(np.argmax(nnd))
        centers.append(cand)
        nnd = np.minimum(nnd, np.sqrt(((vecs - vecs[cand]) ** 2).sum(axis=1)))
    return [int(ids[c]) for c in centers]


# §2.9 extension hook (the reference's NeighborhoodFilter protocol,
# neighborhood.jl:89-137): a filter is f(q_vec, ids, dists, by_id) →
# kept id list; register under a name and every `kind=` site sees it.
NEIGHBORHOOD_FILTERS: dict[str, object] = {}


def register_neighborhood_filter(name: str, fn) -> None:
    """Plug a custom candidate-list filter into ``neighborhood_filter``
    (``fn(q_vec, ids, dists, by_id) -> list[int]``)."""
    NEIGHBORHOOD_FILTERS[name] = fn


def neighborhood_filter(sf_dir: str, kind: str = "sat", k: int = 16, n_queries: int = 10):
    """(query_id, rank, vec_id) — each query's filtered neighborhood,
    rank = kept order under the filter's scan direction."""
    import pyarrow.dataset as pads
    import pandas as pd

    knn = knn_search(sf_dir, k=k, n_queries=n_queries).to_pandas()
    need = sorted(set(knn["vec_id"].astype(int)) | set(knn["query_id"].astype(int)))
    t = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(need)
    )
    by_id = {
        int(i): np.asarray(e, dtype=np.float64)
        for i, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    rows = []
    for qid, g in knn.groupby("query_id"):
        g = g.sort_values("rank")
        ids = g["vec_id"].to_numpy().astype(np.int64)
        dists = g["dist"].to_numpy()
        q = by_id[int(qid)]
        if kind == "sat":
            kept = _sat(q, ids, dists, by_id, range(len(ids)))
        elif kind == "distal_sat":
            kept = _sat(q, ids, dists, by_id, range(len(ids) - 1, -1, -1))
        elif kind == "kcenters":
            n_centers = min(16, max(1, math.ceil(math.log2(max(2, len(ids))))))
            kept = _kcenters(ids, by_id, n_centers)
        elif kind == "identity":
            kept = [int(i) for i in ids]
        elif kind in NEIGHBORHOOD_FILTERS:
            kept = [int(v) for v in NEIGHBORHOOD_FILTERS[kind](q, ids, dists, by_id)]
        else:
            raise ValueError(kind)
        rows += [(int(qid), r + 1, v) for r, v in enumerate(kept)]
    return pd.DataFrame(
        {
            "query_id": pd.array([q for q, _, _ in rows], dtype="int64"),
            "rank": pd.array([r for _, r, _ in rows], dtype="int64"),
            "vec_id": pd.array([v for _, _, v in rows], dtype="int64"),
        }
    )
