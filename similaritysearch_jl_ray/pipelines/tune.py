"""Offline autotuning harness — the reference's ``optimize_index!``
(``/root/reference/src/opt.jl:139-235``) re-shaped for this engine.

The reference runs a stochastic search over ``BeamSearchSpace`` (beam
size, Δ) scoring recall vs an exhaustive gold run, then commits the
best config (``setconfig!``, ``src/searchgraph/optbs.jl:103-107``).
Here the tunables are the serving knobs (WAND range count, IVF nprobe)
and the error functions are the same shapes: ``MinRecall(r)`` picks the
cheapest config meeting recall ≥ r; ``ParetoRecall`` trades recall
against cost (postings scored / lists probed).

Exact BM25 WAND needs no tuning for correctness (recall is 1.0 by
construction) — the harness demonstrates the §2.8 surface and tunes
the approximate IVF path for real.
"""

from __future__ import annotations

import dataclasses

from ..functions.perf import macrorecall

__all__ = [
    "MinRecall",
    "ParetoRecall",
    "tune_ivf",
    "tune_minhash",
    "tune_searchgraph",
    "tune_wand_prefix",
    "tune_wand_ranges",
]


@dataclasses.dataclass(frozen=True)
class MinRecall:
    min_recall: float = 0.9

    def score(self, recall: float, cost: float) -> float:
        # cheapest config meeting the floor (opt.jl:23-45)
        return cost if recall >= self.min_recall else float("inf")


@dataclasses.dataclass(frozen=True)
class ParetoRecall:
    def score(self, recall: float, cost: float) -> float:
        # (1-recall)^2 + normalized-cost^2 (opt.jl:47-61)
        return (1.0 - recall) ** 2 + cost**2


def _gold_lists(sf_dir: str, k: int, n_queries: int) -> dict[int, list[int]]:
    from .ann import knn_search

    gold = knn_search(sf_dir, k=k, n_queries=n_queries).to_pandas()
    return {
        int(q): g.sort_values("rank")["vec_id"].astype(int).tolist()
        for q, g in gold.groupby("query_id")
    }


def tune_ivf(
    sf_dir: str,
    k: int = 8,
    n_queries: int = 20,
    n_centroids: int = 16,
    nprobes=(1, 2, 4, 8, 16),
    error=MinRecall(0.9),
) -> dict:
    """Grid over nprobe; returns {nprobe, recall, cost, table}."""
    from .ivf import knn_search_ivf

    gold = _gold_lists(sf_dir, k, n_queries)
    rows = []
    for nprobe in nprobes:
        got = knn_search_ivf(
            sf_dir, k=k, n_queries=n_queries, n_centroids=n_centroids, nprobe=nprobe
        ).to_pandas()
        got_lists = {
            int(q): g.sort_values("rank")["vec_id"].astype(int).tolist()
            for q, g in got.groupby("query_id")
        }
        recall = macrorecall(gold, got_lists)
        cost = nprobe / max(nprobes)
        rows.append(
            {"nprobe": nprobe, "recall": round(recall, 4), "cost": cost,
             "objective": error.score(recall, cost)}
        )
    best = min(rows, key=lambda r: r["objective"])
    # `setconfig!` analog: the committed config is just the dict the
    # caller passes to knn_search_ivf
    return {"best": best, "table": rows}


def tune_wand_prefix(
    sf_dir: str,
    index_dir: str,
    k: int = 10,
    prefix_grid=(256, 1024, 4096),
) -> dict:
    """Measure pruned-mode cost counters across initial impact-prefix
    depths; recall is 1.0 by construction (asserted), so this tunes
    pure cost."""
    from .query import Bm25Scorer
    from .queryset import REFERENCE_QUERIES

    rows = []
    for prefix0 in prefix_grid:
        wand = Bm25Scorer(index_dir, k=k, mode="wand", prefix0=prefix0)
        gold = Bm25Scorer(index_dir, k=k, mode="exhaustive")
        postings = 0
        for _, text in REFERENCE_QUERIES:
            hits, npost, _ = wand.score_query(text)
            ghits, _, _ = gold.score_query(text)
            assert [h for h, _ in hits] == [h for h, _ in ghits], "pruned mode must stay exact"
            postings += npost
        rows.append({"prefix0": prefix0, "postings_scored": postings})
    best = min(rows, key=lambda r: r["postings_scored"])
    return {"best": best, "table": rows}


tune_wand_ranges = tune_wand_prefix  # backward-compat alias


def tune_minhash(
    sf_dir: str,
    tau: float = 0.5,
    bands_grid=(4, 8, 16),
    error=MinRecall(0.9),
) -> dict:
    """Tune the MinHash-LSH banding (b bands × 64/b rows) against the
    EXACT pair set: recall = |LSH∩exact| / |exact| at Jaccard ≥ τ,
    cost = bands/max(bands) (band rows shuffled scale linearly with b).
    Same ``MinRecall``/``ParetoRecall`` objectives as the reference's
    ``optimize_index!`` (``/root/reference/src/opt.jl:139-235``)."""
    from .dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(sf_dir, tau=tau).to_pandas()
    exact_pairs = set(zip(exact["doc_a"].astype(int), exact["doc_b"].astype(int)))
    rows = []
    for bands in bands_grid:
        got = minhash_lsh_pairs(sf_dir, tau=tau, bands=bands).to_pandas()
        got_pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
        recall = len(got_pairs & exact_pairs) / max(1, len(exact_pairs))
        cost = bands / max(bands_grid)
        rows.append(
            {"bands": bands, "rows_per_band": 64 // bands,
             "recall": round(recall, 4), "cost": cost,
             "objective": error.score(recall, cost)}
        )
    best = min(rows, key=lambda r: r["objective"])
    return {"best": best, "table": rows}


def tune_searchgraph(
    sf_dir: str,
    k: int = 8,
    n_queries: int = 20,
    bs_grid=(8, 16, 32, 64),
    error=MinRecall(0.8),
) -> dict:
    """Tune the SearchGraph beam width against the exhaustive gold —
    the reference's ``optimize_index!`` over ``BeamSearchSpace``
    (``/root/reference/src/opt.jl:139-235``, ``optbs.jl:103-107``)
    reduced to its serving knob: recall = macrorecall vs brute top-k,
    cost = mean distance evaluations per query normalized by corpus
    size (the reference's ``costdist``). ``MinRecall(0.8)`` is the
    reference's own CI bar (``test/testsearchgraph.jl:22-26``)."""
    from .searchgraph import searchgraph_knn

    gold = _gold_lists(sf_dir, k, n_queries)
    rows = []
    for bs in bs_grid:
        got = searchgraph_knn(sf_dir, k=k, n_queries=n_queries, bs=bs).to_pandas()
        got_lists = {
            int(q): g.sort_values("rank")["vec_id"].astype(int).tolist()
            for q, g in got.groupby("query_id")
        }
        recall = macrorecall(gold, got_lists)
        n_corpus = max(1, int(got["dists_evaluated"].max() or 1))
        cost = float(got["dists_evaluated"].mean()) / n_corpus
        rows.append(
            {"bs": bs, "recall": round(recall, 4), "cost": round(cost, 4),
             "objective": error.score(recall, cost)}
        )
    best = min(rows, key=lambda r: r["objective"])
    # setconfig! analog: the committed config is the kwargs dict
    return {"best": best, "table": rows}
