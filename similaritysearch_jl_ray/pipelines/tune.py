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
    "optimize_searchgraph",
    "OptRadius",
    "ParetoRadius",
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


def _kfun(x: float) -> float:
    # opt.jl:95 — saturating cost shaping for the radius objectives
    return 1.0 - 1.0 / (1.0 + x)


@dataclasses.dataclass(frozen=True)
class OptRadius:
    """Radius-bucketed objective (opt.jl:13-15, :204-206): configs are
    scored by their mean covering radius relative to the worst seen,
    quantized to ``tol`` buckets — prefers the cheapest config whose
    result radius is within tolerance of the best."""

    tol: float = 0.1


class ParetoRadius:
    """Radius/cost Pareto objective (opt.jl:17, :201-203):
    ``_kfun(cost) + _kfun(radius̄/R)``."""


def optimize_searchgraph(
    sf_dir: str,
    kind=MinRecall(0.9),
    k: int = 8,
    n_queries: int = 20,
    space: dict | None = None,
    initialpopulation: int = 8,
    bsize: int = 3,
    mutbsize: int = 4,
    crossbsize: int = 3,
    maxiters: int = 8,
    seed: int = 0xC0FFEE,
) -> dict:
    """The reference's STOCHASTIC ``optimize_index!`` loop
    (``/root/reference/src/opt.jl:139-235`` — SearchModels population
    search over ``BeamSearchSpace``), reproduced over the SearchGraph
    serving knobs: an initial random population, then per iteration
    keep the ``bsize`` best by the error function, add ``mutbsize``
    mutants (log-scale jitter) and ``crossbsize`` crosses (rounded
    geometric mean of two parents), re-evaluate, stop on cost
    convergence (|Δcost| ≤ 1e-3, opt.jl:226-228) or ``maxiters``.

    Error functions mirror opt.jl's ``getcost`` (lines 189-209):
    ``MinRecall(r)`` → ``1 + (r − recall)`` below the floor else
    normalized cost; ``ParetoRecall`` → ``cost² + (1−recall)²``;
    ``ParetoRadius`` → ``_kfun(cost) + _kfun(radius̄/R)``;
    ``OptRadius(tol)`` → radius bucket index. cost = mean distance
    evaluations / max seen (M), radius = mean covering radius of the
    k-results / max seen (R) — both normalizers fixed by the initial
    population (opt.jl inspect_population, lines 180-188).

    The committed config (``setconfig!`` analog) is the returned
    ``best['conf']`` kwargs dict for :func:`searchgraph_knn`."""
    import numpy as np

    from .searchgraph import searchgraph_knn

    space = space or {"bs": (k, 256)}
    lo, hi = space["bs"]
    rng = np.random.default_rng(seed)
    recall_based = isinstance(kind, (MinRecall, ParetoRecall))
    gold = _gold_lists(sf_dir, k, n_queries) if recall_based else None

    evaluated: dict[int, dict] = {}

    def evaluate(bs: int) -> dict:
        perf = evaluated.get(bs)
        if perf is not None:
            return perf
        got = searchgraph_knn(sf_dir, k=k, n_queries=n_queries, bs=bs).to_pandas()
        by_q = got.groupby("query_id")
        cost = float(by_q["dists_evaluated"].first().mean())
        radius = float(by_q["dist"].max().mean())  # covering radius per query
        recall = None
        if gold is not None:
            got_lists = {
                int(q): g.sort_values("rank")["vec_id"].astype(int).tolist()
                for q, g in by_q
            }
            recall = macrorecall(gold, got_lists)
        perf = {"bs": bs, "cost": cost, "radius": radius, "recall": recall}
        evaluated[bs] = perf
        return perf

    def clamp(bs: float) -> int:
        return int(min(hi, max(lo, round(bs))))

    # initial population: log-uniform over the space (BeamSearchSpace's
    # random init)
    pop_bs = sorted(
        {
            clamp(np.exp(rng.uniform(np.log(lo), np.log(hi))))
            for _ in range(initialpopulation)
        }
    )
    population = [evaluate(b) for b in pop_bs]
    M = max(p["cost"] for p in population) or 1.0
    R = max(p["radius"] for p in population) or 1.0

    def getcost(p: dict) -> float:
        cost = p["cost"] / M
        if isinstance(kind, ParetoRecall):
            return cost**2 + (1.0 - p["recall"]) ** 2
        if isinstance(kind, ParetoRadius):
            return _kfun(cost) + _kfun(p["radius"] / R)
        if isinstance(kind, MinRecall):
            r = p["recall"]
            return 1.0 + max(kind.min_recall - r, 0.0) if r < kind.min_recall else cost
        if isinstance(kind, OptRadius):
            return round((p["radius"] / R) / kind.tol)
        raise ValueError(f"unknown optimization goal {kind!r}")

    history = []
    prev_best = None
    for it in range(maxiters):
        population.sort(key=getcost)
        best = population[:bsize]
        history.append({"iter": it, "best_bs": best[0]["bs"], "cost": getcost(best[0])})
        if prev_best is not None and abs(getcost(best[0]) - prev_best) <= 1e-3:
            break
        prev_best = getcost(best[0])
        nxt = {p["bs"] for p in best}
        for _ in range(mutbsize):  # mutate: log-scale jitter of a parent
            parent = best[int(rng.integers(len(best)))]
            nxt.add(clamp(parent["bs"] * float(np.exp(rng.normal(0.0, 0.5)))))
        for _ in range(crossbsize):  # cross: rounded geometric mean
            a = best[int(rng.integers(len(best)))]
            b = best[int(rng.integers(len(best)))]
            nxt.add(clamp(np.sqrt(a["bs"] * b["bs"])))
        population = [evaluate(bs) for bs in sorted(nxt)]

    population.sort(key=getcost)
    best = population[0]
    return {
        "best": {"conf": {"bs": best["bs"], "k": k}, **best, "objective": getcost(best)},
        "history": history,
        "evaluated": sorted(evaluated.values(), key=lambda p: p["bs"]),
    }
