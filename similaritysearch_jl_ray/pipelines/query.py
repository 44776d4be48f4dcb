"""Query serving: exhaustive-posting and block-max pruned BM25 top-k.

The flagship path (SURVEY.md §3.1): a ``Bm25Scorer`` callable class in
``queries.map_batches(..., concurrency=N)`` — the Ray analog of the
reference's ``searchbatch!`` thread loop
(``/root/reference/src/SimilaritySearch.jl:163-190``), with

* the actor holding the pinned index (the reference's shared
  read-only index across threads),
* a per-query reusable :class:`TopK` queue with ``KnnResult``
  semantics (``src/pqueue/knnheap.jl``),
* ``theta()`` (= ``covradius``, ``src/pqueue/pqueue.jl:35``) driving
  block-max pruning exactly as ``covradius`` drives beam pruning in
  ``src/searchgraph/beamsearch.jl:52``.

Two modes, proven rank-identical by tests:

* ``exhaustive`` — decode every posting of every query term, vectorized
  accumulate, closed-form top-k (the ``ExhaustiveSearch`` analog,
  ``src/sequential-exhaustive.jl:57-69``).
* ``wand`` — block-max pruning: doc-id space is cut into ranges; each
  range gets an upper bound Σ_t idf_t·max(block-max tf-norms of t's
  blocks overlapping it); ranges are scored best-first and scoring
  stops when the bound drops strictly below θ (ties can still enter
  only via a smaller doc_id, and a bound *equal* to θ cannot produce a
  smaller doc_id than the incumbent frontier… it can — so we stop only
  on strict ``ub < θ`` and additionally require the heap to be full).

Cost counters mirror the reference (``costdist``/``costblk``,
``src/pqueue/knnsorted.jl:10-13``): ``postings_scored`` and
``blocks_decoded`` columns are emitted per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_BM25, SCORE_ROUND_DECIMALS, Bm25Params
from ..functions.bm25 import tf_norm
from ..functions.text import tokenize
from ..functions.topk import TopK, topk_indices
from ..state.reader import IndexReader

__all__ = ["Bm25Scorer", "search", "brute_force_topk"]

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("postings_scored", pa.int64()),
        ("blocks_decoded", pa.int64()),
    ]
)


def _accumulate(ids_list, partial_list):
    """Sum per-doc partials; deterministic order (term-major input)."""
    ids = np.concatenate(ids_list)
    partials = np.concatenate(partial_list)
    uniq, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, partials)
    return uniq, scores


class Bm25Scorer:
    """Stateful map_batches scorer. State loads once per actor."""

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        mode: str = "wand",
        params: Bm25Params | None = None,
        n_ranges: int = 256,
    ):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.mode = mode
        st = self.reader.stats
        self.params = params or Bm25Params(k1=st["k1"], b=st["b"])
        self.n_ranges = n_ranges
        self.heap = TopK(k)  # reused across queries (reference `reuse!`)

    # -- one query ----------------------------------------------------------
    def _query_terms(self, text: str) -> list[str]:
        return sorted({t for t in tokenize(text) if t in self.reader})

    def score_query(self, text: str) -> tuple[list[tuple[int, float]], int, int]:
        """Returns (result, postings_scored, blocks_decoded)."""
        terms = self._query_terms(text)
        if not terms:
            return [], 0, 0
        if self.mode == "exhaustive":
            return self._score_exhaustive(terms)
        return self._score_wand(terms)

    def _score_exhaustive(self, terms):
        ids_l, part_l = [], []
        nblocks = 0
        for t in terms:
            ids, tfs, dls = self.reader.postings(t)
            nblocks += sum(len(r.block_count) for r in self.reader.runs(t))
            ids_l.append(ids)
            part_l.append(self.reader.idf(t) * tf_norm(tfs, dls, self.reader.avgdl, self.params))
        uniq, scores = _accumulate(ids_l, part_l)
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(sum(len(i) for i in ids_l)),
            int(nblocks),
        )

    def _score_wand(self, terms):
        rdr = self.reader
        max_doc = rdr.stats["max_doc"]
        width = max(1, (max_doc + self.n_ranges) // self.n_ranges)
        n_ranges = (max_doc // width) + 1
        ub = np.zeros(n_ranges, dtype=np.float64)
        # per term: flattened block metadata across runs
        blocks = []  # (term, run_idx, first, last, ub_block arrays)
        for t in terms:
            w = rdr.idf(t)
            for ri, run in enumerate(rdr.runs(t)):
                if run.df == 0:
                    continue
                b_ub = w * run.block_max_tfnorm
                blocks.append((t, ri, run.block_first, run.block_last, b_ub))
                lo = run.block_first // width
                hi = run.block_last // width
                # a block contributes its max to every range it overlaps;
                # per-term per-range max would be tighter, but per-run
                # blocks never overlap so within a term the bound is the
                # sum over its runs' overlapping blocks — still valid and
                # cheap. Tighten: per (term) accumulate per-range MAX.
                tub = np.zeros(n_ranges, dtype=np.float64)
                for j in range(len(b_ub)):
                    sl = slice(int(lo[j]), int(hi[j]) + 1)
                    np.maximum(tub[sl], b_ub[j], out=tub[sl])
                ub += tub
        order = np.argsort(-ub, kind="stable")
        heap = self.heap
        heap.reuse(self.k)
        postings_scored = 0
        blocks_decoded = 0
        for r in order:
            bound = ub[r]
            if bound <= 0.0:
                break
            if len(heap) >= self.k and bound < heap.theta():
                break  # best remaining range cannot beat the frontier
            lo_id, hi_id = r * width, (r + 1) * width - 1
            ids_l, part_l = [], []
            for t, ri, firsts, lasts, _ in blocks:
                sel = np.flatnonzero((lasts >= lo_id) & (firsts <= hi_id))
                if len(sel) == 0:
                    continue
                ids, tfs, dls = rdr.decode_run_blocks(t, ri, sel)
                blocks_decoded += len(sel)
                m = (ids >= lo_id) & (ids <= hi_id)
                if not m.any():
                    continue
                ids_l.append(ids[m])
                part_l.append(
                    rdr.idf(t) * tf_norm(tfs[m], dls[m], rdr.avgdl, self.params)
                )
            if not ids_l:
                continue
            uniq, scores = _accumulate(ids_l, part_l)
            postings_scored += int(sum(len(i) for i in ids_l))
            heap.costblk += 1
            for s, d in zip(scores, uniq):
                heap.push_score(float(s), int(d))
        return heap.result(), postings_scored, blocks_decoded

    # -- batch entry --------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = {k: [] for k in ("query_id", "rank", "doc_id", "score", "postings_scored", "blocks_decoded")}
        for qid, text in zip(qids, texts):
            hits, npost, nblk = self.score_query(text)
            for rank, (doc_id, score) in enumerate(hits, start=1):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(doc_id)
                out["score"].append(score)
                out["postings_scored"].append(npost)
                out["blocks_decoded"].append(nblk)
        return pa.Table.from_pydict(out, schema=RESULT_SCHEMA)


def search(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    mode: str = "wand",
    concurrency: int | tuple = 4,
    batch_size: int = 256,
):
    """queries (query_id, text) → results Dataset (long format)."""
    return queries_ds.map_batches(
        Bm25Scorer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def brute_force_topk(
    texts_by_doc: dict[int, str],
    queries: list[tuple[int, str]],
    k: int,
    params: Bm25Params = DEFAULT_BM25,
) -> list[tuple[int, int, int, float]]:
    """Index-free gold oracle (the ``ExhaustiveSearch`` analog): score
    straight from raw texts with the shared kernels + TopK. Test-scale
    only — used to assert rank-identity of both index modes.

    Returns rows (query_id, rank, doc_id, score).
    """
    from collections import Counter

    n_docs = len(texts_by_doc)
    tf: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in texts_by_doc.items():
        toks = tokenize(text)
        dl[doc_id] = len(toks)
        for t, c in Counter(toks).items():
            tf.setdefault(t, {})[doc_id] = c
    avgdl = sum(dl.values()) / max(1, n_docs)
    from ..functions.bm25 import term_scores

    rows = []
    for qid, qtext in queries:
        terms = sorted({t for t in tokenize(qtext) if t in tf})
        heap = TopK(k)
        ids_l, part_l = [], []
        for t in terms:
            posting = tf[t]
            ids = np.fromiter(sorted(posting), dtype=np.int64, count=len(posting))
            tfs = np.fromiter((posting[i] for i in ids), dtype=np.int64, count=len(ids))
            dls = np.fromiter((dl[i] for i in ids), dtype=np.int64, count=len(ids))
            ids_l.append(ids)
            part_l.append(term_scores(tfs, dls, len(posting), n_docs, avgdl, params))
        if ids_l:
            uniq, scores = _accumulate(ids_l, part_l)
            for s, d in zip(scores, uniq):
                heap.push_score(float(s), int(d))
        for rank, (doc_id, score) in enumerate(heap.result(), start=1):
            rows.append((qid, rank, doc_id, score))
    return rows
