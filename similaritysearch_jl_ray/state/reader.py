"""Segment reader: the serving-side pinned index state.

Plays the role of the reference's shared read-only index + per-thread
context caches (``/root/reference/src/searchgraph/context.jl:41-53``):
one reader is constructed per scorer *actor* (once, in ``__init__``)
and pins the term dictionary + encoded runs for its parts in memory;
per-query scratch (heaps, decode caches) is reused across queries.

A term's logical posting list is the concatenation of its salted runs
in ascending salt order (doc-id ranges are disjoint and ordered by
construction — build_index.py); ``df`` is summed across runs at load.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..functions.bm25 import idf as _idf
from ..state.segment import EncodedPostings, decode_all, decode_blocks

__all__ = ["IndexReader"]


class IndexReader:
    def __init__(self, index_dir: str, parts: list[int] | None = None):
        import pyarrow.dataset as pads

        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.n_docs = self.stats["n_docs"]
        self.avgdl = self.stats["avgdl"]
        want = range(self.stats["num_parts"]) if parts is None else parts
        self.terms: dict[str, list[EncodedPostings]] = {}
        postings_dir = os.path.join(index_dir, "postings")
        for p in want:
            part_dir = os.path.join(postings_dir, f"part={p}")
            meta_path = os.path.join(index_dir, "meta", f"part={p}.json")
            if not os.path.exists(meta_path):
                raise FileNotFoundError(f"index part {p} incomplete (no meta): {meta_path}")
            ds = pads.dataset(part_dir, format="parquet")
            tbl = ds.to_table()
            rows = tbl.to_pylist()
            bysalt: dict[str, list[tuple[int, EncodedPostings]]] = {}
            for row in rows:
                bysalt.setdefault(row["term"], []).append((row["salt"], EncodedPostings.from_row(row)))
            for term, runs in bysalt.items():
                runs.sort(key=lambda t: t[0])
                self.terms[term] = [r for _, r in runs]
        self._df = {t: sum(r.df for r in runs) for t, runs in self.terms.items()}
        # decoded-postings cache: the actor-resident analog of the
        # reference's per-thread context caches (context.jl:41-53) —
        # repeated query terms skip re-decoding. Unbounded here (vocab
        # is pinned per actor); an LRU bound is the 100 TB policy.
        self._decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def __contains__(self, term: str) -> bool:
        return term in self.terms

    def df(self, term: str) -> int:
        return self._df.get(term, 0)

    def idf(self, term: str) -> float:
        return float(_idf(self.df(term), self.n_docs))

    def runs(self, term: str) -> list[EncodedPostings]:
        return self.terms.get(term, [])

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full decode: (doc_ids, tfs, dls) across runs, doc_id ascending."""
        runs = self.runs(term)
        if not runs:
            e = np.empty(0, np.int64)
            return e, e, e
        parts = [decode_all(r) for r in runs]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )

    def postings_cached(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        hit = self._decoded.get(term)
        if hit is None:
            hit = self._decoded[term] = self.postings(term)
        return hit

    def decode_run_blocks(self, term: str, run_idx: int, bidx: np.ndarray):
        return decode_blocks(self.terms[term][run_idx], bidx)
