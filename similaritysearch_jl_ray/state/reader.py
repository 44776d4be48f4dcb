"""Segment reader: the serving-side pinned index state.

Plays the role of the reference's shared read-only index + per-thread
context caches (``/root/reference/src/searchgraph/context.jl:41-53``):
one reader is constructed per scorer *actor* (once, in ``__init__``)
and pins the term dictionary + encoded runs for its slice in memory;
per-query scratch (heaps, decode caches) is reused across queries.

Pinning axes (both optional, composable):

* ``parts=[...]`` — load only these term-hash partitions (term-sharded
  serving; a term lives in exactly one part).
* ``doc_range=(lo, hi)`` — load only runs whose doc-id span overlaps
  ``[lo, hi)`` (doc-sharded serving). The filter is pushed into the
  parquet scan on the scalar ``run_first``/``run_last`` columns, so a
  shard actor never materializes out-of-shard payload bytes; range
  salting of head terms makes most of a big term's bytes skippable at
  row-group granularity. Per-term **df stays global**: the reader
  reads the tiny (term, df) projection of every run row so idf is
  identical across shards — the invariant that makes the doc-sharded
  merge rank-identical to unsharded serving.

A term's logical posting list is the concatenation of its salted runs
in ascending salt order (doc-id ranges are disjoint and ordered by
construction — build_index.py); ``df`` is summed across runs at load.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..functions.bm25 import idf as _idf
from ..state.segment import EncodedPostings, decode_all, decode_blocks, decode_positions

__all__ = ["IndexReader"]


class IndexReader:
    def __init__(
        self,
        index_dir: str,
        parts: list[int] | None = None,
        doc_range: tuple[int, int] | None = None,
        max_cached_terms: int | None = None,
    ):
        # base index first, then delta segments in append order — each
        # delta's doc ids are strictly above the previous segment's
        # (lifecycle.append_pages contract), so per-term run lists stay
        # range-ordered and logical concatenation serves both.
        self.doc_range = doc_range
        # NUMERIC sort — lexicographic would load delta=10 before
        # delta=2, breaking the doc-ascending runs() contract that the
        # searchsorted-based masking in postings()/_term_arrays needs
        dirs = [index_dir]
        for name in sorted(
            (n for n in os.listdir(index_dir) if n.startswith("delta=")),
            key=lambda n: int(n.split("=", 1)[1]),
        ):
            dirs.append(os.path.join(index_dir, name))
        # Arrow-native term dictionary (no per-term Python at load):
        # each loaded (segment, part) keeps its Arrow table plus a
        # term-sorted row order; lookups binary-search the sorted term
        # view and construct EncodedPostings runs LAZILY (only queried
        # terms ever materialize Python objects — at web vocab the
        # per-actor dict of every term was the startup/RAM hog).
        self._tables: list[tuple[object, np.ndarray, np.ndarray]] = []  # (tbl, sorted_terms, order)
        self._dfs: list[tuple[np.ndarray, np.ndarray]] = []  # (uniq sorted terms, df sums)
        self._runs_cache: dict[str, list[EncodedPostings]] = {}
        self._terms_dict: dict[str, list[EncodedPostings]] | None = None
        n_docs = total_tokens = 0
        max_doc = -1
        self.stats: dict = {}
        for d in dirs:
            st = self._load_segment(d, parts)
            n_docs += st["n_docs"]
            total_tokens += st["total_tokens"]
            max_doc = max(max_doc, st["max_doc"])
            if not self.stats:
                self.stats = dict(st)
        # combined global stats (idf/avgdl see base+delta corpus)
        self.stats.update(
            {"n_docs": n_docs, "total_tokens": total_tokens, "max_doc": max_doc,
             "avgdl": total_tokens / max(1, n_docs)}
        )
        self.n_docs = n_docs
        self.avgdl = self.stats["avgdl"]
        # decoded-postings cache: the actor-resident analog of the
        # reference's per-thread context caches (context.jl:41-53) —
        # repeated query terms skip re-decoding. Unbounded by default
        # (this corpus' vocab pins comfortably); ``max_cached_terms``
        # is the web-vocab policy: LRU-evict decoded arrays while the
        # encoded runs stay resident.
        self._decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._max_cached_terms = max_cached_terms

    def _load_segment(self, seg_dir: str, parts) -> dict:
        import pyarrow.dataset as pads

        with open(os.path.join(seg_dir, "stats.json")) as f:
            st = json.load(f)
        want = range(st["num_parts"]) if parts is None else parts
        postings_dir = os.path.join(seg_dir, "postings")
        for p in want:
            part_dir = os.path.join(postings_dir, f"part={p}")
            meta_path = os.path.join(seg_dir, "meta", f"part={p}.json")
            if not os.path.exists(meta_path):
                raise FileNotFoundError(f"index part {p} incomplete (no meta): {meta_path}")
            ds = pads.dataset(part_dir, format="parquet")
            if self.doc_range is None:
                tbl = ds.to_table().combine_chunks()
                df_terms = tbl.column("term").to_numpy(zero_copy_only=False)
                df_vals = tbl.column("df").to_numpy()
            else:
                lo, hi = self.doc_range
                # global df from the tiny metadata projection (no payload I/O)
                meta_tbl = ds.to_table(columns=["term", "df"])
                df_terms = meta_tbl.column("term").to_numpy(zero_copy_only=False)
                df_vals = meta_tbl.column("df").to_numpy()
                tbl = ds.to_table(
                    filter=(pads.field("run_last") >= lo) & (pads.field("run_first") < hi)
                ).combine_chunks()
            # per-unique-term df sums, vectorized (sort + reduceat) —
            # df stays GLOBAL under doc_range (meta projection above)
            if len(df_terms):
                d_ord = np.argsort(df_terms, kind="stable")
                t_s = df_terms[d_ord]
                bnd = np.flatnonzero(np.r_[True, t_s[1:] != t_s[:-1]])
                self._dfs.append((t_s[bnd], np.add.reduceat(df_vals[d_ord], bnd)))
            if tbl.num_rows == 0:
                continue
            t_col = tbl.column("term").to_numpy(zero_copy_only=False)
            s_col = tbl.column("salt").to_numpy()
            # stable two-key sort (term, then salt); np.lexsort is
            # unreliable on object (string) arrays, so compose argsorts
            order = np.argsort(s_col, kind="stable")
            order = order[np.argsort(t_col[order], kind="stable")]
            self._tables.append((tbl, t_col[order], order))
        return st

    def __contains__(self, term: str) -> bool:
        if term in self._runs_cache:
            return bool(self._runs_cache[term])
        for _, sorted_terms, _ in self._tables:
            i = np.searchsorted(sorted_terms, term, side="left")
            if i < len(sorted_terms) and sorted_terms[i] == term:
                return True
        return False

    def df(self, term: str) -> int:
        total = 0
        for uniq, sums in self._dfs:
            i = np.searchsorted(uniq, term, side="left")
            if i < len(uniq) and uniq[i] == term:
                total += int(sums[i])
        return total

    def term_dfs(self) -> dict[str, int]:
        """Public snapshot of the term dictionary: {term: global df}."""
        out: dict[str, int] = {}
        for uniq, sums in self._dfs:
            for t, v in zip(uniq.tolist(), sums.tolist()):
                out[t] = out.get(t, 0) + int(v)
        return out

    def idf(self, term: str) -> float:
        return float(_idf(self.df(term), self.n_docs))

    def runs(self, term: str) -> list[EncodedPostings]:
        """A term's runs across segments, base→deltas, salt-ascending
        within a segment part — binary search + lazy construction
        (cached; only queried terms ever materialize)."""
        hit = self._runs_cache.get(term)
        if hit is not None:
            return hit
        out: list[EncodedPostings] = []
        for tbl, sorted_terms, order in self._tables:
            lo = np.searchsorted(sorted_terms, term, side="left")
            hi = np.searchsorted(sorted_terms, term, side="right")
            for j in range(lo, hi):
                out.append(EncodedPostings.from_arrow_row(tbl, int(order[j])))
        self._runs_cache[term] = out
        return out

    @property
    def terms(self) -> dict[str, list[EncodedPostings]]:
        """Whole-dictionary view {term: runs} — materialized on first
        access ONLY (pack building / tests iterate everything anyway;
        query serving never touches this)."""
        if self._terms_dict is None:
            d: dict[str, list[EncodedPostings]] = {}
            for tbl, sorted_terms, order in self._tables:
                for j in range(len(order)):
                    d.setdefault(sorted_terms[j], []).append(
                        EncodedPostings.from_arrow_row(tbl, int(order[j]))
                    )
            self._terms_dict = d
        return self._terms_dict

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

    def postings_with_positions(
        self, term: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Full decode including the v4 positions sidecar:
        (doc_ids, tfs, dls, flat_positions) — ``flat_positions`` holds
        each posting's tf token positions consecutively in doc order
        (offsets = cumsum(tfs)). Raises if the index was built with
        ``with_positions=False``."""
        runs = self.runs(term)
        if not runs:
            e = np.empty(0, np.int64)
            return e, e, e, e.copy()
        parts = [decode_all(r) for r in runs]
        pos = [decode_positions(r, p[1]) for r, p in zip(runs, parts)]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
            np.concatenate(pos),
        )

    def postings_cached(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        hit = self._decoded.get(term)
        if hit is not None:
            if self._max_cached_terms is not None:
                del self._decoded[term]  # LRU bump (dict keeps order)
                self._decoded[term] = hit
            return hit
        hit = self.postings(term)
        if self._max_cached_terms is not None and len(self._decoded) >= self._max_cached_terms:
            self._decoded.pop(next(iter(self._decoded)))
        self._decoded[term] = hit
        return hit

    def decode_run_blocks(self, term: str, run_idx: int, bidx: np.ndarray):
        return decode_blocks(self.runs(term)[run_idx], bidx)
