"""Index-derived analytics: facet counts over query match sets and
forward term-vectors reconstructed from the inverted index.

Reference analogs: the per-result aggregation the reference exposes
through its ``KnnResult`` views + dataset groupbys
(``/root/reference/src/SimilaritySearch.jl`` surface); faceting is the
Lucene/Elasticsearch "terms aggregation on a filter query" pattern
re-expressed over this engine's postings + docmap sidecar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrays import in_sorted

FACET_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("lang", pa.string()),
        ("n_docs", pa.int64()),
    ]
)


class FacetCounter:
    """Actor: per-query facet counts of the disjunction MATCH SET
    (docs containing ≥1 known query term, visibility masks applied —
    the same universe BM25 would score) grouped by a docmap field.

    The docmap field column pins per actor as (sorted doc_ids,
    dictionary codes) — n_docs × ~9 bytes; at 100 TB this actor runs
    doc-range-pinned exactly like sharded serving (the docmap read
    pushes the range down), counts merge by (query_id, value) sum."""

    def __init__(self, index_dir: str, field: str = "lang", doc_range=None):
        import os

        import pyarrow.dataset as pads

        from .query import Bm25Scorer

        self.scorer = Bm25Scorer(
            index_dir, k=1, mode="exhaustive", doc_range=doc_range
        )
        flt = None
        if doc_range is not None:
            flt = (pads.field("doc_id") >= doc_range[0]) & (
                pads.field("doc_id") < doc_range[1]
            )
        t = (
            pads.dataset(os.path.join(index_dir, "docmap"), format="parquet")
            .to_table(columns=["doc_id", field], filter=flt)
            .sort_by("doc_id")
        )
        self._ids = t["doc_id"].to_numpy().astype(np.int64)
        codes = t[field].combine_chunks().dictionary_encode()
        self._codes = codes.indices.to_numpy().astype(np.int64)
        self._values = codes.dictionary.to_pylist()

    def _match_set(self, text: str) -> np.ndarray:
        from ..functions.text import tokenize

        terms = sorted(set(tokenize(text)))
        arrs = [
            self.scorer._term_arrays(t)[0]
            for t in terms
            if self.scorer._has_term(t)
        ]
        arrs = [a for a in arrs if len(a)]
        if not arrs:
            return np.empty(0, np.int64)
        return np.unique(np.concatenate(arrs))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_v, out_n = [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            m = self._match_set(text)
            if not len(m) or not len(self._ids):
                continue
            pos_c, valid = in_sorted(self._ids, m)
            counts = np.bincount(
                self._codes[pos_c[valid]], minlength=len(self._values)
            )
            for code in np.flatnonzero(counts):
                out_q.append(qid)
                out_v.append(self._values[code])
                out_n.append(int(counts[code]))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, type=pa.int64()),
                pa.array(out_v, type=pa.string()),
                pa.array(out_n, type=pa.int64()),
            ],
            schema=FACET_SCHEMA,
        )


def facet_counts(
    index_dir: str,
    field: str = "lang",
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """queries (query_id, text) → (query_id, <field>, n_docs): how the
    disjunction match set distributes over a docmap field — the
    search-engine facet panel. Runs as a standard actor pool over the
    queries dataset; the per-actor state is the postings (shared
    machinery with serving) + one field column."""
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    return qds.map_batches(
        FacetCounter,
        fn_constructor_kwargs={"index_dir": index_dir, "field": field},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FieldSortScorer:
    """Actor: top-k of each query's match set ordered by a docmap
    FIELD instead of relevance — Lucene ``Sort(SortField)``. The field
    column pins per actor next to the postings; ordering is
    (field asc, doc_id asc).

    Selection is by PRECOMPUTED SORT ORDINAL (Lucene's doc-values
    ordinals): the field is sorted ONCE per actor; each query then
    maps its match set to integer ordinals and argpartitions the k
    smallest — O(M) integer work per query instead of an O(M log M)
    Python-object string sort of the full match set (the former
    web-scale bound of this scorer on huge match sets)."""

    def __init__(self, index_dir: str, field: str = "url", k: int = 10):
        import os

        import pyarrow.dataset as pads

        from .query import Bm25Scorer

        self.k = k
        self.field = field
        self.scorer = Bm25Scorer(index_dir, k=1, mode="exhaustive")
        t = (
            pads.dataset(os.path.join(index_dir, "docmap"), format="parquet")
            .to_table(columns=["doc_id", field])
            .sort_by("doc_id")
        )
        self._ids = t["doc_id"].to_numpy().astype(np.int64)
        self._vals = np.asarray(t[field].to_pylist(), dtype=object)
        # global (field asc, doc_id asc) ordinal per docmap row — doc_id
        # is unique, so ordinal order restricted to any match set IS the
        # per-query (field, doc_id) order
        order = np.lexsort((self._ids, self._vals))
        self._ordinal = np.empty(len(order), dtype=np.int64)
        self._ordinal[order] = np.arange(len(order), dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import tokenize

        out = {"query_id": [], "rank": [], "doc_id": [], self.field: []}
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            terms = sorted(set(tokenize(text)))
            arrs = [
                self.scorer._term_arrays(t)[0]
                for t in terms
                if self.scorer._has_term(t)
            ]
            arrs = [a for a in arrs if len(a)]
            if not arrs or not len(self._ids):
                continue
            m = np.unique(np.concatenate(arrs))
            pos_c, valid = in_sorted(self._ids, m)
            m, rows = m[valid], pos_c[valid]
            ords = self._ordinal[rows]
            if len(ords) > self.k:
                sel = np.argpartition(ords, self.k)[: self.k]
            else:
                sel = np.arange(len(ords))
            sel = sel[np.argsort(ords[sel])]
            for r, j in enumerate(sel, start=1):
                out["query_id"].append(qid)
                out["rank"].append(r)
                out["doc_id"].append(int(m[j]))
                out[self.field].append(str(self._vals[rows[j]]))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "rank": pa.array(out["rank"], type=pa.int64()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                self.field: pa.array(out[self.field], type=pa.string()),
            }
        )


def field_sorted_search(
    index_dir: str,
    field: str = "url",
    k: int = 10,
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """Top-k of each query's match set sorted by a stored field
    (asc, doc_id tiebreak) instead of BM25 — the Lucene
    Sort(SortField) collector shape over this engine's docmap."""
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    return qds.map_batches(
        FieldSortScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "field": field, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


HIGHLIGHT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int64()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("first_pos", pa.int64()),
    ]
)


class HighlightScorer:
    """Actor: standard top-k BM25 + the FIRST query-term occurrence
    position per hit (the snippet anchor a highlighter needs), all
    from the positional index — no document text is touched. Per term,
    the hit docs' first occurrences come from one searchsorted into
    the term's posting ids + a gather at the positions offsets; the
    per-hit anchor is the min across the query's terms."""

    def __init__(self, index_dir: str, k: int = 10):
        from .query import Bm25Scorer

        self.scorer = Bm25Scorer(index_dir, k=k, mode="exhaustive")

    def _anchors(self, terms: list[str], docs: np.ndarray) -> np.ndarray:
        # selective decode: only runs containing a hit doc are touched
        # (k docs per query — position bytes read stay O(hits))
        order = np.argsort(docs)
        sd = docs[order]
        acc = np.full(len(sd), np.iinfo(np.int64).max, dtype=np.int64)
        for t in terms:
            if not self.scorer._has_term(t):
                continue
            ids, tfs, pos = self.scorer._term_positions_for(t, sd)
            if not len(ids):
                continue
            offs = np.zeros(len(tfs) + 1, dtype=np.int64)
            np.cumsum(tfs, out=offs[1:])
            at_c, valid = in_sorted(ids, sd)
            firsts = pos[offs[at_c]]
            np.minimum(acc, np.where(valid, firsts, acc), out=acc)
        out = np.empty_like(acc)
        out[order] = acc
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import tokenize

        cols = {n: [] for n in HIGHLIGHT_SCHEMA.names}
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            hits, _, _ = self.scorer.score_query(text)
            if not hits:
                continue
            docs = np.fromiter((d for d, _ in hits), np.int64, len(hits))
            anchors = self._anchors(sorted(set(tokenize(text))), docs)
            for r, ((d, s), a) in enumerate(zip(hits, anchors), start=1):
                cols["query_id"].append(qid)
                cols["rank"].append(r)
                cols["doc_id"].append(d)
                cols["score"].append(s)
                cols["first_pos"].append(int(a))
        return pa.Table.from_arrays(
            [
                pa.array(cols[n], type=HIGHLIGHT_SCHEMA.field(n).type)
                for n in HIGHLIGHT_SCHEMA.names
            ],
            schema=HIGHLIGHT_SCHEMA,
        )


def highlight_search(
    index_dir: str,
    k: int = 10,
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """Top-k BM25 with per-hit snippet anchors (first query-term token
    position), index-only — the Lucene highlighter's offsets-from-
    postings mode re-expressed over the v4 positions sidecar."""
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    return qds.map_batches(
        HighlightScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


SUGGEST_TOKENS: list[tuple[int, str]] = [
    (0, "mergw"),
    (1, "streem"),
    (2, "qurey"),
    (3, "xyzzzzzy"),   # nothing within distance 2
    (4, "data"),       # exact dictionary hit suggests itself first
    (5, "jion"),
]


def spell_suggest(
    index_dir: str,
    tokens=None,
    *,
    max_edits: int = 2,
    top: int = 3,
):
    """Did-you-mean suggestions (Lucene DirectSpellChecker shape):
    for each input token, the dictionary terms within ``max_edits``
    plain Levenshtein, ranked (distance asc, df desc, term asc), top
    ``top``. One Ray task per term-hash part scans its vocabulary
    slice (parts partition the dictionary — the same distribution
    story as :func:`term_vectors`); the global rank is a tiny driver
    merge over parts × top candidates."""
    import json
    import os

    import ray

    toks = tokens if tokens is not None else SUGGEST_TOKENS
    with open(os.path.join(index_dir, "stats.json")) as f:
        num_parts = json.load(f)["num_parts"]

    @ray.remote
    def _part_suggest(d: str, part: int, toks, max_edits: int) -> list:
        from ..functions.distances import levenshtein_dists
        from ..state.reader import IndexReader

        rdr = IndexReader(d, parts=[part])
        out = []
        vocab = sorted(rdr.term_dfs().items())
        terms = np.asarray([t for t, _ in vocab], dtype=object)
        dfs = np.asarray([df for _, df in vocab], dtype=np.int64)
        lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=len(terms))
        for qid, tok in toks:
            # length prune, then ONE vectorized DP over the survivors
            cand = np.flatnonzero(np.abs(lens - len(tok)) <= max_edits)
            if not len(cand):
                continue
            dist = levenshtein_dists(tok, terms[cand])
            ok = dist <= max_edits
            for i, dd in zip(cand[ok], dist[ok]):
                out.append((qid, str(terms[i]), int(dd), int(dfs[i])))
        return out

    rows = [
        r
        for part_rows in ray.get(
            [_part_suggest.remote(index_dir, p, toks, max_edits) for p in range(num_parts)]
        )
        for r in part_rows
    ]
    import pandas as pd

    df = pd.DataFrame(rows, columns=["query_id", "term", "dist", "df"])
    if not len(df):
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
                "term": pd.Series(dtype="object"),
                "dist": pd.Series(dtype="int64"),
                "df": pd.Series(dtype="int64"),
            }
        )
    df = df.sort_values(
        ["query_id", "dist", "df", "term"], ascending=[True, True, False, True]
    ).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= top].reset_index(drop=True)
    return df[["query_id", "rank", "term", "dist", "df"]].astype(
        {"query_id": "int64", "rank": "int64", "dist": "int64", "df": "int64"}
    )


def term_vectors(index_dir: str, doc_ids: list[int]):
    """Forward term-vectors (doc_id, term, tf) for the requested docs,
    reconstructed from the INVERTED index — Lucene TermVectors without
    a stored forward index. One Ray task per term-hash part scans that
    part's term dictionary (parts partition the vocabulary, so the
    scan parallelizes across parts and never leaves the part's files);
    each posting lookup is a searchsorted against the sorted request
    list. Cost: O(part_vocab · log df) per task — the right shape when
    the request list is small (the Lucene use case: a handful of docs
    for highlighting / MLT debugging)."""
    import json
    import os

    import ray
    import ray.data as rd

    targets = np.sort(np.asarray(sorted(set(doc_ids)), dtype=np.int64))

    with open(os.path.join(index_dir, "stats.json")) as f:
        num_parts = json.load(f)["num_parts"]

    @ray.remote
    def _part_vectors(d: str, part: int, tg: np.ndarray) -> pa.Table:
        from ..state.reader import IndexReader
        from ..state.segment import decode_blocks

        rdr = IndexReader(d, parts=[part])
        out_d, out_t, out_f = [], [], []
        for term in sorted(rdr.term_dfs()):
            for r in rdr.runs(term):
                if not len(r.block_first):
                    continue
                lo, hi = int(r.block_first[0]), int(r.block_last[-1])
                j = np.searchsorted(tg, lo)
                if j >= len(tg) or tg[j] > hi:
                    continue  # run span holds no requested doc
                sub = tg[(tg >= lo) & (tg <= hi)]
                bi = np.searchsorted(r.block_first, sub, side="right") - 1
                ok = (bi >= 0) & (r.block_last[np.maximum(bi, 0)] >= sub)
                bidx = np.unique(bi[ok])
                if not len(bidx):
                    continue  # only blocks containing a target decode
                ids, tfs, _ = decode_blocks(r, bidx)
                at_c, valid = in_sorted(ids, sub)
                for jj in np.flatnonzero(valid):
                    out_d.append(int(sub[jj]))
                    out_t.append(term)
                    out_f.append(int(tfs[at_c[jj]]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "term": pa.array(out_t, type=pa.string()),
                "tf": pa.array(out_f, type=pa.int64()),
            }
        )

    refs = [_part_vectors.remote(index_dir, p, targets) for p in range(num_parts)]
    return rd.from_arrow_refs(refs)


# fixed prefix probes for the completion entry (shared with the SQL
# oracle's VALUES list): common starts, a single letter, a dead end
COMPLETE_PREFIXES: list[str] = ["s", "b", "me", "da", "w", "zz"]


def complete_prefix(index_dir: str, prefixes=None, *, top: int = 5):
    """Completion suggester (the Lucene suggest module's
    prefix-completion shape): for each prefix, the top dictionary
    terms ranked (df desc, term asc). One Ray task per term-hash part
    binary-searches its SORTED vocabulary slice for the prefix range
    (no vocabulary iteration) and pre-ranks its top candidates; the
    driver merge is parts × top rows. Returns a pandas DataFrame
    (prefix, rank, term, df)."""
    import json
    import os

    import pandas as pd
    import ray

    pfx = list(prefixes) if prefixes is not None else COMPLETE_PREFIXES
    with open(os.path.join(index_dir, "stats.json")) as f:
        num_parts = json.load(f)["num_parts"]

    @ray.remote
    def _part_complete(d: str, part: int, pfx: list, top: int) -> list:
        import numpy as np

        from ..state.reader import IndexReader

        rdr = IndexReader(d, parts=[part])
        items = sorted(rdr.term_dfs().items())
        terms = np.asarray([t for t, _ in items], dtype=object)
        dfs = np.asarray([df for _, df in items], dtype=np.int64)
        out = []
        for p in pfx:
            lo = np.searchsorted(terms, p, side="left")
            hi = np.searchsorted(terms, p + "￿", side="left")
            if hi <= lo:
                continue
            order = np.lexsort((terms[lo:hi], -dfs[lo:hi]))[:top]
            out.extend(
                (p, str(terms[lo + j]), int(dfs[lo + j])) for j in order
            )
        return out

    refs = [_part_complete.remote(index_dir, p, pfx, top) for p in range(num_parts)]
    rows = [r for part_rows in ray.get(refs) for r in part_rows]
    df = pd.DataFrame(rows, columns=["prefix", "term", "df"])
    if len(df):
        df = df.sort_values(
            ["prefix", "df", "term"], ascending=[True, False, True], kind="stable"
        )
        df = df.groupby("prefix", group_keys=False).head(top).reset_index(drop=True)
        df["rank"] = df.groupby("prefix").cumcount() + 1
    else:
        df["rank"] = pd.Series([], dtype="int64")
    return df[["prefix", "rank", "term", "df"]].astype(
        {"prefix": object, "rank": "int64", "term": object, "df": "int64"}
    )
