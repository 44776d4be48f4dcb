"""The fixed reference query set.

The corpus vocabulary is a fixed ~31-word list (identical across scale
factors — verified in tests), so the reference query set is a
deterministic, sf-independent list of query strings. The DuckDB oracle
inlines exactly these (query_id, term) pairs as a VALUES list; the
engine tokenizes the same strings — both sides share the tokenizer
contract, so dedup/casing behave identically.
"""

from __future__ import annotations

__all__ = ["REFERENCE_QUERIES", "queries_dataset", "queries_values_sql"]

from ..functions.text import tokenize

REFERENCE_QUERIES: list[tuple[int, str]] = [
    (0, "fast merge"),
    (1, "hash join"),
    (2, "window agg stream"),
    (3, "sort order key"),
    (4, "spark query"),
    (5, "customer line value"),
    (6, "big data table scan"),
    (7, "dup"),
    (8, "slow group filter"),
    (9, "vector column batch"),
    (10, "the a"),
    (11, "data data data"),          # in-query duplicates collapse
    (12, "zzzunknown quark"),        # no posting list at all
    (13, "merge zzzunknown"),        # one known, one unknown term
    (14, "Stream FILTER Key"),       # case folding
    (15, "part row small"),
    (16, "query filter sort merge join"),
    (17, "line"),
    (18, "agg value window group sort"),
    (19, "scan big slow"),
]


def queries_dataset():
    """Ray Dataset of (query_id, text)."""
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in REFERENCE_QUERIES])


def queries_values_sql() -> str:
    """``(query_id, term)`` VALUES list of the *tokenized, deduped*
    query terms — the exact term set the engine scores."""
    pairs = []
    for qid, text in REFERENCE_QUERIES:
        for term in sorted(set(tokenize(text))):
            pairs.append(f"({qid}, '{term}')")
    return "(VALUES " + ", ".join(pairs) + ") AS q(query_id, term)"


# Boolean (DNF) reference queries: doc matches if ANY group's terms
# are ALL present; ranking is standard BM25 over the query's distinct
# terms (the Lucene boolean-filter + relevance-rank pattern).
BOOL_QUERIES: list[tuple[int, list[list[str]]]] = [
    (0, [["merge", "join"], ["fast"]]),
    (1, [["window", "agg", "stream"]]),
    (2, [["sort", "key"], ["group", "filter"]]),
    (3, [["zzzunknown"], ["scan", "big"]]),   # dead group + live group
    (4, [["data"], ["table", "row", "batch"]]),
    (5, [["zzzunknown", "merge"]]),           # unknown term kills its group
]


def bool_values_sql() -> str:
    """``(query_id, grp, term)`` VALUES rows of the DNF groups."""
    rows = []
    for qid, groups in BOOL_QUERIES:
        for g, terms in enumerate(groups):
            for t in terms:
                rows.append(f"({qid}, {g}, '{t}')")
    return "(VALUES " + ", ".join(rows) + ") AS qb(query_id, grp, term)"


def phrase_values_sql() -> str:
    """``(query_id, pat)`` VALUES list of space-padded tokenized
    phrases — ``contains(doc_token_string, pat)`` is exactly the
    engine's contiguous-subsequence match."""
    rows = []
    for qid, text in REFERENCE_QUERIES:
        toks = tokenize(text)
        if toks:
            rows.append(f"({qid}, ' {' '.join(toks)} ')")
    return "(VALUES " + ", ".join(rows) + ") AS p(query_id, pat)"
