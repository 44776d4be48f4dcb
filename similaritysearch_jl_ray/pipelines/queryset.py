"""The fixed reference query set.

The corpus vocabulary is a fixed ~31-word list (identical across scale
factors — verified in tests), so the reference query set is a
deterministic, sf-independent list of query strings. The DuckDB oracle
inlines exactly these (query_id, term) pairs as a VALUES list; the
engine tokenizes the same strings — both sides share the tokenizer
contract, so dedup/casing behave identically.
"""

from __future__ import annotations

__all__ = [
    "REFERENCE_QUERIES",
    "queries_dataset",
    "queries_values_sql",
    "SYNONYM_GROUPS",
    "SYNONYM_CANON",
    "SYNONYM_MEMBERS",
    "synonyms_values_sql",
]

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


def query_phrases_sql() -> str:
    """``(query_id, phrase)`` VALUES list: each query's tokenized
    terms joined by single spaces — the SQL twin of treating the
    whole query as a contiguous phrase. On this corpus (single-space
    [a-z0-9]+ word soup, verified in tests) positional adjacency ≡
    ``' ' || text || ' ' LIKE '% phrase %'``."""
    rows = []
    for qid, text in REFERENCE_QUERIES:
        toks = tokenize(text)
        if toks:
            rows.append(f"({qid}, '{' '.join(toks)}')")
    return "(VALUES " + ", ".join(rows) + ") AS qp(query_id, phrase)"


# Fixed lang-weight map for mode="funcscore" (Elasticsearch
# function_score / field_value_factor on a doc-values field): score =
# BM25 · weight(lang), weight defaulting to 1.0. SQL twin inlines the
# same CASE expression.
FUNC_LANG_BOOST: dict[str, float] = {"en": 1.25, "de": 0.75}


def funcscore_case_sql(col: str = "d.lang") -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {w}" for lang, w in sorted(FUNC_LANG_BOOST.items())
    )
    return f"CASE {col} {cases} ELSE 1.0 END"


# Fixed synonym groups for mode="synonym" (Lucene SynonymQuery with
# index-merged semantics: members behave as ONE pseudo-term — tf sums,
# df = |union of docs|). The fixture vocabulary is a closed word list,
# so the groups are arbitrary in-vocab pairs; the CONTRACT (merge
# rule), not the lexicography, is what the oracle proves.
SYNONYM_GROUPS: list[tuple[str, ...]] = [("fast", "slow"), ("big", "small")]
SYNONYM_CANON: dict[str, str] = {t: g[0] for g in SYNONYM_GROUPS for t in g}
SYNONYM_MEMBERS: dict[str, tuple[str, ...]] = {g[0]: g for g in SYNONYM_GROUPS}


def synonyms_values_sql() -> str:
    """``(term, canon)`` VALUES list of the synonym map — the SQL twin
    of ``SYNONYM_CANON`` (canon = first member of the group)."""
    pairs = ", ".join(
        f"('{t}', '{c}')" for t, c in sorted(SYNONYM_CANON.items())
    )
    return f"(VALUES {pairs}) AS syn(term, canon)"


def queries_values_sql() -> str:
    """``(query_id, term)`` VALUES list of the *tokenized, deduped*
    query terms — the exact term set the engine scores."""
    pairs = []
    for qid, text in REFERENCE_QUERIES:
        for term in sorted(set(tokenize(text))):
            pairs.append(f"({qid}, '{term}')")
    return "(VALUES " + ", ".join(pairs) + ") AS q(query_id, term)"


def query_ids_values_sql() -> str:
    """``(query_id)`` VALUES list of ALL reference queries — including
    any that tokenize to zero terms. Count/stat oracles must derive
    their per-query row set from THIS list (not the (query_id, term)
    pairs) so a punctuation-only query still yields an n_matches=0 row
    on both sides (the engine actors emit one per input query)."""
    rows = ", ".join(f"({qid})" for qid, _ in REFERENCE_QUERIES)
    return "(VALUES " + rows + ") AS qi(query_id)"


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


# Nested boolean TREE queries (beyond DNF): a node is one of
#   {"term": t}            — docs containing t
#   {"phrase": "a b c"}    — docs containing the contiguous phrase
#   {"and": [children]}    — intersection; children may be {"not": sub}
#                            (subtracted — Lucene MUST_NOT; at least one
#                            positive child required)
#   {"or": [children]}     — union (no direct "not" children: a pure
#                            negation has no bounded universe)
# Matching docs rank by BM25 over the query's distinct POSITIVE leaf
# terms (phrase tokens included; anything under a "not" never scores),
# ties (score desc, doc_id asc) — the shared serving contract.
TREE_QUERIES: list[tuple[int, dict]] = [
    (0, {"and": [{"term": "merge"}, {"or": [{"term": "fast"}, {"term": "join"}]}]}),
    (1, {"and": [{"term": "data"}, {"not": {"term": "stream"}}]}),
    (2, {"or": [
        {"phrase": "big data"},
        {"and": [{"term": "group"}, {"not": {"or": [{"term": "filter"}, {"term": "scan"}]}}]},
    ]}),
    (3, {"and": [
        {"or": [{"term": "window"}, {"term": "agg"}]},
        {"not": {"phrase": "table scan"}},
    ]}),
    (4, {"and": [{"term": "zzzunknown"}]}),  # unknown term → empty result
    (5, {"or": [
        {"term": "batch"},
        {"and": [{"term": "row"}, {"not": {"term": "zzzunknown"}}]},
    ]}),
]


# PREFIX queries (Lucene PrefixQuery): a token ending in ``*`` expands
# to every dictionary term with that prefix; plain tokens stay literal.
# The union of expanded + literal terms scores as a standard BM25
# disjunction (Lucene's multi-term rewrite SCORING_BOOLEAN_REWRITE,
# not constant-score) — ties and rounding per the shared contract.
PREFIX_QUERIES: list[tuple[int, str]] = [
    (0, "fast mer*"),
    (1, "da*"),                 # data + anything else starting 'da'
    (2, "s* join"),             # wide expansion + literal
    (3, "zz* merge"),           # empty expansion + literal survivor
    (4, "qu* fil*"),            # two prefixes
    (5, "data batch*"),         # literal + single-term expansion
    (6, "*"),                   # bare star: matches nothing (no empty-prefix scan)
]


def parse_prefix_query(text: str) -> tuple[list[str], list[str]]:
    """(literal_terms, prefixes) — whitespace-split; a token of shape
    ``<alnum>*`` is a prefix pattern, anything else goes through the
    standard tokenizer. Both lists deduped + sorted."""
    import re

    lits: set[str] = set()
    prefs: set[str] = set()
    for raw in text.split():
        m = re.fullmatch(r"([a-z0-9]+)\*", raw.lower())
        if m:
            prefs.add(m.group(1))
        else:
            lits.update(tokenize(raw))
    return sorted(lits), sorted(prefs)


def prefix_queries_dataset():
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in PREFIX_QUERIES])


def fuzzy_queries_dataset():
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in FUZZY_QUERIES])


def prefix_values_sql() -> str:
    """``(query_id, pat, is_prefix)`` VALUES rows — literal terms with
    is_prefix=false, prefix stems with is_prefix=true; the oracle
    expands stems against the df dictionary with LIKE."""
    rows = []
    for qid, text in PREFIX_QUERIES:
        lits, prefs = parse_prefix_query(text)
        for t in lits:
            rows.append(f"({qid}, '{t}', false)")
        for p in prefs:
            rows.append(f"({qid}, '{p}', true)")
    return "(VALUES " + ", ".join(rows) + ") AS qp(query_id, pat, is_prefix)"


# FUZZY queries (Lucene FuzzyQuery, maxEdits=1): every query token
# expands to the dictionary terms within plain Levenshtein distance 1
# (exact match included); scoring is the BM25 disjunction over the
# union of expansions. DuckDB's levenshtein() is the same plain edit
# distance, so the oracle expands with it directly.
FUZZY_QUERIES: list[tuple[int, str]] = [
    (0, "mergw"),            # merge at d=1
    (1, "dat"),              # data at d=1 (insertion)
    (2, "joins stream"),     # joins→join, stream exact
    (3, "xyzzy"),            # nothing within d=1
    (4, "sortt orde"),       # two d=1 expansions
    (5, "ky value"),         # ky→key, value exact
]
FUZZY_MAX_EDITS = 1


def fuzzy_values_sql() -> str:
    """``(query_id, term)`` VALUES rows of the raw (tokenized, deduped)
    fuzzy query tokens — expansion happens SQL-side via levenshtein()."""
    rows = []
    for qid, text in FUZZY_QUERIES:
        for t in sorted(set(tokenize(text))):
            rows.append(f"({qid}, '{t}')")
    return "(VALUES " + ", ".join(rows) + ") AS qf(query_id, term)"


# NEAR / proximity queries (Lucene SpanNearQuery, unordered): text of
# shape ``t1 t2 ... ~W``. A doc matches when one position can be chosen
# per DISTINCT query term with max(pos) − min(pos) ≤ W (order-free;
# in-query duplicate tokens collapse). Matching docs rank by the
# standard BM25 sum over the distinct terms — the shared contract. A
# query containing an unindexed term matches nothing (conjunctive).
NEAR_QUERIES: list[tuple[int, str]] = [
    (0, "merge join ~3"),
    (1, "big data ~1"),            # adjacent-only, either order
    (2, "sort order key ~6"),      # three terms, mid window
    (3, "fast scan ~0"),           # W=0: distinct terms can't share a position
    (4, "data zzzunknown ~5"),     # unknown term → empty
    (5, "line ~2"),                # single term: trivially matches
    (6, "group filter slow ~40"),  # wide window ≈ plain AND
]


def parse_near_query(text: str) -> tuple[list[str], int]:
    """``(distinct_sorted_terms, window)`` from ``"t1 t2 ~W"``; raises
    on a missing/malformed ``~W`` suffix (near queries are explicit —
    no default window)."""
    import re

    m = re.fullmatch(r"(.*?)\s*~(\d+)", text.strip())
    if not m:
        raise ValueError(f"near query needs a '~W' suffix: {text!r}")
    return sorted(set(tokenize(m.group(1)))), int(m.group(2))


# ORDERED proximity (Lucene SpanNearQuery in_order=true): the query's
# token SEQUENCE must appear at strictly increasing positions with
# last − first ≤ W. Query 1 reverses NEAR query 1's order and query 3
# reorders "fast scan" — on this corpus the ordered result sets differ
# from the unordered ones (pinned in tests), which is the point.
SPANNEAR_QUERIES: list[tuple[int, str]] = [
    (0, "merge join ~3"),
    (1, "data big ~1"),            # reversed order vs NEAR query 1
    (2, "sort order key ~6"),      # three terms, in order
    (3, "scan fast ~4"),           # reversed "fast scan"
    (4, "data zzzunknown ~5"),     # unknown term → empty
    (5, "line ~2"),                # single term: trivially matches
    (6, "group filter slow ~40"),  # wide window ≈ ordered AND
]


def parse_ordered_near_query(text: str) -> tuple[list[str], int]:
    """``(tokens_in_query_order, window)`` from ``"t1 t2 ~W"`` —
    duplicates KEPT and order preserved (the chain is positional)."""
    import re

    m = re.fullmatch(r"(.*?)\s*~(\d+)", text.strip())
    if not m:
        raise ValueError(f"ordered-near query needs a '~W' suffix: {text!r}")
    return tokenize(m.group(1)), int(m.group(2))


def spannear_queries_dataset():
    import ray.data as rd

    return rd.from_items(
        [{"query_id": qid, "text": t} for qid, t in SPANNEAR_QUERIES]
    )


def near_queries_dataset():
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in NEAR_QUERIES])


# WILDCARD queries (Lucene WildcardQuery): ``*`` matches any run of
# characters, ``?`` exactly one, anywhere in the token; plain tokens
# stay literal. The expansion union scores as a BM25 disjunction (the
# SCORING_BOOLEAN_REWRITE, like prefix/fuzzy). The oracle expands with
# SQL LIKE (* → %, ? → _) — identical fullmatch semantics.
WILDCARD_QUERIES: list[tuple[int, str]] = [
    (0, "m*ge"),              # infix star
    (1, "*ta"),               # suffix match
    (2, "s?an"),              # single-char hole
    (3, "qu*y filter"),       # wildcard + literal
    (4, "*zzz*"),             # matches nothing
    (5, "jo?n b?g"),          # two holes
    (6, "wind*w"),
]


def parse_wildcard_query(text: str) -> tuple[list[str], list[str]]:
    """(literal_terms, patterns) — whitespace-split; a token containing
    ``*`` or ``?`` (otherwise [a-z0-9]) is a wildcard pattern, anything
    else tokenizes literally. Both lists deduped + sorted."""
    import re

    lits: set[str] = set()
    pats: set[str] = set()
    for raw in text.split():
        low = raw.lower()
        if re.fullmatch(r"[a-z0-9*?]+", low) and ("*" in low or "?" in low):
            pats.add(low)
        else:
            lits.update(tokenize(raw))
    return sorted(lits), sorted(pats)


def wildcard_queries_dataset():
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in WILDCARD_QUERIES])


def wildcard_values_sql() -> str:
    """``(query_id, pat, is_pat)`` VALUES rows: literal terms with
    is_pat=false, wildcard patterns translated to LIKE syntax
    (* → %, ? → _) with is_pat=true."""
    rows = []
    for qid, text in WILDCARD_QUERIES:
        lits, pats = parse_wildcard_query(text)
        for t in lits:
            rows.append(f"({qid}, '{t}', false)")
        for p in pats:
            like = p.replace("*", "%").replace("?", "_")
            rows.append(f"({qid}, '{like}', true)")
    return "(VALUES " + ", ".join(rows) + ") AS qw(query_id, pat, is_pat)"


# REGEXP queries (Lucene RegexpQuery): the query text is ONE regular
# expression; dictionary terms that FULLMATCH it form the expansion,
# scored as a BM25 disjunction. Patterns stay inside the
# Python-re ∩ RE2 common subset so the engine (re.fullmatch) and the
# oracle (DuckDB regexp_full_match) agree.
REGEXP_QUERIES: list[tuple[int, str]] = [
    (0, "mer.*"),
    (1, "[sd]a.a"),           # character class + hole
    (2, "jo.n"),
    (3, "(scan|sort|stream)"),  # alternation
    (4, "z{3,}.*"),           # matches nothing
    (5, "[a-z]{3}"),          # every 3-letter term
]


def regexp_queries_dataset():
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in REGEXP_QUERIES])


def regexp_values_sql() -> str:
    rows = [f"({qid}, '{pat}')" for qid, pat in REGEXP_QUERIES]
    return "(VALUES " + ", ".join(rows) + ") AS qr(query_id, pat)"


# BOOSTED queries (Lucene term boosts): ``term^W`` multiplies that
# term's BM25 contribution by W (default 1.0); the doc score is the
# boosted sum. Boost literals are chosen exactly representable in
# binary (0.5, 2, 1.25, 3) so the engine float and the SQL literal are
# the same number.
BOOST_QUERIES: list[tuple[int, str]] = [
    (0, "fast^2 merge"),
    (1, "hash^0.5 join^2"),
    (2, "window agg^3 stream^0.5"),
    (3, "data^1.25"),
    (4, "zzzunknown^2 scan"),     # unknown boosted term drops out
    (5, "the^0.5 a^0.5"),
]


def parse_boost_query(text: str) -> list[tuple[str, float]]:
    """``[(term, boost)]`` — whitespace-split; ``tok^W`` carries boost
    W, a plain token boost 1.0. Duplicate terms keep the LAST boost
    (Lucene rewrite behavior); output sorted by term."""
    import re

    out: dict[str, float] = {}
    for raw in text.split():
        m = re.fullmatch(r"([^^\s]+)\^(\d+(?:\.\d+)?)", raw)
        if m:
            for t in tokenize(m.group(1)):
                out[t] = float(m.group(2))
        else:
            for t in tokenize(raw):
                out[t] = 1.0
    return sorted(out.items())


def boost_queries_dataset():
    import ray.data as rd

    return rd.from_items([{"query_id": qid, "text": t} for qid, t in BOOST_QUERIES])


def boost_values_sql() -> str:
    """``(query_id, term, boost)`` VALUES rows of the parsed boosted
    query terms — the engine's parse inlined for the oracle."""
    rows = []
    for qid, text in BOOST_QUERIES:
        for t, b in parse_boost_query(text):
            rows.append(f"({qid}, '{t}', {b!r})")
    return "(VALUES " + ", ".join(rows) + ") AS qb(query_id, term, boost)"


def tree_positive_terms(node: dict) -> set[str]:
    """Distinct scoring terms of a tree: every term/phrase-token leaf
    NOT under a ``not`` (negated content filters but never scores)."""
    if "term" in node:
        return {node["term"]}
    if "phrase" in node:
        return set(tokenize(node["phrase"]))
    if "not" in node:
        return set()
    kids = node.get("and") or node.get("or") or []
    out: set[str] = set()
    for c in kids:
        out |= tree_positive_terms(c)
    return out


def tree_values_sql() -> str:
    """``(query_id, term)`` VALUES rows of each tree's positive terms."""
    rows = []
    for qid, tree in TREE_QUERIES:
        for t in sorted(tree_positive_terms(tree)):
            rows.append(f"({qid}, '{t}')")
    return "(VALUES " + ", ".join(rows) + ") AS q(query_id, term)"


def tree_set_sql(node: dict) -> str:
    """Recursive SQL set expression for a tree's matching doc_ids,
    against the shared ``tf`` and ``docstr`` CTEs — INTERSECT/UNION/
    EXCEPT mirror and/or/not exactly."""
    if "term" in node:
        return f"SELECT doc_id FROM tf WHERE term = '{node['term']}'"
    if "phrase" in node:
        toks = tokenize(node["phrase"])
        pat = " " + " ".join(toks) + " "
        return f"SELECT doc_id FROM docstr WHERE contains(s, '{pat}')"
    if "or" in node:
        if any("not" in c for c in node["or"]):
            raise ValueError("'not' directly under 'or' has no bounded universe")
        return " UNION ".join(f"({tree_set_sql(c)})" for c in node["or"])
    if "and" in node:
        pos = [c for c in node["and"] if "not" not in c]
        neg = [c["not"] for c in node["and"] if "not" in c]
        if not pos:
            raise ValueError("'and' needs at least one positive child")
        expr = " INTERSECT ".join(f"({tree_set_sql(c)})" for c in pos)
        if neg:
            negexpr = " UNION ".join(f"({tree_set_sql(c)})" for c in neg)
            expr = f"({expr}) EXCEPT ({negexpr})"
        return expr
    raise ValueError(f"unknown tree node: {node!r}")


def tree_matched_sql() -> str:
    """UNION ALL of per-query matched-doc set expressions."""
    parts = [
        f"SELECT {qid} AS query_id, doc_id FROM ({tree_set_sql(tree)})"
        for qid, tree in TREE_QUERIES
    ]
    return " UNION ALL ".join(parts)
