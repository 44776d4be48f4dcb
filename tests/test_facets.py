"""Facet counts + forward term-vectors derived from the index."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq
import pytest

from similaritysearch_jl_ray.functions.text import tokenize
from similaritysearch_jl_ray.pipelines.build_index import build_index
from similaritysearch_jl_ray.pipelines.facets import FacetCounter, term_vectors
from similaritysearch_jl_ray.pipelines.queryset import REFERENCE_QUERIES
from similaritysearch_jl_ray.sources.pages import pages_dataset

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_facets"))
    build_index(pages_dataset(SF_DIR), d, num_parts=4, salt_factor=3)
    return d


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"])
    return {
        int(d): (tx, lg)
        for d, tx, lg in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist()
        )
    }


def _brute_facets(corpus, text):
    terms = set(tokenize(text))
    c = Counter()
    for _, (tx, lg) in corpus.items():
        if terms & set(tokenize(tx)):
            c[lg] += 1
    return dict(c)


def test_facet_counts_match_corpus_scan(index_dir, corpus):
    fc = FacetCounter(index_dir, field="lang")
    import pyarrow as pa

    batch = pa.table(
        {
            "query_id": [q for q, _ in REFERENCE_QUERIES],
            "text": [t for _, t in REFERENCE_QUERIES],
        }
    )
    out = fc(batch).to_pandas()
    for qid, text in REFERENCE_QUERIES:
        got = dict(
            zip(
                out[out.query_id == qid]["lang"],
                out[out.query_id == qid]["n_docs"],
            )
        )
        assert got == _brute_facets(corpus, text), text


def test_facet_counter_doc_range_partitions_sum(index_dir):
    """Doc-range-pinned facet actors must sum to the global counts —
    the partitioning assumption the 100 TB sharded path relies on."""
    import pyarrow as pa

    batch = pa.table(
        {"query_id": [1, 6], "text": ["hash join", "big data table scan"]}
    )
    whole = FacetCounter(index_dir, field="lang")(batch).to_pandas()
    parts = [
        FacetCounter(index_dir, field="lang", doc_range=r)(batch).to_pandas()
        for r in [(0, 200), (200, 500)]
    ]
    import pandas as pd

    merged = (
        pd.concat(parts)
        .groupby(["query_id", "lang"], as_index=False)["n_docs"]
        .sum()
    )
    a = whole.sort_values(["query_id", "lang"]).reset_index(drop=True)
    b = merged.sort_values(["query_id", "lang"]).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_term_vectors_roundtrip(ray_session, index_dir, corpus):
    docs = [0, 42, 499, 10**9]
    res = term_vectors(index_dir, docs).to_pandas()
    assert 10**9 not in set(res["doc_id"])
    for d in (0, 42, 499):
        got = dict(
            zip(res[res.doc_id == d]["term"], res[res.doc_id == d]["tf"])
        )
        assert got == dict(Counter(tokenize(corpus[d][0]))), d


def test_highlight_anchor_matches_corpus_scan(ray_session, index_dir, corpus):
    """first_pos == min over the query's terms of the first token
    position in the doc's token stream (brute re-tokenize check)."""
    from similaritysearch_jl_ray.pipelines.facets import highlight_search

    res = highlight_search(index_dir, k=5).to_pandas()
    assert len(res)
    for row in res.itertuples(index=False):
        toks = tokenize(corpus[int(row.doc_id)][0])
        qterms = set(
            tokenize(dict(REFERENCE_QUERIES)[int(row.query_id)])
        )
        want = min(i for i, t in enumerate(toks) if t in qterms)
        assert int(row.first_pos) == want, (row.query_id, row.doc_id)


def test_field_sorted_search_matches_brute(ray_session, index_dir, corpus):
    from similaritysearch_jl_ray.pipelines.facets import field_sorted_search
    from similaritysearch_jl_ray.sources.pages import page_url

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    meta = {
        int(d): (src, lg)
        for d, src, lg in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["lang"].to_pylist()
        )
    }
    res = field_sorted_search(index_dir, field="url", k=5).to_pandas()
    assert len(res)
    for qid, grp in res.groupby("query_id"):
        text = dict(REFERENCE_QUERIES)[int(qid)]
        qterms = set(tokenize(text))
        matched = [
            d for d, (tx, _) in corpus.items() if qterms & set(tokenize(tx))
        ]
        want = sorted(
            ((page_url(meta[d][0], meta[d][1], d), d) for d in matched)
        )[:5]
        got = list(zip(grp["url"], grp["doc_id"]))
        assert got == [(u, d) for u, d in want], qid


def test_spell_suggest_matches_brute(ray_session, index_dir):
    from similaritysearch_jl_ray.functions.distances import string_distance
    from similaritysearch_jl_ray.pipelines.facets import SUGGEST_TOKENS, spell_suggest
    from similaritysearch_jl_ray.state.reader import IndexReader

    res = spell_suggest(index_dir)
    vocab = IndexReader(index_dir).term_dfs()
    for qid, tok in SUGGEST_TOKENS:
        cand = sorted(
            (string_distance(tok, t, "levenshtein"), -df, t)
            for t, df in vocab.items()
            if string_distance(tok, t, "levenshtein") <= 2
        )[:3]
        got = [
            (int(r.dist), -int(r.df), r.term)
            for r in res[res.query_id == qid].itertuples(index=False)
        ]
        assert got == cand, tok
    # exact hit ranks itself first at distance 0
    first = res[res.query_id == 4].iloc[0]
    assert first["term"] == "data" and first["dist"] == 0
