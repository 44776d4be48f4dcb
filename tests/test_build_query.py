"""End-to-end: synthesize pages → build index → query; rank-identity
of both serving modes vs the index-free brute-force gold (the analog of
the reference's gold-recall tests, /root/reference/test/testsearchgraph.jl:22-26,
with recall tightened to exact rank identity per the north rule)."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from similaritysearch_jl_ray.functions.text import tokenize
from similaritysearch_jl_ray.pipelines.build_index import build_index
from similaritysearch_jl_ray.pipelines.query import Bm25Scorer, brute_force_topk, search
from similaritysearch_jl_ray.pipelines.queryset import REFERENCE_QUERIES, queries_dataset
from similaritysearch_jl_ray.sources.pages import pages_dataset
from similaritysearch_jl_ray.state.reader import IndexReader

SF_DIR = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_sf0001"))
    stats = build_index(pages_dataset(SF_DIR), d, num_parts=4, salt_factor=3)
    assert stats["n_docs"] == 500
    return d


@pytest.fixture(scope="module")
def gold():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    return brute_force_topk(texts, REFERENCE_QUERIES, K)


def _rows_from_scorer(scorer):
    rows = []
    for qid, text in REFERENCE_QUERIES:
        hits, _, _ = scorer.score_query(text)
        for rank, (doc_id, score) in enumerate(hits, start=1):
            rows.append((qid, rank, doc_id, score))
    return rows


def test_search_auto_routes_by_pack_budget(ray_session, index_dir, monkeypatch):
    """search(broadcast=None) must stop assuming every node holds the
    whole index: with the pack-budget forced below the index's
    estimated decoded size it auto-routes to doc-sharded pinned actors,
    with rank- AND score-identical results and the same result schema
    (cost columns aggregate across shards)."""
    import ray.data as rd

    import similaritysearch_jl_ray.config as cfg
    from similaritysearch_jl_ray.pipelines.query import estimated_pack_bytes, search

    def qds():
        return rd.from_items(
            [{"query_id": q, "text": t} for q, t in REFERENCE_QUERIES]
        )

    a = search(qds(), index_dir, k=10, mode="exhaustive").to_pandas()  # auto → broadcast
    est = estimated_pack_bytes(index_dir)
    assert est > 0
    monkeypatch.setattr(cfg, "BROADCAST_PACK_BUDGET_BYTES", max(1, est // 3))
    b = search(qds(), index_dir, k=10, mode="exhaustive").to_pandas()  # auto → sharded
    cols = ["query_id", "rank", "doc_id", "score"]
    pa_ = a[cols].sort_values(["query_id", "rank"]).reset_index(drop=True)
    pb_ = b[cols].sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert pa_.equals(pb_)
    assert set(b.columns) == set(a.columns)


def test_reader_lazy_lookup_parity(index_dir):
    """The Arrow-native lazy term lookup (binary search + on-demand run
    construction) must agree exactly with the materialized whole-
    dictionary view: same terms, same df, same decoded postings —
    including a term that does not exist."""
    from similaritysearch_jl_ray.state.reader import IndexReader

    lazy = IndexReader(index_dir)
    full = IndexReader(index_dir).terms  # materialized {term: runs}
    dfs = IndexReader(index_dir).term_dfs()
    for t, want_runs in full.items():
        assert t in lazy
        got = lazy.runs(t)
        assert len(got) == len(want_runs)
        assert lazy.df(t) == dfs[t] == sum(r.df for r in want_runs)
        import numpy as np

        ga, gb, gc = lazy.postings(t)
        from similaritysearch_jl_ray.state.segment import decode_all

        parts = [decode_all(r) for r in want_runs]
        np.testing.assert_array_equal(ga, np.concatenate([p[0] for p in parts]))
        np.testing.assert_array_equal(gb, np.concatenate([p[1] for p in parts]))
    assert "zzz_not_a_term" not in lazy
    assert lazy.df("zzz_not_a_term") == 0
    assert lazy.runs("zzz_not_a_term") == []


def test_index_layout_and_meta(index_dir):
    stats = json.load(open(os.path.join(index_dir, "stats.json")))
    from similaritysearch_jl_ray.state.reader import IndexReader

    assert len(IndexReader(index_dir).terms) == 31
    # every term is a head term in this corpus (df ~0.8N >> 1% N)
    assert len(stats["head_terms"]) >= 30
    metas = sorted(os.listdir(os.path.join(index_dir, "meta")))
    assert metas == [f"part={p}.json" for p in range(4)]
    total_postings = sum(
        json.load(open(os.path.join(index_dir, "meta", m)))["postings"] for m in metas
    )
    # one posting per (doc, term) pair
    import duckdb

    want = duckdb.sql(
        f"""SELECT count(*) FROM (SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text),'[a-z0-9]+')) t
            FROM read_parquet('{SF_DIR}/documents.parquet'))"""
    ).fetchone()[0]
    assert total_postings == want


def test_exhaustive_mode_matches_gold(index_dir, gold):
    scorer = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    rows = _rows_from_scorer(scorer)
    assert [(q, r, d) for q, r, d, _ in rows] == [(q, r, d) for q, r, d, _ in gold]
    np.testing.assert_allclose(
        [s for *_, s in rows], [s for *_, s in gold], rtol=1e-12, atol=1e-12
    )


def test_wand_mode_rank_identical_to_exhaustive(index_dir, gold):
    wand = Bm25Scorer(index_dir, k=K, mode="wand")
    rows = _rows_from_scorer(wand)
    # ids AND scores rank-identical (scores bit-comparable: same kernel
    # over the same postings, summed in the same term order)
    assert [(q, r, d) for q, r, d, _ in rows] == [(q, r, d) for q, r, d, _ in gold]
    np.testing.assert_allclose(
        [s for *_, s in rows], [s for *_, s in gold], rtol=1e-12, atol=1e-12
    )


def test_search_pipeline_dataset(ray_session, index_dir):
    res = search(queries_dataset(), index_dir, k=K, mode="wand", concurrency=2).to_pandas()
    assert set(res.columns) >= {"query_id", "rank", "doc_id", "score"}
    # query 12 is all-unknown → contributes no rows
    assert 12 not in set(res["query_id"])
    # all other queries return exactly K hits (corpus is dense)
    counts = res.groupby("query_id")["rank"].count()
    assert (counts == K).sum() >= 18


def test_resume_skips_done_and_rebuilds_missing(ray_session, index_dir, tmp_path):
    d = str(tmp_path / "copy")
    shutil.copytree(index_dir, d)
    # delete one part's meta + files → only that part rebuilds
    shutil.rmtree(os.path.join(d, "postings", "part=2"))
    os.remove(os.path.join(d, "meta", "part=2.json"))
    before = os.path.getmtime(os.path.join(d, "meta", "part=0.json"))
    build_index(pages_dataset(SF_DIR), d, num_parts=4, salt_factor=3)
    assert os.path.getmtime(os.path.join(d, "meta", "part=0.json")) == before  # untouched
    # rebuilt index serves identically
    a = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    b = Bm25Scorer(d, k=K, mode="exhaustive")
    for qid, text in REFERENCE_QUERIES:
        assert a.score_query(text)[0] == b.score_query(text)[0]


def test_salting_produced_multiple_runs(index_dir):
    from similaritysearch_jl_ray.state.reader import IndexReader

    rdr = IndexReader(index_dir)
    n_runs = {t: len(runs) for t, runs in rdr.terms.items()}
    assert max(n_runs.values()) == 3  # salt_factor=3 for head terms
    # runs hold disjoint ascending doc ranges
    for runs in rdr.terms.values():
        for a, b in zip(runs[:-1], runs[1:]):
            assert a.block_last[-1] < b.block_first[0]


def test_sharded_search_rank_identical(ray_session, index_dir):
    """Doc-sharded partial top-k + heap merge == direct search
    (SURVEY §7: 'partials merge ... same tie rule')."""
    from similaritysearch_jl_ray.pipelines.query import sharded_search

    direct = (
        search(queries_dataset(), index_dir, k=K, mode="exhaustive", concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    sharded = (
        sharded_search(queries_dataset(), index_dir, k=K, n_shards=3, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert (direct["query_id"].to_numpy() == sharded["query_id"].to_numpy()).all()
    assert (direct["doc_id"].to_numpy() == sharded["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        direct["score"].to_numpy(), sharded["score"].to_numpy(), rtol=1e-12
    )


def test_doc_range_pinned_reader_loads_only_overlapping_runs(index_dir):
    """A doc-sharded actor must never load out-of-shard runs: the
    pinned reader keeps only runs overlapping its range (pushdown on
    run_first/run_last), while per-term df stays GLOBAL so idf — and
    therefore scores — are identical across shards."""
    from similaritysearch_jl_ray.state.reader import IndexReader

    full = IndexReader(index_dir)
    max_doc = full.stats["max_doc"]
    lo, hi = max_doc // 3, 2 * max_doc // 3
    pinned = IndexReader(index_dir, doc_range=(lo, hi))
    n_full = sum(len(r) for r in full.terms.values())
    n_pinned = sum(len(r) for r in pinned.terms.values())
    assert 0 < n_pinned < n_full  # salted head-term runs outside the range skipped
    for runs in pinned.terms.values():
        for r in runs:
            assert r.block_last[-1] >= lo and r.block_first[0] < hi
    assert pinned.term_dfs() == full.term_dfs()  # df global, not shard-local
    assert pinned.stats["n_docs"] == full.stats["n_docs"]


def test_pinned_scorers_cover_exactly_the_direct_results(index_dir, gold):
    """Union of doc-range-pinned scorers' partials merged under the
    queue tie rule == direct search, bit-identical scores."""
    from similaritysearch_jl_ray.functions.topk import TopK

    max_doc = json.load(open(os.path.join(index_dir, "stats.json")))["max_doc"]
    width = max_doc // 3 + 1
    scorers = [
        Bm25Scorer(index_dir, k=K, mode="exhaustive", doc_range=(s * width, (s + 1) * width))
        for s in range(3)
    ]
    direct = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    for qid, text in REFERENCE_QUERIES:
        heap = TopK(K)
        for sc in scorers:
            for doc_id, score in sc.score_query(text)[0]:
                heap.push_score(score, doc_id)
        assert heap.result() == direct.score_query(text)[0]


def test_reader_decoded_cache_lru_bound(index_dir):
    """max_cached_terms bounds the decoded cache with LRU eviction;
    results are unaffected (encoded runs stay resident)."""
    from similaritysearch_jl_ray.state.reader import IndexReader

    bounded = IndexReader(index_dir, max_cached_terms=3)
    full = IndexReader(index_dir)
    terms = sorted(full.terms)[:6]
    for t in terms:
        a = bounded.postings_cached(t)
        b = full.postings_cached(t)
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
    assert len(bounded._decoded) == 3
    assert set(bounded._decoded) == set(terms[-3:])  # LRU kept the recent ones
    # re-decoding an evicted term still returns correct arrays
    a = bounded.postings_cached(terms[0])
    assert (a[0] == full.postings_cached(terms[0])[0]).all()


def test_bool_dnf_semantics(index_dir):
    """DNF filter: hit docs satisfy SOME group fully; scores equal the
    disjunctive scorer's for the same docs; a dead (unknown-term)
    group matches nothing; all-dead query is empty."""
    import pyarrow.parquet as pq

    from similaritysearch_jl_ray.functions.text import tokenize

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    sc = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    groups = [["merge", "join"], ["fast"]]
    hits, _, _ = sc.score_bool(groups)
    assert hits
    for doc_id, score in hits:
        toks = set(tokenize(texts[doc_id]))
        assert any(set(g) <= toks for g in groups)
    # scores match the disjunctive scorer over the same distinct terms
    e_map = dict(sc.score_query("merge join fast")[0])
    for doc_id, score in hits:
        if doc_id in e_map:
            assert score == e_map[doc_id]
    assert sc.score_bool([["zzzunknown", "merge"]])[0] == []


def test_protocol_conformance(index_dir):
    """§2.9: the built-ins satisfy the formal structural protocols
    (the reference's AbstractSearchIndex surface)."""
    from similaritysearch_jl_ray.state.protocol import IndexState, Scorer
    from similaritysearch_jl_ray.state.reader import IndexReader

    assert isinstance(IndexReader(index_dir), IndexState)
    assert isinstance(Bm25Scorer(index_dir, k=5), Scorer)


def test_and_mode_semantics(index_dir):
    """Conjunctive mode: results ⊆ exhaustive results, every hit doc
    contains EVERY query term, unknown terms match nothing."""
    a = Bm25Scorer(index_dir, k=K, mode="and")
    e = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    from similaritysearch_jl_ray.functions.text import tokenize

    for text in ("fast merge", "window agg stream", "the a"):
        hits_a, _, _ = a.score_query(text)
        hits_e, _, _ = e.score_query(text)
        terms = set(tokenize(text))
        for doc_id, score in hits_a:
            assert terms <= set(tokenize(texts[doc_id]))
        # scores agree with the disjunctive scorer for all-terms docs
        e_map = dict(hits_e)
        for doc_id, score in hits_a:
            if doc_id in e_map:
                assert score == e_map[doc_id]
    assert a.score_query("merge zzzunknown")[0] == []  # unknown term → empty


def test_phrase_search_contiguity(ray_session, tmp_path):
    """Phrase match requires CONTIGUOUS tokens: a doc containing the
    words out of order or interleaved must not match."""
    import pyarrow as pa
    import ray.data as rd

    from similaritysearch_jl_ray.pipelines.query import phrase_search
    from similaritysearch_jl_ray.sources.pages import pages_from_documents

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma",      # contiguous "alpha beta" ✓
                    "alpha gamma beta",      # out of order ✗
                    "alpha xx beta",         # interleaved ✗
                    "pre alpha beta post",   # contiguous inside ✓
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
        }
    )
    sf = str(tmp_path / "phrasefix")
    import os

    os.makedirs(sf)
    import pyarrow.parquet as pq

    pq.write_table(docs, f"{sf}/documents.parquet")
    pages = rd.from_arrow(docs).map_batches(
        lambda b: pages_from_documents(b), batch_format="pyarrow", batch_size=None
    )
    idx = str(tmp_path / "phraseidx")
    build_index(pages, idx, num_parts=2, salt_factor=2)
    out = phrase_search(idx, k=10, queries=[(0, "alpha beta")]).to_pandas()
    assert sorted(out["doc_id"].astype(int)) == [0, 3]
    # the corpus-scan fallback agrees exactly
    from similaritysearch_jl_ray.pipelines.query import phrase_search_scan

    scan = phrase_search_scan(sf, idx, k=10, queries=[(0, "alpha beta")]).to_pandas()
    a = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = scan.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "rank", "doc_id", "score"]].equals(
        b[["query_id", "rank", "doc_id", "score"]]
    )


def test_phrase_search_never_reads_corpus(ray_session, tmp_path):
    """The positional phrase path must serve from the index ALONE: the
    corpus is DELETED after the build and phrase queries still answer
    (file-level proof no stage re-reads documents.parquet — the round-2
    scale-killer). Includes a repeated-token phrase, which stresses the
    position-key intersection (same term at two phrase slots)."""
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from similaritysearch_jl_ray.pipelines.query import phrase_search
    from similaritysearch_jl_ray.sources.pages import pages_from_documents

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "stop go stop now",     # "stop go stop" contiguous ✓
                    "stop go go stop",      # ✗ (stop go [go] stop)
                    "go stop go stop go",   # contains "stop go stop" ✓
                    "stop stop go",         # ✗
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
        }
    )
    corpus = str(tmp_path / "corpus")
    import os

    os.makedirs(corpus)
    import pyarrow.parquet as pq

    pq.write_table(docs, f"{corpus}/documents.parquet")
    pages = rd.from_arrow(docs).map_batches(
        lambda b: pages_from_documents(b), batch_format="pyarrow", batch_size=None
    )
    idx = str(tmp_path / "noreadidx")
    build_index(pages, idx, num_parts=2, salt_factor=2)
    shutil.rmtree(corpus)  # corpus gone — only the index remains
    out = phrase_search(idx, k=10, queries=[(0, "stop go stop")]).to_pandas()
    assert sorted(out["doc_id"].astype(int)) == [0, 2]


def test_tree_search_nested_semantics(ray_session, tmp_path):
    """Nested boolean trees: and/or/not nesting and phrase leaves
    against a hand-checkable corpus; NOT subtracts (never scores),
    pure-negative shapes raise."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from similaritysearch_jl_ray.pipelines.query import Bm25Scorer, tree_search
    from similaritysearch_jl_ray.sources.pages import pages_from_documents

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma",   # t1: ¬gamma kills it; t2 phrase ✓
                    "alpha delta",        # t1: alpha∧(beta∨delta), no gamma ✓
                    "beta gamma alpha",   # t2: phrase "beta gamma" ✓
                    "gamma beta",         # t2: out of order ✗
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
        }
    )
    pages = rd.from_arrow(docs).map_batches(
        lambda b: pages_from_documents(b), batch_format="pyarrow", batch_size=None
    )
    idx = str(tmp_path / "treeidx")
    build_index(pages, idx, num_parts=2, salt_factor=2)
    t1 = {
        "and": [
            {"term": "alpha"},
            {"or": [{"term": "beta"}, {"term": "delta"}]},
            {"not": {"term": "gamma"}},
        ]
    }
    t2 = {"phrase": "beta gamma"}
    out = tree_search(idx, [(0, t1), (1, t2)], k=10).to_pandas()
    by_q = {q: sorted(g["doc_id"].astype(int)) for q, g in out.groupby("query_id")}
    assert by_q == {0: [1], 1: [0, 2]}
    s = Bm25Scorer(idx, k=10, mode="exhaustive")
    with pytest.raises(ValueError, match="positive"):
        s.score_tree({"and": [{"not": {"term": "alpha"}}]})
    with pytest.raises(ValueError, match="universe"):
        s.score_tree({"or": [{"not": {"term": "alpha"}}, {"term": "beta"}]})
    # scoring uses only positive terms: doc 1's score for t1 must equal
    # the plain BM25 of "alpha beta delta" on doc 1 (gamma excluded)
    hits, _, _ = Bm25Scorer(idx, k=10, mode="exhaustive").score_query("alpha beta delta")
    want = {d: sc for d, sc in hits}
    got = dict(zip(out[out.query_id == 0]["doc_id"].astype(int), out[out.query_id == 0]["score"]))
    assert got[1] == want[1]


def test_build_callback_fires_per_part(ray_session, tmp_path):
    """§2.9 build-callback hook: on_part_complete sees every part's
    lineage/metrics dict exactly once, at commit time."""
    seen = []
    build_index(
        pages_dataset(SF_DIR),
        str(tmp_path / "cb"),
        num_parts=4,
        salt_factor=2,
        on_part_complete=seen.append,
    )
    assert sorted(m["part"] for m in seen) == [0, 1, 2, 3]
    assert all({"postings", "tokens", "payload_bytes"} <= set(m) for m in seen)


def test_result_cache_identical_and_hits(index_dir):
    """Opt-in per-actor results LRU: identical results, repeated texts
    served from cache (cost counters stop growing), LRU evicts."""
    plain = Bm25Scorer(index_dir, k=K, mode="wand")
    cached = Bm25Scorer(index_dir, k=K, mode="wand", cache_size=4)
    for _, text in REFERENCE_QUERIES:
        assert cached.score_query(text) == plain.score_query(text)
    # repeated text: costdist unchanged by a cache hit
    cached.heap.reuse(K)
    cached.score_query("fast merge")
    before = cached.heap.costdist
    cached.score_query("fast merge")
    assert cached.heap.costdist == before
    assert len(cached._result_cache) <= 4


def test_crashed_stage_d_debris_is_cleaned(ray_session, index_dir, tmp_path):
    """Simulate a crash between the runs_tmp write and meta commit:
    stale postings/part files + a leftover runs_tmp must not leak into
    the rebuilt partition (stage D clears debris for missing parts)."""
    d = str(tmp_path / "crash")
    shutil.copytree(index_dir, d)
    os.remove(os.path.join(d, "meta", "part=1.json"))
    # plant debris: a bogus parquet in the un-committed part + runs_tmp
    os.makedirs(os.path.join(d, "runs_tmp"), exist_ok=True)
    with open(os.path.join(d, "runs_tmp", "garbage.bin"), "wb") as f:
        f.write(b"\x00" * 128)
    with open(os.path.join(d, "postings", "part=1", "stale.parquet"), "wb") as f:
        f.write(b"not parquet")
    build_index(pages_dataset(SF_DIR), d, num_parts=4, salt_factor=3)
    assert not os.path.exists(os.path.join(d, "runs_tmp"))
    assert not os.path.exists(os.path.join(d, "postings", "part=1", "stale.parquet"))
    a = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    b = Bm25Scorer(d, k=K, mode="exhaustive")
    for _, text in REFERENCE_QUERIES:
        assert a.score_query(text)[0] == b.score_query(text)[0]


# ---------------------------------------------------------------------------
# multi-term rewrite: prefix + fuzzy expansion (Lucene MultiTermQuery)
# ---------------------------------------------------------------------------


def test_prefix_expansion_matches_dictionary_scan(index_dir):
    """Binary-search range expansion == brute scan of the dictionary."""
    scorer = Bm25Scorer(index_dir, k=K, mode="prefix")
    vocab = sorted(IndexReader(index_dir).term_dfs())
    for stem in ["s", "da", "mer", "zz", "q", "batch", ""]:
        got = scorer._expand_prefix(stem) if stem else []
        want = [t for t in vocab if t.startswith(stem)] if stem else []
        assert got == want, stem


def test_fuzzy_expansion_matches_brute_force(index_dir):
    from similaritysearch_jl_ray.functions.distances import string_distance

    scorer = Bm25Scorer(index_dir, k=K, mode="fuzzy")
    vocab = sorted(IndexReader(index_dir).term_dfs())
    for tok in ["mergw", "dat", "joins", "xyzzy", "ky", "value"]:
        got = scorer._expand_fuzzy(tok, 1)
        want = [t for t in vocab if string_distance(tok, t, "levenshtein") <= 1]
        assert got == want, tok


def test_prefix_fuzzy_score_like_expanded_disjunction(index_dir):
    """An expanded query scores bit-identically to the exhaustive-mode
    scoring of the same literal term set (wand pruning stays exact on
    expanded sets too), and zero-expansion queries return nothing."""
    from similaritysearch_jl_ray.pipelines.queryset import FUZZY_QUERIES, PREFIX_QUERIES

    ex = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    pf = Bm25Scorer(index_dir, k=K, mode="prefix")
    fz = Bm25Scorer(index_dir, k=K, mode="fuzzy")
    for scorer, qs in ((pf, PREFIX_QUERIES), (fz, FUZZY_QUERIES)):
        saw_nonempty = False
        for _, text in qs:
            terms = scorer._expanded_terms(text)
            got = scorer.score_query(text)[0]
            if not terms:
                assert got == []
                continue
            saw_nonempty = True
            assert got == ex._score_exhaustive(terms)[0]
        assert saw_nonempty
    assert pf.score_query("*")[0] == []  # bare star: no empty-prefix scan


# ---------------------------------------------------------------------------
# proximity (near / slop) queries over the positional sidecar
# ---------------------------------------------------------------------------


def _brute_near(sf_dir: str, terms: list[str], w: int) -> list[int]:
    """Corpus-scan reference: doc matches iff some choice of one
    position per term spans ≤ w (checked via the same anchor sweep
    argument, but per doc in plain Python over tokenized text)."""
    import itertools

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = tokenize(text)
        posmap = {tm: [i for i, x in enumerate(toks) if x == tm] for tm in terms}
        if any(not v for v in posmap.values()):
            continue
        best = min(
            max(c) - min(c) for c in itertools.product(*(posmap[tm] for tm in terms))
        )
        if best <= w:
            out.append(doc_id)
    return sorted(out)


def test_near_candidates_match_corpus_scan(index_dir):
    from similaritysearch_jl_ray.pipelines.queryset import NEAR_QUERIES, parse_near_query

    scorer = Bm25Scorer(index_dir, k=K, mode="near")
    saw_nonempty = 0
    for _, text in NEAR_QUERIES:
        terms, w = parse_near_query(text)
        if not terms or any(not scorer._has_term(t) for t in terms):
            assert scorer.score_query(text)[0] == []
            continue
        got, _ = scorer._near_candidates(terms, w)
        want = _brute_near(SF_DIR, terms, w)
        assert list(got) == want, (text, len(got), len(want))
        saw_nonempty += 1 if len(got) else 0
    assert saw_nonempty >= 3


def test_near_scores_match_exhaustive_restriction(index_dir):
    """Matched docs score exactly as the exhaustive BM25 of the same
    terms restricted to the match set (shared scoring contract)."""
    from similaritysearch_jl_ray.pipelines.queryset import NEAR_QUERIES, parse_near_query

    nr = Bm25Scorer(index_dir, k=1000, mode="near")
    ex = Bm25Scorer(index_dir, k=1000, mode="exhaustive")
    for _, text in NEAR_QUERIES:
        terms, w = parse_near_query(text)
        if not terms or any(not nr._has_term(t) for t in terms):
            continue
        got = nr.score_query(text)[0]
        cand = set(d for d, _ in got)
        want = [(d, s) for d, s in ex._score_exhaustive(terms)[0] if d in cand]
        assert got == want, text


def test_near_edge_semantics(index_dir):
    scorer = Bm25Scorer(index_dir, k=K, mode="near")
    # W=0 with distinct terms: impossible
    assert scorer.score_query("fast scan ~0")[0] == []
    # single term: trivially matches every posting doc
    got, _ = scorer._near_candidates(["line"], 2)
    ids, _, _ = scorer._term_positions("line")
    assert list(got) == list(ids)
    # duplicate tokens collapse: "data data ~2" == "data ~2"
    a = scorer.score_query("data data ~2")[0]
    b = scorer.score_query("data ~2")[0]
    assert a == b
    # malformed (no ~W) raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        scorer.score_query("fast merge")


# ---------------------------------------------------------------------------
# more-like-this (seed doc -> top tf-idf terms -> BM25 disjunction)
# ---------------------------------------------------------------------------


def test_more_like_this_contract(ray_session, index_dir):
    from collections import Counter

    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.query import MLT_SEEDS, more_like_this

    res = more_like_this(SF_DIR, index_dir, k=K)
    seed_of = dict((q, d) for q, d in MLT_SEEDS)
    # seed never appears in its own results; unknown seed yields nothing
    for qid, grp in res.groupby("query_id"):
        assert seed_of[qid] not in set(grp["doc_id"])
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
    assert 6 not in set(res["query_id"])  # seed 10**9 doesn't exist
    # the scored terms are the brute top-10 by (round6(tf*idf), term)
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    rdr = IndexReader(index_dir)
    tf = Counter(tokenize(texts[42]))
    want_terms = [
        tm for _, tm in sorted(
            (-round6(c * rdr.idf(tm)), tm) for tm, c in tf.items() if rdr.df(tm) > 0
        )
    ][:10]
    # scoring those terms exhaustively (k+1, drop seed, trim) == result rows
    ex = Bm25Scorer(index_dir, k=K + 1, mode="exhaustive")
    hits = [(d, s) for d, s in ex._score_exhaustive(sorted(want_terms))[0] if d != 42][:K]
    got = res[res["query_id"] == 2][["doc_id", "score"]].itertuples(index=False)
    assert [(d, round6(s)) for d, s in hits] == [(d, round6(s)) for d, s in got]


# ---------------------------------------------------------------------------
# search_after / deep pagination
# ---------------------------------------------------------------------------


def test_search_after_pages_tile_the_full_ranking(index_dir):
    """k-sized cursor pages concatenate to exactly the one-shot top-3k
    list for every reference query — including ties at page borders
    (the (score==s0 & doc_id>d0) edge)."""
    big = Bm25Scorer(index_dir, k=3 * K, mode="exhaustive")
    small = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    for _, text in REFERENCE_QUERIES:
        want = big.score_query(text)[0]
        got = list(small.score_query(text)[0])
        while len(got) < len(want) and len(got) % K == 0 and got:
            s0, d0 = got[-1][1], got[-1][0]
            nxt = small.score_query_after(text, (s0, d0))[0]
            if not nxt:
                break
            got.extend(nxt)
        assert got == want[: len(got)]
        assert len(got) >= min(len(want), 3 * K) - K  # pages cover the range
    # cursor strictly excludes its own position
    hits = small.score_query("fast merge")[0]
    s0, d0 = hits[0][1], hits[0][0]
    after = small.score_query_after("fast merge", (s0, d0))[0]
    assert (d0, s0) not in after
    assert after == hits[1:] + small.score_query_after("fast merge", (hits[-1][1], hits[-1][0]))[0][:1]


# ---------------------------------------------------------------------------
# scoring variants: dismax + per-term boosts
# ---------------------------------------------------------------------------


def test_dismax_is_max_of_term_partials(index_dir):
    dm = Bm25Scorer(index_dir, k=1000, mode="dismax")
    ex = Bm25Scorer(index_dir, k=1000, mode="exhaustive")
    for _, text in [(0, "fast merge"), (1, "window agg stream"), (2, "dup")]:
        terms = dm._query_terms(text)
        got = dict(dm.score_query(text)[0])
        # brute: per-doc max over each single-term exhaustive scoring
        want = {}
        for t in terms:
            for d, s in ex._score_exhaustive([t])[0]:
                want[d] = max(want.get(d, 0.0), s)
        assert got == want, text


def test_boost_scales_each_term(index_dir):
    from similaritysearch_jl_ray.pipelines.queryset import parse_boost_query

    assert parse_boost_query("fast^2 merge") == [("fast", 2.0), ("merge", 1.0)]
    assert parse_boost_query("Data^0.5 DATA") == [("data", 1.0)]  # last wins
    b = Bm25Scorer(index_dir, k=1000, mode="boost")
    ex = Bm25Scorer(index_dir, k=1000, mode="exhaustive")
    got = dict(b.score_query("fast^2 merge")[0])
    want = {}
    for t, w in [("fast", 2.0), ("merge", 1.0)]:
        for d, s in ex._score_exhaustive([t])[0]:
            want[d] = want.get(d, 0.0) + w * s
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-9
    # boost^1 == plain exhaustive, bit-identical
    assert b.score_query("fast^1 merge^1")[0] == ex._score_exhaustive(["fast", "merge"])[0]


def test_wildcard_expansion_matches_fnmatch(index_dir):
    import fnmatch

    scorer = Bm25Scorer(index_dir, k=K, mode="wildcard")
    vocab = sorted(IndexReader(index_dir).term_dfs())
    for pat in ["m*ge", "*ta", "s?an", "qu*y", "*zzz*", "jo?n", "wind*w", "*", "d?t?"]:
        got = scorer._expand_wildcard(pat)
        want = [t for t in vocab if fnmatch.fnmatchcase(t, pat)]
        assert got == want, pat
    # expanded scoring == exhaustive over the same term set
    ex = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    from similaritysearch_jl_ray.pipelines.queryset import WILDCARD_QUERIES

    for _, text in WILDCARD_QUERIES:
        terms = scorer._expanded_terms(text)
        got = scorer.score_query(text)[0]
        assert got == (ex._score_exhaustive(terms)[0] if terms else [])


def test_regexp_expansion_and_scoring(index_dir):
    import re

    scorer = Bm25Scorer(index_dir, k=K, mode="regexp")
    vocab = sorted(IndexReader(index_dir).term_dfs())
    from similaritysearch_jl_ray.pipelines.queryset import REGEXP_QUERIES

    ex = Bm25Scorer(index_dir, k=K, mode="exhaustive")
    nonempty = 0
    for _, pat in REGEXP_QUERIES:
        want_terms = [t for t in vocab if re.fullmatch(pat, t)]
        got_terms = scorer._expanded_terms(pat)
        assert got_terms == want_terms, pat
        got = scorer.score_query(pat)[0]
        assert got == (ex._score_exhaustive(want_terms)[0] if want_terms else [])
        nonempty += bool(got)
    assert nonempty >= 4


def test_paged_search_three_pages(ray_session, index_dir):
    """n_pages=3 tiles ranks 1..3k (the page-2 continuation regression:
    the full-page check must track the previous page's GLOBAL rank)."""
    from similaritysearch_jl_ray.pipelines.query import paged_search

    res = paged_search(index_dir, k=5, n_pages=3)
    big = Bm25Scorer(index_dir, k=15, mode="exhaustive")
    for qid, text in REFERENCE_QUERIES:
        want = big.score_query(text)[0]
        got = res[res.query_id == qid]
        assert list(got["rank"]) == list(range(1, len(got) + 1))
        assert [(d, s) for d, s in zip(got["doc_id"], got["score"])] == want[: len(got)]
        if len(want) >= 15:
            assert len(got) == 15  # page 3 actually happened


def test_new_modes_shard_cleanly(ray_session, index_dir):
    """dismax / boost / near serve rank- and score-identically through
    doc-sharded pools (each doc's score computes wholly inside one
    shard for every mode; the heap merge is order-independent)."""
    import ray.data as rd

    from similaritysearch_jl_ray.pipelines.query import sharded_search
    from similaritysearch_jl_ray.pipelines.queryset import (
        BOOST_QUERIES,
        NEAR_QUERIES,
        PREFIX_QUERIES,
    )

    cases = [
        ("dismax", REFERENCE_QUERIES),
        ("boost", BOOST_QUERIES),
        ("near", NEAR_QUERIES),
        # expansion modes rely on the pinned reader's GLOBAL term
        # dictionary (df metadata projection) — the rewrite must be
        # identical in every shard
        ("prefix", PREFIX_QUERIES),
    ]
    cols = ["query_id", "rank", "doc_id", "score"]
    for mode, qs in cases:
        qds = rd.from_items([{"query_id": q, "text": t} for q, t in qs])
        sharded = (
            sharded_search(qds, index_dir, k=K, n_shards=3, mode=mode)
            .to_pandas()[cols]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        one = Bm25Scorer(index_dir, k=K, mode=mode)
        rows = []
        for qid, text in qs:
            for r, (d, s) in enumerate(one.score_query(text)[0], start=1):
                rows.append((qid, r, d, s))
        import pandas as pd

        want = pd.DataFrame(rows, columns=cols)
        assert len(sharded) == len(want), mode
        assert (sharded[["query_id", "rank", "doc_id"]].values == want[["query_id", "rank", "doc_id"]].values).all(), mode
        np.testing.assert_allclose(sharded["score"], want["score"], rtol=0, atol=1e-12)


def test_paged_search_mode_consistency(ray_session, index_dir):
    """page 2+ must rank the SAME docs/scores the mode's page 1 ranked
    (the cursor path used to fall back to the plain disjunction for
    every mode — only exhaustive/wand were consistent)."""
    from similaritysearch_jl_ray.pipelines.query import paged_search
    from similaritysearch_jl_ray.pipelines.queryset import (
        BOOST_QUERIES,
        NEAR_QUERIES,
        PREFIX_QUERIES,
    )

    cases = [
        ("and", REFERENCE_QUERIES),
        ("dismax", REFERENCE_QUERIES),
        ("boost", BOOST_QUERIES),
        ("near", NEAR_QUERIES),
        ("prefix", PREFIX_QUERIES),
    ]
    for mode, qs in cases:
        res = paged_search(index_dir, k=4, n_pages=3, queries=qs, mode=mode)
        big = Bm25Scorer(index_dir, k=12, mode=mode)
        for qid, text in qs:
            want = big.score_query(text)[0]
            got = res[res.query_id == qid]
            assert list(got["rank"]) == list(range(1, len(got) + 1)), (mode, qid)
            assert [
                (d, s) for d, s in zip(got["doc_id"], got["score"])
            ] == want[: len(got)], (mode, qid)


def test_regex_literal_prefix():
    from similaritysearch_jl_ray.pipelines.query import _regex_literal_prefix

    assert _regex_literal_prefix("abc") == "abc"
    assert _regex_literal_prefix("ab*") == "a"
    assert _regex_literal_prefix("ab+c") == "ab"
    assert _regex_literal_prefix("ab?c") == "a"
    assert _regex_literal_prefix("a{2}b") == ""
    assert _regex_literal_prefix(".*x") == ""
    assert _regex_literal_prefix("foo(bar|baz)") == "foo"
    assert _regex_literal_prefix(r"\d+") == ""
    assert _regex_literal_prefix("mer[gq]e") == "mer"


def test_regexp_redos_guard(index_dir):
    """A catastrophic-backtracking pattern must not stall the actor:
    the RE2-backed scan answers quickly or rejects, never exponential."""
    import time

    scorer = Bm25Scorer(index_dir, k=K, mode="regexp")
    # classic ReDoS shape: (a+)+b — exponential in Python re on
    # long all-'a' subjects; linear under RE2
    t0 = time.perf_counter()
    try:
        scorer._expanded_terms("(a+)+b")
    except Exception:
        pass  # rejecting is fine; stalling is not
    assert time.perf_counter() - t0 < 5.0
    with pytest.raises(ValueError, match="too long"):
        scorer._expanded_terms("a" * 1001)


def test_actor_caches_bounded(index_dir):
    """A long stream of distinct expansion queries must not grow the
    per-actor caches without bound (the round-3 unbounded-dict leak)."""
    from similaritysearch_jl_ray.pipelines.query import (
        _EXPANSION_CACHE_CAP,
        Bm25Scorer,
    )

    sc = Bm25Scorer(index_dir, k=3, mode="fuzzy")
    for i in range(_EXPANSION_CACHE_CAP + 500):
        sc._expand_fuzzy(f"zq{i:06d}", 1)
    assert len(sc._fuzzy_cache) <= _EXPANSION_CACHE_CAP
    sw = Bm25Scorer(index_dir, k=3, mode="wildcard")
    for i in range(200):
        sw._expand_wildcard(f"zq{i:04d}*")
    assert len(sw._wild_cache) <= 4096
    sr = Bm25Scorer(index_dir, k=3, mode="regexp")
    for i in range(200):
        sr._expand_regexp(f"zq{i:04d}[a-z]*")
    assert len(sr._regexp_cache) <= 4096


def test_fuzzy_trigram_prefilter_exact_and_sublinear(index_dir):
    """The trigram-prefiltered fuzzy expansion must equal the full
    length-pruned Levenshtein scan on EVERY probe (superset + exact
    verify), and examine a small fraction of a large synthetic
    vocabulary (the sublinearity bar for web vocab sizes)."""
    import numpy as np

    from similaritysearch_jl_ray.functions.distances import string_distance

    sc = Bm25Scorer(index_dir, k=3, mode="fuzzy")
    d = sc._dictionary()
    # exactness on the real dictionary for a spread of probes
    probes = [str(t) for t in d[:: max(1, len(d) // 8)]] + [
        "merge", "mergx", "xerge", "databases", "zz", "a",
    ]
    for tok in probes:
        for e in (1, 2):
            want = [
                str(t)
                for t in d[np.abs(sc._dict_lens() - len(tok)) <= e]
                if string_distance(tok, str(t), "levenshtein") <= e
            ]
            assert sc._expand_fuzzy(tok, e) == want, (tok, e)
    # sublinearity on a 200k-term synthetic dictionary
    rng = np.random.default_rng(11)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.unique(
        np.array(
            ["".join(rng.choice(alpha, size=rng.integers(6, 12))) for _ in range(200_000)],
            dtype=object,
        )
    )
    sc._dict_cache = vocab
    sc._dict_lens_cache = None
    sc.__dict__.pop("_dict_lens_cache", None)
    sc._gram_index_cache = None
    sc.__dict__.pop("_gram_index_cache", None)
    tok = str(vocab[12345])
    cand = sc._fuzzy_candidate_idx(tok, 1)
    assert len(cand) < 0.02 * len(vocab), len(cand)  # <2% of vocab examined
    got = sc._expand_fuzzy(tok, 1)
    assert tok in got


def test_merge_concat_path_rank_identical(ray_session, tmp_path):
    """D2's zero-decode concat path (multi-run groups averaging full
    blocks) must serve identically to a single-block build that never
    merges. num_blocks=8 + a tiny block_size force multi-run groups
    past the full-block heuristic; evidence the path ran = merged rows
    with undersized NON-terminal blocks (each input run's last block),
    which pure re-encode never produces."""
    from similaritysearch_jl_ray.pipelines.build_index import build_index
    from similaritysearch_jl_ray.pipelines.query import Bm25Scorer
    from similaritysearch_jl_ray.sources.pages import pages_dataset

    d_multi = str(tmp_path / "concat_multi")
    d_one = str(tmp_path / "concat_one")
    build_index(
        pages_dataset(SF_DIR, num_blocks=8), d_multi,
        num_parts=2, salt_factor=2, block_size=8,
    )
    build_index(
        pages_dataset(SF_DIR, num_blocks=1), d_one,
        num_parts=2, salt_factor=2, block_size=8,
    )
    import pyarrow.dataset as pads

    ragged = 0
    for p in range(2):
        t = pads.dataset(f"{d_multi}/postings/part={p}", format="parquet").to_table()
        for counts in t.column("block_count").to_pylist():
            if any(c < 8 for c in counts[:-1]):
                ragged += 1
    assert ragged > 0, "expected at least one concat-merged run"
    a = Bm25Scorer(d_multi, k=20, mode="exhaustive")
    b = Bm25Scorer(d_one, k=20, mode="exhaustive")
    w = Bm25Scorer(d_multi, k=20, mode="wand")
    for _, text in REFERENCE_QUERIES:
        want = b.score_query(text)[0]
        assert a.score_query(text)[0] == want
        assert w.score_query(text)[0] == want


def test_phrase_selective_block_decode_matches_whole_run(ray_session, tmp_path):
    """Layout v5 cold path: a fresh scorer whose candidate set covers
    <25% of a run's blocks decodes only those blocks
    (decode_positions_blocks); results must equal a scorer forced
    down the whole-run-decode path, for every mode that touches
    positions."""
    d = str(tmp_path / "v5sel")
    build_index(pages_dataset(SF_DIR), d, num_parts=2, salt_factor=2, block_size=4)
    # tiny blocks -> any selective candidate set covers few of them
    sel = Bm25Scorer(d, k=20, mode="phrase")
    whole = Bm25Scorer(d, k=20, mode="phrase")
    # force the whole-run path on the control scorer by pre-warming
    # its per-run cache through unrestricted decodes
    for t in {tok for _, text in REFERENCE_QUERIES for tok in tokenize(text)}:
        if whole._has_term(t):
            whole._term_positions(t)
            for ri, r in enumerate(whole.reader.runs(t)):
                from similaritysearch_jl_ray.state.segment import (
                    decode_all,
                    decode_positions,
                )

                from similaritysearch_jl_ray.pipelines.query import _LRU

                ids_r, tfs_r, _ = decode_all(r)
                if getattr(whole, "_pos_run_cache", None) is None:
                    whole._pos_run_cache = _LRU(512)
                whole._pos_run_cache.put((t, ri), (ids_r, tfs_r, decode_positions(r, tfs_r)))
    for _, text in REFERENCE_QUERIES:
        # restrict candidates hard: top-3 docs of the AND set
        toks = [t for t in tokenize(text) if sel._has_term(t)]
        if len(toks) < 2:
            continue
        docs = sel._and_docs(sorted(set(toks)))[:3]
        if not len(docs):
            continue
        for t in toks:
            a = sel._term_positions_for(t, docs)
            b = whole._term_positions_for(t, docs)
            assert (a[0] == b[0]).all() and (a[1] == b[1]).all() and (a[2] == b[2]).all()
    # and full phrase/near serving agrees end to end (fresh scorers)
    near_a = Bm25Scorer(d, k=20, mode="phrase")
    for _, text in REFERENCE_QUERIES:
        assert near_a.score_query(text)[0] == whole.score_query(text)[0]


def test_bm25f_per_field_b(ray_session, tmp_path):
    """BM25F with per-field length-normalization strength b_f: scores
    must match an independent recomputation from raw postings, and
    setting b_title=0 must erase title length effects entirely."""
    from similaritysearch_jl_ray.functions.bm25 import idf as _idf
    from similaritysearch_jl_ray.pipelines.query import Bm25FScorer
    from similaritysearch_jl_ray.stages.tokenize import extract_title_batch
    from similaritysearch_jl_ray.state.reader import IndexReader

    body = str(tmp_path / "f_body")
    title = str(tmp_path / "f_title")
    build_index(pages_dataset(SF_DIR), body, num_parts=2, salt_factor=2)
    build_index(
        pages_dataset(SF_DIR), title, num_parts=2, salt_factor=2,
        extract_fn=extract_title_batch,
    )
    weights = {"body": 1.0, "title": 2.0}
    field_b = {"body": 0.75, "title": 0.2}
    sc = Bm25FScorer({"body": body, "title": title}, weights, k=15, field_b=field_b)
    readers = {"body": IndexReader(body), "title": IndexReader(title)}

    def reference_scores(text):
        terms = sorted({t for t in tokenize(text)})
        acc = {}
        for t in terms:
            tfde = {}
            for f in ("body", "title"):
                ids, tfs, dls = readers[f].postings(t)
                b = field_b[f]
                for d, tf, dl in zip(ids.tolist(), tfs.tolist(), dls.tolist()):
                    B = (1.0 - b) + b * dl / readers[f].avgdl
                    tfde[d] = tfde.get(d, 0.0) + weights[f] * tf / B
            if not tfde:
                continue
            w = float(_idf(len(tfde), readers["body"].n_docs))
            for d, v in tfde.items():
                acc[d] = acc.get(d, 0.0) + w * v * (1.2 + 1.0) / (v + 1.2)
        return acc

    for _, text in REFERENCE_QUERIES[:6]:
        hits, _, _ = sc.score_query(text)
        want = reference_scores(text)
        for doc, score in hits:
            assert abs(score - want[doc]) < 1e-9, (text, doc)
        # ranking agrees with the model's top-k
        model_top = sorted(want.items(), key=lambda r: (-r[1], r[0]))[: len(hits)]
        assert [d for d, _ in hits] == [d for d, _ in model_top]
    # b_title = 0: title dl must not matter (B_title == 1 exactly)
    sc0 = Bm25FScorer(
        {"body": body, "title": title}, weights, k=5, field_b={"title": 0.0}
    )
    hits0, _, _ = sc0.score_query(REFERENCE_QUERIES[0][1])
    assert hits0  # smoke: still serves


def test_expansion_pack_identical_to_local(ray_session, index_dir):
    """The broadcast expansion side-pack (gram CSR + byte cache built
    ONCE per index state, mapped zero-copy by the pool) must be
    indistinguishable from the per-actor local build: same arrays,
    same fuzzy/prefix/wildcard expansions, same served results."""
    from similaritysearch_jl_ray.pipelines.query import _pack_ref

    packed = Bm25Scorer(index_dir, k=K, mode="fuzzy", pack_ref=_pack_ref(index_dir))
    local = Bm25Scorer(index_dir, k=K, mode="fuzzy")
    exp = packed._expand_pack()
    assert exp is not None  # the pack path actually engaged
    assert local._expand_pack() is None  # reader path derives locally
    gi_p, gi_l = packed._gram_index(), local._gram_index()
    assert gi_p is exp["gram"]
    assert gi_l is not gi_p
    assert gi_p[0] == gi_l[0]
    for a, b in zip(gi_p[1:], gi_l[1:]):
        assert np.array_equal(a, b)
    np.testing.assert_array_equal(packed._dict_lens(), local._dict_lens())
    db_p, db_l = packed._dict_bytes(), local._dict_bytes()
    assert np.array_equal(db_p[0], db_l[0]) and np.array_equal(db_p[1], db_l[1])
    for tok in ["mergw", "dat", "joins", "xyzzy", "value"]:
        assert packed._expand_fuzzy(tok, 1) == local._expand_fuzzy(tok, 1), tok
    # served results identical through the public scorer path
    for q in ["mergw", "valux"]:
        assert packed._score_query_uncached(q) == local._score_query_uncached(q), q


def test_build_with_n_docs_hint_identical(ray_session, tmp_path):
    """n_docs_hint folds the docmap write into D1 (one corpus pass) —
    stats and docmap content must be identical to the stage-A path,
    and a wrong hint must fail loudly (it would corrupt avgdl)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pqm
    import pytest as _pytest

    from similaritysearch_jl_ray.pipelines.build_index import IndexBuildError, build_index
    from similaritysearch_jl_ray.sources.pages import pages_dataset

    sfd = "/root/testdata/sf0.001"
    a, b = str(tmp_path / "idx_a"), str(tmp_path / "idx_b")
    s1 = build_index(pages_dataset(sfd), a, num_parts=4)
    n = pqm.read_metadata(f"{sfd}/documents.parquet").num_rows
    s2 = build_index(pages_dataset(sfd), b, num_parts=4, n_docs_hint=n)
    drop = lambda s: {k: v for k, v in s.items() if k != "build_timings"}
    assert drop(s1) == drop(s2)
    ta = pads.dataset(f"{a}/docmap", format="parquet").to_table().sort_by("doc_id")
    tb = pads.dataset(f"{b}/docmap", format="parquet").to_table().sort_by("doc_id")
    assert ta.select(sorted(ta.column_names)).equals(tb.select(sorted(ta.column_names)))
    with _pytest.raises(IndexBuildError):
        build_index(pages_dataset(sfd), str(tmp_path / "idx_c"), num_parts=4, n_docs_hint=n + 1)


def test_msm_mode_matches_filtered_brute_force(index_dir):
    """mode="msm" (Lucene minimumShouldMatch): result == the full
    brute-force ranking filtered to docs matching ≥ m distinct query
    terms, then cut to k — ids AND scores."""
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    doc_terms = {d: set(tokenize(x)) for d, x in texts.items()}
    full = brute_force_topk(texts, REFERENCE_QUERIES, k=len(texts))
    for m in (2, 3):
        sc = Bm25Scorer(index_dir, k=K, mode="msm", msm=m)
        for qid, text in REFERENCE_QUERIES:
            qterms = set(tokenize(text))
            want = [
                (d, s)
                for q, _, d, s in full
                if q == qid and len(qterms & doc_terms[d]) >= m
            ][:K]
            got = sc.score_query(text)[0]
            assert [d for d, _ in got] == [d for d, _ in want], (qid, m)
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want], rtol=1e-12, atol=1e-12
            )


def test_synonym_mode_matches_scalar_merge(index_dir):
    """mode="synonym" == a scalar reimplementation of the index-merged
    contract (tf sums across group members, df = |union|, query terms
    expand to their group) — ids AND scores."""
    from collections import Counter

    from similaritysearch_jl_ray.functions.bm25 import idf as _idf, tf_norm
    from similaritysearch_jl_ray.functions.topk import TopK
    from similaritysearch_jl_ray.pipelines.queryset import SYNONYM_CANON, SYNONYM_MEMBERS

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    n_docs = len(texts)
    dl = {d: len(tokenize(x)) for d, x in texts.items()}
    avgdl = sum(dl.values()) / n_docs
    tf: dict[str, dict[int, int]] = {}
    for d, x in texts.items():
        for term, c in Counter(tokenize(x)).items():
            tf.setdefault(term, {})[d] = c

    sc = Bm25Scorer(index_dir, k=K, mode="synonym")
    for qid, text in REFERENCE_QUERIES:
        canons = sorted({SYNONYM_CANON.get(x, x) for x in tokenize(text)})
        scores: dict[int, float] = {}
        for canon in canons:
            merged: dict[int, int] = {}
            for mth in SYNONYM_MEMBERS.get(canon, (canon,)):
                for d, c in tf.get(mth, {}).items():
                    merged[d] = merged.get(d, 0) + c
            if not merged:
                continue
            w = float(_idf(len(merged), n_docs))
            for d in sorted(merged):  # doc order, term-major like the engine
                scores[d] = scores.get(d, 0.0) + w * float(
                    tf_norm(np.array([merged[d]]), np.array([dl[d]]), avgdl)[0]
                )
        heap = TopK(K)
        for d in sorted(scores):
            heap.push_score(scores[d], d)
        want = heap.result()
        got = sc.score_query(text)[0]
        assert [d for d, _ in got] == [d for d, _ in want], qid
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12, atol=1e-12
        )


def test_collapse_mode_matches_filtered_brute_force(index_dir):
    """mode="collapse" == the full brute-force ranking reduced to the
    best-scoring doc per lang group, cut to k — ids AND scores."""
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    lang_of = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    full = brute_force_topk(texts, REFERENCE_QUERIES, k=len(texts))
    sc = Bm25Scorer(index_dir, k=K, mode="collapse")
    for qid, text in REFERENCE_QUERIES:
        seen: set[str] = set()
        want = []
        for q, _, d, s in full:  # already (score desc, doc asc) per query
            if q != qid or lang_of[d] in seen:
                continue
            seen.add(lang_of[d])
            want.append((d, s))
        want = want[:K]
        got = sc.score_query(text)[0]
        assert [d for d, _ in got] == [d for d, _ in want], qid
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12, atol=1e-12
        )


def test_explain_contributions_sum_to_scores(ray_session, index_dir):
    """Lucene-Explain analog: every ranked hit's per-term
    contributions sum back to its served score."""
    from similaritysearch_jl_ray.pipelines.query import explain_search, search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    exp = explain_search(queries_dataset(), index_dir, k=K, concurrency=2).to_pandas()
    res = search(queries_dataset(), index_dir, k=K, mode="exhaustive", concurrency=2).to_pandas()
    sums = (
        exp.groupby(["query_id", "rank", "doc_id"])["contribution"].sum().reset_index()
    )
    merged = res[["query_id", "rank", "doc_id", "score"]].merge(
        sums, on=["query_id", "rank", "doc_id"], how="left"
    )
    assert not merged["contribution"].isna().any()
    np.testing.assert_allclose(merged["score"], merged["contribution"], rtol=1e-9)


def test_funcscore_mode_matches_weighted_brute_force(index_dir):
    """mode="funcscore" == the brute-force disjunction with each doc's
    score multiplied by its lang weight, re-ranked — ids AND scores."""
    from similaritysearch_jl_ray.functions.topk import TopK
    from similaritysearch_jl_ray.pipelines.queryset import FUNC_LANG_BOOST

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    lang_of = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    full = brute_force_topk(texts, REFERENCE_QUERIES, k=len(texts))
    sc = Bm25Scorer(index_dir, k=K, mode="funcscore")
    for qid, text in REFERENCE_QUERIES:
        heap = TopK(K)
        for q, _, d, s in full:
            if q == qid:
                heap.push_score(s * FUNC_LANG_BOOST.get(lang_of[d], 1.0), d)
        want = heap.result()
        got = sc.score_query(text)[0]
        assert [d for d, _ in got] == [d for d, _ in want], qid
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12, atol=1e-12
        )


def test_search_after_consistent_for_new_modes(index_dir):
    """Cursor pagination must agree with page 1 for every round-4-late
    mode (the r3-ADVICE bug class): drop the first c hits via the
    cursor → the next hits equal page 1's tail, ids AND scores."""
    for mode, kwargs in [
        ("msm", {"msm": 2}),
        ("synonym", {}),
        ("collapse", {}),
        ("funcscore", {}),
    ]:
        sc = Bm25Scorer(index_dir, k=K, mode=mode, **kwargs)
        for qid, text in REFERENCE_QUERIES:
            page1 = sc.score_query(text)[0]
            if len(page1) < 3:
                continue
            c = 2
            s0, d0 = page1[c - 1][1], page1[c - 1][0]
            nxt = sc.score_query_after(text, (s0, d0))[0]
            assert nxt[: len(page1) - c] == page1[c:], (mode, qid)


def test_folded_docmap_resume_fallback(ray_session, tmp_path):
    """Crash-window resume: all parts committed but the folded docmap
    missing → the hint path falls back to the stage-A write and the
    rebuilt docmap matches the original exactly."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pqm

    from similaritysearch_jl_ray.pipelines.build_index import build_index
    from similaritysearch_jl_ray.sources.pages import pages_dataset

    sfd = "/root/testdata/sf0.001"
    d = str(tmp_path / "idx")
    n = pqm.read_metadata(f"{sfd}/documents.parquet").num_rows
    build_index(pages_dataset(sfd), d, num_parts=4, n_docs_hint=n)
    before = (
        pads.dataset(f"{d}/docmap", format="parquet").to_table().sort_by("doc_id")
    )
    shutil.rmtree(os.path.join(d, "docmap"))
    stats = build_index(pages_dataset(sfd), d, num_parts=4, n_docs_hint=n)
    assert stats["n_docs"] == n
    after = (
        pads.dataset(f"{d}/docmap", format="parquet").to_table().sort_by("doc_id")
    )
    assert before.select(sorted(before.column_names)).equals(
        after.select(sorted(before.column_names))
    )


def test_d2_single_file_fast_path_rank_identical(ray_session, tmp_path):
    """A part whose runs_tmp holds ONE file (one D1 write task, no
    repeated (term, salt)) hardlinks the D1 file into place untouched —
    the extra skey column survives as fast-path evidence — and must
    serve df/stats/scores identical to the same corpus built through
    the multi-file merge path."""
    import glob
    import json
    import os

    import ray.data as rd

    from similaritysearch_jl_ray.pipelines.query import Bm25Scorer
    from similaritysearch_jl_ray.sources.pages import pages_from_documents

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")

    def build(nblocks: int, name: str):
        ds = rd.from_arrow(docs)
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        pages = ds.map_batches(
            lambda b: pages_from_documents(b), batch_format="pyarrow", batch_size=None
        )
        d = str(tmp_path / name)
        build_index(pages, d, num_parts=2, salt_factor=2)
        return d

    fast_dir = build(1, "fastidx")
    slow_dir = build(4, "slowidx")

    # the fast path actually fired: D1 layout (skey column) in place
    fast_schema = pq.read_schema(
        glob.glob(f"{fast_dir}/postings/part=0/segment.parquet")[0]
    )
    assert "skey" in fast_schema.names
    slow_schema = pq.read_schema(
        glob.glob(f"{slow_dir}/postings/part=0/segment.parquet")[0]
    )
    assert "skey" not in slow_schema.names

    # identical logical content: per-part terms/postings/tokens meta
    for p in (0, 1):
        with open(os.path.join(fast_dir, "meta", f"part={p}.json")) as f:
            mf = json.load(f)
        with open(os.path.join(slow_dir, "meta", f"part={p}.json")) as f:
            ms = json.load(f)
        for k in ("terms", "postings", "tokens", "max_doc"):
            assert mf[k] == ms[k], (p, k)

    # rank AND score identity across both serving modes
    for mode in ("exhaustive", "wand"):
        a = _rows_from_scorer(Bm25Scorer(fast_dir, k=10, mode=mode))
        b = _rows_from_scorer(Bm25Scorer(slow_dir, k=10, mode=mode))
        assert a == b, mode


def _independent_hybrid(texts, queries, base_n, rrf_k, k):
    """Engine-state-free hybrid RRF: brute_force_topk for the BM25
    window, a dict-based cosine, and a Python fuse."""
    import math
    from collections import Counter

    brows = brute_force_topk(texts, queries, base_n)
    b_ranks: dict[int, dict[int, int]] = {}
    for qid, rank, doc_id, _ in brows:
        b_ranks.setdefault(qid, {})[doc_id] = rank

    tf_by_doc = {d: Counter(tokenize(x)) for d, x in texts.items()}
    norm = {d: math.sqrt(float(sum(v * v for v in c.values()))) for d, c in tf_by_doc.items()}

    expected: dict[int, list[tuple[int, float]]] = {}
    for qid, qtext in queries:
        toks = set(tokenize(qtext))
        if not toks:
            continue
        qn = math.sqrt(float(len(toks)))
        sims = []
        for d, c in tf_by_doc.items():
            dot = sum(c[tk] for tk in toks if tk in c)
            if dot:
                sims.append((-(float(dot) / (qn * norm[d])), d))
        sims.sort()
        c_ranks = {d: r for r, (_, d) in enumerate(sims[:base_n], 1)}
        bq = b_ranks.get(qid, {})
        fused = [
            (
                (1.0 / (rrf_k + bq[d]) if d in bq else 0.0)
                + (1.0 / (rrf_k + c_ranks[d]) if d in c_ranks else 0.0),
                d,
            )
            for d in set(bq) | set(c_ranks)
        ]
        fused.sort(key=lambda p: (-p[0], p[1]))
        if fused:
            expected[qid] = [(d, s) for s, d in fused[:k]]
    return expected


def test_hybrid_rrf_matches_independent_fusion(index_dir):
    """HybridRrfScorer (index-served BM25 + TF-cosine windows, RRF
    fuse) vs a from-raw-text recomputation that shares NO engine state
    — scores must be exactly equal (the determinism contract in the
    scorer docstring: ranks → two-term IEEE adds). Runs the reference
    query set plus 30 seeded random word-soup queries (with repeated
    and unknown tokens — repeats exercise the deduped-query-vector
    contract, unknowns the all-absent early-out)."""
    from similaritysearch_jl_ray.pipelines.query import HybridRrfScorer

    BASE_N, RRF_K, k = 50, 60, K
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    vocab = sorted({tk for x in texts.values() for tk in tokenize(x)})
    rng = np.random.default_rng(20260818)
    rand_queries = []
    for i in range(30):
        n_toks = int(rng.integers(1, 6))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n_toks)]
        if i % 5 == 0:
            toks.append(toks[0])  # repeated token
        if i % 7 == 0:
            toks.append("zzzunknownzzz")
        rand_queries.append((1000 + i, " ".join(toks)))

    for queries in (REFERENCE_QUERIES, rand_queries):
        expected = _independent_hybrid(texts, queries, BASE_N, RRF_K, k)
        sc = HybridRrfScorer(index_dir, k=k, base_n=BASE_N, rrf_k=RRF_K)
        for qid, qtext in queries:
            got = sc.score_query(qtext)
            assert got == expected.get(qid, []), (qid, qtext)


def test_top_hits_rank1_equals_collapse_survivors(index_dir):
    """Cross-pin: the rank-1 row of every (query, lang) top_hits group
    must be exactly the doc field-collapse keeps for that group (same
    docmap field, same tie rule) — collapse is top_hits with
    per_group=1 before its global cut."""
    from similaritysearch_jl_ray.pipelines.query import TopHitsScorer

    th = TopHitsScorer(index_dir, per_group=3)
    col = Bm25Scorer(index_dir, k=10, mode="collapse")
    for qid, text in REFERENCE_QUERIES:
        tbl = th(
            __import__("pyarrow").table(
                {"query_id": [qid], "text": [text]}
            )
        ).to_pandas()
        acc = col._collapse_accumulate(text)
        if acc is None:
            assert tbl.empty, qid
            continue
        kept_docs, kept_scores = acc[0], acc[1]
        r1 = tbl[tbl["rank"] == 1].sort_values("doc_id")
        want = sorted(zip(kept_docs.tolist(), kept_scores.tolist()))
        got = list(zip(r1["doc_id"].tolist(), r1["score"].tolist()))
        assert got == want, qid
        # every group is bounded by per_group and ranks are 1..n
        for _, grp in tbl.groupby("lang"):
            assert list(grp["rank"]) == list(range(1, len(grp) + 1))


def test_gram_csr_stratified_and_complete():
    """The length-stratified gram CSR must (a) order every gram slice
    by (term length, term idx) with a faithful parallel post_lens, and
    (b) hold exactly the naive (gram → distinct terms) map — both for
    the fused ASCII composite-key path and the generic lexsort path
    (forced via a >255-char term)."""
    from similaritysearch_jl_ray.pipelines.query import build_gram_csr

    def naive(vocab):
        g2t = {}
        for i, t in enumerate(vocab):
            for g in {t[j : j + 3] for j in range(len(t) - 2)}:
                g2t.setdefault(g, set()).add(i)
        return g2t

    def check(vocab):
        d = np.sort(np.asarray(vocab, dtype=object))
        lens = np.fromiter((len(t) for t in d), dtype=np.int64, count=len(d))
        kind, gk, offsets, terms_u, pl = build_gram_csr(d, lens)
        np.testing.assert_array_equal(pl, lens[terms_u])
        got = {}
        for j in range(len(gk)):
            s, e = int(offsets[j]), int(offsets[j + 1])
            sl, st = pl[s:e], terms_u[s:e]
            # (len, idx) ordering within the slice
            assert np.all(np.diff(sl) >= 0), gk[j]
            for L in np.unique(sl):
                seg = st[sl == L]
                assert np.all(np.diff(seg) > 0), (gk[j], L)
            if kind == "ascii":
                key = bytes(
                    [(int(gk[j]) >> 16) & 255, (int(gk[j]) >> 8) & 255, int(gk[j]) & 255]
                ).decode()
            else:
                key = str(gk[j])
            got[key] = set(st.tolist())
        assert got == naive([str(t) for t in d])

    base = ["banana", "bandana", "cabana", "ban", "anas", "panama", "aaaa", "naan"]
    check(base)                      # fused composite path
    check(base + ["a" * 300])        # len ≥ 256 → generic lexsort path


def test_hybrid_rrf_respects_tombstones(index_dir, tmp_path):
    """Hybrid fusion under deletes: tombstoned docs must vanish from
    BOTH ranker windows (ranks recompute over the live set, shifting
    RRF contributions for survivors) — checked against the same
    engine-state-free recomputation restricted to live docs."""
    import math
    import shutil
    from collections import Counter

    from similaritysearch_jl_ray.pipelines.lifecycle import delete_docs
    from similaritysearch_jl_ray.pipelines.query import HybridRrfScorer

    d = str(tmp_path / "hybrid_del")
    shutil.copytree(index_dir, d)
    # delete a doc that surfaces in the undeleted hybrid top-k
    base = HybridRrfScorer(index_dir, k=K)
    qid, qtext = REFERENCE_QUERIES[0]
    victims = [doc for doc, _ in base.score_query(qtext)[:2]]
    delete_docs(d, sorted(victims))

    BASE_N, RRF_K = 50, 60
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = {
        doc: txt
        for doc, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        if doc not in set(victims)
    }
    brows = brute_force_topk(texts, [(qid, qtext)], BASE_N)
    b_ranks = {doc: r for _, r, doc, _ in brows}
    tf_by_doc = {doc: Counter(tokenize(x)) for doc, x in texts.items()}
    toks = set(tokenize(qtext))
    qn = math.sqrt(float(len(toks)))
    sims = sorted(
        (
            -(float(sum(c[tk] for tk in toks if tk in c))
              / (qn * math.sqrt(float(sum(v * v for v in c.values()))))),
            doc,
        )
        for doc, c in tf_by_doc.items()
        if any(tk in c for tk in toks)
    )
    c_ranks = {doc: r for r, (_, doc) in enumerate(sims[:BASE_N], 1)}
    fused = sorted(
        (
            -(
                (1.0 / (RRF_K + b_ranks[doc]) if doc in b_ranks else 0.0)
                + (1.0 / (RRF_K + c_ranks[doc]) if doc in c_ranks else 0.0)
            ),
            doc,
        )
        for doc in set(b_ranks) | set(c_ranks)
    )
    want = [(doc, -s) for s, doc in fused[:K]]

    got = HybridRrfScorer(d, k=K).score_query(qtext)
    assert got == want
    assert not set(victims) & {doc for doc, _ in got}


# ---------------------------------------------------------------------------
# ORDERED proximity (spannear / SpanNearQuery in_order=true)
# ---------------------------------------------------------------------------


def _brute_spannear(sf_dir: str, toks: list[str], w: int) -> list[int]:
    """Corpus-scan reference: doc matches iff SOME strictly increasing
    choice of one position per token (in query order) spans ≤ w —
    exhaustive over position combinations, no greedy shortcut (so it
    independently validates the engine's greedy-chain argument)."""
    import itertools

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        tl = tokenize(text)
        posmap = {tm: [i for i, x in enumerate(tl) if x == tm] for tm in set(toks)}
        if any(not posmap[tm] for tm in toks):
            continue
        for combo in itertools.product(*(posmap[tm] for tm in toks)):
            if all(b > a for a, b in zip(combo, combo[1:])) and combo[-1] - combo[0] <= w:
                out.append(doc_id)
                break
    return sorted(out)


def test_spannear_candidates_match_corpus_scan(index_dir):
    from similaritysearch_jl_ray.pipelines.queryset import (
        SPANNEAR_QUERIES,
        parse_ordered_near_query,
    )

    scorer = Bm25Scorer(index_dir, k=K, mode="spannear")
    saw_nonempty = 0
    order_differs = 0
    for _, text in SPANNEAR_QUERIES:
        toks, w = parse_ordered_near_query(text)
        if not toks or any(not scorer._has_term(t) for t in toks):
            assert scorer.score_query(text)[0] == []
            continue
        got, _ = scorer._ordered_near_candidates(toks, w)
        want = _brute_spannear(SF_DIR, toks, w)
        assert list(got) == want, (text, len(got), len(want))
        saw_nonempty += 1 if len(got) else 0
        if len(toks) > 1:
            unordered = _brute_near(SF_DIR, sorted(set(toks)), w)
            order_differs += int(want != unordered)
    assert saw_nonempty >= 3
    # the fixture is chosen so ordering actually distinguishes
    assert order_differs >= 2


def test_spannear_scores_and_cursor(index_dir):
    """Matched docs score as the exhaustive restriction (shared
    contract) and search_after agrees with page 1 (the _full_hits
    branch contract every mode must satisfy)."""
    from similaritysearch_jl_ray.pipelines.queryset import (
        SPANNEAR_QUERIES,
        parse_ordered_near_query,
    )

    sn = Bm25Scorer(index_dir, k=1000, mode="spannear")
    ex = Bm25Scorer(index_dir, k=1000, mode="exhaustive")
    for _, text in SPANNEAR_QUERIES:
        toks, w = parse_ordered_near_query(text)
        if not toks or any(not sn._has_term(t) for t in toks):
            continue
        got = sn.score_query(text)[0]
        cand = set(d for d, _ in got)
        want = [
            (d, s)
            for d, s in ex._score_exhaustive(sorted(set(toks)))[0]
            if d in cand
        ]
        assert got == want, text
        if len(got) >= 3:
            c = 2
            s0, d0 = got[c - 1][1], got[c - 1][0]
            nxt = sn.score_query_after(text, (s0, d0))[0]
            assert nxt[: len(got) - c] == got[c:], text


def test_spannear_edge_semantics(index_dir):
    scorer = Bm25Scorer(index_dir, k=K, mode="spannear")
    # strictness: "data data ~0" needs two positions of 'data' with
    # p2 > p1 and p2 − p1 ≤ 0 — impossible
    assert scorer.score_query("data data ~0")[0] == []
    # but "data data ~N" (N ≥ 1) requires a genuine repeat within N
    got, _ = scorer._ordered_near_candidates(["data", "data"], 3)
    want = _brute_spannear(SF_DIR, ["data", "data"], 3)
    assert list(got) == want
    # single token: trivially matches every posting doc
    got1, _ = scorer._ordered_near_candidates(["line"], 2)
    ids, _, _ = scorer._term_positions("line")
    assert list(got1) == list(ids)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        scorer.score_query("fast merge")


def test_spannear_fast_and_dynamic_paths_identical(index_dir, monkeypatch):
    """The occ-cache greedy chain and the dynamic per-query key build
    must produce identical candidates (the phrase-kernels path-parity
    convention): force the dynamic path by making _occ_eligible False."""
    from similaritysearch_jl_ray.pipelines.queryset import (
        SPANNEAR_QUERIES,
        parse_ordered_near_query,
    )

    fast = Bm25Scorer(index_dir, k=K, mode="spannear")
    slow = Bm25Scorer(index_dir, k=K, mode="spannear")
    monkeypatch.setattr(slow, "_occ_eligible", lambda: False, raising=True)
    assert fast._occ_eligible() and not slow._occ_eligible()
    for _, text in SPANNEAR_QUERIES + [(99, "data data ~3")]:
        toks, w = parse_ordered_near_query(text)
        if not toks or any(not fast._has_term(t) for t in toks):
            continue
        a, _ = fast._ordered_near_candidates(toks, w)
        b, _ = slow._ordered_near_candidates(toks, w)
        assert list(a) == list(b), text
        # hits (ids AND scores) identical; the postings-touched counter
        # legitimately differs (full cached occ arrays vs AND-restricted)
        assert fast.score_query(text)[0] == slow.score_query(text)[0], text
