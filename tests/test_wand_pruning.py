"""WAND must actually SKIP work on skewed corpora.

The driver fixture is the worst case for block-max pruning (31 terms,
df ≈ 0.8N — every range looks promising), so this test plants a
Zipf-style skew: a rare high-idf term confined to one doc-id
neighborhood. Best-first range scoring must fill the heap from that
neighborhood and stop before touching most stopword-only ranges —
strictly fewer postings scored than the exhaustive path, with
rank-identical results (the safety property that makes the pruning
admissible)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from similaritysearch_jl_ray.pipelines.build_index import build_index
from similaritysearch_jl_ray.pipelines.query import Bm25Scorer
from similaritysearch_jl_ray.sources.pages import pages_from_documents

N_DOCS = 20_000  # > WAND min range width (4096) → multiple ranges


def _skewed_documents() -> pa.Table:
    rng = np.random.default_rng(13)
    common = ["the", "data", "join", "scan", "merge", "table", "row", "batch"]
    texts = []
    for i in range(N_DOCS):
        toks = rng.choice(common, size=30).tolist()
        # rare term lives only in docs 8200..8209 (inside one range)
        if 8200 <= i < 8210:
            toks += ["zyzzyva"] * 5
        texts.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * N_DOCS),
            "source": pa.array(["srcX"] * N_DOCS),
        }
    )


@pytest.fixture(scope="module")
def skew_index(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("skew"))
    pages = rd.from_arrow(_skewed_documents()).map_batches(
        lambda b: pages_from_documents(b), batch_format="pyarrow", batch_size=None
    )
    build_index(pages, d, num_parts=2, salt_factor=4)
    return d


def test_wand_skips_ranges_on_skewed_query(skew_index):
    wand = Bm25Scorer(skew_index, k=10, mode="wand")
    exh = Bm25Scorer(skew_index, k=10, mode="exhaustive")
    q = "zyzzyva the"
    w_hits, w_postings, w_ranges = wand.score_query(q)
    e_hits, e_postings, _ = exh.score_query(q)
    # rank identity first (pruning must be admissible)
    assert [d for d, _ in w_hits] == [d for d, _ in e_hits]
    np.testing.assert_allclose([s for _, s in w_hits], [s for _, s in e_hits], rtol=1e-12)
    # the actual point: strictly less scoring work than exhaustive
    assert w_postings < e_postings * 0.6, (w_postings, e_postings)
    # and the top docs are the planted rare-term neighborhood
    assert all(8200 <= d < 8210 for d, _ in w_hits)


def test_wand_equals_exhaustive_on_pure_stopword_query(skew_index):
    wand = Bm25Scorer(skew_index, k=10, mode="wand")
    exh = Bm25Scorer(skew_index, k=10, mode="exhaustive")
    w_hits, _, _ = wand.score_query("the data")
    e_hits, _, _ = exh.score_query("the data")
    assert [d for d, _ in w_hits] == [d for d, _ in e_hits]


def test_union_sorted_matches_np_unique_both_paths(skew_index):
    """The mark-scratch union (actor-reused, sort-free) must be
    id-identical to np.unique(concatenate(...)) on both its branches:
    dense inputs (mark path) and sparse inputs (unique fallback)."""
    sc = Bm25Scorer(skew_index, k=10, mode="wand")
    base, hi = sc._span
    rng = np.random.default_rng(7)
    # dense: total >= span//64 → mark path
    dense = [
        np.unique(rng.integers(base, hi, size=(hi - base) // 8)) for _ in range(3)
    ]
    got = sc._union_sorted(dense)
    np.testing.assert_array_equal(got, np.unique(np.concatenate(dense)))
    # scratch reset check: a second, different union must be unpolluted
    dense2 = [np.unique(rng.integers(base, hi, size=(hi - base) // 8))]
    got2 = sc._union_sorted(dense2)
    np.testing.assert_array_equal(got2, np.unique(np.concatenate(dense2)))
    # sparse: tiny total → np.unique fallback
    sparse = [np.array([base, hi - 1], dtype=np.int64), np.array([base], dtype=np.int64)]
    np.testing.assert_array_equal(
        sc._union_sorted(sparse), np.unique(np.concatenate(sparse))
    )
    assert len(sc._union_sorted([])) == 0


def test_wand_rank_identity_randomized_queries(skew_index):
    """Seeded stress over mixed rare/common multi-term queries: the
    essential-list MaxScore must stay bit-identical to exhaustive on
    every query (ids AND scores), including all-stopword and
    unknown-term mixes."""
    wand = Bm25Scorer(skew_index, k=10, mode="wand")
    exh = Bm25Scorer(skew_index, k=10, mode="exhaustive")
    vocab = ["the", "data", "join", "scan", "merge", "table", "row", "batch",
             "zyzzyva", "notaterm"]
    rng = np.random.default_rng(29)
    for _ in range(40):
        q = " ".join(rng.choice(vocab, size=int(rng.integers(1, 6))))
        w_hits, _, _ = wand.score_query(q)
        e_hits, _, _ = exh.score_query(q)
        assert [d for d, _ in w_hits] == [d for d, _ in e_hits], q
        assert [s for _, s in w_hits] == [s for _, s in e_hits], q


def test_f32_approx_error_within_bound_and_refine_is_exact(skew_index):
    """The f32-dense approx rescore must honor its published error
    bound, and _refine must recover the bit-exact f64 top-k (ids AND
    scores) from the approx scores — the admissibility contract that
    lets the hot path gather f32."""
    from similaritysearch_jl_ray.functions.topk import topk_indices

    sc = Bm25Scorer(skew_index, k=10, mode="wand")
    terms = ["the", "data", "join"]
    cand = sc._union_sorted([sc._term_arrays(t)[0] for t in terms])
    approx, err = sc._rescore_approx(terms, cand)
    exact = sc._rescore_exact(terms, cand)
    # the fixture's head terms are dense → the f32 path must engage,
    # otherwise this test exercises nothing
    assert err > 0.0
    assert float(np.max(np.abs(approx - exact))) <= err
    sub, ref = sc._refine(terms, cand, approx, err)
    i_full = topk_indices(exact, cand, 10)
    i_sub = topk_indices(ref, sub, 10)
    assert [int(cand[j]) for j in i_full] == [int(sub[j]) for j in i_sub]
    assert [float(exact[j]) for j in i_full] == [float(ref[j]) for j in i_sub]


def test_refine_keeps_ties_inside_margin(skew_index):
    """Synthetic near-tie stress: scores packed within the error
    bound around the k-th frontier must ALL survive _refine's margin
    cut (no true top-k member can be dropped)."""
    sc = Bm25Scorer(skew_index, k=10, mode="wand")
    rng = np.random.default_rng(7)
    cand = np.arange(200, dtype=np.int64)
    base = 5.0
    err = 1e-6
    # 50 docs whose approx scores sit within ±err of the k-th value
    approx = np.concatenate([
        np.full(50, base) + rng.uniform(-err, err, 50),
        rng.uniform(0.0, base - 10 * err, 150),
    ])
    rng.shuffle(approx)
    kth = float(np.partition(approx, -10)[-10])
    keep = approx >= kth - 2.0 * err
    # every doc within err of the frontier is kept by the margin rule
    assert keep[np.abs(approx - kth) <= err].all()
