"""Contract tests for the KnnResult-semantics bounded queue.

Port of the reference's randomized differential test against a naive
sorted-model (``/root/reference/test/testresults.jl:20-84``): drive the
queue with random pushes, mirror every step in a plain sorted list,
assert exact equality of contents and min/max/argmin/argmax.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from similaritysearch_jl_ray.functions.topk import TopK, TopKSorted, merge_topk, topk_indices


def model_topk(pairs, k):
    """Naive model: k smallest under (dist, arrival); pairs in arrival order."""
    ranked = sorted(enumerate(pairs), key=lambda t: (t[1][0], t[0]))[:k]
    return sorted((d, i) for _, (d, i) in ranked)


def test_random_pushes_match_sorted_model():
    rng = random.Random(42)
    for trial in range(20):
        k = rng.choice([1, 3, 10, 32])
        q = TopK(k)
        pairs = []
        for doc_id in range(1000):
            d = rng.choice([rng.uniform(-5, 5), float(rng.randint(-3, 3))])
            pairs.append((d, doc_id))
            q.push(d, doc_id)
            m = model_topk(pairs, k)
            assert q.items() == m, f"trial {trial} step {doc_id}"
            assert q.maximum() == m[-1][0]
            assert q.minimum() == m[0][0]
            assert q.argmax() == m[-1][1]
            assert q.argmin() == m[0][1]


def test_reject_rule_ties_lose_in_order():
    # knnheap.jl:63 — once full, item.dist >= maximum(res) is rejected.
    # With pushes in ascending doc_id order (the reference's exhaustive
    # scan order) a dist-tie with the frontier always loses.
    q = TopK(2)
    assert q.push(1.0, 5)
    assert q.push(2.0, 7)
    assert not q.push(2.0, 11)     # tie with frontier, later doc_id → lose
    assert not q.push(3.0, 12)
    assert q.push(1.5, 13)
    assert q.result() == [(5, -1.0), (13, -1.5)]


def test_out_of_order_ties_resolve_by_doc_id():
    # Deviation (documented): out-of-order pushes keep the set minimal
    # under (dist, doc_id) — equal dist admits a *smaller* doc_id. This
    # coincides with the reference whenever arrival order == id order,
    # and makes partial-merge results order-independent.
    q = TopK(2)
    q.push(1.0, 10)
    q.push(2.0, 11)
    assert q.push(2.0, 5)          # smaller doc_id than frontier at same dist
    assert q.result() == [(10, -1.0), (5, -2.0)]
    assert not q.push(2.0, 8)      # 8 > 5 → frontier keeps 5


def test_covradius_semantics():
    q = TopK(3)
    assert q.covradius() == float("inf")
    q.push(5.0, 1)
    q.push(1.0, 2)
    assert q.covradius() == float("inf")   # not full yet (pqueue.jl:35)
    q.push(3.0, 3)
    assert q.covradius() == 5.0
    assert q.theta() == -5.0


def test_pop_max_and_reuse():
    q = TopK(3)
    for d, i in [(3.0, 1), (1.0, 2), (2.0, 3)]:
        q.push(d, i)
    assert q.pop_max() == (3.0, 1)
    assert len(q) == 2
    q.reuse()
    assert len(q) == 0 and q.covradius() == float("inf")


def test_topk_indices_matches_heap():
    rng = np.random.default_rng(7)
    for _ in range(30):
        n = int(rng.integers(1, 400))
        k = int(rng.integers(1, 40))
        scores = rng.choice([0.5, 1.5, 2.5, rng.uniform()], size=n).astype(np.float64)
        doc_ids = np.arange(100, 100 + n, dtype=np.int64)
        q = TopK(k)
        for s, i in zip(scores, doc_ids):
            q.push_score(float(s), int(i))
        idx = topk_indices(scores, doc_ids, k)
        got = [(int(doc_ids[j]), float(scores[j])) for j in idx]
        assert got == q.result()


def test_merge_topk_equals_global():
    rng = np.random.default_rng(11)
    scores = rng.choice([1.0, 2.0, rng.uniform()], size=500)
    doc_ids = np.arange(500, dtype=np.int64)
    k = 17
    parts = []
    for lo in range(0, 500, 100):
        sl = slice(lo, lo + 100)
        idx = topk_indices(scores[sl], doc_ids[sl], k)
        parts.append([(int(doc_ids[sl][j]), float(scores[sl][j])) for j in idx])
    merged = merge_topk(parts, k)
    gold_idx = topk_indices(scores, doc_ids, k)
    gold = [(int(doc_ids[j]), float(scores[j])) for j in gold_idx]
    assert merged == gold


def test_heap_and_sorted_impls_equivalent():
    """The reference's dual-implementation proof strategy
    (``test/testresults.jl:52-84``, KnnHeap vs KnnSorted): drive both
    queues with identical random streams incl. pops; every accessor
    must agree at every step — the contract is pinned by the pair, not
    by either implementation."""
    rng = random.Random(99)
    for trial in range(20):
        k = rng.choice([1, 2, 5, 16])
        a, b = TopK(k), TopKSorted(k)
        for step in range(400):
            op = rng.random()
            if op < 0.9 or len(a) == 0:
                d = rng.choice([rng.uniform(-4, 4), float(rng.randint(-2, 2))])
                i = rng.randint(0, 10_000)
                assert a.push(d, i) == b.push(d, i), (trial, step)
            elif op < 0.95:
                assert a.pop_max() == b.pop_max()
            else:
                assert a.pop_min() == b.pop_min()
            assert a.items() == b.items()
            assert len(a) == len(b)
            assert a.covradius() == b.covradius()
            if len(a):
                assert (a.maximum(), a.argmax()) == (b.maximum(), b.argmax())
                assert (a.minimum(), a.argmin()) == (b.minimum(), b.argmin())
        a.reuse(k + 1)
        b.reuse(k + 1)
        assert a.items() == b.items() == []


def test_emd_greedy_matches_reference_scan():
    """Greedy-EMD faithful to cloud.jl:92-120 including the
    accumulate-on-improvement rule — checked against a literal
    transcription of the scalar loop."""
    from similaritysearch_jl_ray.functions.distances import emd_greedy

    rng = np.random.default_rng(3)
    for _ in range(20):
        n, dim = int(rng.integers(1, 12)), 3
        A = rng.normal(size=(n, dim))
        B = rng.normal(size=(n, dim))
        p = float(rng.choice([1.0, 2.0]))
        # scalar model
        C = list(range(n))
        s = 0.0
        for i in range(n):
            u = A[i]
            min_, arg = float("inf"), -1
            for j in range(i, n):
                d = float(np.sqrt(((u - B[C[j]]) ** 2).sum())) ** p
                if d < min_:
                    s += d
                    min_, arg = d, j
            C[arg], C[i] = C[i], C[arg]
        want = s ** (1.0 / p)
        got = emd_greedy(A, B, p=p)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_id_and_dist_views():
    q, s = TopK(3), TopKSorted(3)
    for d, i in [(3.0, 1), (1.0, 2), (2.0, 3), (0.5, 9)]:
        q.push(d, i)
        s.push(d, i)
    assert q.ids() == s.ids() == [9, 2, 3]
    assert q.dists() == s.dists() == [0.5, 1.0, 2.0]


def test_k_must_be_positive():
    with pytest.raises(ValueError):
        TopK(0)
    with pytest.raises(ValueError):
        TopKSorted(0)


def test_levenshtein_dists_matches_scalar():
    """Vectorized candidate-major Levenshtein DP ≡ the scalar kernel,
    including empty strings, equal strings, and the non-ASCII
    fallback path."""
    import numpy as np

    from similaritysearch_jl_ray.functions.distances import (
        levenshtein_dists,
        levenshtein_mask,
        string_distance,
    )

    rng = np.random.default_rng(3)
    alpha = list("abcde01")
    pool = [
        "".join(rng.choice(alpha, size=rng.integers(0, 12)).tolist())
        for _ in range(300)
    ]
    for tok in ["", "a", "abcde", "deadbeef", "0a1b2c"]:
        cands = np.asarray(pool, dtype=object)
        want = np.array([string_distance(tok, c, "levenshtein") for c in pool])
        got = levenshtein_dists(tok, cands)
        assert (got == want).all(), tok
        assert (levenshtein_mask(tok, cands, 2) == (want <= 2)).all()
    # unicode falls back to the scalar path, same answers
    uni = np.asarray(["héllo", "hello", "hell"], dtype=object)
    want = np.array([string_distance("hello", c, "levenshtein") for c in uni])
    assert (levenshtein_dists("hello", uni) == want).all()
    assert len(levenshtein_dists("x", np.asarray([], dtype=object))) == 0
