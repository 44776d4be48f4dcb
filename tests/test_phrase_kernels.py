"""Path-parity pins for the round-5 dense-phrase kernels: the
counting-scratch AND, the eq-buffer key mask in ``_occ_keys_for``, and
the polars hash membership probe must each be bit-identical to the
searchsorted chains they replace — including under doc-range sharding
(span offset ``lo > 0``) and tombstone visibility masks.

Reference bar: positional serving is rank- AND score-identical across
kernel choices (the analog of the reference's exhaustive-vs-index
identity tests, /root/reference/test/testsearch.jl)."""

from __future__ import annotations

import numpy as np
import pytest

import similaritysearch_jl_ray.pipelines.query as qmod
from similaritysearch_jl_ray.functions.text import tokenize
from similaritysearch_jl_ray.pipelines.build_index import build_index
from similaritysearch_jl_ray.pipelines.query import Bm25Scorer, _member_mask
from similaritysearch_jl_ray.pipelines.queryset import REFERENCE_QUERIES
from similaritysearch_jl_ray.sources.pages import pages_dataset

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pk_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pk_idx"))
    build_index(pages_dataset(SF_DIR), d, num_parts=2, salt_factor=2)
    return d


def _query_tokens(sc):
    out = []
    for _, text in REFERENCE_QUERIES:
        toks = [t for t in tokenize(text) if sc._has_term(t)]
        if len(toks) >= 2:
            out.append(toks)
    assert out, "fixture queries must include multi-term phrases"
    return out


def test_and_docs_counting_scratch_equals_chain(pk_index):
    """Force the counting path (df gate -> 1) on one scorer and the
    searchsorted chain (span cap -> 0) on another: identical AND sets
    for every multi-term fixture query."""
    fast = Bm25Scorer(pk_index, k=10, mode="phrase")
    fast._AND_SCRATCH_DF_MIN = 1
    slow = Bm25Scorer(pk_index, k=10, mode="phrase")
    slow._AND_SCRATCH_SPAN_CAP = 0
    hit_fast = False
    for toks in _query_tokens(fast):
        terms = sorted(set(toks))
        a = fast._and_docs(terms)
        b = slow._and_docs(terms)
        assert np.array_equal(a, b), terms
        hit_fast = hit_fast or fast._and_eq_for is a
        assert slow._and_eq_for is None
    assert hit_fast, "counting path never engaged despite forced gate"


def test_occ_keys_eq_mask_equals_segment_expansion(pk_index):
    """The eq-buffer key mask (identity-matched docs array) must
    return exactly the keys the in_sorted segment expansion returns
    (a copy of the same docs defeats the identity check by design)."""
    sc = Bm25Scorer(pk_index, k=10, mode="phrase")
    sc._AND_SCRATCH_DF_MIN = 1
    checked = 0
    for toks in _query_tokens(sc):
        terms = sorted(set(toks))
        ad = sc._and_docs(terms)
        if sc._and_eq_for is not ad or not len(ad):
            continue
        for t in terms:
            via_mask = sc._occ_keys_for(t, ad)
            via_expand = sc._occ_keys_for(t, ad.copy())
            assert np.array_equal(via_mask, via_expand), t
            checked += 1
    assert checked > 0


def test_member_mask_polars_equals_searchsorted(monkeypatch):
    """Exact-membership parity of the hash path vs the searchsorted
    path on adversarial inputs: empty probe, no hits, all hits,
    duplicated probe values, extremes of the u64 key space."""
    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 1 << 62, size=5000).astype(np.uint64))
    probes = [
        np.empty(0, np.uint64),
        keys[::7] + np.uint64(1),          # mostly misses
        keys.copy(),                        # all hits
        np.repeat(keys[:50], 3),            # duplicates
        np.array([0, keys[0], keys[-1], np.iinfo(np.uint64).max], np.uint64),
    ]
    for probe in probes:
        want = _member_mask(keys, probe)  # default gate -> searchsorted
        monkeypatch.setattr(qmod, "_MEMBER_HASH_MIN", 0)
        got = _member_mask(keys, probe)
        monkeypatch.setattr(qmod, "_MEMBER_HASH_MIN", 1 << 16)
        assert np.array_equal(got, want)


def test_phrase_serving_identical_across_kernel_gates(pk_index):
    """End-to-end: phrase AND near results (ids and scores) are
    identical whether every round-5 kernel is forced ON or forced OFF."""
    on = Bm25Scorer(pk_index, k=10, mode="phrase")
    on._AND_SCRATCH_DF_MIN = 1
    off = Bm25Scorer(pk_index, k=10, mode="phrase")
    off._AND_SCRATCH_SPAN_CAP = 0
    for _, text in REFERENCE_QUERIES:
        assert on.score_query(text)[0] == off.score_query(text)[0]
        terms = sorted({t for t in tokenize(text) if on._has_term(t)})
        if len(terms) >= 2:
            a, _ = on._near_candidates(terms, 4)
            b, _ = off._near_candidates(terms, 4)
            assert np.array_equal(a, b), terms


def test_counting_scratch_respects_doc_range_offset(pk_index):
    """Sharded serving: a doc-range scorer (span lo > 0) must produce
    the same AND set and the same restricted occurrence keys as the
    unsharded scorer filtered to that range — pins the ``- lo`` offset
    arithmetic in both the scatter and the key mask."""
    full = Bm25Scorer(pk_index, k=10, mode="phrase")
    full._AND_SCRATCH_DF_MIN = 1
    import json
    import os

    n_docs = json.load(open(os.path.join(pk_index, "stats.json")))["n_docs"]
    lo, hi = n_docs // 3, 2 * n_docs // 3
    shard = Bm25Scorer(pk_index, k=10, mode="phrase", doc_range=(lo, hi))
    shard._AND_SCRATCH_DF_MIN = 1
    assert shard._span[0] == lo > 0
    checked = 0
    for toks in _query_tokens(full):
        terms = sorted(set(toks))
        want_all = full._and_docs(terms)
        want = want_all[(want_all >= lo) & (want_all < hi)]
        got = shard._and_docs(terms)
        assert np.array_equal(got, want), terms
        if shard._and_eq_for is got and len(got):
            for t in terms:
                km = shard._occ_keys_for(t, got)
                ke = shard._occ_keys_for(t, got.copy())
                assert np.array_equal(km, ke), t
                checked += 1
    assert checked > 0


def test_spannear_respects_doc_range_sharding(pk_index):
    """Ordered proximity under doc-range sharding: a shard-pinned
    scorer's candidates must equal the unsharded candidates filtered
    to its range, and the served hits (ids AND scores) must equal the
    unsharded hits restricted to the range — spannear composes with
    the doc-sharded serving story like phrase/near."""
    import json
    import os

    from similaritysearch_jl_ray.pipelines.queryset import (
        SPANNEAR_QUERIES,
        parse_ordered_near_query,
    )

    full = Bm25Scorer(pk_index, k=1000, mode="spannear")
    n_docs = json.load(open(os.path.join(pk_index, "stats.json")))["n_docs"]
    lo, hi = n_docs // 3, 2 * n_docs // 3
    shard = Bm25Scorer(pk_index, k=1000, mode="spannear", doc_range=(lo, hi))
    assert shard._span[0] == lo > 0
    checked = 0
    for _, text in SPANNEAR_QUERIES:
        toks, w = parse_ordered_near_query(text)
        if not toks or any(not full._has_term(t) for t in toks):
            continue
        want_all, _ = full._ordered_near_candidates(toks, w)
        want = want_all[(want_all >= lo) & (want_all < hi)]
        got, _ = shard._ordered_near_candidates(toks, w)
        assert np.array_equal(got, want), text
        full_hits = [
            (d, s) for d, s in full.score_query(text)[0] if lo <= d < hi
        ]
        shard_hits = shard.score_query(text)[0][: len(full_hits)]
        assert shard_hits == full_hits, text
        checked += 1 if len(got) else 0
    assert checked >= 2
