"""Tests for distances, quantization, projections, IVF, tuning, media."""

from __future__ import annotations

import numpy as np
import pytest

from similaritysearch_jl_ray.functions.distances import (
    binary_hamming,
    pairwise,
    set_distance,
    string_distance,
)
from similaritysearch_jl_ray.functions.perf import macrorecall, recallscore
from similaritysearch_jl_ray.functions.quantize import sq_decode, sq_encode, sq_global_u8_params

SF_DIR = "/root/testdata/sf0.001"


# -- distance kernels (reference testseq.jl patterns) -----------------------
def test_distance_kernels_basic():
    a = np.array([[0.0, 0.0], [1.0, 1.0]])
    q = np.array([[3.0, 4.0]])
    assert pairwise(a, q, "l2")[0, 0] == 5.0
    assert pairwise(a, q, "sql2")[0, 0] == 25.0
    assert pairwise(a, q, "l1")[0, 0] == 7.0
    assert pairwise(a, q, "linf")[0, 0] == 4.0
    # cosine of parallel vectors is 0 distance
    assert abs(pairwise(np.array([[2.0, 0.0]]), np.array([[5.0, 0.0]]), "cosine")[0, 0]) < 1e-12
    # self-distance ~0 for all metrics (testseq.jl:7-20 pattern)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 8))
    for m in ("l2", "sql2", "l1", "linf", "lp3", "cosine", "angle"):
        d = pairwise(x, x, m)
        assert np.abs(np.diag(d)).max() < 1e-7, m


def test_distance_hack_wrappers():
    """src/dist/hacks.jl:5-50 surface: NegativeDistanceHack,
    SimilarityFromDistance and DistanceWithIdentifiers as kernel
    combinators, usable through the registry like any metric."""
    from similaritysearch_jl_ray.functions.distances import (
        DISTANCES,
        distance_with_identifiers,
        negative_distance,
        register_distance,
        similarity_from_distance,
    )

    rng = np.random.default_rng(3)
    a, q = rng.standard_normal((6, 4)), rng.standard_normal((3, 4))
    d = pairwise(a, q, "l2")
    assert np.array_equal(negative_distance("l2")(a, q), -d)
    assert np.allclose(similarity_from_distance("l2")(a, q), 1.0 / (1.0 + d))
    # similarity inverts the ordering: argmin distance == argmax similarity
    sim = similarity_from_distance("l2")(a, q)
    assert np.array_equal(np.argmin(d, axis=0), np.argmax(sim, axis=0))

    db = rng.standard_normal((10, 4))
    k = distance_with_identifiers("l2", db)
    ia, iq = np.array([0, 3, 9]), np.array([2, 5])
    assert np.allclose(k(ia, iq), pairwise(db[ia], db[iq], "l2"))
    # registry round-trip: pairwise() casts ids to float64; the kernel
    # must recover exact integer ids from that
    register_distance("idl2_test", k)
    try:
        assert np.allclose(pairwise(ia, iq, "idl2_test"), pairwise(db[ia], db[iq], "l2"))
    finally:
        DISTANCES.pop("idl2_test", None)
    # wrappers compose: negating the similarity restores the distance
    # ordering (argmin of −sim == argmin of d == the nearest element)
    near = negative_distance(similarity_from_distance("l2"))
    assert np.array_equal(np.argmin(near(a, q), axis=0), np.argmin(d, axis=0))


def test_set_distances():
    a = np.array([1, 2, 3, 4])
    b = np.array([3, 4, 5, 6])
    assert set_distance(a, b, "jaccard") == 1 - 2 / 6
    assert set_distance(a, b, "dice") == 1 - 4 / 8
    assert set_distance(a, b, "intersection") == 1 - 2 / 4
    assert abs(set_distance(a, b, "cosine_set") - (1 - 2 / 4)) < 1e-12


def test_string_distances():
    assert string_distance("kitten", "sitting", "levenshtein") == 3
    assert string_distance("abc", "abc", "levenshtein") == 0
    assert string_distance("abc", "axc", "hamming") == 1
    assert string_distance("abcd", "abzz", "common_prefix") == 2
    # lcs distance: insert/delete only; "abc"->"bcd" = 2
    assert string_distance("abc", "bcd", "lcs") == 2


def test_binary_hamming():
    a = np.array([0b1011], dtype=np.uint64)
    b = np.array([0b0010], dtype=np.uint64)
    assert binary_hamming(a, b)[0] == 2


def test_recall_utils():
    assert recallscore([1, 2, 3], [3, 2, 9]) == 2 / 3
    assert macrorecall({0: [1, 2]}, {0: [1, 2]}) == 1.0
    assert macrorecall({0: [1, 2], 1: [3]}, {0: [1, 2]}) == 0.5


# -- scalar quantization (reference sq/ tests pattern) ----------------------
@pytest.mark.parametrize("bits", [8, 4, 2])
def test_sq_roundtrip_error_bound(bits):
    rng = np.random.default_rng(bits)
    x = rng.standard_normal((50, 64)) * 3
    packed, mins, cs = sq_encode(x, bits=bits)
    back = sq_decode(packed, mins, cs, bits, 64)
    err = np.abs(back - x)
    # affine quantizer contract: error ≤ half a step per coordinate
    assert (err <= cs[:, None] / 2 + 1e-9).all()


def test_sq_global_params_deterministic():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 16))
    assert sq_global_u8_params(x) == sq_global_u8_params(x)


# -- Ray-side transforms ----------------------------------------------------
def test_random_projection(ray_session):
    from similaritysearch_jl_ray.pipelines.transform import random_projection

    a = random_projection(SF_DIR, out_dim=16).to_pandas().sort_values("vec_id")
    b = random_projection(SF_DIR, out_dim=16).to_pandas().sort_values("vec_id")
    assert len(a) == 500 and len(a["projected"].iloc[0]) == 16
    np.testing.assert_array_equal(
        np.stack(a["projected"].to_numpy()), np.stack(b["projected"].to_numpy())
    )


def test_quantize_embeddings_pipeline(ray_session):
    from similaritysearch_jl_ray.pipelines.transform import quantize_embeddings

    out = quantize_embeddings(SF_DIR, bits=8).to_pandas()
    assert len(out) == 500
    assert (out["max_abs_err"] <= out["c"] / 2 + 1e-9).all()


# -- IVF --------------------------------------------------------------------
def test_ivf_full_probe_is_exact(ray_session):
    from similaritysearch_jl_ray.pipelines.ann import knn_search
    from similaritysearch_jl_ray.pipelines.ivf import knn_search_ivf

    gold = knn_search(SF_DIR, k=8, n_queries=10).to_pandas()
    got = knn_search_ivf(SF_DIR, k=8, n_queries=10, n_centroids=8, nprobe=8).to_pandas()
    g = gold.sort_values(["query_id", "rank"]).reset_index(drop=True)
    o = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (g["vec_id"].to_numpy() == o["vec_id"].to_numpy()).all()


def test_ivf_partial_probe_recall(ray_session):
    from similaritysearch_jl_ray.functions.perf import macrorecall
    from similaritysearch_jl_ray.pipelines.ann import knn_search
    from similaritysearch_jl_ray.pipelines.ivf import knn_search_ivf

    gold = knn_search(SF_DIR, k=8, n_queries=10).to_pandas()
    got = knn_search_ivf(SF_DIR, k=8, n_queries=10, n_centroids=16, nprobe=4).to_pandas()
    gl = {int(q): g.sort_values("rank")["vec_id"].tolist() for q, g in gold.groupby("query_id")}
    ol = {int(q): g.sort_values("rank")["vec_id"].tolist() for q, g in got.groupby("query_id")}
    assert macrorecall(gl, ol) >= 0.5  # 4/16 lists probed


def test_edit_distance_scratch_matches_stateless():
    """Actor-reusable DP rows (the reference's Cpool, seqs.jl:44-53)
    compute identical distances to the stateless kernel."""
    import random

    from similaritysearch_jl_ray.functions.distances import (
        EditDistanceScratch,
        string_distance,
    )

    s = EditDistanceScratch()
    rng = random.Random(17)
    for _ in range(100):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        for kind in ("levenshtein", "lcs"):
            assert s(a, b, kind) == string_distance(a, b, kind)


def test_tune_ivf(ray_session):
    from similaritysearch_jl_ray.pipelines.tune import MinRecall, tune_ivf

    res = tune_ivf(SF_DIR, k=8, n_queries=5, n_centroids=8, nprobes=(2, 8), error=MinRecall(0.99))
    assert res["best"]["nprobe"] == 8  # full probe always meets the floor
    assert res["best"]["recall"] >= 0.99


def test_tune_minhash(ray_session):
    """Banding tune: more bands → recall monotone non-decreasing (the
    LSH S-curve steepens); MinRecall picks the cheapest config meeting
    the floor."""
    from similaritysearch_jl_ray.pipelines.tune import MinRecall, tune_minhash

    res = tune_minhash(SF_DIR, tau=0.5, bands_grid=(8, 16), error=MinRecall(0.8))
    tbl = {r["bands"]: r for r in res["table"]}
    assert set(tbl) == {8, 16}
    assert tbl[16]["recall"] >= tbl[8]["recall"]
    assert res["best"]["recall"] >= 0.8
    assert res["best"]["bands"] == min(
        b for b, r in tbl.items() if r["recall"] >= 0.8
    )


# -- media plumbing ---------------------------------------------------------
def test_media_decode_features(ray_session):
    from similaritysearch_jl_ray.pipelines.media import decode_features

    a = decode_features(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decode_features(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == 500
    assert (a["width"] == 16 + a["doc_id"] % 16).all()
    assert (a["mean_byte"] == b["mean_byte"]).all()


def test_media_strict_raises_without_decoder():
    from similaritysearch_jl_ray.pipelines.media import MediaDecoder

    with pytest.raises(NotImplementedError):
        MediaDecoder(strict=True)


def test_frame_sampling(ray_session):
    from similaritysearch_jl_ray.pipelines.media import sample_frames

    out = sample_frames(SF_DIR, every=2, frame_bytes=64).to_pandas()
    assert (out["frame_idx"] % 2 == 0).all()
    assert out.groupby("doc_id").size().min() >= 1
    assert out["frame"].map(len).eq(64).all()


def test_cloud_distances():
    from similaritysearch_jl_ray.functions.distances import chamfer, hausdorff

    A = np.array([[0.0, 0.0], [1.0, 0.0]])
    B = np.array([[0.0, 1.0]])
    # hausdorff: max(max_a min_b, max_b min_a) = max(sqrt2, 1) = sqrt2
    assert abs(hausdorff(A, B) - np.sqrt(2.0)) < 1e-12
    assert hausdorff(A, A) == 0.0
    assert chamfer(A, A) == 0.0
    assert chamfer(A, B) > 0


def test_topk_pop_min():
    from similaritysearch_jl_ray.functions.topk import TopK

    q = TopK(4)
    for d, i in [(3.0, 1), (1.0, 2), (2.0, 3), (1.0, 0)]:
        q.push(d, i)
    assert q.pop_min() == (1.0, 0)   # best dist, smallest id among ties
    assert q.pop_min() == (1.0, 2)
    assert q.pop_max() == (3.0, 1)
    assert len(q) == 1


def test_permuted_search_same_geometry(ray_session):
    from similaritysearch_jl_ray.pipelines.ann import knn_search, permuted_knn_search

    direct = knn_search(SF_DIR, k=8, n_queries=5).to_pandas()
    perm = permuted_knn_search(SF_DIR, k=8, n_queries=5)
    for qid in range(5):
        d = direct[direct.query_id == qid]
        p = perm[perm.query_id == qid]
        assert set(d["vec_id"]) == set(p["vec_id"])
        assert sorted(d["dist"]) == pytest.approx(sorted(p["dist"]), abs=1e-9)


def test_optimize_searchgraph_stochastic(ray_session):
    """The stochastic optimize_index! loop (opt.jl:139-235 analog):
    population search over the beam-width space converges to a config
    meeting MinRecall on the fixture; the radius objectives run and
    return finite costs (OptRadius prefers cheaper configs within the
    radius tolerance bucket)."""
    from similaritysearch_jl_ray.pipelines.tune import (
        MinRecall,
        OptRadius,
        optimize_searchgraph,
    )

    res = optimize_searchgraph(
        SF_DIR,
        kind=MinRecall(0.8),
        initialpopulation=4,
        bsize=2,
        mutbsize=2,
        crossbsize=2,
        maxiters=3,
    )
    assert res["best"]["recall"] >= 0.8
    assert res["best"]["conf"]["bs"] >= 8
    assert len(res["history"]) >= 1
    # radius objective: no gold needed, still converges to a config
    res2 = optimize_searchgraph(
        SF_DIR,
        kind=OptRadius(0.2),
        initialpopulation=3,
        bsize=2,
        mutbsize=1,
        crossbsize=1,
        maxiters=2,
    )
    assert res2["best"]["radius"] > 0
    import math

    assert math.isfinite(res2["best"]["objective"])


def test_media_batch_kernels_match_scalar_twins(ray_session):
    """Batched synthesis is BYTE-identical to the per-row _fake_media
    twin, and the batched decode's rounded features equal the scalar
    _decode_fake per blob — the kernel/scalar lockstep contract."""
    import pyarrow.parquet as pqt

    from similaritysearch_jl_ray.pipelines.media import (
        MediaDecoder,
        _fake_media,
        media_dataset,
    )

    t = pqt.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    blobs = {}
    for b in media_dataset(SF_DIR).iter_batches(batch_format="pyarrow"):
        for d, m in zip(b["doc_id"].to_pylist(), b["media"].to_pylist()):
            blobs[d] = m
    assert len(blobs) == t.num_rows
    for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        assert blobs[d] == _fake_media(int(d), txt), d

    dec = MediaDecoder()
    feats = dec(
        __import__("pyarrow").table(
            {
                "doc_id": list(blobs.keys()),
                "media": __import__("pyarrow").array(
                    list(blobs.values()), type=__import__("pyarrow").binary()
                ),
            }
        )
    )
    for i, d in enumerate(feats["doc_id"].to_pylist()):
        w, h, px = MediaDecoder._decode_fake(blobs[d])
        assert feats["width"][i].as_py() == w
        assert feats["height"][i].as_py() == h
        assert feats["mean_byte"][i].as_py() == round(float(px.mean()), 6), d
        assert feats["std_byte"][i].as_py() == round(float(px.std()), 6), d
