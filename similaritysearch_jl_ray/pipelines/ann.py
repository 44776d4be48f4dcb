"""k-NN operator suite over the embeddings table — the reference's own
query surface re-expressed on Ray Data (SURVEY.md §2.6).

Distance conventions (all float64):

* ``l2``      — Euclidean, the reference's ``L2Distance``
  (``/root/reference/src/dist/vecs.jl:78-95``).
* ``cosine``  — ``1 − cos``, the reference's ``CosineDistance``
  (``src/dist/cos.jl:16-40``).

Top-k selection everywhere uses the ``KnnResult`` contract
(functions/topk.py): ascending (dist, vec_id), matching the
reference's queue + arrival-order tie rule.

Distribution pattern: the corpus matrix is broadcast once via
``ray.put`` and every batch does one numpy matmul against it —
per-partition partial top-k, then a per-query merge (the
``ParallelExhaustiveSearch`` shape, ``src/parallel-exhaustive.jl:44-62``,
with the spinlock-guarded shared queue replaced by a groupby merge).
At 100 TB the broadcast side is the *query* set and the corpus streams;
the same partial/merge shape holds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.topk import TopK
from ..functions.rounding import round6

__all__ = [
    "load_embeddings",
    "knn_search",
    "allknn",
    "closestpair",
    "fft",
    "distsample",
    "rerank",
    "hsp_filter",
    "permuted_knn_search",
    "neardup_embeddings",
]


def load_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _matrix(sf_dir: str):
    pdf = load_embeddings(sf_dir).to_pandas()
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _dists(bmat: np.ndarray, qmat: np.ndarray, metric: str) -> np.ndarray:
    """(batch, queries) distance matrix in float64."""
    if metric == "l2":
        # sqrt(|a|^2 + |q|^2 - 2 a·q) drifts vs the textbook sum of
        # squares; use the exact elementwise form the oracle uses.
        diff = bmat[:, None, :] - qmat[None, :, :]
        return np.sqrt((diff * diff).sum(axis=2))
    if metric == "cosine":
        bn = np.linalg.norm(bmat, axis=1)
        qn = np.linalg.norm(qmat, axis=1)
        return 1.0 - (bmat @ qmat.T) / np.outer(bn, qn)
    raise ValueError(metric)


def _topk_rows_batch(batch: pa.Table, qids, qmat, metric, k, exclude_self):
    """Per-batch partial top-k rows (query_id, vec_id, dist)."""
    bids = batch["vec_id"].to_numpy().astype(np.int64)
    bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
    d = _dists(bmat, qmat, metric)
    out_q, out_v, out_d = [], [], []
    for j, qid in enumerate(qids):
        dj = d[:, j]
        mask = bids != qid if exclude_self else np.ones(len(bids), bool)
        ids_m, dj_m = bids[mask], dj[mask]
        if len(ids_m) == 0:
            continue
        order = np.lexsort((ids_m, dj_m))[:k]
        out_q.append(np.full(len(order), qid, dtype=np.int64))
        out_v.append(ids_m[order])
        out_d.append(dj_m[order])
    if not out_q:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "dist": pa.array([], type=pa.float64())})
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "dist": pa.array(np.concatenate(out_d), type=pa.float64()),
        }
    )


def _merge_partials(group: pa.Table, k: int, id_col="query_id", out_id="vec_id") -> pa.Table:
    qid = int(group[id_col][0].as_py())
    heap = TopK(k)
    for v, d in zip(group[out_id].to_numpy(), group["dist"].to_numpy()):
        heap.push(float(d), int(v))
    rows = heap.items()  # ascending (dist, id)
    return pa.table(
        {
            id_col: pa.array([qid] * len(rows), type=pa.int64()),
            "rank": pa.array(np.arange(1, len(rows) + 1), type=pa.int64()),
            out_id: pa.array([i for _, i in rows], type=pa.int64()),
            "dist": pa.array([round6(d) for d, _ in rows], type=pa.float64()),
        }
    )


def knn_search(sf_dir: str, k: int = 8, n_queries: int = 20, metric: str = "l2"):
    """``searchbatch`` analog: top-k for the fixed query set
    (vec_id < n_queries), self-matches included."""
    import ray

    ids, mat = _matrix(sf_dir)
    qsel = ids < n_queries
    qids, qmat = ids[qsel], mat[qsel]
    ref = ray.put((qids, qmat))

    def partial(batch: pa.Table) -> pa.Table:
        q, m = ray.get(ref)
        return _topk_rows_batch(batch, q, m, metric, k, exclude_self=False)

    return (
        load_embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("query_id")
        .map_groups(lambda g: _merge_partials(g, k), batch_format="pyarrow")
    )


def allknn(sf_dir: str, k: int = 4, metric: str = "l2", _round: bool = True):
    """k-NN of every indexed item, self excluded
    (``/root/reference/src/allknn.jl:27-87``)."""
    import ray

    ids, mat = _matrix(sf_dir)
    ref = ray.put((ids, mat))

    def partial(batch: pa.Table) -> pa.Table:
        # here the *batch* rows are the queries; corpus is broadcast
        q_ids = batch["vec_id"].to_numpy().astype(np.int64)
        q_mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        all_ids, all_mat = ray.get(ref)
        d = _dists(all_mat, q_mat, metric)  # (corpus, batch)
        out_q, out_v, out_d = [], [], []
        for j, qid in enumerate(q_ids):
            dj = d[:, j]
            mask = all_ids != qid
            ids_m, dj_m = all_ids[mask], dj[mask]
            order = np.lexsort((ids_m, dj_m))[:k]
            out_q.append(np.full(len(order), qid, dtype=np.int64))
            out_v.append(ids_m[order])
            out_d.append(round6(dj_m[order]) if _round else dj_m[order])
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "rank": pa.array(
                    np.concatenate([np.arange(1, len(x) + 1) for x in out_v]), type=pa.int64()
                ),
                "nn_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "dist": pa.array(np.concatenate(out_d), type=pa.float64()),
            }
        )

    return load_embeddings(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=128)


def closestpair(sf_dir: str, metric: str = "l2"):
    """Global closest pair (``/root/reference/src/closestpair.jl:17-78``):
    per-item NN (self excluded) → global argmin, ties by (vec_a, vec_b).
    Selection happens at full precision; only the output dist rounds."""
    nn1 = allknn(sf_dir, k=1, metric=metric, _round=False).to_pandas()
    a = np.minimum(nn1["vec_id"], nn1["nn_id"])
    b = np.maximum(nn1["vec_id"], nn1["nn_id"])
    nn1 = nn1.assign(vec_a=a, vec_b=b).sort_values(["dist", "vec_a", "vec_b"])
    top = nn1.iloc[0]
    import pandas as pd

    return pd.DataFrame(
        {
            "vec_a": pd.array([int(top.vec_a)], dtype="int64"),
            "vec_b": pd.array([int(top.vec_b)], dtype="int64"),
            "dist": [round6(float(top.dist))],
        }
    )


def fft(sf_dir: str, k: int = 5, metric: str = "l2"):
    """Farthest-first traversal (``/root/reference/src/fft.jl:21-64``):
    k rounds of (update running NN-dist to centers, argmax). Seeded at
    the smallest vec_id (deterministic stand-in for the reference's
    random start). Returns (step, center_id, dmax) — dmax is the
    coverage radius *before* adding that round's center (0 for round 0)."""
    ids, mat = _matrix(sf_dir)
    centers = [int(ids[0])]
    rows = [(0, int(ids[0]), 0.0)]
    nnd = _dists(mat, mat[[0]], metric)[:, 0]
    for r in range(1, k):
        # argmax with min-vec_id tie-break
        m = nnd.max()
        cand = ids[nnd == m]
        cid = int(cand.min())
        rows.append((r, cid, round6(float(m))))
        centers.append(cid)
        cidx = int(np.flatnonzero(ids == cid)[0])
        nnd = np.minimum(nnd, _dists(mat, mat[[cidx]], metric)[:, 0])
    import pandas as pd

    return pd.DataFrame(
        {
            "step": pd.array([r for r, _, _ in rows], dtype="int64"),
            "center_id": pd.array([c for _, c, _ in rows], dtype="int64"),
            "dmax": [d for _, _, d in rows],
        }
    )


def distsample(sf_dir: str, metric: str = "l2"):
    """Sampled pairwise distance quantiles
    (``/root/reference/src/distsample.jl:17-58``), deterministic pair
    formula j = (i*31+7) mod n (skip i==j), quantiles 0.1/0.5/0.9."""
    ids, mat = _matrix(sf_dir)
    n = len(ids)
    i = np.arange(n)
    j = (i * 31 + 7) % n
    keep = i != j
    i, j = i[keep], j[keep]
    d = np.sqrt(((mat[i] - mat[j]) ** 2).sum(axis=1)) if metric == "l2" else None
    qs = [0.1, 0.5, 0.9]
    vals = np.quantile(d, qs)
    import pandas as pd

    return pd.DataFrame({"q": qs, "value": round6(vals)})


def rerank(sf_dir: str, k_candidates: int = 20, k: int = 8, n_queries: int = 10):
    """Two-stage search (``/root/reference/src/rerank.jl:5-32``):
    cosine-distance candidate top-k', exact-L2 rerank to top-k."""
    import ray

    ids, mat = _matrix(sf_dir)
    qsel = ids < n_queries
    qids, qmat = ids[qsel], mat[qsel]
    ref = ray.put((ids, mat, qids, qmat))

    def partial(batch: pa.Table) -> pa.Table:
        all_ids, all_mat, q_ids, q_mat = ray.get(ref)
        return _topk_rows_batch(batch, q_ids, q_mat, "cosine", k_candidates, exclude_self=False)

    cands = (
        load_embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("query_id")
        .map_groups(lambda g: _merge_partials(g, k_candidates), batch_format="pyarrow")
    )

    def rescore(group: pa.Table) -> pa.Table:
        all_ids, all_mat, q_ids, q_mat = ray.get(ref)
        qid = int(group["query_id"][0].as_py())
        cand_ids = group["vec_id"].to_numpy().astype(np.int64)
        qrow = q_mat[int(np.flatnonzero(q_ids == qid)[0])]
        crows = all_mat[np.searchsorted(all_ids, cand_ids)]
        d = np.sqrt(((crows - qrow) ** 2).sum(axis=1))
        order = np.lexsort((cand_ids, d))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), type=pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
                "vec_id": pa.array(cand_ids[order], type=pa.int64()),
                "dist": pa.array(round6(d[order]), type=pa.float64()),
            }
        )

    return cands.groupby("query_id").map_groups(rescore, batch_format="pyarrow")


def hsp_filter(sf_dir: str, k: int = 16, n_queries: int = 10):
    """Half-space partition post-filter of each query's knn list
    (``/root/reference/src/hsp.jl:42-63``): scan neighbors ascending by
    dist; drop p if an already-kept c satisfies dist(p,c) < dist(p,q)."""
    import ray

    ids, mat = _matrix(sf_dir)
    knn = knn_search(sf_dir, k=k, n_queries=n_queries).to_pandas()
    by_id = {int(i): mat[int(np.flatnonzero(ids == i)[0])] for i in knn["vec_id"].unique()}
    rows = []
    for qid, g in knn.groupby("query_id"):
        q = mat[int(np.flatnonzero(ids == qid)[0])]
        kept: list[int] = []
        for _, row in g.sort_values("rank").iterrows():
            p = by_id[int(row.vec_id)]
            dpq = np.sqrt(((p - q) ** 2).sum())
            occluded = any(
                np.sqrt(((p - by_id[c]) ** 2).sum()) < dpq for c in kept
            )
            if not occluded:
                kept.append(int(row.vec_id))
        rows += [(int(qid), v) for v in kept]
    import pandas as pd

    return pd.DataFrame(
        {
            "query_id": pd.array([q for q, _ in rows], dtype="int64"),
            "vec_id": pd.array([v for _, v in rows], dtype="int64"),
        }
    )


def permuted_knn_search(sf_dir: str, k: int = 8, n_queries: int = 20, seed: int = 0x5EED):
    """``PermutedSearchIndex`` analog (``/root/reference/src/permindex.jl:10-32``):
    the database is stored under a fixed id permutation; search runs
    entirely in permuted-id space (including its tie-breaks, exactly
    as the reference's wrapper does) and the emit path maps hits back
    through ``π⁻¹``. Same geometry ⇒ same hit sets and distances as
    the direct search (rank order may differ only on exact dist ties).
    """
    import ray
    import pandas as pd

    ids, mat = _matrix(sf_dir)
    n = len(ids)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.int64)   # internal id of external e = perm[e]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    qsel = ids < n_queries
    qids, qmat = ids[qsel], mat[qsel]
    ref = ray.put((qids, qmat, perm))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, p = ray.get(ref)
        bids = batch["vec_id"].to_numpy().astype(np.int64)
        internal = pa.table(
            {"vec_id": pa.array(p[bids], type=pa.int64()), "embedding": batch["embedding"]}
        )
        return _topk_rows_batch(internal, q_ids, q_mat, "l2", k, exclude_self=False)

    res = (
        load_embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("query_id")
        .map_groups(lambda g: _merge_partials(g, k), batch_format="pyarrow")
        .to_pandas()
    )
    res["vec_id"] = pd.array(inv[res["vec_id"].to_numpy()], dtype="int64")
    return res


def neardup_embeddings(sf_dir: str, eps: float = 1.2, n_projections: int = 8):
    """ϵ-dedup with the reference ``neardup`` *contract*
    (``/root/reference/src/neardup.jl:9-17``): every dropped vector has
    a kept center within ϵ. Distributed deviation (documented,
    SURVEY.md §3.3): vectors are bucketed by sign-LSH of fixed random
    projections; center accretion runs per bucket in vec_id order, so
    extra centers may be kept vs the sequential reference, but the
    cover property holds globally. Returns (vec_id, center_id, dist)."""
    import ray

    ids, mat = _matrix(sf_dir)
    rng = np.random.default_rng(0xFEED)
    proj = rng.standard_normal((mat.shape[1], n_projections))
    buckets = (mat @ proj > 0) @ (1 << np.arange(n_projections))
    import ray.data as rd

    def accrete(group: pa.Table) -> pa.Table:
        g_ids = group["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(g_ids)
        g_ids = g_ids[order]
        g_mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)[order]
        centers_idx: list[int] = []
        out_center, out_dist = [], []
        for i in range(len(g_ids)):
            if centers_idx:
                d = np.sqrt(((g_mat[centers_idx] - g_mat[i]) ** 2).sum(axis=1))
                b = int(np.argmin(d))
                if d[b] <= eps:
                    out_center.append(int(g_ids[centers_idx[b]]))
                    out_dist.append(round6(float(d[b])))
                    continue
            centers_idx.append(i)
            out_center.append(int(g_ids[i]))
            out_dist.append(0.0)
        return pa.table(
            {
                "vec_id": pa.array(g_ids, type=pa.int64()),
                "center_id": pa.array(out_center, type=pa.int64()),
                "dist": pa.array(out_dist, type=pa.float64()),
            }
        )

    ds = load_embeddings(sf_dir)
    bucket_of = dict(zip(ids.tolist(), np.asarray(buckets).astype(np.int64).tolist()))
    bref = ray.put(bucket_of)

    def add_bucket(batch: pa.Table) -> pa.Table:
        bo = ray.get(bref)
        return batch.append_column(
            "bucket", pa.array([bo[int(v)] for v in batch["vec_id"].to_pylist()], type=pa.int64())
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(accrete, batch_format="pyarrow")
    )
