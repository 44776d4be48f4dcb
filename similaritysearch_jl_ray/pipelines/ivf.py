"""IVF (inverted-file) approximate nearest neighbor — the scale path
for embedding similarity search (task brief: "an IVF or LSH-bucketed
variant as the scale path"; brute force in pipelines/ann.py is the
baseline it is checked against).

Deterministic k-means: centers seeded by farthest-first traversal (the
reference's ``fft``, ``/root/reference/src/fft.jl:21-64`` — its actual
intended use per its docstring), then a fixed number of Lloyd
iterations. Search probes the ``nprobe`` nearest centroids' lists.

The coarse quantizer is broadcast; list assignment and probing are
``map_batches`` stages — the same partition-by-bucket shape that
shards the lists across nodes at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round6
from ..functions.topk import TopK
from .ann import _read_matrix, load_embeddings

__all__ = ["ivf_centroids", "knn_search_ivf"]


def ivf_centroids(mat: np.ndarray, n_centroids: int = 16, iters: int = 5) -> np.ndarray:
    """Deterministic k-means (fft seeding + Lloyd)."""
    n = len(mat)
    # fft seeding from row 0
    centers = [0]
    nnd = np.sqrt(((mat - mat[0]) ** 2).sum(axis=1))
    for _ in range(1, min(n_centroids, n)):
        cand = int(np.flatnonzero(nnd == nnd.max()).min())
        centers.append(cand)
        nnd = np.minimum(nnd, np.sqrt(((mat - mat[cand]) ** 2).sum(axis=1)))
    c = mat[centers].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = mat[m].mean(axis=0)
    return c


def knn_search_ivf(
    sf_dir: str,
    k: int = 8,
    n_queries: int = 20,
    n_centroids: int = 16,
    nprobe: int = 4,
):
    """Approximate top-k: probe the nprobe nearest centroid lists.

    Same output schema as ann.knn_search; recall measured against it in
    tests (the reference's gold-recall pattern,
    ``/root/reference/test/testsearchgraph.jl:22-26``).
    """
    import ray

    # coarse quantizer trained in a Ray TASK on a deterministic sample
    # (prefix by vec_id, pushdown read) — the driver never holds the
    # corpus; it gets back only the k×d centroid matrix
    @ray.remote
    def _train(d: str, nc: int, cap: int) -> np.ndarray:
        _, sample = _read_matrix(d, max_vec_id=cap)
        return ivf_centroids(sample, nc)

    cent = ray.get(_train.remote(sf_dir, n_centroids, 65536))
    qids, qmat = _read_matrix(sf_dir, max_vec_id=n_queries)  # pushdown read
    # per query: probe set of centroid ids
    qd = ((qmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]
    ref = ray.put((qids, qmat, probes, cent))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_probes, c = ray.get(ref)
        bids = batch["vec_id"].to_numpy().astype(np.int64)
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        # list assignment computed in-batch against the broadcast
        # quantizer — no per-id assignment table is ever built
        b_assign = ((bmat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        out_q, out_v, out_d = [], [], []
        for j, qid in enumerate(q_ids):
            m = np.isin(b_assign, q_probes[j])
            if not m.any():
                continue
            sub_ids, sub = bids[m], bmat[m]
            dj = np.sqrt(((sub - q_mat[j]) ** 2).sum(axis=1))
            order = np.lexsort((sub_ids, dj))[:k]
            out_q.append(np.full(len(order), qid, dtype=np.int64))
            out_v.append(sub_ids[order])
            out_d.append(dj[order])
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

    def merge(group: pa.Table) -> pa.Table:
        qid = int(group["query_id"][0].as_py())
        heap = TopK(k)
        for v, d in zip(group["vec_id"].to_numpy(), group["dist"].to_numpy()):
            heap.push(float(d), int(v))
        rows = heap.items()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), type=pa.int64()),
                "rank": pa.array(np.arange(1, len(rows) + 1), type=pa.int64()),
                "vec_id": pa.array([i for _, i in rows], type=pa.int64()),
                "dist": pa.array([round6(d) for d, _ in rows], type=pa.float64()),
            }
        )

    return (
        load_embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )
