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

__all__ = [
    "ivf_centroids",
    "knn_search_ivf",
    "pq_train",
    "pq_encode",
    "pq_encode_embeddings",
    "knn_search_ivfpq",
]


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


# ---------------------------------------------------------------------------
def pq_train(mat: np.ndarray, m: int = 8, n_codes: int = 16, iters: int = 5) -> np.ndarray:
    """Product-quantization codebooks: the vector splits into ``m``
    subspaces, each clustered with the same deterministic k-means
    (fft seeding + Lloyd). Returns (m, n_codes, d/m)."""
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    return np.stack(
        [ivf_centroids(mat[:, j * ds : (j + 1) * ds], n_codes, iters) for j in range(m)]
    )


def pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes — per subspace, the nearest codebook row."""
    m, _, ds = books.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * ds : (j + 1) * ds]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_encode_embeddings(sf_dir: str, m: int = 8, n_codes: int = 16):
    """(vec_id, code: list<uint8>) — the stored PQ column a 100 TB
    deployment keeps INSTEAD of raw floats on the ANN hot path
    (dim·4 bytes → m bytes per vector; here 64·4 → 8, a 32× cut).
    Codebooks train in a Ray task on a bounded pushdown sample and
    broadcast; encoding is an in-batch argmin per subspace."""
    import ray

    @ray.remote
    def _train(d: str, m: int, nc: int, cap: int) -> np.ndarray:
        _, sample = _read_matrix(d, max_vec_id=cap)
        return pq_train(sample, m=m, n_codes=nc)

    # the task's ObjectRef IS the broadcast — no driver round-trip
    ref = _train.remote(sf_dir, m, n_codes, 65536)

    def encode(batch: pa.Table) -> pa.Table:
        import ray as _ray

        books = _ray.get(ref)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        codes = pq_encode(mat, books)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "code": pa.array(list(codes), type=pa.list_(pa.uint8())),
            }
        )

    return load_embeddings(sf_dir).map_batches(encode, batch_format="pyarrow")


def knn_search_ivfpq(
    sf_dir: str,
    k: int = 8,
    n_queries: int = 20,
    n_centroids: int = 16,
    nprobe: int = 8,
    m: int = 8,
    n_codes: int = 32,
    refine: int = 128,
):
    """IVF-PQ approximate top-k with exact final refine — the memory-
    bounded 100 TB ANN path: coarse quantizer prunes to ``nprobe``
    lists, PQ asymmetric-distance (per-query m×n_codes lookup tables,
    code-indexed gathers) ranks the survivors from codes alone, the
    global top-``refine`` candidates per query are then exact-refined
    against floats fetched by ONE pushdown ``vec_id IN`` read (the
    broadcast-small rerank shape) — so reported distances are TRUE
    distances and only candidate selection is approximate. Recall vs
    the brute-force gold is pinned in tests."""
    import ray

    @ray.remote
    def _train(d: str, nc: int, m: int, codes: int, cap: int):
        _, sample = _read_matrix(d, max_vec_id=cap)
        return ivf_centroids(sample, nc), pq_train(sample, m=m, n_codes=codes)

    cent, books = ray.get(_train.remote(sf_dir, n_centroids, m, n_codes, 65536))
    qids, qmat = _read_matrix(sf_dir, max_vec_id=n_queries)
    qd = ((qmat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]
    ds = qmat.shape[1] // m
    # per-query ADC lookup tables: lut[q, j, c] = ||q_sub_j - book_j[c]||^2
    lut = np.empty((len(qids), m, n_codes))
    for j in range(m):
        qsub = qmat[:, j * ds : (j + 1) * ds]
        lut[:, j, :] = ((qsub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
    ref = ray.put((qids, probes, cent, books, lut))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        q_ids, q_probes, c, bks, tables = _ray.get(ref)
        bids = batch["vec_id"].to_numpy().astype(np.int64)
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        b_assign = ((bmat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        codes = pq_encode(bmat, bks)  # at scale: read from the stored code column
        out_q, out_v, out_d = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = np.isin(b_assign, q_probes[qi])
            if not mask.any():
                continue
            sub_codes = codes[mask]
            adc = tables[qi][np.arange(m)[None, :], sub_codes].sum(axis=1)
            sub_ids = bids[mask]
            order = np.lexsort((sub_ids, adc))[:refine]
            out_q.append(np.full(len(order), qid, dtype=np.int64))
            out_v.append(sub_ids[order])
            out_d.append(adc[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "adc": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "adc": pa.array(np.concatenate(out_d), type=pa.float64()),
            }
        )

    def keep_refine(group: pa.Table) -> pa.Table:
        order = np.lexsort(
            (group["vec_id"].to_numpy(), group["adc"].to_numpy())
        )[:refine]
        return group.take(order)

    cand = (
        load_embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("query_id")
        .map_groups(keep_refine, batch_format="pyarrow")
    ).to_pandas()  # tiny: queries × refine rows

    # exact refine: ONE pushdown read of the candidate floats
    import pyarrow.dataset as pads

    cand_ids = sorted(set(int(v) for v in cand["vec_id"]))
    t = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(cand_ids),
    )
    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    o = np.argsort(ids)
    ids, mat = ids[o], mat[o]
    out = {"query_id": [], "rank": [], "vec_id": [], "dist": []}
    for qi, qid in enumerate(qids):
        g = cand[cand["query_id"] == qid]
        if not len(g):
            continue
        v = g["vec_id"].to_numpy().astype(np.int64)
        at = np.searchsorted(ids, v)
        d = np.sqrt(((mat[at] - qmat[qi]) ** 2).sum(axis=1))
        order = np.lexsort((v, d))[:k]
        for r, j in enumerate(order, start=1):
            out["query_id"].append(int(qid))
            out["rank"].append(r)
            out["vec_id"].append(int(v[j]))
            out["dist"].append(round6(float(d[j])))
    import pandas as pd

    return pd.DataFrame(out).astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64", "dist": "float64"}
    )
