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

Distribution pattern (none of these paths materializes the corpus on
the driver):

* **query sets are filtered reads** — ``vec_id < n_queries`` pushes
  down into the parquet scan (row-group skip), so only the query rows
  ever reach the driver; they are broadcast via ``ray.put`` and the
  corpus STREAMS through ``map_batches`` (partial top-k per batch,
  per-query merge — the ``ParallelExhaustiveSearch`` shape,
  ``src/parallel-exhaustive.jl:44-62``, with the spinlock-guarded
  shared queue replaced by a groupby merge). This is the 100 TB shape:
  broadcast the small side, stream the big side.
* **ops that need the whole corpus resident** (allknn's inner side,
  closestpair via allknn) load it inside a Ray TASK whose return value
  lives in the object store — workers map it zero-copy; the driver
  holds only the ObjectRef. The exact broadcast-corpus mode works to
  the memory bound; the bucketed paths (``neardup_embeddings``'s LSH
  accretion, ivf.py) are the beyond-memory story.
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


def _read_matrix(sf_dir: str, max_vec_id: int | None = None):
    """(ids, mat) sorted by vec_id, via pyarrow with predicate pushdown
    when ``max_vec_id`` bounds the read (query-set selection)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet")
    flt = (pads.field("vec_id") < max_vec_id) if max_vec_id is not None else None
    t = ds.to_table(columns=["vec_id", "embedding"], filter=flt)
    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


_CORPUS_REFS: dict[tuple, object] = {}


def _corpus_ref(sf_dir: str):
    """ObjectRef of the full (ids, mat) — loaded INSIDE a Ray task so
    the driver never materializes the corpus; workers read the arrays
    zero-copy out of the shared object store. Cached per driver per
    file STATE (mtime/size fingerprint, mirroring query._index_
    fingerprint): rewriting embeddings.parquet in place invalidates."""
    import os

    import ray

    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = (sf_dir, int(st.st_mtime_ns), int(st.st_size))
    ref = _CORPUS_REFS.get(key)
    if ref is None:
        for k in [k for k in _CORPUS_REFS if k[0] == sf_dir]:
            del _CORPUS_REFS[k]  # let plasma reclaim the stale corpus

        @ray.remote
        def _load(d: str):
            return _read_matrix(d)

        ref = _CORPUS_REFS[key] = _load.remote(sf_dir)
    return ref


def _query_ref(sf_dir: str, n_queries: int):
    """Broadcast ref of just the query rows (filtered read)."""
    import ray

    qids, qmat = _read_matrix(sf_dir, max_vec_id=n_queries)
    return ray.put((qids, qmat))


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
    (vec_id < n_queries), self-matches included. Queries come from a
    filtered (pushdown) read and are broadcast; the corpus streams."""
    import ray

    ref = _query_ref(sf_dir, n_queries)

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
    (``/root/reference/src/allknn.jl:27-87``). The query side streams
    as batches; the corpus side is loaded by a Ray task into the
    object store (zero-copy per worker, never on the driver) — exact
    to the memory bound; ``neardup_embeddings``/ivf are the bucketed
    beyond-memory paths."""
    import ray

    ref = _corpus_ref(sf_dir)

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
    The argmin is a streaming reduction — each batch emits its single
    best row, so the driver sees one row per block, never the full NN
    table. Selection happens at full precision; only the output
    dist rounds."""

    def batch_min(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_a": pa.array([], type=pa.int64()),
                             "vec_b": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.float64())})
        v = batch["vec_id"].to_numpy()
        n = batch["nn_id"].to_numpy()
        d = batch["dist"].to_numpy()
        a = np.minimum(v, n)
        b = np.maximum(v, n)
        j = int(np.lexsort((b, a, d))[0])
        return pa.table(
            {
                "vec_a": pa.array([int(a[j])], type=pa.int64()),
                "vec_b": pa.array([int(b[j])], type=pa.int64()),
                "dist": pa.array([float(d[j])], type=pa.float64()),
            }
        )

    partials = (
        allknn(sf_dir, k=1, metric=metric, _round=False)
        .map_batches(batch_min, batch_format="pyarrow")
        .to_pandas()  # one row per block — tiny
    )
    partials = partials.sort_values(["dist", "vec_a", "vec_b"])
    top = partials.iloc[0]
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
    random start). Distributed: each round streams the corpus through
    ``map_batches`` against the broadcast center list (a k-row
    matrix), emitting one (max nn-dist, argmax id, center row) row per
    batch; the driver reduces block partials only — the corpus never
    materializes centrally. Returns (step, center_id, dmax) — dmax is
    the coverage radius *before* adding that round's center (0 for
    round 0)."""
    import ray
    import pyarrow.dataset as pads

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet")
    seed_id = int(dset.to_table(columns=["vec_id"])["vec_id"].to_numpy().min())

    def _center_matrix(cids: list[int]) -> np.ndarray:
        # ≤ k rows via pushdown — the legitimately-small side
        t = dset.to_table(
            columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(cids)
        )
        got = {int(i): np.asarray(e, dtype=np.float64)
               for i, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())}
        return np.stack([got[c] for c in cids])

    rows = [(0, seed_id, 0.0)]
    centers_ids = [seed_id]
    emb = load_embeddings(sf_dir)

    for r in range(1, k):
        cref = ray.put(_center_matrix(centers_ids))

        def partial(batch: pa.Table) -> pa.Table:
            cmat = ray.get(cref)
            bids = batch["vec_id"].to_numpy().astype(np.int64)
            bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            nnd = _dists(bmat, cmat, metric).min(axis=1)
            j = int(np.lexsort((bids, -nnd))[0])  # max nnd, min id on ties
            return pa.table(
                {
                    "dmax": pa.array([float(nnd[j])], type=pa.float64()),
                    "arg_id": pa.array([int(bids[j])], type=pa.int64()),
                }
            )

        part = emb.map_batches(partial, batch_format="pyarrow", batch_size=256).to_pandas()
        dmax = float(part["dmax"].max())
        cid = int(part.loc[part["dmax"] == dmax, "arg_id"].min())
        rows.append((r, cid, round6(dmax)))
        centers_ids.append(cid)
    import pandas as pd

    return pd.DataFrame(
        {
            "step": pd.array([s for s, _, _ in rows], dtype="int64"),
            "center_id": pd.array([c for _, c, _ in rows], dtype="int64"),
            "dmax": [d for _, _, d in rows],
        }
    )


def distsample(sf_dir: str, metric: str = "l2"):
    """Sampled pairwise distance quantiles
    (``/root/reference/src/distsample.jl:17-58``), deterministic pair
    formula j = (i*31+7) mod n (skip i==j), quantiles 0.1/0.5/0.9.

    The i-side streams as batches; the j-side rows are gathered from
    the task-built corpus ref (zero-copy object store). The driver
    collects only the distance SAMPLE (by construction bounded — the
    whole point of the operator) for the exact quantile."""
    import ray
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet").count_rows()
    ref = _corpus_ref(sf_dir)

    def pair_dists(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        i = batch["vec_id"].to_numpy().astype(np.int64)
        j = (i * 31 + 7) % n
        keep = i != j
        i, j = i[keep], j[keep]
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)[keep]
        # j is a vec_id VALUE: with sparse/non-dense id spaces it may not
        # exist — drop such pairs (the oracle's JOIN on b.vec_id = j does
        # the same) instead of gathering whatever searchsorted lands on
        pos = np.searchsorted(all_ids, j)
        valid = (pos < len(all_ids)) & (all_ids[np.minimum(pos, len(all_ids) - 1)] == j)
        if not valid.all():
            i, pos, bmat = i[valid], pos[valid], bmat[valid]
        jmat = all_mat[pos]
        d = np.sqrt(((bmat - jmat) ** 2).sum(axis=1))
        return pa.table({"i": pa.array(i, type=pa.int64()),
                         "dist": pa.array(d, type=pa.float64())})

    part = (
        load_embeddings(sf_dir)
        .map_batches(pair_dists, batch_format="pyarrow", batch_size=256)
        .to_pandas()
        .sort_values("i")  # deterministic sample order
    )
    qs = [0.1, 0.5, 0.9]
    vals = np.quantile(part["dist"].to_numpy(), qs)
    import pandas as pd

    return pd.DataFrame({"q": qs, "value": round6(vals)})


def rerank(sf_dir: str, k_candidates: int = 20, k: int = 8, n_queries: int = 10):
    """Two-stage search (``/root/reference/src/rerank.jl:5-32``):
    cosine-distance candidate top-k', exact-L2 rerank to top-k.
    Queries are a broadcast filtered read; the corpus streams for the
    candidate stage; the rescore stage gathers candidate rows from the
    task-built corpus ref (zero-copy, never on the driver)."""
    import ray

    qref = _query_ref(sf_dir, n_queries)
    cref = _corpus_ref(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(qref)
        return _topk_rows_batch(batch, q_ids, q_mat, "cosine", k_candidates, exclude_self=False)

    cands = (
        load_embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=128)
        .groupby("query_id")
        .map_groups(lambda g: _merge_partials(g, k_candidates), batch_format="pyarrow")
    )

    def rescore(group: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(qref)
        all_ids, all_mat = ray.get(cref)
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
    dist; drop p if an already-kept c satisfies dist(p,c) < dist(p,q).
    Driver-side over the SMALL result set only: the needed embedding
    rows (queries + their neighbors) come from one pushdown read."""
    import pyarrow.dataset as pads

    knn = knn_search(sf_dir, k=k, n_queries=n_queries).to_pandas()
    need = sorted(set(knn["vec_id"].astype(int)) | set(knn["query_id"].astype(int)))
    t = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id").isin(need)
    )
    by_id = {
        int(i): np.asarray(e, dtype=np.float64)
        for i, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    rows = []
    for qid, g in knn.groupby("query_id"):
        q = by_id[int(qid)]
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
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/embeddings.parquet", format="parquet").count_rows()
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.int64)   # internal id of external e = perm[e]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    qids, qmat = _read_matrix(sf_dir, max_vec_id=n_queries)  # pushdown read
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

    rng = np.random.default_rng(0xFEED)

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
    # projection matrix derived from the schema's dim (one-row peek),
    # broadcast; each batch computes its own sign-LSH buckets — no
    # per-id lookup table anywhere
    dim = len(ds.take(1)[0]["embedding"])
    proj = rng.standard_normal((dim, n_projections))
    pref = ray.put(proj)

    def add_bucket(batch: pa.Table) -> pa.Table:
        pj = ray.get(pref)
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        buckets = ((bmat @ pj > 0) @ (1 << np.arange(n_projections))).astype(np.int64)
        return batch.append_column("bucket", pa.array(buckets, type=pa.int64()))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(accrete, batch_format="pyarrow")
    )
