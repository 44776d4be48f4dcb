"""Dataset-level sampling and set operations (SURVEY.md §2.7 rows
"sampling" and "union/intersect/except").

The reference samples its database with ``rand`` → ``SubDatabase``
(``/root/reference/src/db/db.jl:77``) and intersects result id lists
in its recall scorer (``/root/reference/src/perf.jl:10-12``). Here
both become DATASET-level operators instead of batch-local numpy:

* :func:`sample_documents` — systematic sample (``doc_id % every ==
  0``): deterministic across runs/partitionings, SQL-oracle-able, and
  a pushdown-friendly predicate. :func:`random_sample_documents`
  wraps ``Dataset.random_sample`` for the probabilistic variant.
* :func:`dataset_set_flags` — tag-union-groupby set algebra between
  two keyed datasets: one tiny shuffle keyed by the id, emitting each
  key's membership flags; intersect/union/except are projections of
  it. This is the co-partitioned shape that scales (no broadcast of
  either side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


__all__ = [
    "sample_documents",
    "random_sample_documents",
    "dataset_set_flags",
    "docs_setops",
]


def sample_documents(sf_dir: str, every: int = 20):
    """Systematic sample: rows with doc_id % every == 0."""
    import ray.data as rd

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return batch.filter(pa.array(ids % every == 0))

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        pick, batch_format="pyarrow"
    )


def random_sample_documents(sf_dir: str, fraction: float = 0.1, seed: int = 7):
    """Probabilistic sample via the Dataset-native operator — the
    ``rand() → SubDatabase`` analog (db.jl:77)."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).random_sample(
        fraction, seed=seed
    )


def dataset_set_flags(a, b, key: str):
    """Tag both datasets, union, group by ``key``: one row per distinct
    key with (in_a, in_b) booleans. intersect = in_a & in_b, except =
    in_a & ~in_b, union = all rows.

    The group reduce is Ray's NATIVE Max aggregate over 0/1 membership
    bits (vectorized partial aggregation per block before the
    shuffle) — the old one-row-per-group ``map_groups`` callable was
    the per-group-Python shape that stalls at millions of keys."""

    def tag(which: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    key: batch[key],
                    "bit_a": pa.array(
                        np.full(n, 1 if which == "a" else 0, dtype=np.int64)
                    ),
                    "bit_b": pa.array(
                        np.full(n, 1 if which == "b" else 0, dtype=np.int64)
                    ),
                }
            )

        return f

    def to_bool(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                key: batch[key],
                "in_a": pc.greater(batch["in_a"].cast(pa.int64()), 0),
                "in_b": pc.greater(batch["in_b"].cast(pa.int64()), 0),
            }
        )

    from ray.data.aggregate import Max

    u = a.map_batches(tag("a"), batch_format="pyarrow").union(
        b.map_batches(tag("b"), batch_format="pyarrow")
    )
    return (
        u.groupby(key)
        .aggregate(Max("bit_a", alias_name="in_a"), Max("bit_b", alias_name="in_b"))
        .map_batches(to_bool, batch_format="pyarrow")
    )


def docs_setops(sf_dir: str, lang: str = "en", token: str = "data"):
    """(op, doc_id) rows for the three set ops between A = docs with
    ``lang`` and B = docs containing ``token`` — the driver-facing
    demonstration of :func:`dataset_set_flags`."""
    import ray.data as rd

    a = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]).filter(
        expr=f"lang == '{lang}'"
    ).select_columns(["doc_id"])

    def has_token(batch: pa.Table) -> pa.Table:
        # vectorized membership: a doc contains the token iff one of
        # its (doc, term) rows equals it (batch_token_counts rows are
        # distinct per doc) — no per-doc Python tokenize
        from ..functions.text import batch_token_counts

        doc_idx, terms, _, _ = batch_token_counts(batch["text"])
        keep = np.zeros(batch.num_rows, dtype=bool)
        keep[doc_idx[terms == token]] = True
        return pa.table({"doc_id": batch["doc_id"].filter(pa.array(keep))})

    b = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        has_token, batch_format="pyarrow"
    )

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        in_a = batch["in_a"].to_numpy(zero_copy_only=False)
        in_b = batch["in_b"].to_numpy(zero_copy_only=False)
        ops, out = [], []
        for op, mask in (
            ("union", np.ones(len(ids), dtype=bool)),
            ("intersect", in_a & in_b),
            ("except", in_a & ~in_b),
        ):
            ops.extend([op] * int(mask.sum()))
            out.append(ids[mask])
        return pa.table(
            {
                "op": pa.array(ops),
                "doc_id": pa.array(np.concatenate(out) if out else [], type=pa.int64()),
            }
        )

    return dataset_set_flags(a, b, "doc_id").map_batches(emit, batch_format="pyarrow")


def domain_balance(sf_dir: str, cap: int = 15):
    """(doc_id, source) — at most ``cap`` docs per source, lowest
    doc_id first: the deterministic domain-balancing step of a
    training-data mixture (down-weights over-represented sources).
    One group task per source; at scale sources are the natural
    partition key and the cap applies within each partition without
    any global coordination."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def head(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        order = np.argsort(ids)[:cap]
        return group.take(order)

    # in-batch combiner: each block keeps at most cap rows per source
    # BEFORE the shuffle, so a hot source's group holds ≤ cap·n_blocks
    # rows instead of the whole domain — the top-k-by-group pre-agg
    def precap(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        src = batch["source"].combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        order = np.lexsort((ids, codes))
        c_s = codes[order]
        seq = np.arange(len(c_s)) - np.maximum.accumulate(
            np.where(np.r_[True, c_s[1:] != c_s[:-1]], np.arange(len(c_s)), 0)
        )
        return batch.take(order[seq < cap])

    return (
        docs.map_batches(precap, batch_format="pyarrow")
        .groupby("source")
        .map_groups(head, batch_format="pyarrow")
    )
