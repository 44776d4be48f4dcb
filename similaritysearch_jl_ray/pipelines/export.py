"""Index export: the built index dumped back to a long relational
table — the engine's ``sparse(adj)`` (the reference exports its
adjacency as a SparseArrays matrix, ``/root/reference/src/adj/Adj.jl:108-127``;
here the "matrix" is the (term × doc) postings relation).

One row per posting: ``(term, doc_id, tf, dl)``. Useful for debugging,
interop, and — crucially — as an INDEX-LEVEL oracle check: DuckDB can
recompute the same relation straight from the corpus, so the driver
verifies the salted shuffle + varint codec + merge end to end without
going through a query.

Streams: one ``map_batches`` over the segment parquet rows, each run
decoding to its postings — no driver materialization, output is a
Dataset (partition-parallel by index part).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..state.segment import EncodedPostings, decode_all

__all__ = ["index_export"]


def index_export(index_dir: str):
    """Ray Dataset of (term, doc_id, tf, dl) across base + deltas."""
    import ray.data as rd

    dirs = [os.path.join(index_dir, "postings")]
    for name in sorted(os.listdir(index_dir)):
        if name.startswith("delta="):
            dirs.append(os.path.join(index_dir, name, "postings"))

    def decode_runs(batch: pa.Table) -> pa.Table:
        tbl = batch.combine_chunks()
        terms, docs, tfs_l, dls_l = [], [], [], []
        for i in range(tbl.num_rows):
            ids, tfs, dls = decode_all(EncodedPostings.from_arrow_row(tbl, i))
            t = tbl.column("term")[i].as_py()
            terms.extend([t] * len(ids))
            docs.append(ids)
            tfs_l.append(tfs)
            dls_l.append(dls)
        if not docs:
            return pa.table(
                {"term": pa.array([], type=pa.string()),
                 "doc_id": pa.array([], type=pa.int64()),
                 "tf": pa.array([], type=pa.int64()),
                 "dl": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "doc_id": pa.array(np.concatenate(docs), type=pa.int64()),
                "tf": pa.array(np.concatenate(tfs_l), type=pa.int64()),
                "dl": pa.array(np.concatenate(dls_l), type=pa.int64()),
            }
        )

    return rd.read_parquet(dirs).map_batches(decode_runs, batch_format="pyarrow")
