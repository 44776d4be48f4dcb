"""Sequence packing: fill token-budget bins with documents — the
context-window packing step of an LLM training-data pipeline.

Next-fit in doc_id order (the deterministic, oracle-checkable policy:
a doc opens a new bin when it would overflow the current one; an
over-budget doc gets a bin of its own). Packing is sequential by
nature, so the distributed shape packs WITHIN deterministic doc-id
shards — each shard is one group task, bins never span shards (the
boundary waste every real sharded packer accepts), and the bin key is
(shard, local bin). The DuckDB oracle replays the same recursion with
a recursive CTE, so the engine's bin assignment is value-checked, not
just shape-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import batch_token_counts

__all__ = ["pack_documents"]


def pack_documents(sf_dir: str, budget: int = 512, shard_size: int = 1000):
    """(doc_id, shard, bin_id, tokens, fill) — next-fit packing of the
    corpus into ``budget``-token bins per ``shard_size`` doc-id shard.
    ``fill`` is the bin's running total AFTER this doc (the oracle
    checks it too — it pins the exact packing order)."""
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def count(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        doclens = batch_token_counts(batch["text"])[3]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shard": pa.array(ids // shard_size, type=pa.int64()),
                "tokens": pa.array(np.asarray(doclens, dtype=np.int64), type=pa.int64()),
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        order = np.argsort(group["doc_id"].to_numpy())
        ids = group["doc_id"].to_numpy()[order]
        toks = group["tokens"].to_numpy()[order]
        shard = int(group["shard"][0].as_py())
        bins = np.empty(len(ids), dtype=np.int64)
        fills = np.empty(len(ids), dtype=np.int64)
        b, fill = 0, 0
        for i, t in enumerate(toks.tolist()):
            if fill and fill + t > budget:
                b += 1
                fill = 0
            fill += t
            bins[i] = b
            fills[i] = fill
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shard": pa.array(np.full(len(ids), shard), type=pa.int64()),
                "bin_id": pa.array(bins, type=pa.int64()),
                "tokens": pa.array(toks, type=pa.int64()),
                "fill": pa.array(fills, type=pa.int64()),
            }
        )

    return (
        docs.map_batches(count, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
    )
