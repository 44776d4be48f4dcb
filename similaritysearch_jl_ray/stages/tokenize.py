"""Stateless map_batches stages: html → text → (term, doc_id, tf, dl).

This is the engine's analog of the reference's "objects arrive parsed"
ingest (SURVEY.md §2.2 "text→object parse" row — new functionality).
The html column is dropped inside the batch function (project early:
wide binary rows must not travel past extraction, SURVEY.md §7).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import batch_extract_text, batch_extract_title, batch_token_counts

__all__ = ["extract_batch", "extract_title_batch", "tokenize_batch", "tokenize_batch_positions"]


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch → (doc_id, url, lang, text) with text re-extracted
    from html (the byte-identical invariant path — we never trust the
    ride-along text column). Arrow ``extract_regex`` end to end, no
    per-row Python."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": batch["url"],
            "lang": batch["lang"],
            "text": batch_extract_text(batch["html"]),
        }
    )


def extract_title_batch(batch: pa.Table) -> pa.Table:
    """pages batch → (doc_id, url, lang, text) where text is the TITLE
    field — feeds a per-field index build (multi-field serving)."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": batch["url"],
            "lang": batch["lang"],
            "text": batch_extract_title(batch["html"]),
        }
    )


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """extracted batch → posting triples (term, doc_id, tf, dl).

    Per-(doc, term) tf aggregation happens here (SPIMI's in-mapper
    combine) so the downstream shuffle moves one row per (doc, term),
    never one per token occurrence.
    """
    doc_idx, terms, tfs, doclens = batch_token_counts(batch["text"])
    doc_ids = batch["doc_id"].to_numpy()
    return pa.table(
        {
            "term": pa.array(terms.tolist(), type=pa.string()),
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.int64()),
            "tf": pa.array(tfs, type=pa.int64()),
            "dl": pa.array(doclens[doc_idx], type=pa.int64()),
        }
    )


def tokenize_batch_positions(batch: pa.Table) -> pa.Table:
    """Positional variant: posting triples plus a ``pos`` list column —
    each row's tf token positions (0-based, ascending), the feed for
    the layout-v4 positions sidecar. The flat positions ride as one
    zero-copy ListArray (offsets = cumsum(tf)), never per-row Python
    lists."""
    import numpy as np

    doc_idx, terms, tfs, doclens, flat_pos = batch_token_counts(
        batch["text"], with_positions=True
    )
    doc_ids = batch["doc_id"].to_numpy()
    offsets = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=offsets[1:])
    pos_col = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(flat_pos, type=pa.int64())
    )
    return pa.table(
        {
            "term": pa.array(terms.tolist(), type=pa.string()),
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.int64()),
            "tf": pa.array(tfs, type=pa.int64()),
            "dl": pa.array(doclens[doc_idx], type=pa.int64()),
            "pos": pos_col,
        }
    )
