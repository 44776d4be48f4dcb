"""Regression: doc-id spaces far sparser than n_docs (e.g. offset /
delta appends) produce salts >= salt_factor; grouping and serving must
stay exact (a packed group key used to collide across terms here)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from similaritysearch_jl_ray.pipelines.build_index import build_index
from similaritysearch_jl_ray.pipelines.query import Bm25Scorer, brute_force_topk
from similaritysearch_jl_ray.pipelines.queryset import REFERENCE_QUERIES
from similaritysearch_jl_ray.sources.pages import pages_from_documents

SF_DIR = "/root/testdata/sf0.001"
OFFSET = 10_000


def test_offset_ids_rank_identical(ray_session, tmp_path):
    import ray.data as rd

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs = docs.set_column(
        docs.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array(np.asarray(docs["doc_id"]) + OFFSET, type=pa.int64()),
    )
    pages = rd.from_arrow(docs).map_batches(
        lambda b: pages_from_documents(b), batch_format="pyarrow"
    )
    d = str(tmp_path / "idx")
    stats = build_index(pages, d, num_parts=2, salt_factor=4)
    assert stats["max_doc"] == OFFSET + 499

    texts = dict(
        zip((np.asarray(docs["doc_id"])).tolist(), docs["text"].to_pylist())
    )
    gold = brute_force_topk(texts, REFERENCE_QUERIES, 10)
    for mode in ("exhaustive", "wand"):
        scorer = Bm25Scorer(d, k=10, mode=mode)
        rows = []
        for qid, text in REFERENCE_QUERIES:
            for rank, (doc_id, score) in enumerate(scorer.score_query(text)[0], start=1):
                rows.append((qid, rank, doc_id, score))
        assert [(q, r, dd) for q, r, dd, _ in rows] == [(q, r, dd) for q, r, dd, _ in gold], mode
