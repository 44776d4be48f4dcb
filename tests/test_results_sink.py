from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from similaritysearch_jl_ray.pipelines.build_index import build_index
from similaritysearch_jl_ray.pipelines.query import Bm25Scorer, search_to_parquet, to_padded
from similaritysearch_jl_ray.pipelines.queryset import queries_dataset
from similaritysearch_jl_ray.sources.pages import pages_dataset

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_sink"))
    build_index(pages_dataset(SF_DIR), d, num_parts=2, salt_factor=2)
    return d


def test_search_to_parquet(ray_session, index_dir, tmp_path):
    out = search_to_parquet(queries_dataset(), index_dir, str(tmp_path / "res"), k=10)
    files = glob.glob(out + "/*.parquet")
    assert files
    t = pq.read_table(out)
    assert t.num_rows == 190  # 19 matching queries × k
    assert {"query_id", "rank", "doc_id", "score"} <= set(t.schema.names)


def test_to_padded_shape_and_sentinel(ray_session, index_dir):
    # k=40 exceeds df('dup') → zero-struct padding with doc_id=-1
    scorer = Bm25Scorer(index_dir, k=40, mode="exhaustive")
    hits, _, _ = scorer.score_query("dup")
    assert 0 < len(hits) < 40
    import pandas as pd

    rows = pd.DataFrame(
        {
            "query_id": [7] * len(hits),
            "rank": range(1, len(hits) + 1),
            "doc_id": [d for d, _ in hits],
            "score": [s for _, s in hits],
        }
    )
    padded = to_padded(rows, k=40)
    assert len(padded) == 1
    hl = padded["hits"].iloc[0]
    assert len(hl) == 40
    assert hl[len(hits)]["doc_id"] == -1 and hl[len(hits)]["score"] == 0.0
    assert hl[0]["doc_id"] == hits[0][0]
