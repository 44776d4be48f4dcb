"""Driver contract for the graft builder (Ray Data target).

Engine: ``similaritysearch_jl_ray`` — a Ray-Data-native inverted-index
+ BM25 query engine (SURVEY.md). Ray is initialised by the driver
before this module is imported; nothing here calls ray.init/shutdown.

Every SQL-expressible operator has a DuckDB oracle below. Both sides
share one contract: tokens = ``regexp_extract_all(lower(text),
'[a-z0-9]+')``; BM25 = Lucene idf ``ln(1+(N-df+0.5)/(df+0.5))`` ×
``tf(k1+1)/(tf+k1(1-b+b·dl/avgdl))`` with k1=1.2, b=0.75; ranking at
full float64 precision by (score desc, doc_id asc); scores rounded to
6 decimals only on output.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

K = 10
_ROUND = 6
_K1, _B = 1.2, 0.75

# Shared SQL CTE prelude: tokenization, tf, dl, stats, df — the
# relational restatement of the engine's tokenize/stats stages.
_TOK_CTES = """
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS dl
  FROM documents
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
"""


def _queries_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import queries_values_sql

    return queries_values_sql()


def _bm25_sql() -> str:
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({_K1} + 1)
              / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)) ) AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _bm25_query(sf_dir: str, mode: str):
    import numpy as np

    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = search(queries_dataset(), index_dir, k=K, mode=mode, concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = np.round(res["score"], _ROUND)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def entry() -> Any:
    """Flagship: synthesize pages → build inverted index (salted
    shuffle, varint blocks) → block-max WAND BM25 top-10 over the
    reference query set, at sf0.001."""
    return _bm25_query("/root/testdata/sf0.001", "wand")


def queries() -> dict[str, Callable[[str], Any]]:
    import pyarrow as pa

    def extract_text_identity(sf_dir: str):
        """North-rule invariant as a relational check: text extracted
        from the synthesized html must equal documents.text per row."""
        import ray.data as rd

        from similaritysearch_jl_ray.sources.pages import pages_dataset
        from similaritysearch_jl_ray.stages.tokenize import extract_batch

        ds = pages_dataset(sf_dir).map_batches(extract_batch, batch_format="pyarrow")
        return ds.select_columns(["doc_id", "text"])

    def doc_lengths(sf_dir: str):
        import ray.data as rd

        from similaritysearch_jl_ray.functions.text import batch_token_counts
        from similaritysearch_jl_ray.sources.pages import pages_dataset
        from similaritysearch_jl_ray.stages.tokenize import extract_batch

        def dl_batch(batch: pa.Table) -> pa.Table:
            _, _, _, dls = batch_token_counts(batch["text"].to_pylist())
            return pa.table({"doc_id": batch["doc_id"], "dl": pa.array(dls, type=pa.int64())})

        return (
            pages_dataset(sf_dir)
            .map_batches(extract_batch, batch_format="pyarrow")
            .map_batches(dl_batch, batch_format="pyarrow")
        )

    def term_df(sf_dir: str):
        """df per term, read from the built index's term dictionary
        (validates the salted-shuffle posting build end to end)."""
        import pandas as pd

        from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
        from similaritysearch_jl_ray.state.reader import IndexReader

        rdr = IndexReader(ensure_index(sf_dir))
        items = sorted(rdr._df.items())
        return pd.DataFrame(
            {"term": [t for t, _ in items], "df": pd.array([d for _, d in items], dtype="int64")}
        )

    def corpus_stats(sf_dir: str):
        import numpy as np
        import pandas as pd

        from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
        from similaritysearch_jl_ray.state.reader import IndexReader

        rdr = IndexReader(ensure_index(sf_dir))
        return pd.DataFrame(
            {
                "n_docs": pd.array([rdr.stats["n_docs"]], dtype="int64"),
                "total_tokens": pd.array([rdr.stats["total_tokens"]], dtype="int64"),
                "avgdl": [float(np.round(rdr.stats["avgdl"], _ROUND))],
            }
        )

    return {
        "extract_text_identity": extract_text_identity,
        "doc_lengths": doc_lengths,
        "term_df": term_df,
        "corpus_stats": corpus_stats,
        "bm25_topk": lambda sf: _bm25_query(sf, "wand"),
        "bm25_topk_exhaustive": lambda sf: _bm25_query(sf, "exhaustive"),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_text_identity": "SELECT doc_id, text FROM documents",
        "doc_lengths": (
            "SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS dl"
            " FROM documents"
        ),
        "term_df": f"WITH {_TOK_CTES} SELECT term, df FROM df ORDER BY term",
        "corpus_stats": f"""
WITH {_TOK_CTES}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT sum(dl) FROM dl)::BIGINT AS total_tokens,
       round((SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents), {_ROUND}) AS avgdl
""",
        "bm25_topk": _bm25_sql(),
        "bm25_topk_exhaustive": _bm25_sql(),
    }
