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
# ``docs_src`` parameterizes the corpus (the purged-index oracle uses a
# filtered corpus: stats/df/avgdl all shift, mirroring purge_tombstones).


def _tok_ctes(docs_src: str = "documents") -> str:
    return f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM {docs_src}
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS dl
  FROM {docs_src}
),
stats AS (
  SELECT (SELECT count(*) FROM {docs_src})::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM {docs_src}) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
"""


_TOK_CTES = _tok_ctes()


def _queries_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import queries_values_sql

    return queries_values_sql()


def _qids_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import query_ids_values_sql

    return query_ids_values_sql()


_BM25_SUM = f"""sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({_K1} + 1)
              / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)) )"""


def _bm25_sql(
    doc_join: str = "", conjunctive: bool = False, docs_src: str = "documents",
    k: int | None = None, min_match: int | None = None,
) -> str:
    having = (
        "HAVING count(*) = (SELECT count(*) FROM q q2 WHERE q2.query_id = q.query_id)"
        if conjunctive
        else (f"HAVING count(*) >= {min_match}" if min_match else "")
    )
    return f"""
WITH {_tok_ctes(docs_src)},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  {doc_join}
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
  {having}
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {k if k is not None else K}
ORDER BY query_id, rank
"""


def _synonym_sql() -> str:
    """SQL twin of ``mode="synonym"`` (queryset.SYNONYM_GROUPS):
    canon-merge the tf table (tf sums per (doc, canon)), df = rows of
    the merged table per canon (= |union of member docs|), and map
    query terms through the same canon — the relational restatement
    of an index-time merge of each synonym group."""
    from similaritysearch_jl_ray.pipelines.queryset import synonyms_values_sql

    return f"""
WITH {_TOK_CTES},
syn AS (SELECT * FROM {synonyms_values_sql()}),
tfc AS (
  SELECT tf.doc_id, coalesce(s.canon, tf.term) AS term, sum(tf.tf)::BIGINT AS tf
  FROM tf LEFT JOIN syn s ON s.term = tf.term
  GROUP BY tf.doc_id, coalesce(s.canon, tf.term)
),
dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY term),
q0 AS (SELECT * FROM {_queries_sql()}),
qc AS (
  SELECT DISTINCT query_id, coalesce(s.canon, q0.term) AS term
  FROM q0 LEFT JOIN syn s ON s.term = q0.term
),
scores AS (
  SELECT qc.query_id, tfc.doc_id,
         sum( ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
              * tfc.tf * ({_K1} + 1)
              / (tfc.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)) ) AS fscore
  FROM qc
  JOIN tfc ON tfc.term = qc.term
  JOIN dfc ON dfc.term = qc.term
  JOIN dl ON dl.doc_id = tfc.doc_id
  CROSS JOIN stats s
  GROUP BY qc.query_id, tfc.doc_id
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


def _rescore_phrase_sql(base_n: int = 50, boost: float = 2.0) -> str:
    """SQL twin of the phrase-rescore window: base top-``base_n`` by
    BM25, +``boost`` for docs containing the query's token sequence
    contiguously (single-space substring ≡ positional adjacency on
    this corpus — queryset.query_phrases_sql), re-ranked."""
    from similaritysearch_jl_ray.pipelines.queryset import query_phrases_sql

    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
qp AS (SELECT * FROM {query_phrases_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
base AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS brank
  FROM scores
),
boosted AS (
  SELECT b.query_id, b.doc_id,
         b.fscore + CASE WHEN ' ' || d.text || ' ' LIKE '% ' || qp.phrase || ' %'
                         THEN {boost} ELSE 0.0 END AS fscore
  FROM base b
  JOIN documents d ON d.doc_id = b.doc_id
  JOIN qp ON qp.query_id = b.query_id
  WHERE b.brank <= {base_n}
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM boosted
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _funcscore_sql() -> str:
    """SQL twin of ``mode="funcscore"``: the plain BM25 disjunction
    multiplied by the ``queryset.FUNC_LANG_BOOST`` doc-values weight."""
    from similaritysearch_jl_ray.pipelines.queryset import funcscore_case_sql

    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
weighted AS (
  SELECT sc.query_id, sc.doc_id, sc.fscore * {funcscore_case_sql()} AS fscore
  FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM weighted
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _field_scores_subquery(docs_src: str) -> str:
    """Per-field (query_id, doc_id, fscore) as a self-contained nested
    WITH — per-field N/avgdl/df come from the field's own text, same
    as the per-field index."""
    return f"""(
  WITH {_tok_ctes(docs_src)},
  q AS (SELECT * FROM {_queries_sql()})
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)"""


def _fields_sql(w_body: float = 1.0, w_title: float = 2.0) -> str:
    title_src = "(SELECT doc_id, substr(text, 1, 40) AS text FROM documents)"
    return f"""
WITH body AS (SELECT * FROM {_field_scores_subquery("documents")} b0),
title AS (SELECT * FROM {_field_scores_subquery(title_src)} t0),
comb AS (
  SELECT coalesce(b.query_id, t.query_id) AS query_id,
         coalesce(b.doc_id, t.doc_id) AS doc_id,
         {w_body} * coalesce(b.fscore, 0) + {w_title} * coalesce(t.fscore, 0) AS fscore
  FROM body b FULL JOIN title t ON b.query_id = t.query_id AND b.doc_id = t.doc_id
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM comb
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _bm25f_sql(w_body: float = 1.0, w_title: float = 2.0) -> str:
    """TRUE BM25F oracle: weights fold into tf BEFORE saturation
    (tf̃ = Σ_f w_f·tf_f/B_f, score = Σ_t idf(df_∪)·tf̃(k1+1)/(tf̃+k1));
    df is document frequency over the union of fields, idf/N shared."""
    return f"""
WITH
bt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
btf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM bt GROUP BY doc_id, term),
bdl AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS dl FROM documents),
tsrc AS (SELECT doc_id, substr(text, 1, 40) AS text FROM documents),
tt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM tsrc),
ttf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tt GROUP BY doc_id, term),
tdl AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS dl FROM tsrc),
st AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT sum(dl) FROM bdl)::DOUBLE / (SELECT count(*) FROM documents) AS bavg,
              (SELECT sum(dl) FROM tdl)::DOUBLE / (SELECT count(*) FROM documents) AS tavg),
u AS (
  SELECT coalesce(b.term, t.term) AS term,
         coalesce(b.doc_id, t.doc_id) AS doc_id,
         {w_body} * coalesce(b.tf, 0) / ((1 - {_B}) + {_B} * bdl.dl / st.bavg)
       + {w_title} * coalesce(t.tf, 0) / ((1 - {_B}) + {_B} * tdl.dl / st.tavg) AS tfde
  FROM btf b FULL JOIN ttf t ON b.term = t.term AND b.doc_id = t.doc_id
  JOIN bdl ON bdl.doc_id = coalesce(b.doc_id, t.doc_id)
  JOIN tdl ON tdl.doc_id = coalesce(b.doc_id, t.doc_id)
  CROSS JOIN st
),
dfa AS (SELECT term, count(*)::BIGINT AS df FROM u GROUP BY term),
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, u.doc_id,
         sum( ln(1 + (st.n - dfa.df + 0.5) / (dfa.df + 0.5))
              * u.tfde * ({_K1} + 1) / (u.tfde + {_K1}) ) AS fscore
  FROM q JOIN u ON u.term = q.term JOIN dfa ON dfa.term = q.term CROSS JOIN st
  GROUP BY q.query_id, u.doc_id
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


def _phrase_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import phrase_values_sql

    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
p AS (SELECT * FROM {phrase_values_sql()}),
docstr AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') || ' ' AS s
  FROM documents
),
m AS (SELECT p.query_id, d.doc_id FROM p JOIN docstr d ON contains(d.s, p.pat)),
scores AS (
  SELECT m.query_id, m.doc_id, {_BM25_SUM} AS fscore
  FROM m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.term = q.term AND tf.doc_id = m.doc_id
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
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


def _bm25_query(sf_dir: str, mode: str, lang: str | None = None):
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = search(
        queries_dataset(), index_dir, k=K, mode=mode, concurrency=2, lang=lang
    ).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _hybrid_rrf(sf_dir: str):
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import hybrid_search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = hybrid_search(queries_dataset(), index_dir, k=K, concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _hybrid_rrf_sql(base_n: int = 50, rrf_k: int = 60) -> str:
    """SQL twin of :func:`hybrid_search` (reciprocal-rank fusion of the
    BM25 and TF-cosine top-``base_n`` windows). Shared determinism
    contract (query.HybridRrfScorer docstring): integer dots / Σ tf²,
    one multiply + one divide per similarity, a single two-term add per
    fused score, full-f64 (score desc, doc_id asc) ranking."""
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
qn AS (SELECT query_id, count(*)::DOUBLE AS nq FROM q GROUP BY query_id),
dn AS (SELECT doc_id, sqrt(sum(tf * tf)::DOUBLE) AS norm FROM tf GROUP BY doc_id),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
brank AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS r
  FROM scores
),
cosim AS (
  SELECT q.query_id, tf.doc_id,
         sum(tf.tf)::DOUBLE / (sqrt(qn.nq) * dn.norm) AS csim
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN dn ON dn.doc_id = tf.doc_id
  JOIN qn ON qn.query_id = q.query_id
  GROUP BY q.query_id, tf.doc_id, qn.nq, dn.norm
),
crank AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, doc_id) AS r
  FROM cosim
),
fused AS (
  SELECT coalesce(b.query_id, c.query_id) AS query_id,
         coalesce(b.doc_id, c.doc_id) AS doc_id,
         coalesce(1.0 / ({rrf_k} + b.r), 0.0)
           + coalesce(1.0 / ({rrf_k} + c.r), 0.0) AS fscore
  FROM (SELECT * FROM brank WHERE r <= {base_n}) b
  FULL OUTER JOIN (SELECT * FROM crank WHERE r <= {base_n}) c
    ON c.query_id = b.query_id AND c.doc_id = b.doc_id
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM fused
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _bm25_spannear(sf_dir: str):
    """Ordered proximity top-k (``t1 t2 ~W``: the token sequence at
    strictly increasing positions, last − first ≤ W — Lucene
    SpanNearQuery in_order=true) — index-only, BM25-ranked per the
    shared contract."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import spannear_search

    index_dir = ensure_index(sf_dir)
    res = spannear_search(index_dir, k=K).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _spannear_sql() -> str:
    """Oracle for ORDERED proximity: the positional self-join chained
    with ``p{i-1}.pos < p{i}.pos`` plus ``p_last − p0 ≤ W`` — the ∃
    semantics the engine's greedy leftmost chain decides (a chain
    exists iff the greedy chain from some anchor fits the window)."""
    from similaritysearch_jl_ray.pipelines.queryset import (
        SPANNEAR_QUERIES,
        parse_ordered_near_query,
    )

    branches = []
    score_rows = []
    for qid, text in SPANNEAR_QUERIES:
        toks, w = parse_ordered_near_query(text)
        if not toks:
            continue
        for t in sorted(set(toks)):
            score_rows.append(f"({qid}, '{t}')")
        joins = "".join(
            f" JOIN posn p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.term = '{t}'"
            f" AND p{i}.pos > p{i - 1}.pos"
            for i, t in enumerate(toks[1:], start=1)
        )
        span = (
            f"p{len(toks) - 1}.pos - p0.pos <= {w}" if len(toks) > 1 else "true"
        )
        branches.append(
            f"SELECT {qid} AS query_id, p0.doc_id FROM posn p0{joins}"
            f" WHERE p0.term = '{toks[0]}' AND {span}"
        )
    m = "\nUNION\n".join(branches)
    qn = "(VALUES " + ", ".join(score_rows) + ") AS qn(query_id, term)"
    return f"""
WITH {_TOK_CTES},
posn AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
  FROM documents
),
m AS ({m}),
qq AS (SELECT * FROM {qn}),
scores AS (
  SELECT m.query_id, m.doc_id, {_BM25_SUM} AS fscore
  FROM m
  JOIN qq ON qq.query_id = m.query_id
  JOIN tf ON tf.term = qq.term AND tf.doc_id = m.doc_id
  JOIN df ON df.term = qq.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
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


def _lang_cardinality(sf_dir: str):
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import lang_cardinality
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = lang_cardinality(queries_dataset(), index_dir, concurrency=2).to_pandas()
    return res.sort_values("query_id").reset_index(drop=True)


def _lang_cardinality_sql() -> str:
    """SQL twin of :func:`lang_cardinality` — exact COUNT(DISTINCT
    lang) over each query's match set; zero rows for every query with
    no matches (query list derived from query ids, the match_counts
    convention)."""
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
qi AS (SELECT * FROM {_qids_sql()}),
m AS (
  SELECT DISTINCT q.query_id, tf.doc_id
  FROM q JOIN tf ON tf.term = q.term
),
card AS (
  SELECT m.query_id, count(DISTINCT d.lang)::BIGINT AS n_langs
  FROM m JOIN documents d ON d.doc_id = m.doc_id
  GROUP BY m.query_id
)
SELECT qi.query_id, coalesce(card.n_langs, 0)::BIGINT AS n_langs
FROM qi LEFT JOIN card ON card.query_id = qi.query_id
ORDER BY qi.query_id
"""


def _top_hits(sf_dir: str):
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import top_hits_search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = top_hits_search(
        queries_dataset(), index_dir, per_group=3, concurrency=2
    ).to_pandas()
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "lang", "rank"]).reset_index(drop=True)


def _top_hits_sql(per_group: int = 3) -> str:
    """SQL twin of :func:`top_hits_search` — the ES terms-bucket +
    top_hits composition: per (query, lang) group the top hits by the
    shared (score desc, doc_id asc) rule."""
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT s.query_id, d.lang, s.doc_id, s.fscore,
         row_number() OVER (
           PARTITION BY s.query_id, d.lang ORDER BY s.fscore DESC, s.doc_id
         ) AS rank
  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT query_id, lang, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {per_group}
ORDER BY query_id, lang, rank
"""


def _bm25_explain(sf_dir: str):
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import explain_search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = explain_search(queries_dataset(), index_dir, k=K, concurrency=2).to_pandas()
    res["contribution"] = round6(res["contribution"].to_numpy())
    return res.sort_values(["query_id", "rank", "term"]).reset_index(drop=True)


def _match_stats(sf_dir: str):
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import match_stats
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = match_stats(queries_dataset(), index_dir, concurrency=2).to_pandas()
    res["max_score"] = round6(res["max_score"].to_numpy())
    res["sum_score"] = round6(res["sum_score"].to_numpy())
    return res.sort_values("query_id").reset_index(drop=True)


def _rescore_phrase(sf_dir: str):
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import rescore_phrase_search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = rescore_phrase_search(
        queries_dataset(), index_dir, base_n=50, boost=2.0, k=K, concurrency=2
    ).to_pandas()
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _significant_terms(sf_dir: str):
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import significant_terms
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = significant_terms(queries_dataset(), index_dir, concurrency=2).to_pandas()
    return res.sort_values(["query_id", "lift", "term"], ascending=[True, False, True]).reset_index(
        drop=True
    )


def _match_counts(sf_dir: str):
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import match_counts
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = match_counts(queries_dataset(), index_dir, concurrency=2).to_pandas()
    return res.sort_values("query_id").reset_index(drop=True)


def _bm25_expanded(sf_dir: str, mode: str):
    """Multi-term rewrite serving (Lucene MultiTermQuery): ``prefix``
    expands ``tok*`` stems against the sorted term dictionary,
    ``fuzzy`` expands every token to dictionary terms within
    Levenshtein 1; the expansion union scores as a standard BM25
    disjunction on the pruned (wand) path."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import (
        fuzzy_queries_dataset,
        prefix_queries_dataset,
    )

    from similaritysearch_jl_ray.pipelines.queryset import wildcard_queries_dataset

    from similaritysearch_jl_ray.pipelines.queryset import regexp_queries_dataset

    qds = {
        "prefix": prefix_queries_dataset,
        "fuzzy": fuzzy_queries_dataset,
        "wildcard": wildcard_queries_dataset,
        "regexp": regexp_queries_dataset,
    }[mode]()
    res = search(qds, ensure_index(sf_dir), k=K, mode=mode, concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _expanded_sql(mode: str) -> str:
    """Oracle for prefix/fuzzy: expansion happens SQL-side against the
    df dictionary (LIKE / levenshtein()), proving the engine's
    dictionary rewrite — not just its scoring — matches."""
    from similaritysearch_jl_ray.pipelines.queryset import (
        FUZZY_MAX_EDITS,
        fuzzy_values_sql,
        prefix_values_sql,
    )

    from similaritysearch_jl_ray.pipelines.queryset import wildcard_values_sql

    if mode == "prefix":
        src = f"qp AS (SELECT * FROM {prefix_values_sql()}),\n" + (
            "qx AS (SELECT DISTINCT qp.query_id, df.term FROM qp JOIN df ON"
            " (qp.is_prefix AND df.term LIKE qp.pat || '%')"
            " OR (NOT qp.is_prefix AND df.term = qp.pat))"
        )
    elif mode == "wildcard":
        src = f"qw AS (SELECT * FROM {wildcard_values_sql()}),\n" + (
            "qx AS (SELECT DISTINCT qw.query_id, df.term FROM qw JOIN df ON"
            " (qw.is_pat AND df.term LIKE qw.pat)"
            " OR (NOT qw.is_pat AND df.term = qw.pat))"
        )
    elif mode == "regexp":
        from similaritysearch_jl_ray.pipelines.queryset import regexp_values_sql

        src = f"qr AS (SELECT * FROM {regexp_values_sql()}),\n" + (
            "qx AS (SELECT DISTINCT qr.query_id, df.term FROM qr"
            " JOIN df ON regexp_full_match(df.term, qr.pat))"
        )
    else:
        src = f"qf AS (SELECT * FROM {fuzzy_values_sql()}),\n" + (
            "qx AS (SELECT DISTINCT qf.query_id, df.term FROM qf"
            f" JOIN df ON levenshtein(qf.term, df.term) <= {FUZZY_MAX_EDITS})"
        )
    return f"""
WITH {_TOK_CTES},
{src},
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM qx q
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


def _tombstone_variant(sf_dir: str, tag: str, purge: bool) -> str:
    """Mutated index copy with docs ``doc_id % 7 == 3`` deleted —
    tombstoned only (``purge=False``: Lucene live-docs masking, build
    stats intact) or physically purged (``purge=True``: stats/df
    identical to a rebuild over the survivors)."""
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index_variant

    def mutate(d: str) -> None:
        import os

        import pyarrow.dataset as pads

        from similaritysearch_jl_ray.pipelines.lifecycle import (
            delete_docs,
            purge_tombstones,
        )

        ids = (
            pads.dataset(os.path.join(d, "docmap"), format="parquet")
            .to_table(columns=["doc_id"])["doc_id"]
            .to_numpy()
        )
        delete_docs(d, ids[ids % 7 == 3])
        if purge:
            purge_tombstones(d)

    return ensure_index_variant(sf_dir, tag, mutate)


def _bm25_deleted(sf_dir: str):
    """Serving over a tombstoned index: deleted docs invisible, df/idf/
    avgdl keep build-time values (Lucene live-docs) — the oracle scores
    over the FULL corpus and only filters the result set."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = _tombstone_variant(sf_dir, "tomb", purge=False)
    res = search(queries_dataset(), index_dir, k=K, mode="wand", concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _bm25_delete_by_query(sf_dir: str):
    """delete_by_query('fast merge') then serve the standard query
    set: every doc containing 'fast' or 'merge' is tombstoned (Lucene
    deleteDocuments(Query)); stats stay build-time (live-docs), so
    the oracle scores the full corpus and anti-joins the match set."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index_variant
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    def mutate(d: str) -> None:
        from similaritysearch_jl_ray.pipelines.lifecycle import delete_by_query

        delete_by_query(d, "fast merge")

    index_dir = ensure_index_variant(sf_dir, "delq", mutate)
    res = search(queries_dataset(), index_dir, k=K, mode="wand", concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _bm25_purged(sf_dir: str):
    """Serving after purge_tombstones: postings rewritten, stats
    re-derived — the oracle recomputes BM25 over the survivor corpus
    (df, N and avgdl all shift, unlike the tombstone-mask entry)."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = _tombstone_variant(sf_dir, "purged", purge=True)
    res = search(queries_dataset(), index_dir, k=K, mode="wand", concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _index_export(sf_dir: str):
    """sparse(adj)-style long-table dump of the built index — an
    index-LEVEL oracle check (codec + shuffle + merge, no query)."""
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.export import index_export

    return index_export(ensure_index(sf_dir))


def _bm25_fields(sf_dir: str):
    """Multi-field weighted BM25 (body + title): each field has its
    own index (own N/avgdl/df); score = 1.0·BM25_body + 2.0·BM25_title
    over the union of matches — Lucene MultiFieldQueryParser
    semantics, the sum-of-fields member of the BM25F family. The title
    field is the fixture contract text[:40] (sources/pages.py
    TITLE_CHARS), which the oracle derives as substr(text, 1, 40)."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import (
        ensure_field_index,
        ensure_index,
    )
    from similaritysearch_jl_ray.pipelines.query import multifield_search

    res = multifield_search(
        {"body": ensure_index(sf_dir), "title": ensure_field_index(sf_dir, "title")},
        {"body": 1.0, "title": 2.0},
        k=K,
    ).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _bm25f(sf_dir: str):
    """TRUE BM25F (weights inside the saturation, per-field length
    norms, union document frequency — Robertson/Zaragoza) over the same
    body + title per-field indexes as ``bm25_topk_fields``."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import (
        ensure_field_index,
        ensure_index,
    )
    from similaritysearch_jl_ray.pipelines.query import bm25f_search

    res = bm25f_search(
        {"body": ensure_index(sf_dir), "title": ensure_field_index(sf_dir, "title")},
        {"body": 1.0, "title": 2.0},
        k=K,
    ).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _bm25_phrase(sf_dir: str):
    """Phrase top-k (contiguous token match, BM25-scored) — served
    from the positional index alone; the corpus is never re-read."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import phrase_search

    index_dir = ensure_index(sf_dir)
    res = phrase_search(index_dir, k=K).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _bm25_near(sf_dir: str):
    """Proximity top-k (``t1 t2 ~W``: one position per distinct term
    within a W-wide window, unordered — Lucene SpanNearQuery) — served
    from the positional index alone; BM25-ranked per the shared
    contract."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import near_search

    index_dir = ensure_index(sf_dir)
    res = near_search(index_dir, k=K).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _near_sql() -> str:
    """Oracle for proximity queries: token positions via
    ``unnest + generate_subscripts``, one k-way positional self-join
    per query (``greatest−least ≤ W`` over one chosen position per
    term), then the shared BM25 scoring/ranking CTE."""
    from similaritysearch_jl_ray.pipelines.queryset import (
        NEAR_QUERIES,
        parse_near_query,
    )

    branches = []
    score_rows = []
    for qid, text in NEAR_QUERIES:
        terms, w = parse_near_query(text)
        if not terms:
            continue
        for t in terms:
            score_rows.append(f"({qid}, '{t}')")
        joins = "".join(
            f" JOIN posn p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.term = '{t}'"
            for i, t in enumerate(terms[1:], start=1)
        )
        allpos = ", ".join(f"p{i}.pos" for i in range(len(terms)))
        span = (
            f"greatest({allpos}) - least({allpos}) <= {w}"
            if len(terms) > 1
            else "true"
        )
        branches.append(
            f"SELECT {qid} AS query_id, p0.doc_id FROM posn p0{joins}"
            f" WHERE p0.term = '{terms[0]}' AND {span}"
        )
    m = "\nUNION\n".join(branches)
    qn = "(VALUES " + ", ".join(score_rows) + ") AS qn(query_id, term)"
    return f"""
WITH {_TOK_CTES},
posn AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
  FROM documents
),
m AS ({m}),
qq AS (SELECT * FROM {qn}),
scores AS (
  SELECT m.query_id, m.doc_id, {_BM25_SUM} AS fscore
  FROM m
  JOIN qq ON qq.query_id = m.query_id
  JOIN tf ON tf.term = qq.term AND tf.doc_id = m.doc_id
  JOIN df ON df.term = qq.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
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


def _bm25_paged(sf_dir: str):
    """Deep pagination: page 1 = top-K; page 2 re-queries with the
    last (score, doc_id) as an exclusive search_after cursor — no
    offset accumulation. Oracle = the plain ranking to rank 2K, so
    the cursor page must seamlessly continue page 1."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import paged_search

    res = paged_search(ensure_index(sf_dir), k=K, n_pages=2)
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


TV_DOCS = [0, 7, 42, 123, 250, 499, 10**9]  # 10**9: absent doc → no rows


def _merged_index(sf_dir: str) -> str:
    """Cached two-way index merge: the corpus splits at the median
    doc_id, each half builds independently, merge_indexes folds them —
    serving must equal a single full build (the oracle is the plain
    BM25 ranking over the whole corpus)."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from similaritysearch_jl_ray.pipelines.entry_helpers import cached_index_dir
    from similaritysearch_jl_ray.pipelines.lifecycle import merge_indexes
    from similaritysearch_jl_ray.sources.pages import pages_from_documents

    out = cached_index_dir(sf_dir) + "_merged"
    # explicit done-marker written AFTER the merge completes —
    # stats.json appears at copytree time, so an interrupted merge
    # must not be cached as complete
    marker = os.path.join(out, "_merge_done")
    if os.path.exists(marker):
        return out
    from similaritysearch_jl_ray.pipelines.build_index import build_index

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    mid = n // 2

    def half(lo, hi, d):
        docs = pq.read_table(f"{sf_dir}/documents.parquet").slice(lo, hi - lo)
        ds = rd.from_arrow(docs).map_batches(
            lambda b: pages_from_documents(b), batch_format="pyarrow"
        )
        build_index(ds, d, num_parts=4, salt_factor=3)

    a, b = out + "_a", out + "_b"
    for d in (a, b, out):
        shutil.rmtree(d, ignore_errors=True)
    half(0, mid, a)
    half(mid, n, b)
    merge_indexes(a, b, out)
    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _bm25_dismax(sf_dir: str):
    """Disjunction-max scoring (Lucene DisjunctionMaxQuery,
    tie_breaker=0): doc score = max over matching terms."""
    return _bm25_query(sf_dir, "dismax")


def _bm25_boost(sf_dir: str):
    """Per-term boosts (``term^W``): boosted BM25 sum."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import boost_queries_dataset

    res = search(
        boost_queries_dataset(), ensure_index(sf_dir), k=K, mode="boost", concurrency=2
    ).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _dismax_sql() -> str:
    dismax = _BM25_SUM.replace("sum(", "max(", 1)
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {dismax} AS fscore
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


def _boost_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import boost_values_sql

    boosted = _BM25_SUM.replace("sum( ", "sum( qb.boost * (", 1) + ")"
    # note: the multiplier wraps each term's contribution INSIDE the sum
    return f"""
WITH {_TOK_CTES},
qb AS (SELECT * FROM {boost_values_sql()}),
scores AS (
  SELECT qb.query_id, tf.doc_id, {boosted} AS fscore
  FROM qb
  JOIN tf ON tf.term = qb.term
  JOIN df ON df.term = qb.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qb.query_id, tf.doc_id
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


def _bm25_highlight(sf_dir: str):
    """Top-k + per-hit snippet anchor (first query-term position) from
    the positional index; document text is never read."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.facets import highlight_search

    res = highlight_search(ensure_index(sf_dir), k=K).to_pandas()
    res = res.astype(
        {
            "query_id": "int64",
            "rank": "int64",
            "doc_id": "int64",
            "score": "float64",
            "first_pos": "int64",
        }
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _highlight_sql() -> str:
    """Oracle: the standard ranking joined to the positions CTE —
    ``min(pos) − 1`` (SQL positions are 1-based) over the query's
    terms must equal the engine's anchor for every hit."""
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
posn AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
  FROM documents
),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
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
SELECT r.query_id, r.rank, r.doc_id, round(r.fscore, {_ROUND}) AS score,
       (min(p.pos) - 1)::BIGINT AS first_pos
FROM ranked r
JOIN q ON q.query_id = r.query_id
JOIN posn p ON p.doc_id = r.doc_id AND p.term = q.term
WHERE r.rank <= {K}
GROUP BY r.query_id, r.rank, r.doc_id, r.fscore
ORDER BY r.query_id, r.rank
"""


def _bm25_merged_entry(sf_dir: str):
    """Serving over the two-way merged index (Lucene addIndexes);
    oracle = the plain full-corpus ranking, so the merge must preserve
    global df/idf/avgdl exactly."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    res = search(
        queries_dataset(), _merged_index(sf_dir), k=K, mode="wand", concurrency=2
    ).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _pack_documents(sf_dir: str):
    """Next-fit token-budget packing per doc-id shard (LLM context-
    window packing); the oracle replays the recursion in SQL."""
    from similaritysearch_jl_ray.pipelines.packing import pack_documents

    res = pack_documents(sf_dir, budget=512, shard_size=1000).to_pandas()
    res = res.astype(
        {c: "int64" for c in ("doc_id", "shard", "bin_id", "tokens", "fill")}
    )
    return res.sort_values("doc_id").reset_index(drop=True)


_PACK_SQL = """
WITH RECURSIVE
dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS t
  FROM documents
),
docs AS (SELECT doc_id, doc_id // 1000 AS shard, t FROM dl),
seqd AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS seq FROM docs
),
pack AS (
  SELECT shard, seq, doc_id, t, 0::BIGINT AS bin_id, t AS fill
  FROM seqd WHERE seq = 1
  UNION ALL
  SELECT s.shard, s.seq, s.doc_id, s.t,
         CASE WHEN p.fill > 0 AND p.fill + s.t > 512 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill > 0 AND p.fill + s.t > 512 THEN s.t ELSE p.fill + s.t END
  FROM pack p JOIN seqd s ON s.shard = p.shard AND s.seq = p.seq + 1
)
SELECT doc_id, shard, bin_id, t AS tokens, fill
FROM pack
ORDER BY doc_id
"""


def _facet_lang(sf_dir: str):
    """Facet counts: the disjunction match set of each reference query
    grouped by docmap lang (Lucene terms-aggregation-on-a-filter)."""
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.facets import facet_counts

    res = facet_counts(ensure_index(sf_dir), field="lang").to_pandas()
    res = res.astype({"query_id": "int64", "n_docs": "int64"})
    return res.sort_values(["query_id", "lang"]).reset_index(drop=True)


def _spell_suggest(sf_dir: str):
    """Did-you-mean: dictionary terms within Levenshtein 2, ranked
    (distance, df desc, term), top 3 per token."""
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.facets import spell_suggest

    return spell_suggest(ensure_index(sf_dir))


def _spell_suggest_sql() -> str:
    from similaritysearch_jl_ray.pipelines.facets import SUGGEST_TOKENS

    vals = ", ".join(f"({q}, '{t}')" for q, t in SUGGEST_TOKENS)
    return f"""
WITH {_TOK_CTES},
qs AS (SELECT * FROM (VALUES {vals}) AS qs(query_id, tok)),
cand AS (
  SELECT qs.query_id, df.term, levenshtein(qs.tok, df.term)::BIGINT AS dist, df.df
  FROM qs JOIN df ON levenshtein(qs.tok, df.term) <= 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY dist, df DESC, term) AS rank
  FROM cand
)
SELECT query_id, rank, term, dist, df
FROM ranked WHERE rank <= 3
ORDER BY query_id, rank
"""


def _sort_by_url(sf_dir: str):
    """Match set ordered by stored url field (Lucene Sort(SortField))
    — the oracle recomputes the deterministic url from the documents
    table, so the engine's stored field must agree byte-for-byte."""
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.facets import field_sorted_search

    res = field_sorted_search(ensure_index(sf_dir), field="url", k=K).to_pandas()
    res = res.astype({"query_id": "int64", "rank": "int64", "doc_id": "int64"})
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _sort_by_url_sql() -> str:
    return f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf ON tf.term = q.term),
u AS (
  SELECT m.query_id, m.doc_id,
         'https://' || d.source || '.example.com/' || d.lang || '/'
           || lpad(d.doc_id::VARCHAR, 8, '0') AS url
  FROM m JOIN documents d ON d.doc_id = m.doc_id
),
ranked AS (
  SELECT query_id, doc_id, url,
         row_number() OVER (PARTITION BY query_id ORDER BY url, doc_id) AS rank
  FROM u
)
SELECT query_id, rank, doc_id, url
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _term_vectors(sf_dir: str):
    """Forward term-vectors for a fixed doc set, reconstructed from
    the inverted index (one Ray task per term-hash part)."""
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.facets import term_vectors

    res = term_vectors(ensure_index(sf_dir), TV_DOCS).to_pandas()
    res = res.astype({"doc_id": "int64", "tf": "int64"})
    return res.sort_values(["doc_id", "term"]).reset_index(drop=True)


def _bm25_mlt(sf_dir: str):
    """More-like-this: seed doc → top-10 terms by round6(tf·idf) →
    BM25 disjunction on the pruned path, seed excluded."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import more_like_this

    res = more_like_this(sf_dir, ensure_index(sf_dir), k=K)
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _mlt_sql() -> str:
    """Oracle for more-like-this: the seed's term selection (rounded
    tf·idf, term-asc ties) AND the seed-excluded BM25 ranking both
    happen SQL-side — checking the whole rewrite chain."""
    from similaritysearch_jl_ray.pipelines.query import MLT_SEEDS

    sd = ", ".join(f"({q}, {d})" for q, d in MLT_SEEDS)
    return f"""
WITH {_TOK_CTES},
sd AS (SELECT * FROM (VALUES {sd}) AS sd(query_id, seed)),
selscore AS (
  SELECT sd.query_id, sd.seed, tf.term,
         round(tf.tf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)), 6) AS sel
  FROM sd
  JOIN tf ON tf.doc_id = sd.seed
  JOIN df ON df.term = tf.term
  CROSS JOIN stats s
),
q AS (
  SELECT query_id, seed, term FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sel DESC, term) AS rn
    FROM selscore
  ) WHERE rn <= 10
),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.doc_id <> q.seed
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


def _bm25_bool(sf_dir: str):
    """Boolean DNF filter + BM25 ranking over the fixed group set."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import bool_search

    res = bool_search(ensure_index(sf_dir), k=K, concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _bool_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import bool_values_sql

    return f"""
WITH {_TOK_CTES},
qb AS (SELECT * FROM {bool_values_sql()}),
qterms AS (SELECT DISTINCT query_id, term FROM qb),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
need AS (SELECT query_id, grp, count(*)::BIGINT AS need FROM qb GROUP BY query_id, grp),
have AS (
  SELECT qb.query_id, qb.grp, tf.doc_id, count(*)::BIGINT AS have
  FROM qb JOIN tf ON tf.term = qb.term
  GROUP BY qb.query_id, qb.grp, tf.doc_id
),
matched AS (
  SELECT DISTINCT h.query_id, h.doc_id
  FROM have h JOIN need n ON n.query_id = h.query_id AND n.grp = h.grp
  WHERE h.have = n.need
),
ranked AS (
  SELECT s.query_id, s.doc_id, s.fscore,
         row_number() OVER (PARTITION BY s.query_id ORDER BY s.fscore DESC, s.doc_id) AS rank
  FROM scores s JOIN matched m ON m.query_id = s.query_id AND m.doc_id = s.doc_id
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


def _bm25_tree(sf_dir: str):
    """Nested boolean trees (and/or/not, phrase leaves) + BM25 ranking
    over each tree's positive terms — beyond-DNF BooleanQuery."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import tree_search

    res = tree_search(ensure_index(sf_dir), k=K, concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _tree_sql() -> str:
    from similaritysearch_jl_ray.pipelines.queryset import (
        tree_matched_sql,
        tree_values_sql,
    )

    return f"""
WITH {_TOK_CTES},
docstr AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') || ' ' AS s
  FROM documents
),
q AS (SELECT * FROM {tree_values_sql()}),
matched AS ({tree_matched_sql()}),
scores AS (
  SELECT m.query_id, m.doc_id, {_BM25_SUM} AS fscore
  FROM matched m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.term = q.term AND tf.doc_id = m.doc_id
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.query_id, m.doc_id
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


def _bm25_sharded(sf_dir: str):
    """Doc-sharded serving path — exact, shares the BM25 oracle."""
    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
    from similaritysearch_jl_ray.pipelines.query import sharded_search
    from similaritysearch_jl_ray.pipelines.queryset import queries_dataset

    index_dir = ensure_index(sf_dir)
    res = sharded_search(queries_dataset(), index_dir, k=K, n_shards=3, concurrency=2).to_pandas()
    res = res[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64", "score": "float64"}
    )
    res["score"] = round6(res["score"].to_numpy())
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _random_projection_long(sf_dir: str):
    """Long format (vec_id, dim_idx, value): list columns don't sort/
    hash in the driver's value comparison."""
    import numpy as np
    import pandas as pd

    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.transform import random_projection

    pdf = random_projection(sf_dir, out_dim=16).to_pandas().sort_values("vec_id")
    mat = np.stack(pdf["projected"].to_numpy())
    n, d = mat.shape
    return pd.DataFrame(
        {
            "vec_id": pd.array(np.repeat(pdf["vec_id"].to_numpy(), d), dtype="int64"),
            "dim_idx": pd.array(np.tile(np.arange(d), n), dtype="int64"),
            "value": round6(mat.ravel()),
        }
    )


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
        items = sorted(rdr.term_dfs().items())
        return pd.DataFrame(
            {"term": [t for t, _ in items], "df": pd.array([d for _, d in items], dtype="int64")}
        )

    def corpus_stats(sf_dir: str):
        import pandas as pd

        from similaritysearch_jl_ray.functions.rounding import round6
        from similaritysearch_jl_ray.pipelines.entry_helpers import ensure_index
        from similaritysearch_jl_ray.state.reader import IndexReader

        rdr = IndexReader(ensure_index(sf_dir))
        return pd.DataFrame(
            {
                "n_docs": pd.array([rdr.stats["n_docs"]], dtype="int64"),
                "total_tokens": pd.array([rdr.stats["total_tokens"]], dtype="int64"),
                "avgdl": [round6(rdr.stats["avgdl"])],
            }
        )

    from similaritysearch_jl_ray.pipelines import ann, dedup, events, textstats

    entries = {
        # -- inverted index / BM25 (SURVEY §2.2-2.6, the flagship) -------
        "extract_text_identity": extract_text_identity,
        "doc_lengths": doc_lengths,
        "term_df": term_df,
        "corpus_stats": corpus_stats,
        "bm25_topk": lambda sf: _bm25_query(sf, "wand"),
        "bm25_topk_exhaustive": lambda sf: _bm25_query(sf, "exhaustive"),
        "bm25_topk_sharded": _bm25_sharded,
        "index_export": _index_export,
        "bm25_topk_and": lambda sf: _bm25_query(sf, "and"),
        # Lucene minimumShouldMatch: docs matching ≥2 distinct query
        # terms rank by the plain BM25 disjunction (scorer default m=2)
        "bm25_topk_msm": lambda sf: _bm25_query(sf, "msm"),
        # Lucene SynonymQuery (index-merged semantics): synonym groups
        # score as ONE pseudo-term — tf sums, df = |union|; the map is
        # queryset.SYNONYM_GROUPS, mirrored SQL-side as a VALUES join
        "bm25_topk_synonym": lambda sf: _bm25_query(sf, "synonym"),
        # Lucene TotalHitCountCollector: full match-set cardinality
        "match_counts": _match_counts,
        # ES stats aggregation over the full match set
        "match_stats": _match_stats,
        # ES significant_terms: lift-ranked over-represented terms
        "significant_terms": _significant_terms,
        # ES rescore API: BM25 top-50 window, exact-phrase boost +2.0
        "bm25_topk_rescore_phrase": _rescore_phrase,
        # Lucene/ES field collapse: best-scoring doc per docmap-lang
        # group, then the global top-k — result diversification
        "bm25_topk_collapse": lambda sf: _bm25_query(sf, "collapse"),
        # sparse+dense fusion: BM25 ∪ TF-cosine windows, reciprocal-
        # rank fusion (Cormack et al. RRF) — the hybrid-retrieval shape
        "hybrid_rrf": _hybrid_rrf,
        # ES terms-bucket + top_hits: k best hits per (query, lang)
        "top_hits_lang": _top_hits,
        # ES cardinality agg: exact distinct-lang count per match set
        "lang_cardinality": _lang_cardinality,
        # Lucene Explain: per-term score breakdown of every top-k hit
        "bm25_explain": _bm25_explain,
        # ES function_score: BM25 × weight(lang) doc-values factor
        "bm25_topk_funcscore": lambda sf: _bm25_query(sf, "funcscore"),
        # ES percolate: corpus streams against broadcast standing
        # queries (conjunctive match) — reverse-search alerting
        "percolate": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.query", fromlist=["percolate"]
        ).percolate(sf),
        # Lucene suggest module: prefix completion ranked by df
        "complete_prefix": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.facets", fromlist=["complete_prefix"]
        ).complete_prefix(
            __import__(
                "similaritysearch_jl_ray.pipelines.entry_helpers",
                fromlist=["ensure_index"],
            ).ensure_index(sf)
        ),
        "bm25_topk_lang_en": lambda sf: _bm25_query(sf, "wand", lang="en"),
        "bm25_topk_phrase": _bm25_phrase,
        "bm25_topk_fields": _bm25_fields,
        "bm25_topk_bm25f": _bm25f,
        "bm25_topk_bool": _bm25_bool,
        "bm25_topk_tree": _bm25_tree,
        "bm25_topk_deleted": _bm25_deleted,
        "bm25_topk_delete_by_query": _bm25_delete_by_query,
        "bm25_topk_purged": _bm25_purged,
        "bm25_topk_prefix": lambda sf: _bm25_expanded(sf, "prefix"),
        "bm25_topk_fuzzy": lambda sf: _bm25_expanded(sf, "fuzzy"),
        "bm25_topk_wildcard": lambda sf: _bm25_expanded(sf, "wildcard"),
        "bm25_topk_regexp": lambda sf: _bm25_expanded(sf, "regexp"),
        "bm25_topk_near": _bm25_near,
        # ordered proximity (SpanNearQuery in_order=true, greedy chain)
        "bm25_topk_spannear": _bm25_spannear,
        "more_like_this": _bm25_mlt,
        "bm25_topk_paged": _bm25_paged,
        "facet_lang": _facet_lang,
        "term_vectors": _term_vectors,
        "sort_by_url": _sort_by_url,
        "spell_suggest": _spell_suggest,
        "pack_documents": _pack_documents,
        "domain_balance": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.setops", fromlist=["domain_balance"]
        ).domain_balance(sf, cap=15),
        "bm25_topk_merged": _bm25_merged_entry,
        "bm25_topk_highlight": _bm25_highlight,
        "bm25_topk_dismax": _bm25_dismax,
        "bm25_topk_boost": _bm25_boost,
        # -- dedup suite (SURVEY §2.6 neardup + task brief) ---------------
        "exact_dedup": dedup.exact_dedup,
        "url_dedup": dedup.url_dedup,
        "window_dedup": lambda sf: dedup.window_dedup(sf, window=3),
        # max_df=None pins the EXACT mode (matches the SQL oracle); the
        # library default is the bounded production path
        "ngram_jaccard_pairs": lambda sf: dedup.ngram_jaccard_pairs(
            sf, tau=0.5, n=3, max_df=None
        ),
        "dedup_clusters": lambda sf: dedup.dedup_clusters(
            sf, tau=0.5, n=3, edge_source="ngram", max_df=None
        ),
        "decontaminate": lambda sf: dedup.decontaminate(sf, n=3, min_shared=2),
        "minhash_lsh_pairs": lambda sf: dedup.minhash_lsh_pairs(sf, tau=0.5, n=3),
        "simhash_pairs": lambda sf: dedup.simhash_pairs(sf, max_hamming=3),
        "embedding_neardup_pairs": lambda sf: dedup.embedding_neardup_pairs(sf, tau=0.3),
        # -- knn suite over embeddings (SURVEY §2.6 reference ops) --------
        "knn_search": lambda sf: ann.knn_search(sf, k=8, n_queries=20),
        "allknn": lambda sf: ann.allknn(sf, k=4),
        "closestpair": ann.closestpair,
        "fft": lambda sf: ann.fft(sf, k=5),
        "distsample": ann.distsample,
        "rerank": lambda sf: ann.rerank(sf, k_candidates=20, k=8, n_queries=10),
        "hsp_filter": lambda sf: ann.hsp_filter(sf, k=16, n_queries=10),
        # neighborhood filter family (SAT/DistalSAT/KCenters) — the
        # reference's static-pruning rules as knn post-filters;
        # order-dependent geometry → pytest-pinned, rows-only here
        "sat_neighborhood": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.neighborhood", fromlist=["neighborhood_filter"]
        ).neighborhood_filter(sf, kind="sat"),
        "distal_sat_neighborhood": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.neighborhood", fromlist=["neighborhood_filter"]
        ).neighborhood_filter(sf, kind="distal_sat"),
        "kcenters_neighborhood": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.neighborhood", fromlist=["neighborhood_filter"]
        ).neighborhood_filter(sf, kind="kcenters"),
        "permuted_knn_search": lambda sf: ann.permuted_knn_search(sf, k=8, n_queries=10),
        "neardup_embeddings": lambda sf: ann.neardup_embeddings(sf, eps=1.2),
        # SearchGraph (the reference's flagship navigable-graph ANN):
        # approximate by design → rows-only; macrorecall >= 0.8 vs the
        # brute gold is pinned in tests/test_dedup_ann.py (the
        # reference's own CI bar, test/testsearchgraph.jl:22-26)
        "searchgraph_knn": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.searchgraph",
            fromlist=["searchgraph_knn"],
        ).searchgraph_knn(sf, k=8, n_queries=20),
        # -- ANN scale path + transforms ----------------------------------
        # full probe == exact → shares the brute-force oracle
        "knn_search_ivf_full": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.ivf", fromlist=["knn_search_ivf"]
        ).knn_search_ivf(sf, k=8, n_queries=20, n_centroids=8, nprobe=8),
        "knn_search_ivf": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.ivf", fromlist=["knn_search_ivf"]
        ).knn_search_ivf(sf, k=8, n_queries=20, n_centroids=16, nprobe=4),
        # IVF-PQ: probabilistic candidate selection (recall pinned in
        # tests); reported distances are exact (refine step) — rows-only
        "knn_search_ivfpq": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.ivf", fromlist=["knn_search_ivfpq"]
        ).knn_search_ivfpq(sf, k=8, n_queries=20),
        "pq_codes": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.ivf", fromlist=["pq_encode_embeddings"]
        ).pq_encode_embeddings(sf),
        "random_projection": _random_projection_long,
        "quantize_embeddings": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.transform", fromlist=["quantize_embeddings"]
        ).quantize_embeddings(sf, bits=8),
        # -- dataset-level sampling / set ops (SURVEY §2.7) ----------------
        "docs_sample": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.setops", fromlist=["sample_documents"]
        ).sample_documents(sf, every=20),
        "docs_setops": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.setops", fromlist=["docs_setops"]
        ).docs_setops(sf, lang="en", token="data"),
        # -- multimodal plumbing (decode stubbed per brief) ---------------
        "media_features": lambda sf: __import__(
            "similaritysearch_jl_ray.pipelines.media", fromlist=["decode_features"]
        ).decode_features(sf),
        # -- text analysis (task brief) -----------------------------------
        "lang_dist": textstats.lang_dist,
        "token_totals_by_lang": textstats.token_totals_by_lang,
        "quality_scores": textstats.quality_scores,
        "lang_id": textstats.lang_id,
        "doc_fingerprint": textstats.doc_fingerprint,
        "repetition_scores": textstats.repetition_scores,
        "bigram_pmi": lambda sf: textstats.bigram_pmi(sf, min_count=5, top_n=20),
        # composed C4/Gopher-style cleaning verdicts (first-failing-rule)
        "corpus_filter": textstats.corpus_filter,
        # -- stream-shaped (events) ---------------------------------------
        "windowed_event_counts": lambda sf: events.windowed_event_counts(sf, window_s=3600),
        "sliding_event_counts": lambda sf: events.sliding_event_counts(
            sf, window_s=3600, slide_s=900
        ),
        "late_event_stats": lambda sf: events.late_event_stats(sf, watermark_s=7200),
        "sessionize": lambda sf: events.sessionize(sf, gap_s=1800),
    }
    # The driver's correctness run samples the FIRST 50 entries, so
    # ordering is a verification-coverage decision, not cosmetics.
    # Front of the window (round 5): the 39 entries the round-4 driver
    # never sampled (positions 51-89 then — dedup/ann/textstats/events,
    # including the never-checked searchgraph_knn / knn_search_ivfpq /
    # pq_codes / repetition_scores / bigram_pmi / corpus_filter and the
    # late-r4 rewrites sessionize / docs_setops / doc_fingerprint),
    # plus the 11 flagship or round-5-touched search entries. The
    # long-stable bm25 mode variants (green in r2/r3/r4 and re-proven
    # every session by tests/test_oracle_parity.py) rotate to the tail.
    front = [
        "dedup_clusters", "decontaminate", "minhash_lsh_pairs",
        "simhash_pairs", "embedding_neardup_pairs", "knn_search",
        "allknn", "closestpair", "fft", "distsample", "rerank",
        "hsp_filter", "sat_neighborhood", "distal_sat_neighborhood",
        "kcenters_neighborhood", "permuted_knn_search",
        "neardup_embeddings", "searchgraph_knn", "knn_search_ivf_full",
        "knn_search_ivf", "knn_search_ivfpq", "pq_codes",
        "random_projection", "quantize_embeddings", "docs_sample",
        "docs_setops", "media_features", "lang_dist",
        "token_totals_by_lang", "quality_scores", "lang_id",
        "doc_fingerprint", "repetition_scores", "bigram_pmi",
        "corpus_filter", "windowed_event_counts",
        "sliding_event_counts", "late_event_stats", "sessionize",
        # round-5-touched / flagship search entries
        "bm25_topk", "bm25_topk_exhaustive", "bm25_topk_sharded",
        "corpus_stats", "match_counts",
        "match_stats", "bm25_topk_collapse", "significant_terms",
        # new this round — each needs its first driver row
        "hybrid_rrf", "top_hits_lang", "bm25_topk_spannear",
    ]
    assert set(front) <= set(entries), sorted(set(front) - set(entries))
    # the driver samples EXACTLY the first 50 — a shorter front wastes
    # window slots on whatever dict order follows; a longer one silently
    # pushes a chosen entry out of the hard signal
    assert len(front) == 50, len(front)
    ordered = {k: entries[k] for k in front}
    ordered.update((k, v) for k, v in entries.items() if k not in ordered)
    return ordered


def _fft_sql(k: int = 5) -> str:
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT min(vec_id) AS id FROM e)",
        "d0 AS (SELECT e.vec_id, list_distance(e.v,"
        " (SELECT v FROM e WHERE vec_id = (SELECT id FROM c0))) AS nnd FROM e)",
    ]
    selects = ["SELECT 0::BIGINT AS step, (SELECT id FROM c0)::BIGINT AS center_id, 0.0::DOUBLE AS dmax"]
    for i in range(1, k):
        ctes.append(f"m{i} AS (SELECT max(nnd) AS dmax FROM d{i-1})")
        ctes.append(
            f"c{i} AS (SELECT min(vec_id) AS id FROM d{i-1} WHERE nnd = (SELECT dmax FROM m{i}))"
        )
        ctes.append(
            f"d{i} AS (SELECT d{i-1}.vec_id, least(d{i-1}.nnd, list_distance(e.v,"
            f" (SELECT v FROM e WHERE vec_id = (SELECT id FROM c{i})))) AS nnd"
            f" FROM d{i-1} JOIN e ON e.vec_id = d{i-1}.vec_id)"
        )
        selects.append(
            f"SELECT {i}::BIGINT, (SELECT id FROM c{i})::BIGINT, round((SELECT dmax FROM m{i}), 6)"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects) + "\nORDER BY step"


_TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"

_GRAMS_CTE = f"""
toklists AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM toklists WHERE len(toks) >= 3),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS gram FROM pos
  UNION
  SELECT DISTINCT doc_id, array_to_string(toks, ' ') AS gram
  FROM toklists WHERE len(toks) BETWEEN 1 AND 2
)
"""


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
        "bm25_topk_sharded": _bm25_sql(),
        "index_export": f"""
WITH {_TOK_CTES}
SELECT tf.term, tf.doc_id, tf.tf, dl.dl
FROM tf JOIN dl ON dl.doc_id = tf.doc_id
""",
        "bm25_topk_and": _bm25_sql(conjunctive=True),
        "bm25_topk_msm": _bm25_sql(min_match=2),
        "bm25_topk_synonym": _synonym_sql(),
        "match_counts": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
qi AS (SELECT * FROM {_qids_sql()}),
mc AS (
  SELECT q.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matches
  FROM q LEFT JOIN tf ON tf.term = q.term
  GROUP BY q.query_id
)
SELECT qi.query_id, coalesce(mc.n_matches, 0)::BIGINT AS n_matches
FROM qi LEFT JOIN mc ON mc.query_id = qi.query_id
""",
        "hybrid_rrf": _hybrid_rrf_sql(),
        "top_hits_lang": _top_hits_sql(),
        "lang_cardinality": _lang_cardinality_sql(),
        "bm25_explain": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
contrib AS (
  SELECT q.query_id, tf.doc_id, q.term,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_K1} + 1)
           / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)) AS contribution
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, sum(contribution) AS fscore
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM scores
)
SELECT r.query_id, r.rank, r.doc_id, c.term, round(c.contribution, {_ROUND}) AS contribution
FROM ranked r
JOIN contrib c ON c.query_id = r.query_id AND c.doc_id = r.doc_id
WHERE r.rank <= {K}
ORDER BY r.query_id, r.rank, c.term
""",
        "bm25_topk_funcscore": _funcscore_sql(),
        "percolate": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()})
SELECT q.query_id, tf.doc_id
FROM q JOIN tf ON tf.term = q.term
GROUP BY q.query_id, tf.doc_id
HAVING count(*) = (SELECT count(*) FROM q q2 WHERE q2.query_id = q.query_id)
""",
        "bm25_topk_rescore_phrase": _rescore_phrase_sql(),
        "significant_terms": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
m AS (SELECT query_id, doc_id FROM scores),
mn AS (SELECT query_id, count(*)::DOUBLE AS m FROM m GROUP BY query_id),
a AS (
  SELECT m.query_id, tf.term, count(*)::BIGINT AS a
  FROM m JOIN tf ON tf.doc_id = m.doc_id
  GROUP BY m.query_id, tf.term
),
lifted AS (
  SELECT a.query_id, a.term, a.a AS n_match,
         round(((a.a::DOUBLE * s.n)) / ((mn.m * df.df::DOUBLE)), {_ROUND}) AS lift
  FROM a
  JOIN mn ON mn.query_id = a.query_id
  JOIN df ON df.term = a.term
  CROSS JOIN stats s
  WHERE a.a >= 3
),
ranked AS (
  SELECT query_id, term, n_match, lift,
         row_number() OVER (PARTITION BY query_id ORDER BY lift DESC, term) AS rk
  FROM lifted
)
SELECT query_id, term, n_match, lift FROM ranked WHERE rk <= 5
ORDER BY query_id, rk
""",
        "match_stats": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
agg AS (
  SELECT query_id, count(*)::BIGINT AS n, max(fscore) AS mx, sum(fscore) AS sm
  FROM scores GROUP BY query_id
),
qq AS (SELECT * FROM {_qids_sql()})
SELECT qq.query_id, coalesce(agg.n, 0)::BIGINT AS n_matches,
       round(coalesce(agg.mx, 0.0), {_ROUND}) AS max_score,
       round(coalesce(agg.sm, 0.0), {_ROUND}) AS sum_score
FROM qq LEFT JOIN agg ON agg.query_id = qq.query_id
""",
        "complete_prefix": f"""
WITH {_TOK_CTES},
px(prefix) AS (VALUES ('s'), ('b'), ('me'), ('da'), ('w'), ('zz')),
cand AS (
  SELECT px.prefix, df.term, df.df
  FROM px JOIN df ON df.term LIKE px.prefix || '%'
),
ranked AS (
  SELECT prefix, term, df,
         row_number() OVER (PARTITION BY prefix ORDER BY df DESC, term) AS rank
  FROM cand
)
SELECT prefix, rank, term, df FROM ranked WHERE rank <= 5 ORDER BY prefix, rank
""",
        "bm25_topk_collapse": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
scores AS (
  SELECT q.query_id, tf.doc_id, {_BM25_SUM} AS fscore
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
grouped AS (
  SELECT sc.query_id, sc.doc_id, sc.fscore,
         row_number() OVER (PARTITION BY sc.query_id, d.lang
                            ORDER BY sc.fscore DESC, sc.doc_id) AS lrank
  FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id
),
ranked AS (
  SELECT query_id, doc_id, fscore,
         row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id) AS rank
  FROM grouped WHERE lrank = 1
)
SELECT query_id, rank, doc_id, round(fscore, {_ROUND}) AS score
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
""",
        "bm25_topk_lang_en": _bm25_sql(
            doc_join="JOIN documents dd ON dd.doc_id = tf.doc_id AND dd.lang = 'en'"
        ),
        "bm25_topk_phrase": _phrase_sql(),
        "bm25_topk_fields": _fields_sql(),
        "bm25_topk_bm25f": _bm25f_sql(),
        "bm25_topk_bool": _bool_sql(),
        "bm25_topk_tree": _tree_sql(),
        # tombstone mask: stats over the FULL corpus, only the result
        # set filtered (Lucene live-docs — mirrors Bm25Scorer._deleted)
        "bm25_topk_deleted": _bm25_sql(
            doc_join="JOIN documents dd ON dd.doc_id = tf.doc_id AND dd.doc_id % 7 <> 3"
        ),
        # delete_by_query('fast merge'): anti-join the query's match
        # set; stats stay full-corpus (live-docs, same as _deleted)
        "bm25_topk_delete_by_query": _bm25_sql(
            doc_join=(
                "JOIN (SELECT d2.doc_id FROM documents d2 WHERE NOT EXISTS "
                "(SELECT 1 FROM tf t2 WHERE t2.doc_id = d2.doc_id "
                "AND t2.term IN ('fast', 'merge'))) keepd "
                "ON keepd.doc_id = tf.doc_id"
            )
        ),
        # purge: stats/df recomputed over the survivor corpus (mirrors
        # purge_tombstones ≡ rebuild-on-survivors, proven in tests)
        "bm25_topk_purged": _bm25_sql(
            docs_src="(SELECT * FROM documents WHERE doc_id % 7 <> 3)"
        ),
        "bm25_topk_prefix": _expanded_sql("prefix"),
        "bm25_topk_fuzzy": _expanded_sql("fuzzy"),
        "bm25_topk_wildcard": _expanded_sql("wildcard"),
        "bm25_topk_regexp": _expanded_sql("regexp"),
        "bm25_topk_near": _near_sql(),
        "bm25_topk_spannear": _spannear_sql(),
        "more_like_this": _mlt_sql(),
        "bm25_topk_paged": _bm25_sql(k=2 * K),
        "facet_lang": f"""
WITH {_TOK_CTES},
q AS (SELECT * FROM {_queries_sql()}),
m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf ON tf.term = q.term)
SELECT m.query_id, d.lang, count(*)::BIGINT AS n_docs
FROM m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY m.query_id, d.lang
ORDER BY m.query_id, d.lang
""",
        "term_vectors": f"""
WITH {_TOK_CTES}
SELECT doc_id, term, tf FROM tf
WHERE doc_id IN ({", ".join(str(d) for d in TV_DOCS)})
ORDER BY doc_id, term
""",
        # merged two-way index must equal the single-build ranking
        "bm25_topk_merged": _bm25_sql(),
        "sort_by_url": _sort_by_url_sql(),
        "spell_suggest": _spell_suggest_sql(),
        "pack_documents": _PACK_SQL,
        "domain_balance": (
            "SELECT doc_id, source FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15 "
            "ORDER BY doc_id"
        ),
        "bm25_topk_highlight": _highlight_sql(),
        "bm25_topk_dismax": _dismax_sql(),
        "bm25_topk_boost": _boost_sql(),
        # -- dedup ---------------------------------------------------------
        "exact_dedup": (
            "SELECT min(doc_id)::BIGINT AS keeper_doc_id, count(*)::BIGINT AS group_size"
            " FROM documents GROUP BY text"
        ),
        "window_dedup": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
w AS (
  SELECT doc_id,
         unnest(list_transform(range(0, (len(toks) // 3)::BIGINT),
                i -> array_to_string(toks[(i*3+1)::INT : (i*3+3)::INT], ' '))) AS win
  FROM t
)
SELECT win, count(*)::BIGINT AS n_occurrences, min(doc_id)::BIGINT AS keeper_doc_id
FROM w GROUP BY win HAVING count(*) >= 2
""",
        # url_dedup: the noisy-variant synthesis + canonicalization
        # contract is shared VERBATIM with pipelines/dedup.url_dedup
        "url_dedup": r"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN base
      WHEN 1 THEN 'https://www.' || substr(base, 9)
      WHEN 2 THEN base || '/'
      ELSE base || '?utm_source=feed&ref=rss' END AS url
  FROM (SELECT doc_id, 'https://example.com/page-' || (doc_id // 2) AS base FROM documents)
),
c AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
      '^https?://', ''), '^www\.', ''), '\?.*$', ''), '/+$', '') AS canon_url
  FROM u
)
SELECT canon_url, min(doc_id)::BIGINT AS keeper_doc_id, count(*)::BIGINT AS n_dups
FROM c GROUP BY canon_url
""",
        "decontaminate": f"""
WITH {_GRAMS_CTE},
ev AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0),
ov AS (
  SELECT tr.doc_id AS train_doc_id, ev.doc_id AS eval_doc_id,
         count(*)::BIGINT AS shared_ngrams
  FROM tr JOIN ev ON tr.gram = ev.gram
  GROUP BY 1, 2
)
SELECT train_doc_id, eval_doc_id, shared_ngrams
FROM ov WHERE shared_ngrams >= 2
ORDER BY train_doc_id, eval_doc_id
""",
        "ngram_jaccard_pairs": f"""
WITH {_GRAMS_CTE},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND b.doc_id > a.doc_id
  GROUP BY da, db
),
jac AS (
  SELECT da AS doc_a, db AS doc_b,
         inter::DOUBLE / (sa.sz + sb.sz - inter) AS j
  FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
)
SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM jac WHERE j >= 0.5
""",
        "dedup_clusters": f"""
WITH RECURSIVE {_GRAMS_CTE},
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND b.doc_id > a.doc_id
  GROUP BY da, db
),
jac AS (
  SELECT da AS doc_a, db AS doc_b
  FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
  WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM jac
          UNION ALL SELECT doc_b, doc_a FROM jac),
reach(node, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(m)::BIGINT AS keeper_doc_id FROM reach GROUP BY node
""",
        # minhash_lsh_pairs / simhash_pairs: probabilistic candidates →
        # rows-only driver check (recall/precision proven in pytest).
        "embedding_neardup_pairs": """
WITH d AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
  FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
)
SELECT vec_a, vec_b, round(cos, 6) AS cosine FROM d WHERE cos >= 0.3
""",
        # -- knn suite -----------------------------------------------------
        "knn_search": """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 20),
d AS (SELECT q.qid, e.vec_id, list_distance(q.qe, e.embedding::DOUBLE[]) AS dist
      FROM q, embeddings e),
r AS (SELECT qid AS query_id, vec_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rank FROM d)
SELECT query_id, rank, vec_id, round(dist, 6) AS dist FROM r WHERE rank <= 8
""",
        "allknn": """
WITH d AS (SELECT a.vec_id, b.vec_id AS nn_id,
                  list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
           FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
r AS (SELECT vec_id, nn_id, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, nn_id) AS rank FROM d)
SELECT vec_id, rank, nn_id, round(dist, 6) AS dist FROM r WHERE rank <= 4
""",
        "closestpair": """
WITH d AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                  list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
           FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id)
SELECT vec_a, vec_b, round(dist, 6) AS dist FROM d ORDER BY d.dist, vec_a, vec_b LIMIT 1
""",
        "fft": _fft_sql(5),
        "knn_search_ivf_full": """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 20),
d AS (SELECT q.qid, e.vec_id, list_distance(q.qe, e.embedding::DOUBLE[]) AS dist
      FROM q, embeddings e),
r AS (SELECT qid AS query_id, vec_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rank FROM d)
SELECT query_id, rank, vec_id, round(dist, 6) AS dist FROM r WHERE rank <= 8
""",
        "distsample": """
WITH n AS (SELECT count(*)::BIGINT AS c FROM embeddings),
p AS (SELECT e.vec_id AS i, (e.vec_id * 31 + 7) % (SELECT c FROM n) AS j FROM embeddings e),
pp AS (SELECT i, j FROM p WHERE i <> j),
d AS (SELECT list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
      FROM pp JOIN embeddings a ON a.vec_id = pp.i JOIN embeddings b ON b.vec_id = pp.j)
SELECT 0.1::DOUBLE AS q, round(quantile_cont(dist, 0.1)::DOUBLE, 6) AS value FROM d
UNION ALL SELECT 0.5::DOUBLE, round(quantile_cont(dist, 0.5)::DOUBLE, 6) FROM d
UNION ALL SELECT 0.9::DOUBLE, round(quantile_cont(dist, 0.9)::DOUBLE, 6) FROM d
ORDER BY q
""",
        "rerank": """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10),
c AS (SELECT q.qid, e.vec_id,
             1.0 - list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cdist,
             list_distance(q.qe, e.embedding::DOUBLE[]) AS ldist
      FROM q, embeddings e),
cand AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cdist, vec_id) AS crank FROM c),
rr AS (SELECT qid AS query_id, vec_id, ldist,
              row_number() OVER (PARTITION BY qid ORDER BY ldist, vec_id) AS rank
       FROM cand WHERE crank <= 20)
SELECT query_id, rank, vec_id, round(ldist, 6) AS dist FROM rr WHERE rank <= 8
""",
        "docs_sample": "SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0",
        "docs_setops": """
WITH a AS (SELECT doc_id FROM documents WHERE lang = 'en'),
b AS (SELECT doc_id FROM documents
      WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), 'data'))
SELECT 'union' AS op, doc_id FROM (SELECT doc_id FROM a UNION SELECT doc_id FROM b)
UNION ALL
SELECT 'intersect', doc_id FROM (SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b)
UNION ALL
SELECT 'except', doc_id FROM (SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b)
""",
        # hsp_filter / neardup_embeddings: order-dependent (reference
        # contract ported, trajectory not SQL-expressible) → rows-only.
        # -- text analysis -------------------------------------------------
        "lang_dist": "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang",
        "token_totals_by_lang": (
            f"SELECT lang, sum(len({_TOKS_SQL}))::BIGINT AS total_tokens"
            " FROM documents GROUP BY lang"
        ),
        "quality_scores": f"""
SELECT doc_id, length(text)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
  CASE WHEN len(toks) = 0 THEN 0.0
       ELSE round(len(list_distinct(toks))::DOUBLE / len(toks), 6) END AS uniq_ratio,
  CASE WHEN len(toks) = 0 THEN 0.0
       ELSE round(len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE / len(toks), 6)
       END AS stop_ratio
FROM (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
""",
        # lang_id / doc_fingerprint: heuristic/hash internals → rows-only.
        "repetition_scores": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t
),
c AS (SELECT doc_id, bg, count(*)::BIGINT AS c FROM b GROUP BY doc_id, bg),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS nb,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup,
         max(c)::BIGINT AS mx
  FROM c GROUP BY doc_id
)
SELECT t.doc_id, coalesce(agg.nb, 0)::BIGINT AS n_bigrams,
  CASE WHEN coalesce(agg.nb, 0) = 0 THEN 0.0
       ELSE round(agg.dup::DOUBLE / agg.nb, 6) END AS dup_bigram_ratio,
  CASE WHEN coalesce(agg.nb, 0) = 0 THEN 0.0
       ELSE round(agg.mx::DOUBLE / agg.nb, 6) END AS top_bigram_ratio
FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
""",
        # corpus_filter: rule thresholds shared verbatim with
        # textstats (20/1200 tokens, stop_ratio ≥ 0.01 on the ROUNDED
        # value, top_bigram_ratio ≤ 0.12 rounded) — first failing rule
        "corpus_filter": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
feat AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE round(len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE
                         / len(toks), 6) END AS stop_ratio
  FROM t
),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t
),
c AS (SELECT doc_id, bg, count(*)::BIGINT AS c FROM b GROUP BY doc_id, bg),
agg AS (SELECT doc_id, sum(c)::BIGINT AS nb, max(c)::BIGINT AS mx FROM c GROUP BY doc_id),
rep AS (
  SELECT t.doc_id,
         CASE WHEN coalesce(agg.nb, 0) = 0 THEN 0.0
              ELSE round(agg.mx::DOUBLE / agg.nb, 6) END AS top_bigram_ratio
  FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
),
verdict AS (
  SELECT f.doc_id,
         CASE WHEN f.n_tokens < 20 THEN 'min_tokens'
              WHEN f.n_tokens > 1200 THEN 'max_tokens'
              WHEN f.stop_ratio < 0.01 THEN 'stop_ratio'
              WHEN r.top_bigram_ratio > 0.12 THEN 'top_bigram_ratio'
              ELSE '' END AS reject_reason
  FROM feat f JOIN rep r ON r.doc_id = f.doc_id
)
SELECT doc_id, (reject_reason = '') AS keep, reject_reason FROM verdict
""",
        # bigram_pmi: pmi = ln(((c_xy·NU)·NU)/((NB·c_x)·c_y)) — the
        # association order is fixed and mirrored in textstats.bigram_pmi
        "bigram_pmi": f"""
WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents),
u AS (SELECT unnest(toks) AS term FROM t),
nu AS (SELECT count(*)::DOUBLE AS nu FROM u),
uc AS (SELECT term, count(*)::DOUBLE AS c FROM u GROUP BY term),
bgl AS (
  SELECT unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i + 1]])) AS pr
  FROM t
),
nb AS (SELECT count(*)::DOUBLE AS nb FROM bgl),
bc AS (
  SELECT pr[1] AS x, pr[2] AS y, count(*)::BIGINT AS c_xy
  FROM bgl GROUP BY pr[1], pr[2] HAVING count(*) >= 5
),
p AS (
  SELECT bc.x || ' ' || bc.y AS bigram, bc.c_xy,
         round(ln(((bc.c_xy::DOUBLE * nu.nu) * nu.nu) / ((nb.nb * ux.c) * uy.c)), 6) AS pmi
  FROM bc CROSS JOIN nu CROSS JOIN nb
  JOIN uc ux ON ux.term = bc.x
  JOIN uc uy ON uy.term = bc.y
)
SELECT row_number() OVER (ORDER BY pmi DESC, bigram)::BIGINT AS rank, bigram, c_xy, pmi
FROM p ORDER BY pmi DESC, bigram LIMIT 20
""",
        # -- events --------------------------------------------------------
        "windowed_event_counts": """
SELECT event_type, ((epoch_us(ts) // 1000000) // 3600 * 3600)::BIGINT AS window_start,
       count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY event_type, window_start
""",
        "sliding_event_counts": """
SELECT event_type,
       ((((epoch_us(ts) // 1000000) // 900) - k.k) * 900)::BIGINT AS window_start,
       count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events, (SELECT unnest(range(0, 4)) AS k) AS k
GROUP BY event_type, window_start
""",
        "late_event_stats": """
WITH e AS (SELECT event_type, epoch_us(ts) // 1000000 AS s FROM events),
m AS (SELECT event_type, max(s) AS mx FROM e GROUP BY event_type)
SELECT e.event_type, count(*)::BIGINT AS n_total,
       sum(CASE WHEN e.s < m.mx - 7200 THEN 1 ELSE 0 END)::BIGINT AS n_late,
       m.mx::BIGINT AS max_ts_s
FROM e JOIN m ON m.event_type = e.event_type
GROUP BY e.event_type, m.mx
""",
        "sessionize": """
WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS s FROM events),
o AS (SELECT user_id, s, lag(s) OVER (PARTITION BY user_id ORDER BY s) AS prev FROM e),
f AS (SELECT user_id, s,
             CASE WHEN prev IS NULL OR s - prev > 1800 THEN 1 ELSE 0 END AS new_sess FROM o),
g AS (SELECT user_id, s,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY s
                                 ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       min(s)::BIGINT AS start_s, max(s)::BIGINT AS end_s
FROM g GROUP BY user_id, session_id
""",
    }
