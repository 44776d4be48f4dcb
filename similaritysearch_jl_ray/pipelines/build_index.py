"""Inverted-index build: the engine's ``index!`` (SURVEY.md §2.5, §3.2).

The reference builds its graph index by locked appends to a shared
``AdjList`` (``/root/reference/src/adj/adjlist.jl:55-67``) and freezes
it into CSR (``src/adj/adjstatic.jl:25-46``). Here the shared mutable
state is replaced by a salted ``groupby`` shuffle, and the freeze by
per-(term, salt) encoded runs — SPIMI re-expressed on Ray Data.

Checkpointed stage layout under ``index_dir`` (every stage is
skip-if-complete; stage D additionally resumes per output partition —
the north rule's "resumable from per-partition checkpoints with
lineage + metrics")::

    docs/               doc_id, url, lang, text   (extracted, html dropped)
    tokens/             term, doc_id, tf, dl      (SPIMI triples)
    stats.json          N, avgdl, vocab df sketch → head-term set, knobs
    postings/part=*/    term, salt, df, cf, payload, block_* arrays
    meta/part=*.json    docs, postings, bytes, terms  (lineage + metrics)

Skew handling (explicit, north rule): terms whose sketched df exceeds
``HEAD_TERM_DF_FRACTION × N`` are "head" terms; their shuffle key gets
a salt = doc_id *range* bucket (monotone in doc_id), so one head
term's postings build as ``salt_factor`` independent runs that a
reader later treats as one logical list — no single task ever holds a
stopword's full posting list, and no re-encode is needed at merge
because ranges are disjoint and ordered.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa

from ..config import (
    DEFAULT_BM25,
    DEFAULT_NUM_PARTS,
    DEFAULT_SALT_FACTOR,
    HEAD_TERM_DF_FRACTION,
    POSTING_BLOCK_SIZE,
    Bm25Params,
)
from ..stages.tokenize import extract_batch, tokenize_batch
from ..state.segment import encode_postings

__all__ = ["build_index", "term_part", "IndexBuildError"]


class IndexBuildError(RuntimeError):
    pass


def term_part(terms: np.ndarray | list[str], num_parts: int) -> np.ndarray:
    """Stable term → output-partition hash (crc32; never python hash())."""
    return np.fromiter(
        (zlib.crc32(t.encode()) % num_parts for t in terms), dtype=np.int64, count=len(terms)
    )


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _mark_done(path: str) -> None:
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok\n")


def build_index(
    pages_ds,
    index_dir: str,
    *,
    num_parts: int = DEFAULT_NUM_PARTS,
    salt_factor: int = DEFAULT_SALT_FACTOR,
    head_df_fraction: float = HEAD_TERM_DF_FRACTION,
    block_size: int = POSTING_BLOCK_SIZE,
    params: Bm25Params = DEFAULT_BM25,
    tokenize_batch_size: int = 1024,
) -> dict:
    """Build (or resume) the index; returns the stats dict.

    ``pages_ds`` is a Ray Dataset with the input_hint schema (plus the
    fixture's ride-along ``doc_id``; a real crawl would derive doc_id
    from (input partition, row index) — see sources/pages.py).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    os.makedirs(index_dir, exist_ok=True)
    docs_dir = os.path.join(index_dir, "docs")
    tokens_dir = os.path.join(index_dir, "tokens")
    stats_path = os.path.join(index_dir, "stats.json")
    postings_dir = os.path.join(index_dir, "postings")
    meta_dir = os.path.join(index_dir, "meta")

    # ---- stage A: extract (html → text), project early ------------------
    if not _done(docs_dir):
        shutil.rmtree(docs_dir, ignore_errors=True)
        pages_ds.map_batches(extract_batch, batch_format="pyarrow").write_parquet(docs_dir)
        _mark_done(docs_dir)

    # ---- stage B: tokenize → SPIMI triples ------------------------------
    if not _done(tokens_dir):
        shutil.rmtree(tokens_dir, ignore_errors=True)
        rd.read_parquet(docs_dir, columns=["doc_id", "text"]).map_batches(
            tokenize_batch, batch_format="pyarrow", batch_size=tokenize_batch_size
        ).write_parquet(tokens_dir)
        _mark_done(tokens_dir)

    # ---- stage C: global stats + df sketch → head-term set --------------
    if not os.path.exists(stats_path):
        n_docs = rd.read_parquet(docs_dir, columns=["doc_id"]).count()
        tok = rd.read_parquet(tokens_dir, columns=["term", "tf", "doc_id"])
        agg = tok.aggregate(Sum("tf", alias_name="total_tokens"), Max("doc_id", alias_name="max_doc"))
        # df per term: one triple row per (doc, term) → groupby count.
        # (Pre-aggregated by construction; the vocab-sized result is small.)
        df_tbl = (
            rd.read_parquet(tokens_dir, columns=["term"])
            .groupby("term")
            .aggregate(Count(alias_name="df"))
            .to_pandas()
        )
        head_cut = head_df_fraction * n_docs
        head = df_tbl[df_tbl["df"] > head_cut]
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": int(agg["total_tokens"]),
            "avgdl": float(agg["total_tokens"]) / max(1, int(n_docs)),
            "max_doc": int(agg["max_doc"]),
            "vocab": int(len(df_tbl)),
            "k1": params.k1,
            "b": params.b,
            "block_size": block_size,
            "num_parts": num_parts,
            "salt_factor": salt_factor,
            "head_df_fraction": head_df_fraction,
            "head_terms": {t: int(d) for t, d in zip(head["term"], head["df"])},
        }
        tmp = stats_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(tmp, stats_path)
    with open(stats_path) as f:
        stats = json.load(f)

    # ---- stage D: salted shuffle → encoded runs, per-part resume --------
    os.makedirs(meta_dir, exist_ok=True)
    done_parts = {
        int(name[len("part=") : -len(".json")])
        for name in os.listdir(meta_dir)
        if name.startswith("part=") and name.endswith(".json")
    }
    missing = [p for p in range(num_parts) if p not in done_parts]
    if missing:
        # clear debris from any crashed previous attempt at these parts
        for p in missing:
            shutil.rmtree(os.path.join(postings_dir, f"part={p}"), ignore_errors=True)

        head_terms = set(stats["head_terms"])
        avgdl = stats["avgdl"]
        max_doc = stats["max_doc"]
        salt_div = (max_doc // salt_factor) + 1  # doc_id // salt_div ∈ [0, salt_factor)
        missing_set = set(missing)

        def key_batch(batch: pa.Table) -> pa.Table:
            terms = np.asarray(batch["term"].to_pylist(), dtype=object)
            part = term_part(terms, num_parts)
            keep = np.isin(part, list(missing_set))
            if not keep.all():
                batch = batch.take(pa.array(np.flatnonzero(keep)))
                terms = terms[keep]
                part = part[keep]
            doc_ids = batch["doc_id"].to_numpy()
            is_head = np.fromiter((t in head_terms for t in terms), dtype=bool, count=len(terms))
            salt = np.where(is_head, doc_ids // salt_div, 0).astype(np.int64)
            skey = pa.array([f"{t}\x00{s}" for t, s in zip(terms, salt)], type=pa.string())
            return batch.append_column("part", pa.array(part)).append_column(
                "salt", pa.array(salt)
            ).append_column("skey", skey)

        def encode_group(group: pa.Table) -> pa.Table:
            term = group["term"][0].as_py()
            salt = int(group["salt"][0].as_py())
            part = int(group["part"][0].as_py())
            doc_ids = group["doc_id"].to_numpy()
            order = np.argsort(doc_ids, kind="stable")
            enc = encode_postings(
                doc_ids[order],
                group["tf"].to_numpy()[order],
                group["dl"].to_numpy()[order],
                avgdl=avgdl,
                block_size=block_size,
            )
            row = enc.to_row(term)
            row["salt"] = salt
            row["part"] = part
            return pa.Table.from_pylist([row])

        import ray.data as rd2

        tok = rd2.read_parquet(tokens_dir)
        runs = (
            tok.map_batches(key_batch, batch_format="pyarrow")
            .groupby("skey")
            .map_groups(encode_group, batch_format="pyarrow")
        )
        runs.write_parquet(postings_dir, partition_cols=["part"])

        # meta: per-partition lineage + metrics (docs, postings, bytes)
        import pyarrow.parquet as pq
        import pyarrow.dataset as pads

        for p in missing:
            part_dir = os.path.join(postings_dir, f"part={p}")
            os.makedirs(part_dir, exist_ok=True)  # a part may own no terms
            dset = pads.dataset(part_dir, format="parquet")
            t = dset.to_table(columns=["term", "df", "cf", "payload"])
            meta = {
                "part": p,
                "terms": int(len(set(t["term"].to_pylist()))),
                "runs": t.num_rows,
                "postings": int(np.sum(t["df"].to_numpy())) if t.num_rows else 0,
                "tokens": int(np.sum(t["cf"].to_numpy())) if t.num_rows else 0,
                "payload_bytes": int(sum(len(x) for x in t["payload"].to_pylist())),
            }
            tmp = os.path.join(meta_dir, f"part={p}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, os.path.join(meta_dir, f"part={p}.json"))
    return stats
