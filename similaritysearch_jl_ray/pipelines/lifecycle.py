"""Index lifecycle: rebuild and incremental append (SURVEY.md §2.5).

* :func:`rebuild` — the reference's ``rebuild``
  (``/root/reference/src/searchgraph/rebuild.jl:17-53``): re-derive the
  whole index against the full dataset. Here that is just re-running
  the build DAG with the checkpoints cleared — cheap to express by
  construction.
* :func:`append_pages` — the ``push_item!`` analog
  (``src/searchgraph/insertions.jl:123-142``): new documents arrive as
  a DELTA segment (its own stage-D layout under ``delta=N/``); readers
  treat a term's logical posting list as base runs ++ delta runs.
  Contract (asserted): appended doc_ids exceed every existing doc_id —
  true for any crawl-style append where ids derive from (partition,
  row) of ever-growing input — so runs stay range-ordered and serving
  needs no re-encode. Compaction = :func:`rebuild`.
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = ["rebuild", "append_pages", "delta_dirs", "maybe_compact", "compact_deltas"]

from .build_index import build_index


def rebuild(pages_ds, index_dir: str, **build_kwargs) -> dict:
    """Full rebuild: clear every checkpoint, re-run the DAG."""
    for sub in ("docmap", "postings", "meta", "runs_tmp"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    for f in ("stats.json", "head_sketch.json"):
        try:
            os.remove(os.path.join(index_dir, f))
        except FileNotFoundError:
            pass
    for d in delta_dirs(index_dir):
        shutil.rmtree(d, ignore_errors=True)
    return build_index(pages_ds, index_dir, **build_kwargs)


def delta_dirs(index_dir: str) -> list[str]:
    out = []
    if os.path.isdir(index_dir):
        for name in sorted(os.listdir(index_dir)):
            if name.startswith("delta="):
                out.append(os.path.join(index_dir, name))
    return out


def append_pages(pages_ds, index_dir: str, max_deltas: int | None = 4, **build_kwargs) -> dict:
    """Append new documents as a delta segment.

    The delta is a full mini-index (same layout) under ``delta=N/``;
    :class:`state.reader.IndexReader` merges base + deltas at load.

    When the delta count exceeds ``max_deltas`` the index SELF-COMPACTS
    (:func:`compact_deltas` — segment-level fold, no raw-page access),
    so a long-lived append-heavy index never accretes unbounded read
    amplification. ``max_deltas=None`` disables the trigger (callers
    that batch appends and compact once at the end).
    """
    with open(os.path.join(index_dir, "stats.json")) as f:
        base_stats = json.load(f)
    existing = delta_dirs(index_dir)
    # the append contract holds against base AND every prior delta
    base_hi = base_stats["max_doc"]
    for d in existing:
        with open(os.path.join(d, "stats.json")) as f:
            base_hi = max(base_hi, json.load(f)["max_doc"])
    n = len(existing) + 1
    delta_dir = os.path.join(index_dir, f"delta={n}")
    build_kwargs.setdefault("num_parts", base_stats["num_parts"])
    build_kwargs.setdefault("salt_factor", base_stats["salt_factor"])
    stats = build_index(pages_ds, delta_dir, **build_kwargs)
    lo = _min_doc(delta_dir)
    if lo is not None and lo <= base_hi:
        shutil.rmtree(delta_dir, ignore_errors=True)
        raise ValueError(
            f"append violates id ordering: delta min doc {lo} <= base max {base_hi}; "
            "use rebuild() for overlapping id spaces"
        )
    if max_deltas is not None and len(delta_dirs(index_dir)) > max_deltas:
        compact_deltas(index_dir)
    return stats


def compact_deltas(index_dir: str) -> dict:
    """Fold every delta segment into the base segment — segment-level
    LSM compaction, NO raw-page access (contrast :func:`rebuild`).

    Per term-hash part, one Ray task concatenates base+delta posting
    rows. A term whose every source segment holds a single run gets its
    runs merged ZERO-COPY (``concat_runs`` — the append contract makes
    segment doc-ranges disjoint and ascending, so payload bytes
    concatenate without decode); salted head-term rows keep their span
    granularity (doc-range pushdown stays row-group-effective). Salts
    are renumbered in run_first order, preserving the reader's
    (term, salt)-sort ⇒ doc-order invariant across what used to be
    segment boundaries. Docmap files move into the base docmap (which
    also folds appended docs into the lang-filter view); merged
    stats.json carries summed n_docs/total_tokens and max max_doc, so
    idf/avgdl are unchanged from the delta-extended logical index —
    serving is rank- AND score-identical before/after (tested).

    Positions (layout v4) survive when every segment carries them;
    a mixed v3 base drops the sidecar for merged rows (``concat_runs``
    contract) and the merged stats record with_positions=False.
    """
    import ray

    deltas = delta_dirs(index_dir)
    if not deltas:
        return json.load(open(os.path.join(index_dir, "stats.json")))
    with open(os.path.join(index_dir, "stats.json")) as f:
        base_stats = json.load(f)
    seg_stats = [base_stats]
    for d in deltas:
        with open(os.path.join(d, "stats.json")) as f:
            seg_stats.append(json.load(f))
    num_parts = base_stats["num_parts"]

    @ray.remote
    def _compact_part(index_dir: str, deltas: list[str], p: int) -> dict:
        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pqw

        from ..state.segment import EncodedPostings, concat_runs
        from .build_index import RUN_SCHEMA

        rows_by_term: dict[str, list] = {}
        max_runs_one_seg: dict[str, int] = {}
        for seg in [index_dir] + deltas:
            part_dir = os.path.join(seg, "postings", f"part={p}")
            tbl = pads.dataset(part_dir, format="parquet").to_table().combine_chunks()
            t_col = tbl.column("term").to_numpy(zero_copy_only=False)
            per_seg: dict[str, int] = {}
            for i in range(tbl.num_rows):
                t = t_col[i]
                rows_by_term.setdefault(t, []).append(EncodedPostings.from_arrow_row(tbl, int(i)))
                per_seg[t] = per_seg.get(t, 0) + 1
            for t, c in per_seg.items():
                max_runs_one_seg[t] = max(max_runs_one_seg.get(t, 0), c)
        out_rows = []
        for t in sorted(rows_by_term):
            runs = sorted(rows_by_term[t], key=lambda r: int(r.block_first[0]) if len(r.block_first) else -1)
            if max_runs_one_seg[t] == 1 and len(runs) > 1:
                runs = [concat_runs(runs)]  # tail term: one run again
            for salt, r in enumerate(runs):
                row = r.to_row(t)
                row["salt"] = salt
                row["part"] = p
                out_rows.append(row)
        schema = RUN_SCHEMA.remove(RUN_SCHEMA.get_field_index("skey"))
        out_tbl = pa.Table.from_pylist(out_rows, schema=schema)
        part_out = os.path.join(index_dir, "postings", f"part={p}")
        tmp_out = part_out + ".compact_tmp"
        shutil.rmtree(tmp_out, ignore_errors=True)
        os.makedirs(tmp_out)
        pqw.write_table(out_tbl, os.path.join(tmp_out, "compacted.parquet"), compression="zstd")
        shutil.rmtree(part_out)
        os.rename(tmp_out, part_out)
        return {"part": p, "terms": len(rows_by_term), "runs": len(out_rows)}

    metas = ray.get(
        [_compact_part.remote(index_dir, deltas, p) for p in range(num_parts)]
    )
    meta_dir = os.path.join(index_dir, "meta")
    for m in metas:
        path = os.path.join(meta_dir, f"part={m['part']}.json")
        with open(path) as f:
            old = json.load(f)
        old.update({"compacted_segments": len(deltas) + 1, "runs": m["runs"]})
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(old, f)
        os.replace(tmp, path)
    # docmap: fold delta docmaps into the base docmap directory (the
    # lang-filter pushdown reads this dir; appended docs join it here)
    docmap_dir = os.path.join(index_dir, "docmap")
    for di, d in enumerate(deltas, start=1):
        src = os.path.join(d, "docmap")
        if os.path.isdir(src):
            for name in os.listdir(src):
                os.rename(os.path.join(src, name), os.path.join(docmap_dir, f"delta{di}_{name}"))
    merged = dict(base_stats)
    merged.update(
        {
            "n_docs": sum(s["n_docs"] for s in seg_stats),
            "total_tokens": sum(s["total_tokens"] for s in seg_stats),
            "max_doc": max(s["max_doc"] for s in seg_stats),
            "with_positions": all(s.get("with_positions", False) for s in seg_stats),
            "compactions": int(base_stats.get("compactions", 0)) + 1,
        }
    )
    merged["avgdl"] = merged["total_tokens"] / max(1, merged["n_docs"])
    stats_path = os.path.join(index_dir, "stats.json")
    tmp = stats_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, stats_path)
    for d in deltas:
        shutil.rmtree(d, ignore_errors=True)
    return merged


def maybe_compact(full_pages_ds, index_dir: str, max_deltas: int = 4, **build_kwargs):
    """Compaction policy: when the delta count exceeds ``max_deltas``,
    rebuild the whole index from ``full_pages_ds`` (base + all appended
    pages); otherwise no-op. Returns (compacted: bool, stats | None).

    Serving cost grows with delta count (each term's logical posting
    list is base runs ++ one run-set per delta — reader.py), so an
    append-heavy workload periodically folds deltas back into a single
    base segment. The threshold trades append latency (cheap deltas)
    against read amplification, exactly the LSM compaction trade-off;
    the reference's only equivalent is a full ``rebuild``
    (``/root/reference/src/searchgraph/rebuild.jl:17-53``).
    """
    if len(delta_dirs(index_dir)) <= max_deltas:
        return False, None
    return True, rebuild(full_pages_ds, index_dir, **build_kwargs)


def _min_doc(index_dir: str):
    import pyarrow.dataset as pads

    postings = os.path.join(index_dir, "postings")
    lo = None
    for part in os.listdir(postings):
        t = pads.dataset(os.path.join(postings, part), format="parquet").to_table(
            columns=["run_first"]  # scalar span column (layout v3)
        )
        for v in t["run_first"].to_pylist():
            if v is not None and v >= 0:
                lo = v if lo is None else min(lo, v)
    return lo
