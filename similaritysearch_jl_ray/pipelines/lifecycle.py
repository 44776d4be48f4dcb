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

__all__ = ["rebuild", "append_pages", "delta_dirs", "maybe_compact"]

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


def append_pages(pages_ds, index_dir: str, **build_kwargs) -> dict:
    """Append new documents as a delta segment.

    The delta is a full mini-index (same layout) under ``delta=N/``;
    :class:`state.reader.IndexReader` merges base + deltas at load.
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
    return stats


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
