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

__all__ = [
    "rebuild",
    "append_pages",
    "delta_dirs",
    "maybe_compact",
    "compact_deltas",
    "delete_docs",
    "deleted_ids",
    "purge_tombstones",
]

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
    # NUMERIC sort (delta=2 before delta=10) — append order IS doc-id
    # order; lexicographic listing breaks the reader's doc-ascending
    # runs() contract once ≥10 deltas accumulate
    out = []
    if os.path.isdir(index_dir):
        for name in sorted(
            (n for n in os.listdir(index_dir) if n.startswith("delta=")),
            key=lambda n: int(n.split("=", 1)[1]),
        ):
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
            # skip missing/empty part dirs (a term-hash part can be
            # empty on tiny corpora; an empty dir has no schema)
            if not os.path.isdir(part_dir) or not any(
                n.endswith(".parquet") for n in os.listdir(part_dir)
            ):
                continue
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
                if name.startswith(("_", ".")):
                    continue  # markers (_SUCCESS): renaming one to a
                    # non-hidden name would crash every later pyarrow
                    # dataset discovery over the docmap dir
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


def merge_indexes(
    a_dir: str, b_dir: str, out_dir: str, *, renumber: bool = False, compact: bool = True
) -> dict:
    """Merge two independently built indexes — Lucene
    ``IndexWriter.addIndexes``. No raw-page access: A copies to
    ``out_dir`` as the base; each of B's segments stages as a delta
    with its doc ids shifted by ``offset`` — a METADATA rewrite only
    (the codec stores absolute ``block_first`` per block with in-block
    gaps, so shifting a whole run touches the run_first/run_last/
    block_first/block_last columns and never decodes a payload byte;
    positions are within-doc and unaffected) — then the standard
    segment fold (:func:`compact_deltas`) produces one base segment.
    Global df/idf/avgdl emerge from the fold's summed stats, so the
    merged index serves rank-identically to a single build over the
    union corpus (tested, and the ``bm25_topk_merged`` oracle).

    ``renumber=False`` (external-id mode): doc-id ranges must already
    be disjoint with every B doc above every A doc (offset 0; raises
    otherwise). ``renumber=True`` (Lucene internal-id semantics): B's
    ids shift by ``a_max_doc + 1`` unconditionally.

    Both indexes must share ``num_parts`` (the term-hash partition
    function is what lets the merge stay one task per part)."""
    import ray

    if os.path.exists(out_dir):
        raise ValueError(f"out_dir exists: {out_dir}")
    with open(os.path.join(a_dir, "stats.json")) as f:
        a_stats = json.load(f)
    with open(os.path.join(b_dir, "stats.json")) as f:
        b_stats = json.load(f)
    if a_stats["num_parts"] != b_stats["num_parts"]:
        raise ValueError(
            f"num_parts mismatch: {a_stats['num_parts']} vs {b_stats['num_parts']}"
        )
    for d in (a_dir, b_dir):
        if deleted_ids(d) is not None:
            raise ValueError(
                f"{d} has tombstones; purge_tombstones() before merging"
            )
    a_hi = a_stats["max_doc"]
    for d in delta_dirs(a_dir):
        with open(os.path.join(d, "stats.json")) as f:
            a_hi = max(a_hi, json.load(f)["max_doc"])
    if renumber:
        offset = a_hi + 1
    else:
        offset = 0
        b_lo = _min_doc(b_dir)
        for d in delta_dirs(b_dir):
            lo = _min_doc(d)
            if lo is not None:
                b_lo = lo if b_lo is None else min(b_lo, lo)
        if b_lo is not None and b_lo <= a_hi:
            raise ValueError(
                f"doc ranges overlap (B min {b_lo} <= A max {a_hi}); "
                "pass renumber=True for Lucene internal-id semantics"
            )
    shutil.copytree(a_dir, out_dir)
    num_parts = a_stats["num_parts"]

    @ray.remote
    def _shift_part(src_seg: str, dst_seg: str, p: int, off: int) -> int:
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pqw

        part_dir = os.path.join(src_seg, "postings", f"part={p}")
        dst = os.path.join(dst_seg, "postings", f"part={p}")
        # check the source BEFORE creating the destination — an empty
        # schemaless part dir would crash compact_deltas' dataset read
        # later (tiny corpora can leave term-hash parts empty)
        if not os.path.isdir(part_dir):
            return 0
        os.makedirs(dst, exist_ok=True)
        tbl = pads.dataset(part_dir, format="parquet").to_table().combine_chunks()
        if off and tbl.num_rows:
            import pyarrow.compute as pc

            for name in ("run_first", "run_last"):
                i = tbl.schema.get_field_index(name)
                tbl = tbl.set_column(i, name, pc.add(tbl.column(name), off))
            for name in ("block_first", "block_last"):
                i = tbl.schema.get_field_index(name)
                col = tbl.column(name).combine_chunks()
                # shift a list<int64> column zero-copy-ish: add to the
                # flat values buffer, rewrap with the same offsets
                arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
                shifted = pa.ListArray.from_arrays(
                    arr.offsets, pc.add(arr.values, off), type=arr.type
                )
                tbl = tbl.set_column(i, name, shifted)
        pqw.write_table(
            tbl, os.path.join(dst, "merged.parquet"), compression="zstd"
        )
        return tbl.num_rows

    next_delta = len(delta_dirs(out_dir))
    b_segs = [b_dir] + delta_dirs(b_dir)
    for seg in b_segs:
        next_delta += 1
        dst_seg = os.path.join(out_dir, f"delta={next_delta}")
        os.makedirs(os.path.join(dst_seg, "postings"))
        ray.get(
            [_shift_part.remote(seg, dst_seg, p, offset) for p in range(num_parts)]
        )
        # meta: copy with max_doc shifted
        os.makedirs(os.path.join(dst_seg, "meta"))
        for name in os.listdir(os.path.join(seg, "meta")):
            with open(os.path.join(seg, "meta", name)) as f:
                m = json.load(f)
            if "max_doc" in m:
                m["max_doc"] = m["max_doc"] + offset
            with open(os.path.join(dst_seg, "meta", name), "w") as f:
                json.dump(m, f)
        # docmap: doc_id += offset (small rewrite; serves lang filters)
        src_dm = os.path.join(seg, "docmap")
        if os.path.isdir(src_dm):
            import pyarrow.compute as pc
            import pyarrow.dataset as pads
            import pyarrow.parquet as pqw

            dm = pads.dataset(src_dm, format="parquet").to_table()
            if offset:
                i = dm.schema.get_field_index("doc_id")
                dm = dm.set_column(i, "doc_id", pc.add(dm.column("doc_id"), offset))
            os.makedirs(os.path.join(dst_seg, "docmap"))
            pqw.write_table(
                dm, os.path.join(dst_seg, "docmap", "merged.parquet"), compression="zstd"
            )
        with open(os.path.join(seg, "stats.json")) as f:
            s = json.load(f)
        s["max_doc"] = s["max_doc"] + offset
        with open(os.path.join(dst_seg, "stats.json"), "w") as f:
            json.dump(s, f)
    if compact:
        return compact_deltas(out_dir)
    return json.load(open(os.path.join(out_dir, "stats.json")))


def delete_by_query(index_dir: str, text: str) -> int:
    """Lucene ``IndexWriter.deleteDocuments(Query)``: tombstone every
    doc matching the disjunction — the FULL match set, no top-k cut
    (``Bm25Scorer._full_hits``), composed with :func:`delete_docs`
    (live-docs semantics; :func:`purge_tombstones` reclaims later).
    Returns the number of newly tombstoned docs. The match set is
    doc_ids only (8 B/doc) — at web scale the scan streams through
    the scorer's accumulate, never the corpus text."""
    from .query import Bm25Scorer

    sc = Bm25Scorer(index_dir, k=1, mode="exhaustive")
    hits = sc._full_hits(text)
    if hits is None or not len(hits[0]):
        return 0
    return delete_docs(index_dir, hits[0])


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone deletion — the missing half of the index lifecycle
    next to ``append_pages`` (the reference mutates via ``push_item!``
    only, ``/root/reference/src/searchgraph/insertions.jl:123-142``;
    deletion is engine-native, modeled on Lucene live-docs).

    Appends a sorted tombstone file under ``index_dir/tombstones/``;
    nothing else is touched. Serving applies tombstones as a
    VISIBILITY mask: deleted docs never appear in results, while
    df/idf/avgdl/N keep their build-time values until
    :func:`purge_tombstones` physically rewrites the postings
    (exactly Lucene's deleted-docs-until-merge semantics — surviving
    docs' scores are unchanged by a delete, tested). The mask is read
    per actor via a pushdown scan (doc-range-pinned actors read only
    their range's tombstones), so the deleted set is never broadcast
    through the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqw

    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    tomb_dir = os.path.join(index_dir, "tombstones")
    os.makedirs(tomb_dir, exist_ok=True)
    n = len([f for f in os.listdir(tomb_dir) if f.endswith(".parquet")])
    tmp = os.path.join(tomb_dir, f".tomb-{n + 1}.parquet.tmp")
    pqw.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp)
    os.replace(tmp, os.path.join(tomb_dir, f"tomb-{n + 1}.parquet"))
    return int(len(ids))


def deleted_ids(index_dir: str, doc_range: tuple[int, int] | None = None):
    """Sorted unique tombstoned doc_ids (``None`` when there are none).
    With ``doc_range`` the range filter is pushed into the parquet scan
    so a doc-sharded actor materializes only its shard's tombstones."""
    import numpy as np
    import pyarrow.dataset as pads

    tomb_dir = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(tomb_dir):
        return None
    files = [os.path.join(tomb_dir, f) for f in os.listdir(tomb_dir) if f.endswith(".parquet")]
    if not files:
        return None
    ds = pads.dataset(files, format="parquet")
    filt = None
    if doc_range is not None:
        lo, hi = doc_range
        filt = (pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi)
    t = ds.to_table(columns=["doc_id"], filter=filt)
    arr = np.unique(t["doc_id"].to_numpy().astype(np.int64))
    return arr if len(arr) else None


def purge_tombstones(index_dir: str) -> dict:
    """Physically remove tombstoned docs — the Lucene-merge analog.

    Per (segment, part), one Ray task decodes only runs whose
    ``[run_first, run_last]`` span contains a tombstone (all other
    rows pass through untouched, payload bytes zero-copy), drops the
    deleted postings (positions sidecar filtered alongside when the
    layout carries one), re-encodes, and atomically replaces the part.
    Runs left empty are dropped and surviving salts renumbered in
    run_first order (preserving the reader's (term, salt)-sort ⇒
    doc-order invariant, as in :func:`compact_deltas`). Each segment's
    docmap is rewritten without the deleted rows and its stats
    recomputed from the new part metadata the same way the build's
    stage E does (n_docs from docmap, total_tokens = Σcf) — so after a
    purge df/idf/avgdl/N are IDENTICAL to a fresh build over the
    surviving corpus, and serving is rank- AND score-bit-identical to
    that rebuild (tested) without ever touching raw pages."""
    import numpy as np
    import ray

    tomb = deleted_ids(index_dir)
    if tomb is None:
        with open(os.path.join(index_dir, "stats.json")) as f:
            return json.load(f)
    tomb_ref = ray.put(tomb)
    seg_dirs = [index_dir] + delta_dirs(index_dir)

    @ray.remote
    def _purge_part(seg_dir: str, p: int, deleted) -> dict:
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pqw

        from ..state.segment import (
            EncodedPostings,
            decode_all,
            decode_positions,
            encode_postings,
        )
        from .build_index import RUN_SCHEMA

        with open(os.path.join(seg_dir, "stats.json")) as f:
            block_size = json.load(f).get("block_size", 128)
        part_dir = os.path.join(seg_dir, "postings", f"part={p}")
        tbl = pads.dataset(part_dir, format="parquet").to_table().combine_chunks()
        t_col = tbl.column("term").to_numpy(zero_copy_only=False)
        rf = tbl.column("run_first").to_numpy()
        rl = tbl.column("run_last").to_numpy()
        # a run needs rewriting iff some tombstone falls inside its span
        touched = np.searchsorted(deleted, rf, side="left") < np.searchsorted(
            deleted, rl, side="right"
        )
        rows_by_term: dict[str, list] = {}
        for i in range(tbl.num_rows):
            run = EncodedPostings.from_arrow_row(tbl, int(i))
            if touched[i]:
                ids, tfs, dls = decode_all(run)
                d_pos = np.searchsorted(deleted, ids)
                d_pos = np.minimum(d_pos, len(deleted) - 1)
                keep = deleted[d_pos] != ids
                if not keep.all():
                    if not keep.any():
                        continue  # run emptied: drop it
                    pos = decode_positions(run, tfs) if len(run.pos_payload) else None
                    if pos is not None:
                        pos = pos[np.repeat(keep, tfs)]
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    run = encode_postings(
                        ids, tfs, dls, block_size=block_size, positions=pos
                    )
            rows_by_term.setdefault(t_col[i], []).append(run)
        out_rows = []
        for t in sorted(rows_by_term):
            runs = sorted(
                rows_by_term[t],
                key=lambda r: int(r.block_first[0]) if len(r.block_first) else -1,
            )
            for salt, r in enumerate(runs):
                row = r.to_row(t)
                row["salt"] = salt
                row["part"] = p
                out_rows.append(row)
        schema = RUN_SCHEMA.remove(RUN_SCHEMA.get_field_index("skey"))
        out_tbl = pa.Table.from_pylist(out_rows, schema=schema)
        tmp_out = part_dir + ".purge_tmp"
        shutil.rmtree(tmp_out, ignore_errors=True)
        os.makedirs(tmp_out)
        pqw.write_table(out_tbl, os.path.join(tmp_out, "purged.parquet"), compression="zstd")
        shutil.rmtree(part_dir)
        os.rename(tmp_out, part_dir)
        cf = out_tbl.column("cf").to_numpy()
        rl_new = out_tbl.column("run_last").to_numpy()
        return {
            "part": p,
            "terms": len(rows_by_term),
            "runs": out_tbl.num_rows,
            "postings": int(out_tbl.column("df").to_numpy().sum()),
            "tokens": int(cf.sum()),
            "max_doc": int(rl_new.max()) if len(rl_new) else -1,
        }

    @ray.remote
    def _purge_docmap(seg_dir: str, deleted) -> int:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import pyarrow.parquet as pqw

        dm_dir = os.path.join(seg_dir, "docmap")
        files = sorted(
            f for f in os.listdir(dm_dir) if f.endswith(".parquet")
        )
        kept = 0
        for name in files:
            path = os.path.join(dm_dir, name)
            t = pads.dataset(path, format="parquet").to_table()
            mask = pc.invert(pc.is_in(t.column("doc_id"), value_set=pa.array(deleted)))
            t2 = t.filter(mask)
            if t2.num_rows != t.num_rows:
                tmp = path + ".purge_tmp"
                pqw.write_table(t2, tmp, compression="zstd")
                os.replace(tmp, path)
            kept += t2.num_rows
        return kept

    total_purged = 0
    combined = None
    for seg in seg_dirs:
        with open(os.path.join(seg, "stats.json")) as f:
            st = json.load(f)
        metas = ray.get(
            [_purge_part.remote(seg, p, tomb_ref) for p in range(st["num_parts"])]
        )
        n_docs = ray.get(_purge_docmap.remote(seg, tomb_ref))
        total_purged += st["n_docs"] - n_docs
        total_tokens = sum(m["tokens"] for m in metas)
        st.update(
            {
                "n_docs": int(n_docs),
                "total_tokens": int(total_tokens),
                "avgdl": total_tokens / max(1, n_docs),
                "max_doc": max((m["max_doc"] for m in metas), default=-1),
                "deletes_purged": int(st.get("deletes_purged", 0)) + int(len(tomb)),
            }
        )
        meta_dir = os.path.join(seg, "meta")
        for m in metas:
            path = os.path.join(meta_dir, f"part={m['part']}.json")
            with open(path) as f:
                old = json.load(f)
            old.update(m)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(old, f)
            os.replace(tmp, path)
        tmp = os.path.join(seg, "stats.json.tmp")
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, os.path.join(seg, "stats.json"))
        if seg == index_dir:
            combined = st
    shutil.rmtree(os.path.join(index_dir, "tombstones"), ignore_errors=True)
    combined["docs_purged"] = int(total_purged)
    return combined


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
