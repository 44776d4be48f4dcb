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

    docmap/             doc_id, url, lang         (the doc-side map)
    head_sketch.json    sampled df → head-term set (from a pages sample)
    stats.json          N, avgdl, exact stats from merge metadata, knobs
    postings/part=*/    term, salt, df, cf, payload, block_* arrays
    meta/part=*.json    docs, postings, bytes, terms  (lineage + metrics)

    Extract → tokenize → SPIMI-encode run FUSED in one streaming pass
    (stage D1): neither the clean text nor the (term, doc_id, tf, dl)
    triples are ever persisted — the only intermediate on disk is the
    compressed encoded-runs shuffle payload (runs_tmp/), ≈1/8 of the
    raw token bytes. On a D1 crash the pass re-runs (tokenization is
    cheaper than the I/O the old token checkpoint cost every build).

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
from ..stages.tokenize import extract_batch, tokenize_batch, tokenize_batch_positions
from ..state.segment import encode_postings, encode_postings_grouped

__all__ = ["build_index", "term_part", "IndexBuildError"]


def _seg_gather(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Gather variable-length segments ``flat[starts[i] : starts[i] +
    lens[i]]`` concatenated, fully vectorized (repeat + arange) — the
    positions analog of a take over a list column."""
    tot = int(lens.sum())
    if tot == 0:
        return flat[:0]
    seg_starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=seg_starts[1:])
    idx = np.repeat(starts, lens) + (
        np.arange(tot, dtype=np.int64) - np.repeat(seg_starts, lens)
    )
    return flat[idx]


class IndexBuildError(RuntimeError):
    pass


RUN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("run_first", pa.int64()),
        ("run_last", pa.int64()),
        ("payload", pa.binary()),
        ("pos_payload", pa.binary()),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_count", pa.list_(pa.int32())),
        ("block_offset", pa.list_(pa.int64())),
        ("block_vstart", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
        ("block_min_dl", pa.list_(pa.int64())),
        ("block_pvstart", pa.list_(pa.int64())),
        ("block_poffset", pa.list_(pa.int64())),
        ("salt", pa.int64()),
        ("part", pa.int64()),
        ("skey", pa.string()),
    ]
)


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
    docmap_ds=None,
    num_parts: int = DEFAULT_NUM_PARTS,
    salt_factor: int = DEFAULT_SALT_FACTOR,
    head_df_fraction: float = HEAD_TERM_DF_FRACTION,
    block_size: int = POSTING_BLOCK_SIZE,
    params: Bm25Params = DEFAULT_BM25,
    tokenize_batch_size: int = 1024,
    on_part_complete=None,
    with_positions: bool = True,
    extract_fn=None,
    n_docs_hint: int | None = None,
) -> dict:
    """Build (or resume) the index; returns the stats dict.

    ``pages_ds`` is a Ray Dataset with the input_hint schema (plus the
    fixture's ride-along ``doc_id``; a real crawl would derive doc_id
    from (input partition, row index) — see sources/pages.py).

    ``on_part_complete(meta_dict)`` is the §2.9 build-callback hook
    (the reference's ``execute_callbacks!`` cadence, per-partition
    here): invoked on the driver as each merge task's lineage/metrics
    dict is committed — progress logging, metrics export, external
    checkpoint registration.

    ``with_positions`` (default True, the Lucene-style index): encode
    each posting's token positions into the layout-v4 sidecar stream so
    phrase queries run off the index alone (query.phrase_search) —
    ``False`` drops the sidecar for position-free workloads (≈cf extra
    varints per term is the cost).

    ``extract_fn`` (default ``extract_batch`` — the body field) maps a
    pages batch to (doc_id, url, lang, text); pass
    ``stages.tokenize.extract_title_batch`` to index the TITLE field —
    per-field indexes are the multi-field/BM25F serving substrate
    (query.multifield_search).

    ``n_docs_hint`` — the EXACT corpus row count, when the caller
    knows it (e.g. parquet metadata × replicate). Providing it folds
    the docmap write into the fused D1 pass (each encode task writes
    its batch's (doc_id, url, lang) slice alongside encoding), which
    removes stage A's separate full pass over the pages — the last
    size-dependent fixed cost of the build. The hint becomes
    ``stats.n_docs`` (→ avgdl), so it MUST be exact; the build
    verifies the folded docmap's metadata row count against it and
    fails loudly on mismatch.
    """
    import time as _time

    import ray.data as rd

    if extract_fn is None:
        extract_fn = extract_batch

    os.makedirs(index_dir, exist_ok=True)
    docmap_dir = os.path.join(index_dir, "docmap")
    stats_path = os.path.join(index_dir, "stats.json")
    postings_dir = os.path.join(index_dir, "postings")
    meta_dir = os.path.join(index_dir, "meta")
    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()

    def _lap(stage: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        timings[stage] = round(now - _t0, 3)
        _t0 = now

    # ---- stage A: doc map (doc_id, url, lang) — projected, no html ------
    # with an exact n_docs_hint the docmap write FOLDS into the fused
    # D1 pass instead (one corpus pass total); stage A runs only on
    # the hint-less path (and as the resume fallback below)
    fold_docmap = n_docs_hint is not None
    if not _done(docmap_dir) and not fold_docmap:
        shutil.rmtree(docmap_dir, ignore_errors=True)
        dm = docmap_ds if docmap_ds is not None else pages_ds
        dm.select_columns(["doc_id", "url", "lang"]).write_parquet(
            docmap_dir, compression="zstd"
        )
        _mark_done(docmap_dir)
    _lap("A_docmap")

    # ---- stage C: df SKETCH → head-term set (sampled, cheap) ------------
    # Salting is a performance decision, not a correctness one, so the
    # head-term set comes from a bounded PAGES sample (limit() early-
    # stops the read). Exact global stats (N, avgdl, df) are finalized
    # AFTER the merge from run/meta metadata (stage E) — no full
    # pre-pass over the corpus.
    sketch_path = os.path.join(index_dir, "head_sketch.json")
    if not os.path.exists(sketch_path):
        from collections import Counter

        import pyarrow.dataset as pads

        # metadata-only row count (no Ray job — the old
        # rd.read_parquet().count() plus the two sample map stages were
        # ~40% of a bench-config build's wall time in job overhead);
        # hint mode trusts the caller's exact count (verified against
        # the folded docmap's metadata after D1)
        if fold_docmap:
            n_docs = int(n_docs_hint)
        else:
            n_docs = pads.dataset(docmap_dir, format="parquet").count_rows()
        sample_n = int(min(n_docs, 4096))
        df_sketch: Counter = Counter()
        # the sample tokenizes DRIVER-SIDE (4096 docs ≈ 0.2 s of Arrow
        # kernels — cheaper than one Ray stage launch); limit() stops
        # the upstream read after the first blocks
        for t in pages_ds.limit(sample_n).iter_batches(batch_format="pyarrow"):
            tok = tokenize_batch(extract_fn(t))
            enc = tok["term"].combine_chunks().dictionary_encode()
            counts = np.bincount(enc.indices.to_numpy(), minlength=len(enc.dictionary))
            for term, c in zip(enc.dictionary.to_pylist(), counts):
                df_sketch[term] += int(c)  # one row per (doc, term) = df
        scale = n_docs / max(1, sample_n)
        head_cut = head_df_fraction * n_docs
        head_terms_sketch = {
            t: int(c * scale) for t, c in df_sketch.items() if c * scale > head_cut
        }
        tmp = sketch_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_docs": int(n_docs), "head_terms": head_terms_sketch}, f)
        os.replace(tmp, sketch_path)
    with open(sketch_path) as f:
        sketch = json.load(f)
    _lap("C_sketch")

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

        head_terms = set(sketch["head_terms"])
        # salt ranges need only an id-space ESTIMATE, not exact stats:
        # doc_ids are dense by construction (deterministic (partition,
        # row) assignment), so n_docs estimates the span. Sparser ids
        # simply produce more than salt_factor buckets — harmless, the
        # reader merges any number of salt runs in range order.
        salt_div = (sketch["n_docs"] // salt_factor) + 1
        missing_set = set(missing)

        # SPIMI: encode compact sub-runs locally per batch, shuffle only
        # the encoded runs (≈1/8 the raw bytes, thousands of rows, not
        # millions), k-way merge per (term, salt) group. The row-level
        # ``groupby(term, doc_id, tf, dl)`` alternative measured ~35×
        # slower at bench scale — the shuffle payload is the lever.
        def encode_local(batch: pa.Table) -> pa.Table:
            # dictionary-encode: hashing/set-membership run once per
            # unique term per batch, never per row
            enc_col = batch["term"].combine_chunks().dictionary_encode()
            codes = enc_col.indices.to_numpy()
            vocab = enc_col.dictionary.to_pylist()
            part_of_code = term_part(vocab, num_parts)
            keep_code = np.isin(part_of_code, list(missing_set))
            head_of_code = np.fromiter(
                (t in head_terms for t in vocab), dtype=bool, count=len(vocab)
            )
            doc_ids = batch["doc_id"].to_numpy()
            tf = batch["tf"].to_numpy()
            dl = batch["dl"].to_numpy()
            if with_positions:
                pos_col = batch["pos"].combine_chunks()
                pos_flat = pos_col.values.to_numpy(zero_copy_only=True).astype(
                    np.int64, copy=False
                )
                pos_starts = pos_col.offsets.to_numpy().astype(np.int64)[:-1]
            else:
                pos_flat = pos_starts = None
            keep = keep_code[codes]
            rows_idx = np.arange(len(codes), dtype=np.int64)
            if not keep.all():
                codes = codes[keep]
                doc_ids, tf, dl = doc_ids[keep], tf[keep], dl[keep]
                rows_idx = rows_idx[keep]
            salt = np.where(head_of_code[codes], doc_ids // salt_div, 0).astype(np.int64)
            if len(codes) == 0:
                return pa.Table.from_pylist([], schema=RUN_SCHEMA)
            # sort by (code, salt, doc) directly — a packed single key
            # would collide when salt >= salt_factor (legal for sparse
            # or offset id spaces, e.g. delta-segment appends)
            order = np.lexsort((doc_ids, salt, codes))
            c_s, s_s = codes[order], salt[order]
            bounds = np.flatnonzero(
                np.r_[True, (c_s[1:] != c_s[:-1]) | (s_s[1:] != s_s[:-1]), True]
            )
            # ONE vectorized encode over every (term, salt) group — the
            # per-group encode_postings loop was vocab-level Python
            # (byte-identical per group; pinned by tests/test_segment.py)
            pos_sorted = (
                _seg_gather(pos_flat, pos_starts[rows_idx[order]], tf[order])
                if with_positions
                else None
            )
            cols = encode_postings_grouped(
                doc_ids[order],
                tf[order],
                dl[order],
                bounds,
                block_size=block_size,
                positions=pos_sorted,
            )
            import pyarrow.compute as pc

            g0 = bounds[:-1]
            g_codes = c_s[g0]
            terms_arr = enc_col.dictionary.take(pa.array(g_codes, type=pa.int64()))
            salt_arr = pa.array(s_s[g0], type=pa.int64())
            cols = dict(cols)
            cols["term"] = terms_arr
            cols["salt"] = salt_arr
            cols["part"] = pa.array(part_of_code[g_codes], type=pa.int64())
            cols["skey"] = pc.binary_join_element_wise(
                terms_arr, pc.cast(salt_arr, pa.string()), "\x00"
            )
            return pa.Table.from_pydict(
                {n: cols[n] for n in RUN_SCHEMA.names}, schema=RUN_SCHEMA
            )

        # D1: FUSED extract → tokenize → encode → partitioned WRITE of
        # local runs, ONE map_batches over the raw pages (no token
        # intermediate, no all-to-all operator — the hash partitioning
        # happens in the parquet layout itself). Ray's
        # groupby().map_groups() measured 95 s on these wide binary
        # rows even with a trivial UDF; a per-part merge task over the
        # partitioned files does the same exchange in seconds and is
        # the per-segment-merger shape a 100 TB build wants. The three
        # sub-steps run in-process per block (round-4: the staged
        # version re-shipped the token table — ~10× the run bytes —
        # through the object store between stages, and the row-count
        # batch_size on the tokenize stage serialized blocks through a
        # coalescing buffer; fusing removed both). ``tokenize_batch_
        # size`` still bounds the token-table working set via internal
        # slicing; encoding stays once-per-block so each (term, salt)
        # yields one run per block.
        import ray

        runs_dir = os.path.join(index_dir, "runs_tmp")
        shutil.rmtree(runs_dir, ignore_errors=True)
        tok = tokenize_batch_positions if with_positions else tokenize_batch

        # folded docmap: D1 tasks write their batch's (doc_id, url,
        # lang) slice next to encoding — same destination store the
        # merge tasks write to, so the cluster assumption is unchanged.
        # Cleared with runs_tmp on any D1 (re)start; marked done (and
        # row-count-verified against the hint) right after the D1
        # barrier, so a crash during D2 resumes without rewriting it.
        side_docmap = fold_docmap and not _done(docmap_dir)
        if side_docmap:
            shutil.rmtree(docmap_dir, ignore_errors=True)
            os.makedirs(docmap_dir, exist_ok=True)

        def encode_pages(batch: pa.Table) -> pa.Table:
            ext = extract_fn(batch)
            if ext.num_rows == 0:
                return pa.Table.from_pylist([], schema=RUN_SCHEMA)
            if side_docmap:
                import pyarrow.parquet as pqw

                # Idempotent side-write: the filename derives from the
                # batch content (first doc_id — globally unique per row,
                # so disjoint blocks can never collide) and the write is
                # tmp + os.replace, so a Ray task retry / lineage
                # re-execution OVERWRITES its own slice instead of
                # duplicating it and tripping the post-D1 row-count
                # verification.
                first_doc = ext.column("doc_id")[0].as_py()
                dst = os.path.join(docmap_dir, f"part-{first_doc:012d}.parquet")
                tmp = dst + f".tmp-{os.getpid()}"
                pqw.write_table(
                    ext.select(["doc_id", "url", "lang"]),
                    tmp,
                    compression="zstd",
                )
                os.replace(tmp, dst)
            toks = [
                tok(ext.slice(i, tokenize_batch_size))
                for i in range(0, ext.num_rows, tokenize_batch_size)
            ]
            tok_tbl = pa.concat_tables(toks).combine_chunks() if len(toks) > 1 else toks[0]
            return encode_local(tok_tbl)

        (
            pages_ds.map_batches(encode_pages, batch_format="pyarrow", batch_size=None)
            .write_parquet(runs_dir, partition_cols=["part"], compression="zstd")
        )
        if side_docmap:
            import pyarrow.dataset as pads

            n_written = pads.dataset(docmap_dir, format="parquet").count_rows()
            if n_written != int(n_docs_hint):
                # Distinguish duplicate slices (a retry artifact — should
                # be impossible with the content-derived filenames above)
                # from a genuinely wrong hint.
                import pyarrow.compute as pc2

                ids = (
                    pads.dataset(docmap_dir, format="parquet")
                    .to_table(columns=["doc_id"])
                    .column("doc_id")
                )
                n_distinct = len(pc2.unique(ids))
                if n_distinct == int(n_docs_hint):
                    raise IndexBuildError(
                        f"folded docmap holds {n_written} rows but only "
                        f"{n_distinct} distinct doc_ids — duplicate slices "
                        "from a task retry; the hint is correct, the "
                        "side-write deduplication failed"
                    )
                raise IndexBuildError(
                    f"n_docs_hint={n_docs_hint} but the folded docmap wrote "
                    f"{n_written} rows ({n_distinct} distinct doc_ids) — "
                    "the hint must be the exact corpus size"
                )
            _mark_done(docmap_dir)
        _lap("D1_encode_shuffle")

        # D2: one merge task per output partition. Arrow-native: the
        # part table is never converted to Python rows — single-run
        # groups pass through via one vectorized ``take`` (payload
        # buffers are sliced zero-copy), and only multi-run groups
        # (two batches emitted the same (term, salt)) decode/re-encode.
        @ray.remote
        def merge_part(part: int) -> dict:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads
            import pyarrow.parquet as pqw

            from ..state.segment import EncodedPostings, decode_all, decode_positions

            part_in = os.path.join(runs_dir, f"part={part}")
            part_out = os.path.join(postings_dir, f"part={part}")
            os.makedirs(part_out, exist_ok=True)
            schema = RUN_SCHEMA.remove(RUN_SCHEMA.get_field_index("skey"))
            out_tbl = pa.Table.from_pylist([], schema=schema)
            files = (
                sorted(
                    os.path.join(part_in, f)
                    for f in os.listdir(part_in)
                    if f.endswith(".parquet")
                )
                if os.path.isdir(part_in)
                else []
            )
            if len(files) == 1 and os.environ.get("GRAFT_D2_FASTPATH", "1") != "0":
                # SINGLE-FILE FAST PATH: when one D1 write task produced
                # this whole part AND no (term, salt) repeats inside it
                # (one run per group — nothing to merge), the D1 file is
                # already a valid segment: every consumer reads columns
                # BY NAME (the extra ``skey`` column is ignored; ``part``
                # lives in the directory name, and the reader re-sorts
                # by (term, salt) at load), so the file hardlinks into
                # place untouched — no decode, no re-encode, no parquet
                # rewrite. Meta comes from one projected column read.
                skey_col = pqw.read_table(files[0], columns=["skey"]).column("skey")
                n_runs = len(skey_col)
                if n_runs and pc.count_distinct(skey_col).as_py() == n_runs:
                    dst = os.path.join(part_out, "segment.parquet")
                    if os.path.exists(dst):
                        os.remove(dst)
                    try:
                        os.link(files[0], dst)
                    except OSError:
                        shutil.copy2(files[0], dst)
                    m_tbl = pqw.read_table(
                        files[0], columns=["term", "df", "cf", "payload", "block_last"]
                    )
                    flat_last = pc.list_flatten(m_tbl.column("block_last"))
                    return {
                        "part": part,
                        "terms": pc.count_distinct(m_tbl.column("term")).as_py(),
                        "runs": n_runs,
                        "postings": int(pc.sum(m_tbl.column("df")).as_py() or 0),
                        "tokens": int(pc.sum(m_tbl.column("cf")).as_py() or 0),
                        "payload_bytes": int(
                            pc.sum(pc.binary_length(m_tbl.column("payload"))).as_py() or 0
                        ),
                        "max_doc": int(pc.max(flat_last).as_py()) if len(flat_last) else -1,
                    }
            if files:
                tbl = pads.dataset(part_in, format="parquet").to_table().combine_chunks()
            else:
                tbl = None
            if tbl is not None and tbl.num_rows:
                skeys = tbl.column("skey").to_numpy(zero_copy_only=False)
                order = np.argsort(skeys, kind="stable")
                sk = skeys[order]
                bounds = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1], True])
                sizes = np.diff(bounds)
                # group ordinal (skey-ascending) keeps the output row
                # order identical to the per-group loop it replaces
                single = sizes == 1
                pieces, gpos = [], []
                if single.any():
                    idx = order[bounds[:-1][single]]
                    s_tbl = tbl.take(pa.array(idx, type=pa.int64()))
                    cols = {n: s_tbl.column(n) for n in schema.names if n != "part"}
                    cols["part"] = pa.array(
                        np.full(len(idx), part, dtype=np.int64), type=pa.int64()
                    )
                    pieces.append(pa.Table.from_pydict(cols, schema=schema))
                    gpos.append(np.flatnonzero(single))
                from ..state.segment import concat_runs

                merged_rows = []
                for g in np.flatnonzero(~single):
                    idxs = order[bounds[g] : bounds[g + 1]]
                    encs = [EncodedPostings.from_arrow_row(tbl, int(i)) for i in idxs]
                    # zero-decode fast path: runs from different D1
                    # blocks cover disjoint doc ranges whenever the
                    # input is doc-contiguous (always for a fresh build
                    # / delta append), so big runs CONCATENATE — blocks
                    # are self-contained (absolute block_first). Only
                    # concat when every run averages full blocks (head
                    # terms, the bulk of D2 decode time); fragmented
                    # rare-term runs re-encode so the read side never
                    # sees a long tail of tiny blocks.
                    total_df = sum(e.df for e in encs)
                    if total_df >= block_size * len(encs):
                        encs_sorted = sorted(
                            encs, key=lambda e: int(e.block_first[0]) if len(e.block_first) else -1
                        )
                        try:
                            enc = concat_runs(encs_sorted)
                        except ValueError:
                            enc = None  # overlapping ranges → decode path
                        if enc is not None:
                            row = enc.to_row(tbl.column("term")[int(idxs[0])].as_py())
                            row["salt"] = tbl.column("salt")[int(idxs[0])].as_py()
                            row["part"] = part
                            merged_rows.append(row)
                            continue
                    decoded = [decode_all(e) for e in encs]
                    ids = np.concatenate([d[0] for d in decoded])
                    tf = np.concatenate([d[1] for d in decoded])
                    dl = np.concatenate([d[2] for d in decoded])
                    o = np.argsort(ids, kind="stable")
                    pos = None
                    if with_positions:
                        # positions re-interleave with their postings:
                        # per-posting segments are atomic (a doc's tokens
                        # live in one batch → one run), so a vectorized
                        # segment gather in the new doc order suffices
                        pos_flat = np.concatenate(
                            [decode_positions(e, d[1]) for e, d in zip(encs, decoded)]
                        )
                        starts = np.zeros(len(tf), dtype=np.int64)
                        np.cumsum(tf[:-1], out=starts[1:])
                        pos = _seg_gather(pos_flat, starts[o], tf[o])
                    enc = encode_postings(
                        ids[o], tf[o], dl[o], block_size=block_size, positions=pos
                    )
                    row = enc.to_row(tbl.column("term")[int(idxs[0])].as_py())
                    row["salt"] = tbl.column("salt")[int(idxs[0])].as_py()
                    row["part"] = part
                    merged_rows.append(row)
                if merged_rows:
                    pieces.append(pa.Table.from_pylist(merged_rows, schema=schema))
                    gpos.append(np.flatnonzero(~single))
                out_tbl = pa.concat_tables(pieces)
                g_all = np.concatenate(gpos)
                if not (np.diff(g_all) > 0).all():  # interleave back to skey order
                    out_tbl = out_tbl.take(pa.array(np.argsort(g_all), type=pa.int64()))
            pqw.write_table(
                out_tbl, os.path.join(part_out, "segment.parquet"), compression="zstd"
            )
            flat_last = pc.list_flatten(out_tbl.column("block_last"))
            return {
                "part": part,
                "terms": pc.count_distinct(out_tbl.column("term")).as_py() if out_tbl.num_rows else 0,
                "runs": out_tbl.num_rows,
                "postings": int(pc.sum(out_tbl.column("df")).as_py() or 0),
                "tokens": int(pc.sum(out_tbl.column("cf")).as_py() or 0),
                "payload_bytes": int(pc.sum(pc.binary_length(out_tbl.column("payload"))).as_py() or 0),
                "max_doc": int(pc.max(flat_last).as_py()) if len(flat_last) else -1,
            }

        # commit each part's meta as its merge task finishes (not as a
        # barrier), so the callback fires at true completion cadence
        pending = {merge_part.remote(p): p for p in missing}
        while pending:
            done, _ = ray.wait(list(pending), num_returns=1)
            ref = done[0]
            del pending[ref]
            meta = ray.get(ref)
            tmp = os.path.join(meta_dir, f"part={meta['part']}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, os.path.join(meta_dir, f"part={meta['part']}.json"))
            if on_part_complete is not None:
                on_part_complete(meta)
        _lap("D2_merge")
        shutil.rmtree(runs_dir, ignore_errors=True)

    if fold_docmap and not _done(docmap_dir):
        # resume hole: every part already committed in a previous run
        # but the folded docmap never completed (crash before the D1
        # marker) — fall back to the stage-A write
        shutil.rmtree(docmap_dir, ignore_errors=True)
        dm = docmap_ds if docmap_ds is not None else pages_ds
        dm.select_columns(["doc_id", "url", "lang"]).write_parquet(
            docmap_dir, compression="zstd"
        )
        _mark_done(docmap_dir)

    # ---- stage E: finalize EXACT global stats from merge metadata -------
    if not os.path.exists(stats_path):
        metas = []
        for p in range(num_parts):
            with open(os.path.join(meta_dir, f"part={p}.json")) as f:
                metas.append(json.load(f))
        total_tokens = sum(m["tokens"] for m in metas)
        n_docs = sketch["n_docs"]
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": int(total_tokens),
            "avgdl": total_tokens / max(1, n_docs),
            "max_doc": max(m["max_doc"] for m in metas),
            "k1": params.k1,
            "b": params.b,
            "block_size": block_size,
            "num_parts": num_parts,
            "salt_factor": salt_factor,
            "head_df_fraction": head_df_fraction,
            "with_positions": bool(with_positions),
            "head_terms": sketch["head_terms"],
            "build_timings": timings,
        }
        tmp = stats_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(tmp, stats_path)
    with open(stats_path) as f:
        stats = json.load(f)
    return stats
