"""On-disk posting-list segments: delta+varint blocks with block-max.

This is the engine's ``StaticAdjList`` (the reference's CSR freeze of a
dynamic adjacency, ``/root/reference/src/adj/adjstatic.jl:25-46``): a
term's variable-length posting list becomes a flat compressed byte
payload plus offset/skip arrays. Differences driven by Ray-Data-first
design (SURVEY.md §2.5, §7):

* **Blocks are independent.** Each ≤``POSTING_BLOCK_SIZE``-posting
  block stores its first docID absolutely in the header arrays and
  doc-gaps varint-encoded inside the payload. Sub-runs built under
  different shuffle salts (doc_id *range* salting → disjoint, ordered
  ranges) therefore merge by pure concatenation — no re-encode in the
  second-stage head-term merge.
* **Block-max is stored as (max tf, min dl)** per block. The true
  per-block score bound needs idf (known only after the salted merge
  fixes global df) and avgdl (a global stat) — both applied at READ
  time: ``ub = idf(df) · tf_norm(max_tf, min_dl, avgdl)``. tf_norm is
  monotone ↑ in tf and ↓ in dl, so this bounds every member posting;
  storing raw (tf, dl) extrema keeps the build free of any global
  pre-pass (no avgdl needed before encoding).
* Postings carry ``(doc_gap, tf, dl)`` so query scoring needs no
  doc-side join: only the global stats (N, avgdl) and per-term df.

A segment part is one parquet file of term rows::

    term:str, df:int64, cf:int64, payload:binary,
    block_first:list<int64>, block_last:list<int64>,
    block_count:list<int32>, block_offset:list<int64>,
    block_vstart:list<int64>, block_max_tf:list<int64>,
    block_min_dl:list<int64>

``block_vstart`` is the cumulative varint count before each block so a
whole payload decodes in ONE vectorized pass and slices per block.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import POSTING_BLOCK_SIZE
from ..functions.varint import (
    decode_varints,
    encode_varints,
    encode_varints_raw,
    varint_sizes,
)

__all__ = [
    "EncodedPostings",
    "encode_postings",
    "encode_postings_grouped",
    "concat_runs",
    "decode_all",
    "decode_blocks",
    "decode_positions",
    "decode_positions_blocks",
]


def _ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] for the given segment lengths."""
    tot = int(lengths.sum())
    if tot == 0:
        return np.empty(0, dtype=np.int64)
    seg_starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=seg_starts[1:])
    return np.arange(tot, dtype=np.int64) - np.repeat(seg_starts, lengths)


@dataclasses.dataclass
class EncodedPostings:
    """One term's (or sub-run's) compressed posting list."""

    df: int
    cf: int
    payload: bytes
    block_first: np.ndarray     # int64, absolute first docID per block
    block_last: np.ndarray      # int64, absolute last docID per block
    block_count: np.ndarray     # int32
    block_offset: np.ndarray    # int64, byte offset into payload
    block_vstart: np.ndarray    # int64, varint count before block
    block_max_tf: np.ndarray    # int64, max tf in block
    block_min_dl: np.ndarray    # int64, min dl in block
    # OPTIONAL positions sidecar (layout v4): per posting, its tf token
    # positions delta-encoded (first absolute, then gaps), postings in
    # doc order, one varint stream for the whole run — cf varints total.
    # b"" = built without positions (all non-positional paths ignore it;
    # the payload/block arithmetic above is untouched by this field).
    pos_payload: bytes = b""
    # layout v5: per-block offsets INTO the positions sidecar — value
    # count (Σ tf of earlier blocks) and byte offset before each block —
    # so candidate-restricted positional decode touches only candidate
    # blocks (decode_positions_blocks). Empty on v4 segments and on
    # mixed concats: every consumer falls back to whole-run decode.
    block_pvstart: np.ndarray = dataclasses.field(
        default_factory=lambda: np.empty(0, np.int64)
    )
    block_poffset: np.ndarray = dataclasses.field(
        default_factory=lambda: np.empty(0, np.int64)
    )

    @property
    def has_pos_blocks(self) -> bool:
        return len(self.pos_payload) > 0 and len(self.block_pvstart) == len(self.block_count)

    def to_row(self, term: str) -> dict:
        return {
            "term": term,
            "df": self.df,
            "cf": self.cf,
            # run-level doc-id span as SCALAR columns: lets a doc-range
            # pinned reader push `run_last >= lo AND run_first < hi`
            # down into the parquet scan (row-group skip) instead of
            # reading every run's payload (-1 sentinel for empty runs)
            "run_first": int(self.block_first[0]) if len(self.block_first) else -1,
            "run_last": int(self.block_last[-1]) if len(self.block_last) else -1,
            # bytes() is identity on bytes and materializes pyarrow
            # Buffers (runs that came straight from from_arrow_row —
            # e.g. compaction passthrough rows) for from_pylist
            "payload": bytes(self.payload),
            "pos_payload": bytes(self.pos_payload),
            "block_first": self.block_first.tolist(),
            "block_last": self.block_last.tolist(),
            "block_count": self.block_count.tolist(),
            "block_offset": self.block_offset.tolist(),
            "block_vstart": self.block_vstart.tolist(),
            "block_max_tf": self.block_max_tf.tolist(),
            "block_min_dl": self.block_min_dl.tolist(),
            "block_pvstart": self.block_pvstart.tolist(),
            "block_poffset": self.block_poffset.tolist(),
        }

    @classmethod
    def from_arrow_row(cls, tbl, i: int) -> "EncodedPostings":
        """Zero-copy construction from row ``i`` of a (combined-chunk)
        Arrow table with the segment schema: list columns map straight
        onto their int buffers and ``payload`` stays a ``pa.Buffer``
        (``np.frombuffer`` in the decode path accepts any buffer
        protocol object — no bytes copy is made)."""

        def arr(name, dtype):
            return tbl.column(name)[i].values.to_numpy(zero_copy_only=True).astype(dtype, copy=False)

        names = set(tbl.schema.names)  # v3 segments have no pos_payload
        pos = tbl.column("pos_payload")[i].as_buffer() if "pos_payload" in names else b""
        e = np.empty(0, np.int64)
        return cls(
            df=tbl.column("df")[i].as_py(),
            cf=tbl.column("cf")[i].as_py(),
            payload=tbl.column("payload")[i].as_buffer(),
            block_first=arr("block_first", np.int64),
            block_last=arr("block_last", np.int64),
            block_count=arr("block_count", np.int32),
            block_offset=arr("block_offset", np.int64),
            block_vstart=arr("block_vstart", np.int64),
            block_max_tf=arr("block_max_tf", np.int64),
            block_min_dl=arr("block_min_dl", np.int64),
            pos_payload=pos if pos is not None else b"",
            # v5 sidecar offsets; absent on v3/v4 segments
            block_pvstart=arr("block_pvstart", np.int64) if "block_pvstart" in names else e,
            block_poffset=arr("block_poffset", np.int64) if "block_poffset" in names else e,
        )

    @classmethod
    def from_row(cls, row: dict) -> "EncodedPostings":
        return cls(
            df=int(row["df"]),
            cf=int(row["cf"]),
            payload=bytes(row["payload"]),
            block_first=np.asarray(row["block_first"], dtype=np.int64),
            block_last=np.asarray(row["block_last"], dtype=np.int64),
            block_count=np.asarray(row["block_count"], dtype=np.int32),
            block_offset=np.asarray(row["block_offset"], dtype=np.int64),
            block_vstart=np.asarray(row["block_vstart"], dtype=np.int64),
            block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int64),
            block_min_dl=np.asarray(row["block_min_dl"], dtype=np.int64),
            pos_payload=bytes(row.get("pos_payload") or b""),
            block_pvstart=np.asarray(row.get("block_pvstart") or [], dtype=np.int64),
            block_poffset=np.asarray(row.get("block_poffset") or [], dtype=np.int64),
        )


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = POSTING_BLOCK_SIZE,
    positions: np.ndarray | None = None,
) -> EncodedPostings:
    """Encode one term's postings (must be sorted by doc_id, unique).

    ``positions`` (optional, layout v4): flat int64 array of the term's
    token positions, grouped per posting in ``doc_ids`` order
    (``tfs[i]`` values per posting, ascending within a posting) —
    encoded as an independent delta+varint sidecar stream so every
    non-positional path is byte-identical with or without it.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        z64 = np.empty(0, np.int64)
        return EncodedPostings(0, 0, b"", z64, z64, np.empty(0, np.int32), z64, z64, z64, z64.copy())
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("postings must be strictly increasing by doc_id")
    pos_payload = b""
    pos_byte_before = seg_starts = None
    if positions is not None:
        positions = np.asarray(positions, dtype=np.int64)
        if len(positions) != int(tfs.sum()):
            raise ValueError("positions length must equal sum(tfs)")
        seg_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(tfs[:-1], out=seg_starts[1:])
        deltas = np.empty(len(positions), dtype=np.int64)
        deltas[0] = positions[0]
        deltas[1:] = positions[1:] - positions[:-1]
        deltas[seg_starts] = positions[seg_starts]  # absolute first per posting
        if (deltas < 0).any():
            raise ValueError("positions must be ascending within each posting")
        pos_u8, pos_byte_before = encode_varints_raw(deltas.astype(np.uint64))
        pos_payload = pos_u8.tobytes()

    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)
    counts = (ends - starts).astype(np.int32)
    nblocks = len(starts)
    e64 = np.empty(0, np.int64)
    if positions is not None:
        # v5: per-block sidecar offsets — value count (Σ tf of earlier
        # blocks) and byte offset before each block, so a candidate-
        # restricted decode slices only candidate blocks
        block_pvstart = seg_starts[starts]
        block_poffset = pos_byte_before[block_pvstart]
    else:
        block_pvstart = block_poffset = e64

    # Per-block value layout: gaps (count−1) ++ tfs (count) ++ dls
    # (count), all blocks concatenated into ONE value stream and varint-
    # encoded in ONE call — byte-identical to encoding each block
    # separately and concatenating (LEB128 is per-value), but without a
    # Python loop per block (that loop was ~half of stage-D1 time at
    # 2M docs: ~1M tiny encode calls per build).
    c64 = counts.astype(np.int64)
    reps = c64 - 1                       # gaps per block
    nvals = 3 * c64 - 1                  # values per block
    val_starts = np.zeros(nblocks, dtype=np.int64)
    np.cumsum(nvals[:-1], out=val_starts[1:])
    total_vals = int(nvals.sum())
    stream = np.empty(total_vals, dtype=np.uint64)

    # gaps section: within-block diffs of doc_ids
    all_gaps = np.diff(doc_ids).astype(np.uint64) if n > 1 else np.empty(0, np.uint64)
    dst_gap = np.repeat(val_starts, reps) + _ranges(reps)
    src_gap = np.repeat(starts, reps) + _ranges(reps)
    stream[dst_gap] = all_gaps[src_gap]
    # tfs section (block-contiguous sources == plain arange)
    dst_tf = np.repeat(val_starts + reps, c64) + _ranges(c64)
    stream[dst_tf] = tfs.astype(np.uint64)
    # dls section
    dst_dl = np.repeat(val_starts + reps + c64, c64) + _ranges(c64)
    stream[dst_dl] = dls.astype(np.uint64)

    payload = encode_varints(stream)
    sizes = varint_sizes(stream)
    byte_before = np.zeros(total_vals + 1, dtype=np.int64)
    np.cumsum(sizes, out=byte_before[1:])
    return EncodedPostings(
        df=n,
        cf=int(tfs.sum()),
        payload=payload,
        block_first=doc_ids[starts],
        block_last=doc_ids[ends - 1],
        block_count=counts,
        block_offset=byte_before[val_starts],
        block_vstart=val_starts,
        block_max_tf=np.maximum.reduceat(tfs, starts),
        block_min_dl=np.minimum.reduceat(dls, starts),
        pos_payload=pos_payload,
        block_pvstart=block_pvstart,
        block_poffset=block_poffset,
    )


def encode_postings_grouped(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_offsets: np.ndarray,
    block_size: int = POSTING_BLOCK_SIZE,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode MANY terms' posting lists in one vectorized pass.

    The per-(term, salt)-group ``encode_postings`` loop was the last
    Python-per-group work in the build hot path (vocab-level: ~1 call
    per unique term per block — millions at web vocab). This encodes
    every group's blocks into ONE value stream, varint-encodes it in
    one call, and slices per-group payloads out by offset — bit-
    identical bytes per group to calling ``encode_postings`` on each
    group's slice (pinned by tests/test_segment.py).

    ``group_offsets`` (int64, length ``n_groups+1``): group ``g`` is
    rows ``[go[g], go[g+1])`` of the input arrays; every group must be
    non-empty and strictly increasing in doc_id. ``positions`` (flat,
    ``tfs[i]`` values per row, row-contiguous) spans ALL groups.

    Returns a dict of **pyarrow arrays**, one element per group:
    ``df cf run_first run_last payload pos_payload block_first
    block_last block_count block_offset block_vstart block_max_tf
    block_min_dl`` — ready to assemble into the run-table schema with
    the caller's key columns; list/binary columns are built from flat
    buffers + offsets (no per-group Python objects anywhere).
    """
    import pyarrow as pa

    go = np.ascontiguousarray(group_offsets, dtype=np.int64)
    k = len(go) - 1
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = len(doc_ids)
    if k < 0 or go[0] != 0 or go[-1] != n:
        raise ValueError("group_offsets must span [0, len(doc_ids)]")
    sizes_g = np.diff(go)
    if (sizes_g <= 0).any():
        raise ValueError("empty groups are not allowed")
    if n > 1:
        d = np.diff(doc_ids)
        bad = d <= 0
        bad[go[1:-1] - 1] = False  # group-crossing diffs don't count
        if bad.any():
            raise ValueError("postings must be strictly increasing by doc_id within each group")

    # ---- positions sidecar (delta stream over ALL groups at once) ----
    pos_u8 = pos_byte_before = None
    if positions is not None:
        positions = np.asarray(positions, dtype=np.int64)
        total_pos = int(tfs.sum())
        if len(positions) != total_pos:
            raise ValueError("positions length must equal sum(tfs)")
        post_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(tfs[:-1], out=post_starts[1:])
        deltas = np.empty(total_pos, dtype=np.int64)
        if total_pos:
            deltas[0] = positions[0]
            deltas[1:] = positions[1:] - positions[:-1]
            deltas[post_starts] = positions[post_starts]  # absolute first per posting
            if (deltas < 0).any():
                raise ValueError("positions must be ascending within each posting")
        pos_u8, pos_byte_before = encode_varints_raw(deltas.astype(np.uint64))
        grp_pos_vstart = post_starts[go[:-1]]
        pos_offsets = np.empty(k + 1, dtype=np.int64)
        pos_offsets[:-1] = pos_byte_before[grp_pos_vstart]
        pos_offsets[-1] = len(pos_u8)

    # ---- block layout (blocks tile the whole input contiguously) -----
    nblk_g = (sizes_g + block_size - 1) // block_size
    tot_blk = int(nblk_g.sum())
    blk_grp_start = np.zeros(k, dtype=np.int64)
    np.cumsum(nblk_g[:-1], out=blk_grp_start[1:])
    loc = np.arange(tot_blk, dtype=np.int64) - np.repeat(blk_grp_start, nblk_g)
    bstarts = np.repeat(go[:-1], nblk_g) + loc * block_size
    bends = np.minimum(bstarts + block_size, np.repeat(go[1:], nblk_g))
    counts = bends - bstarts
    # consecutive blocks tile [0, n): reduceat segments == blocks
    block_max_tf = np.maximum.reduceat(tfs, bstarts) if n else np.empty(0, np.int64)
    block_min_dl = np.minimum.reduceat(dls, bstarts) if n else np.empty(0, np.int64)

    # ---- one value stream: per block gaps(c-1) ++ tfs(c) ++ dls(c) ----
    reps = counts - 1
    nvals = 3 * counts - 1
    val_starts = np.zeros(tot_blk, dtype=np.int64)
    np.cumsum(nvals[:-1], out=val_starts[1:])
    total_vals = int(nvals.sum())
    stream = np.empty(total_vals, dtype=np.uint64)
    all_gaps = np.diff(doc_ids).astype(np.uint64) if n > 1 else np.empty(0, np.uint64)
    dst_gap = np.repeat(val_starts, reps) + _ranges(reps)
    src_gap = np.repeat(bstarts, reps) + _ranges(reps)
    stream[dst_gap] = all_gaps[src_gap]
    # tf/dl sections: block-contiguous sources tile the input in order
    stream[np.repeat(val_starts + reps, counts) + _ranges(counts)] = tfs.astype(np.uint64)
    stream[np.repeat(val_starts + reps + counts, counts) + _ranges(counts)] = dls.astype(
        np.uint64
    )
    payload_u8, byte_before = encode_varints_raw(stream)
    if len(payload_u8) >= (1 << 31):  # pa.binary() offsets are int32
        raise ValueError("grouped payload exceeds 2 GiB; encode in smaller batches")

    grp_vstart = val_starts[blk_grp_start]
    grp_byte_start = byte_before[grp_vstart]
    block_vstart = val_starts - np.repeat(grp_vstart, nblk_g)
    block_offset = byte_before[val_starts] - np.repeat(grp_byte_start, nblk_g)
    pay_offsets = np.empty(k + 1, dtype=np.int64)
    pay_offsets[:-1] = grp_byte_start
    pay_offsets[-1] = len(payload_u8)

    def _binary(offsets: np.ndarray, data: np.ndarray) -> pa.Array:
        return pa.Array.from_buffers(
            pa.binary(),
            len(offsets) - 1,
            [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data.tobytes())],
        )

    def _list64(lengths: np.ndarray, values: np.ndarray) -> pa.Array:
        off = np.zeros(len(lengths) + 1, dtype=np.int32)
        np.cumsum(lengths, out=off[1:])
        return pa.ListArray.from_arrays(pa.array(off, type=pa.int32()), pa.array(values))

    if positions is not None:
        pos_arr = _binary(pos_offsets, pos_u8)
        # v5 sidecar offsets, group-relative (mirrors encode_postings)
        blk_pv_global = post_starts[bstarts]
        pv_rel = blk_pv_global - np.repeat(grp_pos_vstart, nblk_g)
        po_rel = pos_byte_before[blk_pv_global] - np.repeat(
            pos_byte_before[grp_pos_vstart], nblk_g
        )
        pv_arr = _list64(nblk_g, pv_rel)
        po_arr = _list64(nblk_g, po_rel)
    else:
        pos_arr = _binary(np.zeros(k + 1, dtype=np.int64), np.empty(0, np.uint8))
        zl = np.zeros(k, dtype=np.int64)
        pv_arr = _list64(zl, np.empty(0, np.int64))
        po_arr = _list64(zl, np.empty(0, np.int64))
    return {
        "df": pa.array(sizes_g, type=pa.int64()),
        "cf": pa.array(np.add.reduceat(tfs, go[:-1]) if n else np.empty(0, np.int64), type=pa.int64()),
        "run_first": pa.array(doc_ids[go[:-1]], type=pa.int64()),
        "run_last": pa.array(doc_ids[go[1:] - 1], type=pa.int64()),
        "payload": _binary(pay_offsets, payload_u8),
        "pos_payload": pos_arr,
        "block_first": _list64(nblk_g, doc_ids[bstarts]),
        "block_last": _list64(nblk_g, doc_ids[bends - 1]),
        "block_count": pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(nblk_g)].astype(np.int32), type=pa.int32()),
            pa.array(counts.astype(np.int32), type=pa.int32()),
        ),
        "block_offset": _list64(nblk_g, block_offset),
        "block_vstart": _list64(nblk_g, block_vstart),
        "block_max_tf": _list64(nblk_g, block_max_tf),
        "block_min_dl": _list64(nblk_g, block_min_dl),
        "block_pvstart": pv_arr,
        "block_poffset": po_arr,
    }


def concat_runs(runs: list[EncodedPostings]) -> EncodedPostings:
    """Merge doc-range-disjoint, ascending sub-runs by concatenation.

    Valid because range-salting partitions docIDs into ordered disjoint
    ranges and blocks are self-contained (absolute ``block_first``).
    """
    runs = [r for r in runs if r.df > 0]
    if not runs:
        return encode_postings(np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if len(runs) == 1:
        return runs[0]
    lasts = [r.block_last[-1] for r in runs]
    firsts = [r.block_first[0] for r in runs]
    if any(firsts[i + 1] <= lasts[i] for i in range(len(runs) - 1)):
        raise ValueError("sub-runs overlap in doc_id space; range salting broken")
    byte_shift = np.cumsum([0] + [len(r.payload) for r in runs[:-1]])
    v_shift = np.cumsum([0] + [int(r.block_vstart[-1] + 3 * r.block_count[-1] - 1) for r in runs[:-1]])
    # position sidecars concatenate too (per-posting deltas are self-
    # contained); mixed positional/non-positional runs drop positions
    # LOUDLY — the segment-level with_positions flag can't express a
    # per-term loss, so the warning is the only audit trail (e.g.
    # compact_deltas over mixed v3/v4 segments)
    have_pos = [len(r.pos_payload) > 0 for r in runs]
    if any(have_pos) and not all(have_pos):
        import warnings

        warnings.warn(
            "concat_runs: merging positional with non-positional sub-runs "
            f"({sum(have_pos)}/{len(runs)} have positions) — dropping the "
            "positions sidecar for this term; phrase/near/highlight will "
            "route to the corpus-scan path for it",
            stacklevel=2,
        )
    pos = b"".join(bytes(r.pos_payload) for r in runs) if all(have_pos) else b""
    e64 = np.empty(0, np.int64)
    pv = po = e64
    if all(have_pos) and all(r.has_pos_blocks for r in runs):
        # v5 offsets shift exactly like the doc-payload ones: value
        # count by cumulative cf, byte offset by cumulative sidecar size
        pv_shift = np.cumsum([0] + [int(r.cf) for r in runs[:-1]])
        po_shift = np.cumsum([0] + [len(r.pos_payload) for r in runs[:-1]])
        pv = np.concatenate([r.block_pvstart + int(s) for r, s in zip(runs, pv_shift)])
        po = np.concatenate([r.block_poffset + int(s) for r, s in zip(runs, po_shift)])
    return EncodedPostings(
        df=sum(r.df for r in runs),
        cf=sum(r.cf for r in runs),
        payload=b"".join(r.payload for r in runs),
        block_first=np.concatenate([r.block_first for r in runs]),
        block_last=np.concatenate([r.block_last for r in runs]),
        block_count=np.concatenate([r.block_count for r in runs]),
        block_offset=np.concatenate([r.block_offset + int(s) for r, s in zip(runs, byte_shift)]),
        block_vstart=np.concatenate([r.block_vstart + int(s) for r, s in zip(runs, v_shift)]),
        block_max_tf=np.concatenate([r.block_max_tf for r in runs]),
        block_min_dl=np.concatenate([r.block_min_dl for r in runs]),
        pos_payload=pos,
        block_pvstart=pv,
        block_poffset=po,
    )


def decode_blocks(enc: EncodedPostings, bidx: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only the selected blocks (ascending indices) in one pass.

    Returns (doc_ids, tfs, dls) concatenated across the blocks.
    """
    if len(bidx) == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    bidx = np.asarray(bidx, dtype=np.int64)
    # contiguous byte ranges per selected block → decode each range; to
    # keep it one vectorized decode, gather the byte slices first.
    counts = enc.block_count[bidx].astype(np.int64)
    nvars = 3 * counts - 1
    payload = np.frombuffer(enc.payload, dtype=np.uint8)
    ends = np.append(enc.block_offset[1:], len(payload))
    pieces = [payload[int(enc.block_offset[i]) : int(ends[i])] for i in bidx]
    stream = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
    vals = decode_varints(stream, count=int(nvars.sum()))
    ids_l, tfs_l, dls_l = [], [], []
    v = 0
    for j, i in enumerate(bidx):
        c = int(counts[j])
        gaps = vals[v : v + c - 1].astype(np.int64)
        tf = vals[v + c - 1 : v + 2 * c - 1].astype(np.int64)
        dl = vals[v + 2 * c - 1 : v + 3 * c - 1].astype(np.int64)
        ids = np.empty(c, dtype=np.int64)
        ids[0] = enc.block_first[i]
        if c > 1:
            np.cumsum(gaps, out=ids[1:])
            ids[1:] += ids[0]
        ids_l.append(ids)
        tfs_l.append(tf)
        dls_l.append(dl)
        v += 3 * c - 1
    return np.concatenate(ids_l), np.concatenate(tfs_l), np.concatenate(dls_l)


def decode_all(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the full posting list: (doc_ids, tfs, dls)."""
    return decode_blocks(enc, np.arange(len(enc.block_count), dtype=np.int64))


def decode_positions_blocks(
    enc: EncodedPostings, bidx: np.ndarray, tfs: np.ndarray
) -> np.ndarray:
    """Decode the positions sidecar for SELECTED blocks only (layout
    v5, requires ``enc.has_pos_blocks``). ``bidx`` = ascending block
    indices; ``tfs`` = the decoded tf array of exactly those blocks
    (``decode_blocks(enc, bidx)[1]``) — per-posting segment lengths.
    Valid because block boundaries are posting boundaries and every
    posting's first delta is stored absolute: any posting-aligned
    subsequence decodes independently. Returns flat positions,
    ``sum(tfs)`` values, same layout as :func:`decode_positions`."""
    bidx = np.asarray(bidx, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    if not enc.has_pos_blocks:
        raise ValueError("segment has no per-block position offsets (layout < v5)")
    buf = np.frombuffer(enc.pos_payload, dtype=np.uint8)
    po_end = np.append(enc.block_poffset[1:], len(buf))
    pv_end = np.append(enc.block_pvstart[1:], enc.cf)
    nvals = pv_end[bidx] - enc.block_pvstart[bidx]
    pieces = [buf[int(enc.block_poffset[i]) : int(po_end[i])] for i in bidx]
    stream = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
    deltas = decode_varints(stream, count=int(nvals.sum())).astype(np.int64)
    if len(deltas) != total:
        raise ValueError("positions sidecar does not match the selected blocks' tfs")
    c = np.cumsum(deltas)
    seg_starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=seg_starts[1:])
    corr = np.zeros(len(tfs), dtype=np.int64)
    corr[1:] = c[seg_starts[1:] - 1]
    return c - np.repeat(corr, tfs)


def decode_positions(enc: EncodedPostings, tfs: np.ndarray) -> np.ndarray:
    """Decode the positions sidecar back to absolute token positions.

    ``tfs`` must be the run's full decoded tf array (``decode_all``) —
    it carries the per-posting segment lengths the delta stream was
    encoded under. Returns a flat int64 array of length ``sum(tfs)``,
    grouped per posting in doc order, ascending within a posting.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    if len(enc.pos_payload) == 0:
        raise ValueError(
            "segment has no positions sidecar (index built with with_positions=False)"
        )
    deltas = decode_varints(
        np.frombuffer(enc.pos_payload, dtype=np.uint8), count=total
    ).astype(np.int64)
    c = np.cumsum(deltas)
    seg_starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=seg_starts[1:])
    corr = np.zeros(len(tfs), dtype=np.int64)
    corr[1:] = c[seg_starts[1:] - 1]  # running total before each posting
    return c - np.repeat(corr, tfs)
