"""Stream-shaped operators over the ``events`` table.

The reference is strictly batch (SURVEY.md §2.7: windows/watermarks
absent); these follow the Ray-guide pattern for stream-shaped inputs:
treat events as an ordered, partitioned log — tumbling windows via
keyed pre-aggregation, sessionization via per-key sorted map_groups.
Timestamps are emitted as epoch seconds (int64) to keep the DuckDB
value-hash comparison dtype-stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import grouped_parts
from ..functions.rounding import round6

__all__ = [
    "windowed_event_counts",
    "sliding_event_counts",
    "late_event_stats",
    "sessionize",
]


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _group_type_window(etype_col, wstart: np.ndarray, vals: np.ndarray):
    """In-batch (event_type, window_start) pre-aggregation, fully
    vectorized: Arrow dictionary-encodes the type column (C hashing, no
    per-row Python), a stable lexsort groups (code, window) pairs, and
    reduceat folds counts/sums per group. Returns (types StringArray,
    wstarts, n, sum_vals) — one row per group, float adds in sorted-run
    order (deterministic)."""
    enc = etype_col.combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    if not len(codes):  # empty block: bounds would be [0, 1] vs size-0 order
        e = np.empty(0, np.int64)
        return enc.dictionary.take(pa.array(e)), e, e, np.empty(0, np.float64)
    order = np.lexsort((wstart, codes))
    c_s, w_s = codes[order], wstart[order]
    bounds = np.flatnonzero(np.r_[True, (c_s[1:] != c_s[:-1]) | (w_s[1:] != w_s[:-1]), True])
    firsts = order[bounds[:-1]]
    n = np.diff(bounds).astype(np.int64)
    sv = np.add.reduceat(vals[order], bounds[:-1]) if len(vals) else np.empty(0, np.float64)
    types = enc.dictionary.take(pa.array(codes[firsts], type=pa.int64()))
    return types, wstart[firsts], n, sv


def _finalize_window(batch: pa.Table) -> pa.Table:
    """Round/rename after the NATIVE Sum aggregates — the per-group
    Python finalize callable is gone (vectorized partial aggregation
    per block, one tiny batch map after the shuffle)."""
    return pa.table(
        {
            "event_type": batch["event_type"],
            "window_start": batch["window_start"].cast(pa.int64()),
            "n": batch["n"].cast(pa.int64()),
            "sum_value": pa.array(
                round6(batch["sum_value"].to_numpy(zero_copy_only=False)), type=pa.float64()
            ),
        }
    )


def windowed_event_counts(sf_dir: str, window_s: int = 3600):
    """Tumbling window per event_type: (event_type, window_start, n,
    sum_value). Pre-aggregated per batch, then one tiny shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64()).to_numpy() // 1_000_000
        wstart = (epoch // window_s) * window_s
        vals = batch["value"].to_numpy()
        types, ws, n, sv = _group_type_window(batch["event_type"], wstart, vals)
        return pa.table(
            {
                "event_type": types,
                "window_start": pa.array(ws, type=pa.int64()),
                "n_partial": pa.array(n, type=pa.int64()),
                "sum_partial": pa.array(sv, type=pa.float64()),
            }
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_partial", alias_name="n"), Sum("sum_partial", alias_name="sum_value"))
        .map_batches(_finalize_window, batch_format="pyarrow")
    )


def sliding_event_counts(sf_dir: str, window_s: int = 3600, slide_s: int = 900):
    """Sliding window per event_type: an event at time t contributes
    to every window ``[w, w + window_s)`` with ``w ≡ 0 (mod slide_s)``
    and ``w ≤ t < w + window_s`` — exactly ``window_s // slide_s``
    windows per event. Same pre-aggregate-per-batch + tiny-shuffle
    shape as the tumbling op; fanout happens inside the batch, so the
    shuffle moves one row per (type, window, batch)."""
    from ray.data.aggregate import Sum

    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    fanout = window_s // slide_s

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64()).to_numpy() // 1_000_000
        vals = batch["value"].to_numpy()
        # vectorized window fanout: k = 0..fanout-1; the type column
        # fans out via an index take (dictionary codes tile with it)
        base = epoch // slide_s
        wstart = ((base[None, :] - np.arange(fanout)[:, None]) * slide_s).ravel()
        idx = np.tile(np.arange(batch.num_rows, dtype=np.int64), fanout)
        etype_f = batch["event_type"].take(pa.array(idx, type=pa.int64()))
        vals_f = np.tile(vals, fanout)
        types, ws, n, sv = _group_type_window(etype_f, wstart, vals_f)
        return pa.table(
            {
                "event_type": types,
                "window_start": pa.array(ws, type=pa.int64()),
                "n_partial": pa.array(n, type=pa.int64()),
                "sum_partial": pa.array(sv, type=pa.float64()),
            }
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_partial", alias_name="n"), Sum("sum_partial", alias_name="sum_value"))
        .map_batches(_finalize_window, batch_format="pyarrow")
    )


def late_event_stats(sf_dir: str, watermark_s: int = 7200):
    """Watermark accounting, batch-restated: per event_type the
    watermark is ``max(ts) − watermark_s``; events older than it are
    the ones a streaming engine with that allowed-lateness would have
    dropped. Emits (event_type, n_total, n_late, max_ts_s). Two-phase:
    a tiny per-type max aggregate is broadcast, then one streamed
    counting pass — the corpus is never collected."""
    import ray
    from ray.data.aggregate import Sum

    def max_partial(b: pa.Table) -> pa.Table:
        epoch = pc.cast(b["ts"], pa.int64()).to_numpy() // 1_000_000
        enc = b["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        if not len(codes):  # reduceat on an empty array raises
            return pa.table(
                {
                    "event_type": enc.dictionary.take(pa.array([], type=pa.int64())),
                    "mx": pa.array([], type=pa.int64()),
                }
            )
        order = np.argsort(codes, kind="stable")
        c_s = codes[order]
        bounds = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        mx = np.maximum.reduceat(epoch[order], bounds)
        return pa.table(
            {
                "event_type": enc.dictionary.take(pa.array(c_s[bounds], type=pa.int64())),
                "mx": pa.array(mx, type=pa.int64()),
            }
        )

    maxes = (
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(max_partial, batch_format="pyarrow")
        .groupby("event_type")
        .max("mx")
        .to_pandas()
    )
    max_by_type = dict(zip(maxes["event_type"], maxes["max(mx)"].astype(int)))
    mref = ray.put(max_by_type)

    def partial(batch: pa.Table) -> pa.Table:
        mx = ray.get(mref)
        epoch = pc.cast(batch["ts"], pa.int64()).to_numpy() // 1_000_000
        enc = batch["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        vocab = enc.dictionary.to_pylist()  # one small list per batch, not per row
        cutoff = np.array([mx[t] - watermark_s for t in vocab], dtype=np.int64)
        n = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        late = np.bincount(
            codes, weights=(epoch < cutoff[codes]).astype(np.float64), minlength=len(vocab)
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": enc.dictionary,
                "n_partial": pa.array(n, type=pa.int64()),
                "late_partial": pa.array(late, type=pa.int64()),
            }
        )

    def attach_max(batch: pa.Table) -> pa.Table:
        mx = ray.get(mref)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n_total": batch["n_total"].cast(pa.int64()),
                "n_late": batch["n_late"].cast(pa.int64()),
                "max_ts_s": pa.array(
                    [int(mx[t]) for t in batch["event_type"].to_pylist()], type=pa.int64()
                ),
            }
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_partial", alias_name="n_total"), Sum("late_partial", alias_name="n_late"))
        .map_batches(attach_max, batch_format="pyarrow")
    )


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Per-user sessions (gap > gap_s starts a new session):
    (user_id, session_id, n_events, start_s, end_s). session_id is
    1-based in ts order per user (ties: stable ts order). Hash
    partitions = config.grouped_parts() (driver-resolved; the dedup
    grouped-stage shape)."""
    P = grouped_parts()

    def key_part(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        return pa.table(
            {
                "part": pa.array(uid % P, type=pa.int64()),
                "user_id": batch["user_id"],
                "ts": batch["ts"],
            }
        )

    def sessions_of_partition(group: pa.Table) -> pa.Table:
        # ONE vectorized pass over every user of the hash partition
        # (per-user map_groups would run a Python callable per user —
        # unbounded keys at web scale; this is the dedup grouped-parts shape)
        uid = group["user_id"].to_numpy().astype(np.int64)
        epoch = pc.cast(group["ts"], pa.int64()).to_numpy() // 1_000_000
        if not len(uid):
            e = np.empty(0, np.int64)
            return pa.table(
                {"user_id": e, "session_id": e, "n_events": e, "start_s": e, "end_s": e}
            )
        order = np.lexsort((epoch, uid))  # user-major, ts-ascending
        u_s, e_s = uid[order], epoch[order]
        new_user = np.ones(len(u_s), dtype=bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        new_sess = new_user | np.r_[True, (e_s[1:] - e_s[:-1]) > gap_s]
        bounds = np.flatnonzero(new_sess)
        n_ev = np.diff(np.r_[bounds, len(e_s)]).astype(np.int64)
        nsess = len(bounds)
        sess_user = u_s[bounds]
        # per-user 1-based session ordinals: subtract each user's first
        # session index (sessions are user-contiguous after the sort)
        first_of_user = np.r_[True, sess_user[1:] != sess_user[:-1]]
        sess_ord = np.arange(nsess, dtype=np.int64)
        offs = np.maximum.accumulate(np.where(first_of_user, sess_ord, 0))
        return pa.table(
            {
                "user_id": pa.array(sess_user, type=pa.int64()),
                "session_id": pa.array(sess_ord - offs + 1, type=pa.int64()),
                "n_events": pa.array(n_ev, type=pa.int64()),
                "start_s": pa.array(e_s[bounds], type=pa.int64()),
                "end_s": pa.array(e_s[np.r_[bounds[1:], len(e_s)] - 1], type=pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(key_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions_of_partition, batch_format="pyarrow")
        .select_columns(["user_id", "session_id", "n_events", "start_s", "end_s"])
    )
