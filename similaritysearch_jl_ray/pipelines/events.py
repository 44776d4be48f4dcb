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

    def finalize(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "window_start": pa.array([group["window_start"][0].as_py()], type=pa.int64()),
                "n": pa.array([int(np.sum(group["n_partial"].to_numpy()))], type=pa.int64()),
                "sum_value": pa.array(
                    [round6(float(np.sum(group["sum_partial"].to_numpy())))], type=pa.float64()
                ),
            }
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .map_groups(finalize, batch_format="pyarrow")
    )


def sliding_event_counts(sf_dir: str, window_s: int = 3600, slide_s: int = 900):
    """Sliding window per event_type: an event at time t contributes
    to every window ``[w, w + window_s)`` with ``w ≡ 0 (mod slide_s)``
    and ``w ≤ t < w + window_s`` — exactly ``window_s // slide_s``
    windows per event. Same pre-aggregate-per-batch + tiny-shuffle
    shape as the tumbling op; fanout happens inside the batch, so the
    shuffle moves one row per (type, window, batch)."""
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

    def finalize(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "window_start": pa.array([group["window_start"][0].as_py()], type=pa.int64()),
                "n": pa.array([int(np.sum(group["n_partial"].to_numpy()))], type=pa.int64()),
                "sum_value": pa.array(
                    [round6(float(np.sum(group["sum_partial"].to_numpy())))], type=pa.float64()
                ),
            }
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .map_groups(finalize, batch_format="pyarrow")
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

    def finalize(group: pa.Table) -> pa.Table:
        mx = max_by_type[group["event_type"][0].as_py()]
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "n_total": pa.array([int(np.sum(group["n_partial"].to_numpy()))], type=pa.int64()),
                "n_late": pa.array([int(np.sum(group["late_partial"].to_numpy()))], type=pa.int64()),
                "max_ts_s": pa.array([int(mx)], type=pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Per-user sessions (gap > gap_s starts a new session):
    (user_id, session_id, n_events, start_s, end_s). session_id is
    1-based in ts order per user (ties: stable ts order)."""

    def sessions(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        epoch = pc.cast(group["ts"], pa.int64()).to_numpy() // 1_000_000
        order = np.argsort(epoch, kind="stable")
        e = epoch[order]
        new_sess = np.ones(len(e), dtype=bool)
        new_sess[1:] = (e[1:] - e[:-1]) > gap_s
        # e is ascending, so each session is a contiguous run: reduceat
        # boundaries are exactly the new-session flags
        bounds = np.flatnonzero(new_sess)
        n_ev = np.diff(np.r_[bounds, len(e)]).astype(np.int64)
        nsess = len(bounds)
        return pa.table(
            {
                "user_id": pa.array(np.full(nsess, uid, dtype=np.int64)),
                "session_id": pa.array(np.arange(1, nsess + 1, dtype=np.int64)),
                "n_events": pa.array(n_ev, type=pa.int64()),
                "start_s": pa.array(e[bounds], type=pa.int64()),
                "end_s": pa.array(e[np.r_[bounds[1:], len(e)] - 1], type=pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
    )
