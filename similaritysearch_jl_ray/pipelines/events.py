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


def windowed_event_counts(sf_dir: str, window_s: int = 3600):
    """Tumbling window per event_type: (event_type, window_start, n,
    sum_value). Pre-aggregated per batch, then one tiny shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64()).to_numpy() // 1_000_000
        wstart = (epoch // window_s) * window_s
        etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        vals = batch["value"].to_numpy()
        key = np.array([f"{t}\x00{w}" for t, w in zip(etype, wstart)], dtype=object)
        u, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        sv = np.zeros(len(u), dtype=np.float64)
        np.add.at(sv, inv, vals)
        types = [k.split("\x00")[0] for k in u]
        ws = [int(k.split("\x00")[1]) for k in u]
        return pa.table(
            {
                "gkey": pa.array(u.tolist()),
                "event_type": pa.array(types),
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
        .groupby("gkey")
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
        etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        vals = batch["value"].to_numpy()
        # vectorized window fanout: k = 0..fanout-1
        base = epoch // slide_s
        wstart = ((base[None, :] - np.arange(fanout)[:, None]) * slide_s).ravel()
        etype_f = np.tile(etype, fanout)
        vals_f = np.tile(vals, fanout)
        key = np.array([f"{t}\x00{w}" for t, w in zip(etype_f, wstart)], dtype=object)
        u, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        sv = np.zeros(len(u), dtype=np.float64)
        np.add.at(sv, inv, vals_f)
        return pa.table(
            {
                "gkey": pa.array(u.tolist()),
                "event_type": pa.array([k.split("\x00")[0] for k in u]),
                "window_start": pa.array([int(k.split("\x00")[1]) for k in u], type=pa.int64()),
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
        .groupby("gkey")
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

    maxes = (
        _events(sf_dir, ["ts", "event_type"])
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": pa.array(
                        np.unique(np.asarray(b["event_type"].to_pylist(), dtype=object)).tolist()
                    ),
                    "mx": pa.array(
                        [
                            int((pc.cast(b["ts"], pa.int64()).to_numpy() // 1_000_000)[
                                np.asarray(b["event_type"].to_pylist(), dtype=object) == t
                            ].max())
                            for t in np.unique(np.asarray(b["event_type"].to_pylist(), dtype=object))
                        ],
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .max("mx")
        .to_pandas()
    )
    max_by_type = dict(zip(maxes["event_type"], maxes["max(mx)"].astype(int)))
    mref = ray.put(max_by_type)

    def partial(batch: pa.Table) -> pa.Table:
        mx = ray.get(mref)
        epoch = pc.cast(batch["ts"], pa.int64()).to_numpy() // 1_000_000
        etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        u, inv = np.unique(etype, return_inverse=True)
        n = np.bincount(inv)
        late = np.zeros(len(u), dtype=np.int64)
        for j, t in enumerate(u):
            late[j] = int((epoch[inv == j] < mx[t] - watermark_s).sum())
        return pa.table(
            {
                "event_type": pa.array(u.tolist()),
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
        sid = np.cumsum(new_sess)
        out = {"user_id": [], "session_id": [], "n_events": [], "start_s": [], "end_s": []}
        for s in np.unique(sid):
            m = sid == s
            out["user_id"].append(uid)
            out["session_id"].append(int(s))
            out["n_events"].append(int(m.sum()))
            out["start_s"].append(int(e[m].min()))
            out["end_s"].append(int(e[m].max()))
        return pa.table(
            {
                "user_id": pa.array(out["user_id"], type=pa.int64()),
                "session_id": pa.array(out["session_id"], type=pa.int64()),
                "n_events": pa.array(out["n_events"], type=pa.int64()),
                "start_s": pa.array(out["start_s"], type=pa.int64()),
                "end_s": pa.array(out["end_s"], type=pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
    )
