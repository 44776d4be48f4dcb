"""Stream-shaped operator invariants (the driver's DuckDB oracles do
the exact-value checks at sf0.01; these pin the algebraic identities
that hold regardless of data)."""

from __future__ import annotations

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def test_sliding_equals_tumbling_when_slide_is_window(ray_session):
    from similaritysearch_jl_ray.pipelines.events import (
        sliding_event_counts,
        windowed_event_counts,
    )

    tum = (
        windowed_event_counts(SF_DIR, window_s=3600)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    sli = (
        sliding_event_counts(SF_DIR, window_s=3600, slide_s=3600)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    assert tum.equals(sli)


def test_sliding_fanout_conserves_mass(ray_session):
    """Each event lands in exactly window_s/slide_s windows, so total
    n across windows = fanout × event count."""
    from similaritysearch_jl_ray.pipelines.events import (
        sliding_event_counts,
        windowed_event_counts,
    )

    tum = windowed_event_counts(SF_DIR, window_s=3600).to_pandas()
    sli = sliding_event_counts(SF_DIR, window_s=3600, slide_s=900).to_pandas()
    assert sli["n"].sum() == 4 * tum["n"].sum()
    np.testing.assert_allclose(sli["sum_value"].sum(), 4 * tum["sum_value"].sum(), rtol=1e-9)


def test_late_event_stats_invariants(ray_session):
    from similaritysearch_jl_ray.pipelines.events import late_event_stats

    out = late_event_stats(SF_DIR, watermark_s=7200).to_pandas()
    assert (out["n_late"] <= out["n_total"]).all()
    assert (out["n_total"] > 0).all()
    # watermark_s = ∞ → nothing is late
    none_late = late_event_stats(SF_DIR, watermark_s=10**12).to_pandas()
    assert (none_late["n_late"] == 0).all()
    assert (none_late["n_total"].sort_values().to_numpy()
            == out["n_total"].sort_values().to_numpy()).all()


def test_event_kernels_handle_empty_batches(ray_session):
    """Empty Arrow blocks (filtered upstream, empty files) must not
    crash the vectorized pre-aggregation kernels."""
    import pyarrow as pa

    from similaritysearch_jl_ray.pipelines.events import _group_type_window

    empty = pa.table(
        {"event_type": pa.array([], type=pa.string())}
    )["event_type"]
    types, ws, n, sv = _group_type_window(
        empty, np.empty(0, np.int64), np.empty(0, np.float64)
    )
    assert len(types) == 0 and len(ws) == 0 and len(n) == 0 and len(sv) == 0
