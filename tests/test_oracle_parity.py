"""Driver-mimic: run each ``queries()`` callable and its DuckDB oracle
side by side and compare row count + schema + order-insensitive values
(the exact shape of the driver's CORRECTNESS gate), at sf0.001."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        df = obj
    elif hasattr(obj, "to_pandas"):
        df = obj.to_pandas()
    else:
        raise TypeError(type(obj))
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, got, want):
    assert list(got.columns) == list(want.columns), f"{name}: columns {got.columns} vs {want.columns}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype("float64"), w.astype("float64"), check_names=False, atol=1e-9, rtol=0
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), f"{name}: col {col} differs"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


def test_entry_smoke(entry_mod):
    out = entry_mod.entry()
    df = _normalize(out)
    assert len(df) > 0


def test_every_query_has_result_and_parity(entry_mod):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    con = _oracle_con(SF_DIR)
    assert set(sqls) <= set(qs)
    for name, fn in qs.items():
        out = fn(SF_DIR)
        if name in sqls:
            got = _normalize(out)
            want = _normalize(con.execute(sqls[name]).fetchdf())
            _compare(name, got, want)
        else:
            # rows-only check — no sort: list-typed columns (pq codes)
            # don't order in pandas, and the driver doesn't sort these
            df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
            assert len(df) >= 0
