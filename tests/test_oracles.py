"""Driver-style correctness harness: run every queries() entry at
sf0.001 and compare against its DuckDB oracle (row count, sorted-column
schema, order-insensitive values)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_all_oracles():
    import __ray_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    con = _duck(SF_DIR)
    failures = []
    for name, fn in qs.items():
        got = _canon(_to_pandas(fn(SF_DIR)))
        assert len(got) >= 0
        if name not in oracles:
            continue
        want = _canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        if not got.equals(want):
            neq = (got != want).any(axis=1)
            failures.append(
                f"{name}: values differ, e.g.\n{got[neq].head(3)}\nvs\n{want[neq].head(3)}")
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e
    df = _to_pandas(e.entry())
    assert len(df) >= 0
    assert list(df.columns) == ["doc_id", "score"]
