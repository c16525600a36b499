"""Local mirror of the driver's correctness gate: run every ``queries()``
entry at sf0.001 and compare SQL-oracled ones against DuckDB exactly
(sorted columns, sorted rows, exact values)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    from ray.data import Dataset
    if isinstance(result, Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
    return (df.sort_values(by=list(df.columns))
              .reset_index(drop=True))


ORACLED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(con, name):
    ray_df = _normalize(_to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = _normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), (
        f"{name}: {len(ray_df)} vs {len(sql_df)} rows")
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=True, obj=name)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    df = _to_df(entrymod.queries()[name](SF_DIR))
    assert len(df) >= 0
    if len(df) > 0:
        assert len(df.columns) > 0
    if name == "html_text_pages":
        assert df["byte_identical"].all()


def test_entry_smoke():
    df = _to_df(entrymod.entry())
    assert len(df) > 0
    assert "node_id" in df.columns
