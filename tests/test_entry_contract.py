"""Mimics the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count
+ order-insensitive values (columns sorted by name, exact match on the
rounded values)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks(sf01_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf01_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(entry.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf01_dir, ducks, name):
    q = entry.queries()[name]
    got = _normalize(q(spark, sf01_dir).toPandas())
    exp = _normalize(ducks.execute(entry.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


def test_all_queries_have_oracle_or_reason():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = set(osql) - set(qs)
    assert not missing, f"oracle without query: {missing}"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score"}
