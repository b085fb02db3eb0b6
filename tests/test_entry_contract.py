"""Replicates the driver's correctness gate locally: every queries() entry
runs at sf0.01; entries with an oracle_sql() are compared to DuckDB on
row count, column names, and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "cluster_id", "is_kept"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_runs_and_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    assert got is not None
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    exp = duck.execute(oracle).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), name
    g, e = _normalize(got), _normalize(exp)
    # EXACT comparison — the driver value-hashes both sides, so any float
    # drift (e.g. DuckDB float32 vs Spark double) must fail here too, not
    # hide behind a tolerance.
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True, obj=name)
