"""Local replica of the driver's correctness gate: run each __spark_entry__
query AND its DuckDB oracle at sf0.01, compare row count, schema (column
names sorted), and a value hash over rows sorted by all columns.

Run: python3 tools/check_queries.py [query ...]      (default: all queries
that have an oracle; pass names to check a subset, or --rows-only names to
just execute oracle-less queries and print their row counts)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entry
    from cpp_near_dedupe_spark.session import build_session

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args or [n for n in qs if n in oracles]

    spark = build_session(
        app_name="check-queries", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = 0
    for name in names:
        spark_pdf = qs[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(spark_pdf)} rows")
            continue
        oracle_pdf = con.execute(oracles[name]).fetchdf()
        s, o = norm(spark_pdf), norm(oracle_pdf)
        rows_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns)
        vals_ok = rows_ok and schema_ok and s.equals(o)
        status = "OK" if (rows_ok and schema_ok and vals_ok) else "FAIL"
        print(
            f"{name:32s} {status}  rows {len(s)}/{len(o)} "
            f"schema={'ok' if schema_ok else list(s.columns) + list(o.columns)} "
            f"values={'ok' if vals_ok else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures += 1
            if rows_ok and schema_ok:
                neq = ~(s == o).all(axis=1)
                print("  first diffs (spark vs oracle):")
                print(pd.concat([s[neq].head(3), o[neq].head(3)], axis=1))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
