"""Extra benchmarks for the optimization rounds (bench.py is frozen —
driver contract). Times an arbitrary subset of the headline queries with
the same methodology as bench.py (warm session, noop sink, best-of-N,
cache release between reps) so per-query optimizations can be measured
in isolation without re-running the whole headline suite.

Usage: python3 bench_extra.py [query ...]   (default: the r6-touched set)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from cpp_near_dedupe_spark.session import build_session
    from cpp_near_dedupe_spark.cache import release_all
    import __spark_entry__ as entry_mod

    spark = build_session(app_name="bench-extra", master=f"local[{cpus}]")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    def _noop(batches):
        import numpy, pandas  # noqa: F401

        yield from batches

    (
        spark.range(0, int(cpus) * 10, 1, int(cpus))
        .toDF("id")
        .mapInPandas(_noop, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    queries = entry_mod.queries()
    names = sys.argv[1:] or [
        "incremental_sql_dedupe",
        "web_clean_report",
        "gopher_repetition",
    ]
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(n_reps):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            release_all()
        timings[name] = round(best, 3)
    print(json.dumps({"queries": timings, "sf": sf_dir, "reps": n_reps}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
