"""Skew stress A/B (r5, VERDICT r4 #7): measure the windowless capped+star
pair topology against the reverted WINDOWED formulation on a manufactured
degenerate bucket — the r4 skew hardening was plan-pinned ("no Window
node", tests/test_scale_paths.py) but never measured under actual skew.

Input shape: one hot bucket of --hot rows (the boilerplate/fingerprint-0
class at web scale) plus --cold-buckets buckets of 10 rows each (the
healthy tail). The windowed variant reproduces the pre-r4 plan exactly:
``row_number() over (partition by band_key order by doc_id)`` rank head +
``first_value`` star — AQE cannot split a window partition, so the hot
bucket is ONE O(h log h) sort task there. The production variant is
``operators.pairs.capped_star_pairs`` (hash-agg stats, portable-hash
head, broadcast bucket-min star — no window, no sort).

Both variants read the same persisted input and are timed alternating
(A/B/A/B), best-of-N per variant; pair counts are printed so the outputs
are comparable (both emit head-pairs + star at O(h), the difference is
HOW the head/star are computed). Prints one JSON line for
BENCH/BASELINE.md.

Run: python3 tools/bench_skew.py [--hot 5000000] [--cold-buckets 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def windowed_pairs(rows, cap: int):
    """The reverted pre-r4 formulation: rank-window head + first_value
    star. Kept ONLY as the A/B baseline for this bench — the production
    path is operators.pairs.capped_star_pairs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("band_key").orderBy("doc_id")
    ranked = rows.select(
        "band_key",
        "doc_id",
        F.row_number().over(w).alias("rk"),
        F.first("doc_id").over(w).alias("bmin"),
    )
    head = ranked.filter(F.col("rk") <= cap)
    head_pairs = (
        head.select("band_key", F.col("doc_id").alias("a"))
        .join(head.select("band_key", F.col("doc_id").alias("b")), "band_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    star_pairs = ranked.filter(F.col("doc_id") != F.col("bmin")).select(
        F.col("bmin").alias("a"), F.col("doc_id").alias("b")
    )
    return head_pairs.unionByName(star_pairs).dropDuplicates(["a", "b"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=5_000_000)
    ap.add_argument("--cold-buckets", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cpp_near_dedupe_spark.cache import release_all
    from cpp_near_dedupe_spark.operators.pairs import capped_star_pairs
    from cpp_near_dedupe_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="bench-skew", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    hot = spark.range(args.hot).select(
        F.lit(0).cast("long").alias("band_key"),
        (F.col("id") + 1_000_000_000).alias("doc_id"),
    )
    cold = spark.range(args.cold_buckets * 10).select(
        (1 + F.pmod(F.col("id"), F.lit(args.cold_buckets))).alias("band_key"),
        F.col("id").alias("doc_id"),
    )
    rows = hot.unionByName(cold).persist()
    rows.count()  # warm the shared input

    def run(fn):
        t0 = time.time()
        n = fn().count()
        dt = time.time() - t0
        release_all()
        return n, dt

    results = {"windowless": [], "windowed": []}
    counts = {}
    for _ in range(args.reps):
        counts["windowless"], dt = run(
            lambda: capped_star_pairs(rows, ["band_key"], "doc_id", args.cap)
        )
        results["windowless"].append(round(dt, 2))
        counts["windowed"], dt = run(lambda: windowed_pairs(rows, args.cap))
        results["windowed"].append(round(dt, 2))

    rows.unpersist()
    out = {
        "metric": "skew_stress_hot_bucket",
        "hot_rows": args.hot,
        "cold_buckets": args.cold_buckets,
        "cap": args.cap,
        "cpus": int(cpus),
        "windowless_best_sec": min(results["windowless"]),
        "windowed_best_sec": min(results["windowed"]),
        "all_reps": results,
        "pair_counts": counts,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
