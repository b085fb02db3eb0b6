"""Per-stage timing breakdown of the slowest bench.py headline queries.

Runs each listed query at $SPARK_GRAFT_SF_DIR twice (cold plan + warm) and,
for the pipeline query, times each stage boundary separately so regressions
can be attributed (sketch vs bands vs pairs vs edges vs CC vs resolve)
instead of guessed. Prints one JSON line per measurement.

Usage: python3 tools/profile_bench.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label: str, fn) -> None:
    t0 = time.time()
    out = fn()
    print(json.dumps({"stage": label, "sec": round(time.time() - t0, 3), "rows": out}))


def noop_write(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> int:
    from cpp_near_dedupe_spark.config import DedupeConfig
    from cpp_near_dedupe_spark.session import build_session

    import __spark_entry__ as em

    spark = build_session(app_name="profile", master="local[32]")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm

    names = sys.argv[1:] or ["lsh_clusters", "ngram_jaccard_adjacent", "simhash_dupe_pairs"]
    qs = em.queries()

    if "lsh_clusters" in names:
        from cpp_near_dedupe_spark.plans.pipeline import run_pipeline

        cfg = DedupeConfig()
        docs = em._docs(spark, SF_DIR)
        for stage in ("signatures", "bands", "pairs", "edges", None):
            label = stage or "full"
            t0 = time.time()
            res = run_pipeline(spark, docs, cfg, stop_after=stage)
            df = {
                "signatures": lambda r: r.signatures,
                "bands": lambda r: r.bands,
                "pairs": lambda r: r.pairs,
                "edges": lambda r: r.edges,
                "full": lambda r: r.resolved,
            }[label](res)
            df.write.format("noop").mode("overwrite").save()
            print(json.dumps({"stage": f"pipeline:{label}", "sec": round(time.time() - t0, 3)}))
        names = [n for n in names if n != "lsh_clusters"]

    for name in names:
        for attempt in ("cold", "warm"):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            print(json.dumps({"stage": f"{name}:{attempt}", "sec": round(time.time() - t0, 3)}))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
