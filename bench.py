"""Bench harness (driver contract): headline queries at $SPARK_GRAFT_SF_DIR
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set: the full near-dedupe pipeline (sketch → LSH → pairs → Jaccard
→ CC → resolve) plus the heavy standalone operators. Each timing is
action-to-completion (count/collect) on a warm session; Spark/JVM startup is
excluded (north_rule measures pipeline throughput, not cold start).

The two-parallelism scaling run (north_rule's stand-in for N vs 4N
executors) lives in bench_scaling.py and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cpp_near_dedupe_spark.session import build_session
    from cpp_near_dedupe_spark.config import DedupeConfig
    import __spark_entry__ as entry_mod

    spark = build_session(app_name="bench", master=f"local[{cpus}]")
    # warm the JVM + python workers once so per-query numbers are steady.
    # The mapInPandas no-op forces every Python worker to fork and import
    # numpy/pandas BEFORE the first timed query — executor-reusable state a
    # real cluster amortizes across jobs; r1/r2 paid this (~1.3 s) inside
    # the first timed query instead.
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    def _noop(batches):
        import numpy, pandas  # noqa: F401 — force worker-side imports

        yield from batches

    (
        spark.range(0, int(cpus) * 10, 1, int(cpus))
        .toDF("id")
        .mapInPandas(_noop, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    cfg = DedupeConfig()
    queries = entry_mod.queries()
    # the r1-r3 comparable core set; its subtotal is reported separately
    # (core11_total) so round-over-round comparisons stay apples-to-apples
    core11 = [
        "lsh_clusters",        # full pipeline end-to-end
        "lsh_candidate_pairs",
        "exact_dedupe",
        "simhash_dupe_pairs",
        "ngram_jaccard_adjacent",
        "doc_stats",
        "token_histogram",
        "language_id",
        "ann_topk",
        "ann_lsh_topk",
        "binary_features",
    ]
    # r4: operators added in r3 join the headline so their regressions are
    # visible round-over-round (VERDICT r3 #8)
    headline = core11 + [
        "lsh_greedy_kept",           # pipeline edges + strict-order greedy
        "bpe_token_stats",
        "embedding_dupe_pairs_lsh",
        # r5: the oracle-checked incremental mode joins the headline (each
        # rep rebuilds its scratch state dir — self-contained per rep).
        # incremental_sql_strict stays out: at 33 s/rep it would dominate
        # the headline while its two moving parts are already tracked
        # (greedy via lsh_greedy_kept, the incremental machinery here).
        "incremental_sql_dedupe",
        "repeated_line_removal",     # r5: corpus-wide boilerplate filter
        # r5: record-linkage chain (golden records exercises blocking,
        # JW scoring, CC, and survivorship end-to-end) + the north-star
        # pages shape + crawl-identity URL dedup
        "er_golden_records",
        "pages_dedupe",
        "url_dedupe_kept",
        # r5: crawl-pipeline shaping stages (extraction → scrub → sample
        # → delta); all pure codegen'd projections/aggregations, cheap by
        # construction — tracked so a UDF or window regression shows up
        "html_extract_text",
        "pii_scrub",
        "domain_cap_sample",
        "crawl_delta",
        # r5: Gopher hard quality gate (pure codegen projection) and the
        # SemDeDup composition on its 100 TB path (LSH pair generation →
        # CC → keep; the exact path is the driver's oracle query only)
        "gopher_quality",
        # r5: Gopher §A1.2 per-doc repetition rules (pure projection; the
        # 9 in-row array_sort+aggregate passes are the cost to watch)
        "gopher_repetition",
        "c4_clean",  # r5: C4 line/page filters (pure codegen projection)
        "semantic_dedupe_lsh",
        "ngram_contamination",  # r5: 13-gram benchmark decontamination
        # r5: span-level exact-substring dedup — the heavy window explode
        # is the cost driver to watch (dedupe_report stays out: it re-runs
        # the whole SQL-mode pipeline already timed via lsh_clusters)
        "duplicate_spans",
        # r5: the 7-stage crawl-to-clean-corpus composition end-to-end
        "web_clean_report",
        # r5b: sorted-neighborhood blocking end-to-end (distributed rank
        # + bucket join + JW-blend scoring) and TF-IDF cosine (posting-
        # list shuffle shape — different cost profile from the set/sketch
        # scorers, so tracked separately)
        "er_sn_matches",
        "tfidf_cosine_adjacent",
        # r5b: corpus bigram-LM fluency (the CCNet slot) — the bigram
        # explode + two hash aggs are the cost to watch
        "lm_fluency",
    ]
    from cpp_near_dedupe_spark.cache import release_all

    # best-of-N warm reps per query (r5, VERDICT r4 #5): this VM's
    # documented run-to-run noise (±20-25%) exceeds most per-query deltas,
    # so single-shot timings round-trip as phantom regressions between
    # rounds. Each rep rebuilds the query plan from scratch and releases
    # its caches, so reps are independent; min-of-N is the standard
    # noise-floor estimator (same discipline BENCH/BASELINE.md's scaling
    # runs already use).
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(n_reps):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            # cache-lifecycle contract: a query's tracked persists die
            # with it (also keeps reps independent)
            release_all()
        timings[name] = round(best, 3)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    core11_total = round(sum(timings[q] for q in core11), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "core11_total": core11_total,  # r1-r3 comparable subtotal
        "sf": sf_dir,
        "docs": n_docs,
        "pipeline_docs_per_sec": round(n_docs / max(timings["lsh_clusters"], 1e-9), 1),
        "cpus": int(cpus),
        "reps": n_reps,  # timings are best-of-reps (min), per query
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
