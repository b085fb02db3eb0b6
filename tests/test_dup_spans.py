"""Span-level exact-substring dedup (operators/dup_spans.py) and the
cluster-shape report (operators/resolve.dedupe_report)."""

from pyspark.sql import functions as F

W = [f"w{i:03d}" for i in range(40)]


def _run(spark, docs, span_tokens=10):
    from cpp_near_dedupe_spark.operators.dup_spans import duplicate_spans

    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = duplicate_spans(d, span_tokens=span_tokens)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_exact_copies_fully_covered(spark):
    text = " ".join(W[:20])
    out = _run(spark, [(1, text), (2, text)], span_tokens=10)
    for i in (1, 2):
        assert out[i]["n_windows"] == 11
        assert out[i]["n_dup_windows"] == 11
        assert out[i]["covered_tokens"] == 20
        assert out[i]["dup_frac"] == 1.0


def test_partial_shared_span_coverage(spark):
    # docs share exactly tokens W[0:12] -> three 10-windows duplicated,
    # covering tokens 1..12 of each doc
    a = " ".join(W[:12] + ["xxa", "xxb", "xxc", "xxd", "xxe", "xxf"])
    b = " ".join(W[:12] + ["yya", "yyb", "yyc", "yyd", "yye", "yyf"])
    out = _run(spark, [(1, a), (2, b)], span_tokens=10)
    assert out[1]["n_dup_windows"] == 3
    assert out[1]["covered_tokens"] == 12
    assert out[1]["n_windows"] == 9  # 18 tokens -> 9 windows
    assert 0 < out[1]["dup_frac"] < 1


def test_within_doc_repeat_counts(spark):
    # the same 10-token run twice INSIDE one doc duplicates its windows
    text = " ".join(W[:10] + ["sep1", "sep2"] + W[:10])
    out = _run(spark, [(1, text)], span_tokens=10)
    assert out[1]["n_dup_windows"] >= 2
    assert out[1]["covered_tokens"] >= 20


def test_short_and_unique_docs(spark):
    out = _run(
        spark,
        [(1, "only three words"), (2, " ".join(W[20:35]))],
        span_tokens=10,
    )
    assert out[1]["n_windows"] == 0 and out[1]["dup_frac"] == 0.0
    assert out[2]["n_dup_windows"] == 0 and out[2]["dup_frac"] == 0.0
    assert len(out) == 2


def test_remove_span_duplicated_docs(spark):
    from cpp_near_dedupe_spark.operators.dup_spans import (
        remove_span_duplicated_docs,
    )

    text = " ".join(W[:20])
    d = spark.createDataFrame(
        [(1, text), (2, text), (3, " ".join(W[20:40]))],
        "doc_id long, text string",
    )
    kept = remove_span_duplicated_docs(d, span_tokens=10, max_dup_frac=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]


def test_dedupe_report_histogram(spark):
    from cpp_near_dedupe_spark.operators.resolve import dedupe_report

    resolved = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False),
         (4, 4, True), (5, 5, True), (6, 6, True), (7, 6, False)],
        "doc_id long, cluster_id long, is_kept boolean",
    )
    rows = {
        r["cluster_size"]: r.asDict() for r in dedupe_report(resolved).collect()
    }
    assert rows[1] == {
        "cluster_size": 1, "n_clusters": 2, "n_docs": 2, "n_removed": 0
    }
    assert rows[2] == {
        "cluster_size": 2, "n_clusters": 1, "n_docs": 2, "n_removed": 1
    }
    assert rows[3] == {
        "cluster_size": 3, "n_clusters": 1, "n_docs": 3, "n_removed": 2
    }


def test_duplicate_spans_plan_windowless(spark):
    from cpp_near_dedupe_spark.operators.dup_spans import duplicate_spans
    from cpp_near_dedupe_spark.cache import release_all

    d = spark.createDataFrame(
        [(1, " ".join(W[:20]))], "doc_id long, text string"
    )
    plan = (
        duplicate_spans(d, span_tokens=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    release_all()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
