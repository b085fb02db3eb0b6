"""Benchmark decontamination (operators/decontamination.py)."""

from pyspark.sql import functions as F

W = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _run(spark, docs, bench, n=13):
    from cpp_near_dedupe_spark.operators.decontamination import (
        ngram_contamination,
    )

    d = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame([(t,) for t in bench], "text string")
    out = ngram_contamination(d, b, n=n)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_exact_member_fully_contaminated(spark):
    text = " ".join(W)  # 20 tokens -> 8 distinct 13-grams
    out = _run(spark, [(1, text)], [text])
    assert out[1]["n_ngrams"] == 8
    assert out[1]["n_hit"] == 8
    assert out[1]["contaminated"] is True


def test_partial_overlap_counts_hits(spark):
    # doc shares exactly tokens W[0:15] with the bench -> 3 shared 13-grams
    doc = " ".join(W[:15] + ["zulu", "yankee"])
    bench = " ".join(W[:15])
    out = _run(spark, [(1, doc)], [bench])
    assert out[1]["n_hit"] == 3
    assert out[1]["contaminated"] is True


def test_clean_and_short_docs(spark):
    out = _run(
        spark,
        [(1, "completely different words here only"), (2, " ".join(W[:5]))],
        [" ".join(W)],
    )
    assert out[1]["contaminated"] is False and out[1]["n_hit"] == 0
    # shorter than n tokens -> zero n-grams, never contaminated
    assert out[2]["n_ngrams"] == 0 and out[2]["contaminated"] is False
    assert len(out) == 2  # zero-gram docs keep their row


def test_decontaminate_filters_rows(spark):
    from cpp_near_dedupe_spark.operators.decontamination import decontaminate

    d = spark.createDataFrame(
        [(1, " ".join(W)), (2, "totally unrelated clean text")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame([(" ".join(W),)], "text string")
    kept = decontaminate(d, b, n=13)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    assert kept.columns == ["doc_id", "text"]  # full input row survives


def test_bench_join_is_broadcast(spark):
    from cpp_near_dedupe_spark.operators.decontamination import (
        ngram_contamination,
    )

    d = spark.createDataFrame([(1, " ".join(W))], "doc_id long, text string")
    b = spark.createDataFrame([(" ".join(W),)], "text string")
    plan = (
        ngram_contamination(d, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
