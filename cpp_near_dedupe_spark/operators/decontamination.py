"""Benchmark decontamination: cross-corpus word-n-gram overlap.

The published LLM training pipelines (GPT-3 appendix C, PaLM, Llama)
remove or flag training documents that share any long word n-gram
(n = 13 is the canonical choice) with an evaluation benchmark — exact
n-gram collision, not similarity, because eval leakage is binary. This
operator tags every training document with its distinct-n-gram count,
the number of those n-grams that appear anywhere in the benchmark
corpus, and the resulting contamination verdict.

Scale shape (the benchmark side is SMALL by nature — eval sets are
megabytes against a 100 TB training corpus):

* benchmark n-grams: tokenize → n-gram → ``explode`` → global
  ``distinct`` — a tiny relation that Spark BROADCASTS;
* training side: tokenize once per doc (materialized token projection —
  see ``ngram.word_ngrams`` plan-hygiene note), distinct n-grams,
  ``explode_outer`` (zero-gram docs keep their row), map-side broadcast
  hash join against the benchmark set, then ONE shuffle keyed by doc_id
  for the partial-aggregated hit counts. No window functions, no driver
  collect, no UDF — the whole operator is codegen'd JVM expressions and
  is hash-verifiable against a DuckDB oracle.

Reference scope note: the reference engine has no cross-corpus operator
(`/root/reference/CPPDeduper/main.cpp` dedupes one corpus against
itself); decontamination is part of the training-data surface built on
top of its near-dedup machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import word_ngrams_from_tokens
from .text_analysis import words_col


def benchmark_ngrams(
    bench: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Global distinct word-n-gram set of the benchmark corpus: (gram)."""
    toks = bench.select(words_col(text_col).alias("_w"))
    return (
        toks.select(
            F.explode(
                F.array_distinct(word_ngrams_from_tokens(n, F.col("_w")))
            ).alias("gram")
        )
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id, n_ngrams, n_hit, contaminated) for every training document.

    ``n_ngrams`` counts the doc's DISTINCT n-grams; ``n_hit`` counts how
    many of those occur anywhere in ``bench``; ``contaminated`` is
    ``n_hit > 0`` (the binary remove/keep signal the published pipelines
    filter on). Documents shorter than ``n`` tokens have zero n-grams and
    are never contaminated.
    """
    grams_set = F.broadcast(
        benchmark_ngrams(bench, n=n, text_col=bench_text_col).withColumn(
            "hit", F.lit(1)
        )
    )
    toks = docs.select(F.col(id_col), words_col(text_col).alias("_w"))
    doc_grams = toks.select(
        id_col,
        F.explode_outer(
            F.array_distinct(word_ngrams_from_tokens(n, F.col("_w")))
        ).alias("gram"),
    )
    tagged = doc_grams.join(grams_set, "gram", "left")
    n_hit = F.coalesce(F.sum("hit"), F.lit(0)).cast("long")
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count("gram").cast("long").alias("n_ngrams"),
            n_hit.alias("n_hit"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_hit",
            (F.col("n_hit") > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """The filtering face: ``docs`` rows whose text shares NO word
    n-gram with the benchmark corpus (left-anti against the contaminated
    id set, so the full input row survives untouched)."""
    bad = ngram_contamination(
        docs, bench, n=n, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col,
    ).filter(F.col("contaminated"))
    return docs.join(bad.select(id_col), id_col, "left_anti")
