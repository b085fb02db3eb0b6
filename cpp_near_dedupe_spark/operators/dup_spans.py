"""Exact-substring (span-level) duplicate detection.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") remove every ≥50-token span that occurs twice anywhere in the
corpus, using a monolithic suffix array. The RELATIONAL formulation of
the same semantics — each length-L token window keyed by its hash,
window-hash frequencies corpus-wide, every window whose hash occurs ≥2
times marked duplicated — shards naturally in Spark: explode windows →
hash-agg frequencies → shuffle join back on the window hash. No suffix
array, no driver state, no window functions; every stage is a hash
aggregation or equi-join that partitions by window-hash/doc_id.

Cost shape at 100 TB: the window explode is ~n_tokens rows per document
(the same token stream the sketch pipeline already shuffles once) and
the frequency table is corpus-sized, so this is a heavy-but-flat
two-shuffle job — the distributed replacement for the suffix array's
O(corpus) memory. Coverage accounting explodes ONLY the duplicated
windows (a small fraction of real corpora) into their L token positions
and counts distinct positions per doc, so the union-of-intervals math
stays relational and oracle-mirrorable.

Reference scope note: the reference engine has no sub-document operator
(`/root/reference/CPPDeduper` matches whole-document sketches);
span-level dedup is part of the training-data surface built on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import words_col


def _window_hashes(w, span_tokens: int):
    """Array column of (md5 over the space-joined L-token window) for
    every start position 1..n-L+1; empty when the doc is shorter than L."""
    return F.when(
        F.size(w) >= F.lit(span_tokens),
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(span_tokens - 1)),
            lambda i: F.md5(F.array_join(F.slice(w, i, span_tokens), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duplicate_spans(
    docs: DataFrame,
    span_tokens: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_windows, n_dup_windows, covered_tokens, dup_frac)
    per document.

    A window is DUPLICATED when its hash occurs ≥ ``min_count`` times in
    the whole corpus (within-doc repeats count, matching the suffix-array
    semantics). ``covered_tokens`` is the size of the union of all
    duplicated [pos, pos+L) intervals; ``dup_frac`` = covered / n_tokens,
    rounded to 6 dp — the doc-level removal signal.
    """
    L = span_tokens
    toks = docs.select(
        F.col(id_col), words_col(text_col).alias("_w")
    ).select(
        id_col,
        F.size("_w").cast("long").alias("n_tokens"),
        _window_hashes(F.col("_w"), L).alias("_h"),
    )
    # multi-consumer (wins + base) tokenizer/hash projection: registry-
    # tracked persist per the session cache-lifecycle contract (cache.py)
    from ..cache import track

    toks = track(toks)
    wins = toks.select(
        id_col, F.posexplode("_h").alias("_p0", "h")
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "h")
    freq = wins.groupBy("h").count().filter(F.col("count") >= min_count)
    dup_wins = wins.join(freq.select("h"), "h")
    coverage = (
        dup_wins.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(L - 1))
            ).alias("tpos"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("tpos").cast("long").alias("covered_tokens"))
    )
    dup_counts = dup_wins.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_dup_windows")
    )
    base = toks.select(
        id_col, "n_tokens", F.size("_h").cast("long").alias("n_windows")
    )
    covered = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long")
    return (
        base.join(dup_counts, id_col, "left")
        .join(coverage, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            covered.alias("covered_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0, covered / F.col("n_tokens")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_span_duplicated_docs(
    docs: DataFrame,
    span_tokens: int = 50,
    max_dup_frac: float = 0.5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The filtering face: drop documents whose duplicated-span coverage
    exceeds ``max_dup_frac`` (doc-level action; span-level text surgery
    is a corpus rewrite — the published pipelines mostly gate at the doc
    level for exactly the reassembly-cost reason)."""
    bad = duplicate_spans(
        docs, span_tokens=span_tokens, min_count=min_count,
        id_col=id_col, text_col=text_col,
    ).filter(F.col("dup_frac") > max_dup_frac)
    return docs.join(bad.select(id_col), id_col, "left_anti")
