"""String-similarity operators (Jaro-Winkler) for entity resolution.

The north-star pipeline scores candidate pairs with "batched
Jaccard/Jaro-Winkler similarity in pandas UDFs": sketch-Jaccard covers
document bodies (operators/scoring.py); this module covers the short
identity-ish strings (titles, url slugs, name fields) where Jaro-Winkler
is the standard record-linkage measure. Arrow-batched kernel, no per-row
Python in the Spark path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaro_winkler_score(
    pairs: DataFrame, left_col: str = "s1", right_col: str = "s2"
) -> DataFrame:
    """Append ``jw`` (rounded to 6 dp) to a DataFrame of string pairs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.jaro_winkler import jaro_winkler_batch

        for pdf in batches:
            out = pdf.copy()
            out["jw"] = jaro_winkler_batch(
                pdf[left_col].tolist(), pdf[right_col].tolist()
            ).round(6)
            yield out

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(pairs.schema.fields) + [StructField("jw", DoubleType())])
    return pairs.mapInPandas(run, schema=schema)


def levenshtein_adjacent(
    docs: DataFrame,
    n_chars: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b=a+1, lev, lev_sim) over the first ``n_chars`` characters of
    consecutive documents: classic edit distance plus the standard
    normalized similarity 1 - lev/max(len). Entirely JVM-side —
    ``F.levenshtein`` is a built-in codegen expression. The third
    record-linkage string measure next to Jaro-Winkler (typo-shaped
    damage) and n-gram Jaccard (reordering): edit distance is the
    standard gauge for insert/delete damage.

    Cross-engine unit parity: Spark's levenshtein counts CODEPOINTS
    while DuckDB's counts UTF-8 BYTES (``levenshtein('é','a')`` is 1 vs
    2), so the comparison runs over an ASCII projection of the text —
    non-ASCII chars are dropped on BOTH sides with the same regex before
    the prefix is taken, making the two units coincide exactly (the same
    reason the JW kernel is byte-based: functions/jaro_winkler.py)."""
    ascii_text = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), "[^\\x00-\\x7F]", ""
    )
    prefix = F.substring(ascii_text, 1, n_chars)
    left = docs.select(F.col(id_col).alias("a"), prefix.alias("s1"))
    right = docs.select((F.col(id_col) - 1).alias("a"), prefix.alias("s2"))
    lev = F.levenshtein(F.col("s1"), F.col("s2"))
    sim = F.round(
        F.lit(1.0)
        - lev.cast("double")
        / F.greatest(F.length("s1"), F.length("s2"), F.lit(1)),
        6,
    )
    return (
        left.join(right, "a")
        .select(
            "a",
            (F.col("a") + 1).alias("b"),
            lev.alias("lev"),
            sim.alias("lev_sim"),
        )
    )


def jaro_winkler_adjacent(
    docs: DataFrame,
    n_chars: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b=a+1, jw) over the first ``n_chars`` characters of consecutive
    documents — the same adjacent-pair harness shape as
    ngram_jaccard_adjacent, exercising the JW kernel end-to-end with a
    DuckDB oracle (jaro_winkler_similarity)."""
    prefix = F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, n_chars)
    left = docs.select(F.col(id_col).alias("a"), prefix.alias("s1"))
    right = docs.select((F.col(id_col) - 1).alias("a"), prefix.alias("s2"))
    pairs = left.join(right, "a").select(
        "a", (F.col("a") + 1).alias("b"), "s1", "s2"
    )
    return jaro_winkler_score(pairs).select("a", "b", "jw")


def token_sort_jw_adjacent(
    docs: DataFrame,
    n_tokens: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b=a+1, ts_jw): Jaro-Winkler over the space-joined SORTED first
    ``n_tokens`` tokens of consecutive docs — the token_sort idea from
    fuzzy record matching (compare after canonicalizing token order) on
    the existing Arrow JW kernel. Word-order damage ("doe john" vs
    "john doe") costs raw JW most of its signal; sorting first removes
    order as a variable while character-level damage still shows.
    Tokens come from the shared analytics tokenizer; sort/join/slice are
    pure codegen'd array expressions. NULL text coalesces to '' BEFORE
    tokenizing (module NULL contract, same as the two siblings above):
    without it the NULL propagates through sort/join into the kernel's
    None→'' coalesce while the oracle's jaro_winkler_similarity(NULL, s)
    stays NULL — a value mismatch on any NULL-text row."""
    from .text_analysis import words_col

    base = docs.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    key = F.array_join(F.array_sort(F.slice(words_col("_t"), 1, n_tokens)), " ")
    left = base.select(F.col(id_col).alias("a"), key.alias("s1"))
    right = base.select((F.col(id_col) - 1).alias("a"), key.alias("s2"))
    pairs = left.join(right, "a").select(
        "a", (F.col("a") + 1).alias("b"), "s1", "s2"
    )
    return jaro_winkler_score(pairs).select(
        "a", "b", F.col("jw").alias("ts_jw")
    )
