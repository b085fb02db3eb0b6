"""Exact deduplication — hash-groupBy, entirely JVM-side.

The degenerate fast path of the near-dedupe engine (a doc is J=1.0 to its
byte-identical copies): group on the text hash, keep the minimum id. No
UDFs; whole-stage codegen end to end, map-side partial aggregation, one
shuffle on the 128-bit text hash (never on the full text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedupe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One kept id per distinct text value: (text_md5, kept_id, n_copies)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dupe_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Only the groups with actual duplicates (n_copies > 1)."""
    return exact_dedupe(docs, id_col, text_col).filter(F.col("n_copies") > 1)


def exact_dedupe_output(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Input minus exact duplicates (keeps min-id copy), full schema.

    Implemented as a semi-join against the kept ids — at scale this
    broadcast-or-shuffle joins on the id, never moves `text` twice.
    """
    kept = exact_dedupe(docs, id_col, text_col).select(
        F.col("kept_id").alias(id_col)
    )
    return docs.join(kept, id_col, "left_semi")
