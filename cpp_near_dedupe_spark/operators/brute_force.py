"""Brute-force all-pairs comparer — the reference's alternative path
(`/root/reference/CPPDeduper/ComparerThreadBruteForce.h:75-296`, included
but never instantiated in its main). Here it is a real, runnable operator:
cross join on doc ids (a < b) + the exact batched Jaccard — O(n²), the
ground-truth oracle for the LSH pipeline at small scale (SURVEY.md §2 C3),
never the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig
from .sketch_op import sketch_documents
from .scoring import score_pairs


def brute_force_pairs(docs: DataFrame, cfg: DedupeConfig, max_docs: int = 20_000) -> DataFrame:
    """All (a, b, jaccard) pairs with a < b. Guarded against accidental
    O(n²) blowups: refuses inputs larger than ``max_docs``."""
    n = docs.count()
    if n > max_docs:
        raise ValueError(
            f"brute_force_pairs is O(n²); input has {n} docs > max_docs={max_docs}. "
            "Use the LSH pipeline for real corpora."
        )
    ids = docs.select(F.col(cfg.id_col))
    pairs = (
        ids.select(F.col(cfg.id_col).alias("a"))
        .crossJoin(ids.select(F.col(cfg.id_col).alias("b")))
        .filter(F.col("a") < F.col("b"))
    )
    sigs = sketch_documents(docs, cfg)
    return score_pairs(pairs, sigs, cfg)


def brute_force_dupe_pairs(docs: DataFrame, cfg: DedupeConfig, max_docs: int = 20_000) -> DataFrame:
    return brute_force_pairs(docs, cfg, max_docs).filter(
        F.col("jaccard") >= F.lit(cfg.threshold)
    )
