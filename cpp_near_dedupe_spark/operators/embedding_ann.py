"""Similarity search over an embedding column (array<float>).

Two paths:

* ``brute_force_topk`` — exact cosine top-k, entirely JVM-side: the query
  set is broadcast, the dot product is ``aggregate(zip_with(...))`` (whole-
  stage codegen, no Python), top-k via window row_number with deterministic
  tie-break. The baseline and the oracle.
* ``lsh_topk`` — random-hyperplane LSH (sign-bit bucketing, seeded, fixed),
  multi-table: ``n_tables`` independent hyperplane sets are computed in ONE
  matmul per Arrow batch; a candidate is any vector sharing ≥1 table's
  bucket with the query, deduplicated BEFORE scoring, then scored exactly.
  This is the 100 TB path: bucketing turns the O(N·Q) cross product into a
  bucket-local equi-join; recall follows 1-(1-p)^T per neighbor where p is
  the single-table collision rate (1 - θ/π)^n_planes — measured ≥0.9
  recall@5 at the bench config in tests/test_ann_recall.py and reported in
  BENCH/BASELINE.md.

Scores are rounded to 6 dp so Spark and the DuckDB oracle (float32 →
double accumulation order) compare exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded)."""
    base = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    queries = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("q")
    )
    scored = base.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(_cosine(F.col("q"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket): sign-bit buckets of ``n_tables`` independent
    seeded random projections, all computed in one matmul per Arrow batch
    (the per-batch cost of T tables is one (batch × dim) @ (dim × T·planes)
    product — memory-bandwidth-identical to a single wide table)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = np.random.default_rng(seed).standard_normal(
            (dim, n_tables * n_planes)
        )
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        tables = np.arange(n_tables, dtype=np.int32)
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (mat @ planes) > 0
            # (n, T, planes) @ (planes,) -> (n, T)
            bucket = bits.reshape(len(mat), n_tables, n_planes) @ weights
            n = len(mat)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].values, n_tables),
                    "table": np.tile(tables, n),
                    "bucket": bucket.reshape(-1),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, table int, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine over candidates sharing ≥1 of
    ``n_tables`` hyperplane buckets with the query. Candidate pairs are
    deduplicated across tables BEFORE the (expensive) exact scoring — the
    same distinct-before-score discipline as the text LSH chain
    (operators/pairs.py)."""
    buckets = hyperplane_buckets(
        embeddings, n_planes, dim, seed, n_tables, id_col, vec_col
    )
    qlist = list(query_ids)
    q_buckets = buckets.filter(F.col(id_col).isin(qlist)).select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(q_buckets), ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q_vecs = embeddings.filter(F.col(id_col).isin(qlist)).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q")
    )
    scored = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("q"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
