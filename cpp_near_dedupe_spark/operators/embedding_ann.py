"""Similarity search over an embedding column (array<float>).

Two paths:

* ``brute_force_topk`` — exact cosine top-k, entirely JVM-side: the query
  set is broadcast, the dot product is ``aggregate(zip_with(...))`` (whole-
  stage codegen, no Python), top-k via window row_number with deterministic
  tie-break. The baseline and the oracle.
* ``lsh_topk`` — random-hyperplane LSH (sign-bit bucketing, seeded, fixed):
  candidates are restricted to the query's bucket, then scored exactly.
  This is the 100 TB path: bucketing turns the O(N·Q) cross product into a
  bucket-local equi-join; the projection is one numpy matmul per Arrow
  batch. Recall is tunable via n_planes/n_tables (here one table — the
  structure is what matters; prod would union several).

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
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-bit bucket of the seeded random projection."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bucket = ((mat @ planes) > 0) @ weights
            yield pd.DataFrame({id_col: pdf[id_col].values, "bucket": bucket})

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, candidates limited to the query's
    hyperplane bucket."""
    buckets = hyperplane_buckets(embeddings, n_planes, dim, seed, id_col, vec_col)
    base = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")).join(
        buckets, id_col
    )
    queries = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("q"), "bucket"
    )
    scored = base.join(F.broadcast(queries), "bucket").filter(
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
