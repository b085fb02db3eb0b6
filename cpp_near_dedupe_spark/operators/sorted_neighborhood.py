"""Sorted-neighborhood blocking (Hernández & Stolfo 1995) for record linkage.

The classic non-LSH blocking strategy: sort all records by a key, slide a
window of ``w`` positions over the sorted order, and compare every pair
that co-occurs in a window — i.e. every pair whose rank distance is
strictly under ``w``. It complements the equi-key blocking passes in
``operators/entity_resolution.py`` (and the reference's band-bucket
blocking, /root/reference/CPPDeduper/LSHBandHashMap.h): key blocking
misses dupes whose keys disagree in the first characters, while
sort-order adjacency catches any damage that preserves the sort prefix.

Scale shape (the part worth getting right at 10¹² rows):

* The global rank is NOT one ``row_number() over (order by key)`` window —
  that plan funnels the entire table through a single task. Instead the
  classic two-phase distributed rank: ``repartitionByRange`` on the full
  sort tuple (Spark's range sampler balances the partitions), a
  ``row_number`` window partitioned by ``spark_partition_id()`` (each
  window partition is one range partition, ~N/P rows, bounded by the
  sampler), and per-partition offsets from a P-row count aggregate. The
  only global-order window runs over that P-row relation — partition
  COUNT, not data, and broadcast back. Rank values are independent of
  where the range boundaries land (rank = position in the total order),
  so the output is deterministic even though the sampler isn't.
* Window pairs come from a bucket equi-join, not a rank range join:
  ranks are bucketed by ``floor(rank / w)``; a pair at distance < w sits
  in the same or adjacent buckets, so the probe side is exploded to
  (bucket, bucket-1) and the join emits each qualifying pair exactly
  once. Output is linear — ~N·(w-1) pairs — and every join is a plain
  shuffled equi-join; no window, no cross join, no skew hazard (bucket
  populations are at most ``w`` by construction — ranks are 1-based, so
  bucket 0 holds the w-1 rows of ranks 1..w-1).

NULL contract: sort keys must be non-null. Spark's total order places
NULLs FIRST while the DuckDB oracles' ORDER BY defaults to NULLS LAST,
so a NULL sort key would produce engine-divergent ranks; every current
caller derives keys from non-null expressions (the ER fixture's names
are md5-derived). Callers with nullable keys should coalesce them to a
sentinel before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank`` (1-based position under the total order
    ``(*sort_cols, id_col)``) without a single-task global window.

    The ranked relation is persisted through the session cache registry:
    it feeds two consumers inside this function (the P-row count
    aggregate and the join-back) and typically two more in the caller
    (both sides of the pair self-join), and an unpersisted plan would
    re-run the range shuffle per consumer.
    """
    from ..cache import track

    order = [F.col(c) for c in sort_cols] + [F.col(id_col)]
    part = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    local = track(
        part.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_lr", F.row_number().over(w_local)
        )
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # exclusive prefix sum over ONE row per range partition — the only
    # single-partition window in the plan, bounded by partition count
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("rank", (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    sort_cols: list[str],
    id_col: str,
    window: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a, b), a < b by id, whose positions under
    the ``(*sort_cols, id_col)`` total order differ by less than
    ``window`` — the sorted-neighborhood method's compare set."""
    ranked = global_rank(records, sort_cols, id_col, num_partitions).select(
        F.col(id_col), F.col("rank")
    )
    blk = lambda r: F.floor(r / window)  # noqa: E731
    lhs = ranked.select(
        F.col(id_col).alias("_ida"), F.col("rank").alias("_ra")
    ).withColumn("_blk", blk(F.col("_ra")))
    rhs = ranked.select(
        F.col(id_col).alias("_idb"), F.col("rank").alias("_rb")
    ).withColumn(
        "_blk", F.explode(F.array(blk(F.col("_rb")), blk(F.col("_rb")) - 1))
    )
    return (
        lhs.join(rhs, "_blk")
        .filter(
            (F.col("_rb") > F.col("_ra"))
            & (F.col("_rb") - F.col("_ra") < window)
        )
        .select(
            F.least("_ida", "_idb").alias("a"),
            F.greatest("_ida", "_idb").alias("b"),
        )
    )
