"""Dedup resolution: pick each cluster's representative, emit keep/drop sets.

Replaces the reference's resolver stage — a 230-line Arrow file splicer
(`/root/reference/CPPDeduper/DupeResolverThread.h:138-431`) — with one
window + one anti-join (SURVEY.md §2 O2): the entire "copy input minus dupe
rows" machinery is ``docs.join(duplicates, id, "left_anti")``.

Representative choice: the reference keeps the *first-seen* doc of a
cluster (arrival order = (file index, row number),
`ComparerThread.h:379-404`). Our order key is configurable
(``cfg.order_col``, e.g. ``warc_ts`` for web pages; defaults to the id) —
min (order_col, id) within each cluster is kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupeConfig


def resolve_clusters(
    docs: DataFrame, clusters: DataFrame, cfg: DedupeConfig
) -> DataFrame:
    """docs × (id, cluster_id) → (id, cluster_id, is_kept) for ALL docs.

    Docs absent from ``clusters`` (no duplicate edge) are singleton
    clusters of themselves and are kept.
    """
    id_col = cfg.id_col
    order_col = cfg.order_col or id_col
    cols = [id_col] if order_col == id_col else [id_col, order_col]
    member = clusters.withColumnRenamed("id", id_col)
    joined = docs.select(*cols).join(member, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col(order_col), F.col(id_col))
    return joined.withColumn(
        "is_kept", F.row_number().over(w) == F.lit(1)
    ).select(id_col, "cluster_id", "is_kept")


def duplicates(resolved: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """The drop set: every doc that is not its cluster's representative."""
    return resolved.filter(~F.col("is_kept")).select(cfg.id_col, "cluster_id")


def dedupe_output(docs: DataFrame, resolved: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """Input minus duplicates, full passthrough schema — the reference's
    entire output stage as one anti-join."""
    dupes = duplicates(resolved, cfg).select(cfg.id_col)
    return docs.join(dupes, cfg.id_col, "left_anti")
