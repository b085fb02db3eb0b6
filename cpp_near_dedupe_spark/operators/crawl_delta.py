"""Two-snapshot crawl delta: added / removed / changed / unchanged pages.

Recurring crawls re-fetch the web; the incremental question "which pages
are new, gone, or content-changed since the last snapshot?" gates all
downstream work (only `added`/`changed` pages need re-sketching — the
streaming/incremental module then folds exactly those into the retained
signature state). The reference has no snapshot story (it consumes one
static directory tree, `/root/reference/CPPDeduper/ArrowLoaderThread.h`);
this operator is the batch face of the same incremental need.

Identity is the CANONICAL url (operators/urls.py — tracking params or a
host-case change between crawls must not read as remove+add); content
identity is md5 of the text column. Where one snapshot carries several
rows of the same canonical url, the min fingerprint represents it
(deterministic; crawl-identity dedup upstream makes it moot).

Plan shape at 100 TB: two narrow projections → two hash aggregations
(map-side combined, keyed on the canonical url — the natural partition
key both snapshots share, so bucketing/partitioning the snapshots by it
makes the join co-located) → one full outer equi-join → a per-row CASE.
No window, no driver action, no skew-sensitive step beyond a join whose
key is unique per side post-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import canonicalize_url


def _snapshot(pages: DataFrame, url_col: str, text_col: str) -> DataFrame:
    return (
        pages.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
        )
        .groupBy("canonical_url")
        .agg(F.min("fp").alias("fp"))
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(canonical_url, status) with status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    o = _snapshot(old, url_col, text_col).withColumnRenamed("fp", "fp_old")
    n = _snapshot(new, url_col, text_col).withColumnRenamed("fp", "fp_new")
    joined = o.join(n, "canonical_url", "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select("canonical_url", status.alias("status"))


def crawl_delta_counts(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(status, n): the summary a crawl operator actually monitors."""
    return (
        crawl_delta(old, new, url_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
