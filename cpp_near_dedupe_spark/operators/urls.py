"""URL canonicalization and exact URL-level dedup for web crawls.

Before any content-based near-dedup runs, a crawl pipeline collapses the
cheap identity class: the same page fetched under trivially different
URLs (tracking parameters, fragments, case-insensitive hosts, default
ports, trailing slashes, parameter order). This is pure string algebra —
every step is a built-in Spark SQL expression (codegen'd, no UDF), and
each has an exact DuckDB analogue so the whole operator is
hash-verifiable.

Canonicalization rules (conservative, lossless for crawl dedup):
  1. drop the #fragment;
  2. lowercase the scheme://host prefix (path/query stay case-sensitive);
  3. drop an explicit default port (:443 for https, :80 for http);
  4. drop tracking query parameters (utm_*, fbclid, gclid, ref);
  5. sort the surviving query parameters (order-insensitive identity);
  6. drop a trailing slash on a non-root path.

At 100 TB this is a narrow projection + one hash aggregation on the
canonical string — no joins, no windows; the groupBy key is the
canonical url whose cardinality is ~the corpus size, so partial
(map-side) aggregation carries it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "ref")


def _is_tracking(param: Column) -> Column:
    cond = param.startswith(TRACKING_PREFIXES[0])
    for p in TRACKING_PARAMS:
        cond = cond | param.startswith(p + "=")
    return cond


def canonicalize_url(url: Column) -> Column:
    """url string → canonical url string (pure built-in expressions)."""
    u = F.regexp_replace(url, "#.*$", "")  # 1. fragment
    # 2. lowercase scheme://host; 3. default ports (host segment only)
    head = F.lower(F.regexp_extract(u, "^([^/]*//[^/?]*)", 1))
    head = F.regexp_replace(
        F.regexp_replace(head, ":443$", ""), ":80$", ""
    )
    tail = F.regexp_replace(u, "^[^/]*//[^/?]*", "")
    path = F.regexp_replace(tail, r"\?.*$", "")
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    # 4./5. filter tracking params, sort the rest
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: (x != "") & ~_is_tracking(x),
            )
        ),
        "&",
    )
    # 6. trailing slash (non-root: the fixture/crawl paths are non-empty)
    path = F.regexp_replace(path, "/$", "")
    return F.concat(
        head,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def url_canonicalize(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canonical_url) for every row."""
    return pages.select(
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )


def url_dedupe(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canonical_url, is_kept): keep the lexicographic-min raw url
    of each canonical group — deterministic, engine-independent. One
    hash aggregation + one equi-join on the canonical string."""
    canon = url_canonicalize(pages, url_col)
    keep = canon.groupBy("canonical_url").agg(F.min("url").alias("_keep"))
    return canon.join(keep, "canonical_url").select(
        "url",
        "canonical_url",
        (F.col("url") == F.col("_keep")).alias("is_kept"),
    )


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, n_pages, n_canonical): per-host crawl profile over the
    canonicalized corpus. Two-level hash aggregation, no shuffle beyond
    the groupBy keys."""
    canon = url_canonicalize(pages, url_col)
    host = F.regexp_extract("canonical_url", "^[^/]*//([^/?]*)", 1)
    return (
        canon.select(host.alias("host"), "canonical_url")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("canonical_url").alias("n_canonical"),
        )
    )
