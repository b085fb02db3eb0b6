"""Deterministic corpus sampling: per-domain caps and hash splits.

Two shaping steps every web-scale training-data pipeline runs after
dedup (the reference stops at duplicate removal; these are downstream of
`/root/reference/CPPDeduper/DupeResolverThread.h`'s output):

* **per-domain cap** — a handful of mega-domains dominate a crawl;
  capping pages-per-domain rebalances the corpus. The classic
  implementation is ``row_number() over (partition by domain)`` — which
  puts every page of the hottest domain in ONE window task, exactly the
  unsplittable-task shape this repo eliminated from its pair paths.
  ``domain_cap_sample`` is windowless: one hash aggregation for domain
  counts, broadcast of the (tiny) over-cap domain list, then a per-row
  keep decision by a portable md5-derived hash threshold — a page of a
  hot domain with ``n`` pages survives iff ``h60(url) % ceil(n/cap) ==
  0``, giving an EXPECTED ~cap survivors per hot domain (a deterministic
  sample, not an exact-N head; exactness would need the rank). Cold
  domains pass through untouched.

* **hash split** — train/validation/test assignment must be stable
  across reruns and machines, so it derives from content identity, not
  randomness: ``h60(url) % denom`` buckets against cumulative weight
  boundaries. Adding data never reshuffles existing assignments.

Both use ``h60``: the first 15 hex digits of md5 as an int64 — the same
construction the SQL-mode chain uses for portable hashing, computable
identically in Spark (``conv(substr(md5(u),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(u),1,15))::BIGINT``), so both operators are
hash-verifiable end-to-end.

At 100 TB: the cap is one groupBy(domain) (map-side combined; domain
cardinality ~10⁷ ≪ corpus) + one broadcast join; the split is a pure
projection. No window, no sort, no driver action, nothing skew-sensitive
— the hot domain IS the skew and it never concentrates in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = "^[^/]*//([^/?]*)"


def h60(col: Column) -> Column:
    """Portable 60-bit md5-derived int64 of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(sql: str) -> str:
    """DuckDB mirror of ``h60``."""
    return f"('0x' || substr(md5({sql}), 1, 15))::BIGINT"


def domain_cap_sample(
    pages: DataFrame, cap: int, url_col: str = "url"
) -> DataFrame:
    """(url, host, is_kept): deterministic ~cap-per-domain downsample.

    ``is_kept`` is emitted for every input row (rather than filtering)
    so audits and oracles see the full decision; callers filter on it.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    rows = pages.select(F.col(url_col).alias("url"), host.alias("host"))
    hot = (
        rows.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .filter(F.col("n_pages") > cap)
    )
    denom = F.expr(f"div(n_pages + {cap - 1}, {cap})")
    return rows.join(F.broadcast(hot), "host", "left").select(
        "url",
        "host",
        F.when(F.col("n_pages").isNull(), F.lit(True))
        .otherwise(F.pmod(h60(F.col("url")), denom) == 0)
        .alias("is_kept"),
    )


def hash_split(
    pages: DataFrame,
    weights: dict[str, int] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """(url, split): stable content-keyed split assignment.

    ``weights`` maps split name → integer weight (default
    train/val/test = 98/1/1); buckets ``h60(url) % total`` are assigned
    to splits in the given order by cumulative boundary.
    """
    weights = weights or {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = F.pmod(h60(F.col(url_col)), F.lit(total))
    expr: Column | None = None
    cum = 0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        branch = F.when(bucket < cum, F.lit(name))
        expr = branch if expr is None else expr.when(bucket < cum, F.lit(name))
    split = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return pages.select(F.col(url_col).alias("url"), split.alias("split"))
