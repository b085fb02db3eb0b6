"""Session-level cache registry: persist with a lifecycle.

Several operators persist an intermediate that feeds multiple plan
subtrees (Spark does not CSE duplicated Python-UDF subtrees, so an
unpersisted multi-consumer ``mapInPandas`` kernel re-runs once per
consumer). The persist is correct per-query, but a long-lived session
accumulating one cached RDD per query call leaks executor storage.

Contract: operators register every persist here via :func:`track`; the
CALLER that materializes the returned DataFrame releases the caches when
it is done with the query via :func:`release_all` (bench.py and the
driver-facing query wrappers in ``__spark_entry__`` do this between
queries; tests assert the registry drains — see
tests/test_cache_lifecycle.py). Releasing is always safe: an unpersisted
DataFrame stays computable, it just loses the cache.

Plan-shaped small relations (e.g. the hot-bucket stats broadcast in
operators/pairs.py) deliberately do NOT persist at all — identical
broadcast subtrees are collapsed by Spark's ReuseExchange rule instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for a later :func:`release_all`."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n


def tracked_count() -> int:
    return len(_TRACKED)
