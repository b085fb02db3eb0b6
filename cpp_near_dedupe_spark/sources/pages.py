"""Input binding for web-page tables ``(url, warc_ts, html, text, lang)``.

The reference identifies rows by (file index, row number)
(`/root/reference/CPPDeduper/ArrowLoaderThread.h:26-31`); for an unordered
distributed table the stable identity is the ``url`` column (input
invariant: byte-identical ``text`` per ``url``). We derive a surrogate
``doc_id = xxhash64(url)`` long so the join/CC machinery runs on fixed-width
keys. Spark's builtin ``xxhash64`` is fine here — identity hashing needs
determinism, not reference hash parity.

Collision note for 10^12-doc scale: a 64-bit surrogate expects ~n²/2^65
collisions (≈30k at a trillion rows). The pipeline itself is collision-
tolerant for everything except cluster membership mixups between the two
colliding urls; deployments at that scale should widen the key to
(xxhash64(url, seed 0), xxhash64(url, seed 1)) or carry ``url`` through the
pair stage. Not needed at sandbox scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig

PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def load_pages(spark, path: str) -> DataFrame:
    """Read a pages table. Iceberg catalogs aren't available in this
    environment (no runtime jars); parquet directories stand in — the
    reader is the only place that would change. Directories of Arrow IPC
    stream files (the reference's native input,
    `/root/reference/CPPDeduper/ArrowLoaderThread.h:117-119`) are detected
    by extension and routed through sources/arrow_ipc.py."""
    if path.startswith("iceberg:"):
        try:
            return spark.read.table(path.removeprefix("iceberg:"))
        except Exception as exc:  # pragma: no cover - environment-dependent
            raise RuntimeError(
                "Iceberg catalog not configured in this environment"
            ) from exc
    if path.endswith(".arrow") or _has_arrow_files(path):
        from .arrow_ipc import read_arrow_ipc

        return read_arrow_ipc(spark, path)
    return spark.read.parquet(path)


def _has_arrow_files(path: str) -> bool:
    import os

    if not os.path.isdir(path):
        return False
    from .arrow_ipc import discover_arrow_files

    return bool(discover_arrow_files(path))


def with_doc_id(pages: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """Attach the surrogate ``doc_id`` identity column."""
    if cfg.id_col in pages.columns:
        return pages
    return pages.withColumn(cfg.id_col, F.xxhash64("url"))
