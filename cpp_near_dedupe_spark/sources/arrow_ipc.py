"""Arrow IPC stream-format source — the reference's native input.

The reference ingests a directory tree of Arrow IPC *stream* files: a
recursive, extension-filtered scan assigns each file an index in scan order
(`/root/reference/CPPDeduper/CPPDeduper.cpp:50-62`), then each file is
memory-mapped and iterated batch-by-batch with a RecordBatchStreamReader,
rows identified by ``(file_index, row_number)`` where row_number is the
file-global row offset (`ArrowLoaderThread.h:26-31,117-119,194`).

Spark has no built-in IPC-stream reader, so this source distributes the
FILE LIST (one row per file) and opens each file inside ``mapInArrow`` —
the per-task loop is pyarrow's own zero-copy stream reader, and batches
flow to downstream operators as Arrow without row-wise conversion. The
unit of parallelism is the file, matching the reference's one-loader-
per-file model; at 100 TB the corpus is many files, so the scan saturates
the cluster (a single giant .arrow stream file is unsplittable — as it is
for the reference — and should be converted to parquet/Iceberg instead).

``(file_index, row_number)`` doubles as the no-id-column identity mode
(`doc_id = file_index << 40 | row_number`), closing the reference's
identity semantics for inputs without a stable key column.
"""

from __future__ import annotations

import os
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# row_number fits in 40 bits (1.1e12 rows/file); file_index in the high 23
_ROW_BITS = 40


def discover_arrow_files(base_path: str, ext: str = ".arrow") -> list[str]:
    """Recursive extension-filtered scan; sorted for a deterministic
    file_index assignment (the reference uses directory scan order, which
    is filesystem-dependent — we canonicalize to sorted paths)."""
    out = []
    for root, _dirs, names in os.walk(base_path):
        for name in names:
            if name.endswith(ext):
                out.append(os.path.join(root, name))
    return sorted(out)


def _stream_schema(path: str) -> pa.Schema:
    with pa.memory_map(path) as source:
        return pa.ipc.open_stream(source).schema


def read_arrow_ipc(
    spark: SparkSession,
    base_path: str,
    columns: list[str] | None = None,
    ext: str = ".arrow",
) -> DataFrame:
    """Directory tree of .arrow stream files → DataFrame with
    (file_index, row_number, doc_id, <selected columns>).

    ``columns`` prunes the projection at the reader (only those arrays are
    copied out of the mapped file — the IPC analogue of parquet column
    pruning; the reference reads one named column the same way,
    `ArrowLoaderThread.h:144-145`).
    """
    if os.path.isfile(base_path):
        files = [base_path]
    else:
        files = discover_arrow_files(base_path, ext)
    if not files:
        raise FileNotFoundError(f"no *{ext} files under {base_path}")

    file_schema = _stream_schema(files[0])
    names = columns if columns is not None else file_schema.names
    missing = [n for n in names if file_schema.get_field_index(n) < 0]
    if missing:
        raise KeyError(f"columns {missing} not in arrow schema {file_schema.names}")

    # derived identity only when the input has no doc_id of its own
    # (reference inputs have none — identity IS (file_index, row_number))
    add_doc_id = "doc_id" not in names
    id_fields = [
        pa.field("file_index", pa.int64()),
        pa.field("row_number", pa.int64()),
    ] + ([pa.field("doc_id", pa.int64())] if add_doc_id else [])
    out_schema = pa.schema(id_fields + [file_schema.field(n) for n in names])
    from pyspark.sql.pandas.types import from_arrow_schema

    spark_schema = from_arrow_schema(out_schema)

    paths = spark.createDataFrame(
        [(i, p) for i, p in enumerate(files)], "file_index long, path string"
    ).repartition(len(files))

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for b in batches:
            for fi, path in zip(
                b.column("file_index").to_pylist(), b.column("path").to_pylist()
            ):
                with pa.memory_map(path) as source:
                    reader = pa.ipc.open_stream(source)
                    offset = 0
                    for rb in reader:
                        n = rb.num_rows
                        row_no = np.arange(offset, offset + n, dtype=np.int64)
                        arrays = [
                            pa.array(np.full(n, fi, dtype=np.int64)),
                            pa.array(row_no),
                        ]
                        if add_doc_id:
                            arrays.append(pa.array((fi << _ROW_BITS) | row_no))
                        arrays += [
                            rb.column(rb.schema.get_field_index(n_)) for n_ in names
                        ]
                        yield pa.RecordBatch.from_arrays(
                            arrays, schema=out_schema
                        )
                        offset += n

    return paths.mapInArrow(scan, schema=spark_schema)


def write_arrow_ipc_fixture(
    parquet_path: str, out_dir: str, n_files: int = 2, sort_col: str = "doc_id"
) -> list[str]:
    """Deterministic .arrow stream fixture from a parquet table: rows sorted
    by ``sort_col`` and split into ``n_files`` contiguous chunks (file i =
    rows [i*ceil -> ...]). Test/driver scaffolding only — runs on the
    driver; inputs are the small sf tables."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    table = pq.read_table(parquet_path).sort_by(sort_col)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    out = []
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        path = os.path.join(out_dir, f"part_{i:03d}.arrow")
        with pa.OSFile(path, "wb") as sink:
            with pa.ipc.new_stream(sink, table.schema) as writer:
                for rb in chunk.to_batches(max_chunksize=1000):
                    writer.write_batch(rb)
        out.append(path)
    return out
