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

    # one file per task up to a multiple of the cluster's parallelism;
    # beyond that, multiple files per task (10⁶ input files must not
    # become 10⁶ scheduler tasks — the per-task loop below already
    # iterates over every file row it receives)
    n_parts = min(len(files), 4 * spark.sparkContext.defaultParallelism)
    paths = spark.createDataFrame(
        [(i, p) for i, p in enumerate(files)], "file_index long, path string"
    ).repartition(n_parts)

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
                        # resolve each name explicitly: get_field_index
                        # returns -1 for a column missing from THIS file
                        # (heterogeneous directory), and pyarrow's negative
                        # indexing would silently return the LAST column
                        for n_ in names:
                            idx = rb.schema.get_field_index(n_)
                            if idx < 0:
                                raise KeyError(
                                    f"column {n_!r} missing from {path} "
                                    f"(schema: {rb.schema.names})"
                                )
                            arrays.append(rb.column(idx))
                        yield pa.RecordBatch.from_arrays(
                            arrays, schema=out_schema
                        )
                        offset += n

    return paths.mapInArrow(scan, schema=spark_schema)


def write_arrow_ipc(
    df: "DataFrame",
    in_base: str,
    out_base: str,
    ext: str = ".arrow",
    drop_columns: tuple[str, ...] = ("file_index", "row_number"),
    write_empty_files: bool = True,
) -> "DataFrame":
    """Mirrored-tree Arrow IPC *output* writer — the reference's output
    format: the deduped survivors of each input file are written back as
    one .arrow stream file at the SAME relative path under ``out_base``
    (`/root/reference/CPPDeduper/DupeResolverThread.h:138-196`), schema
    passed through from the data columns (`:215-218`), rows in original
    file order.

    ``df`` must carry ``file_index`` and ``row_number`` as produced by
    ``read_arrow_ipc``; those scan-identity columns are dropped from the
    output (``drop_columns`` — inputs read in no-id-column mode should add
    the derived ``doc_id`` to it). Input files whose rows were ALL deduped
    away still get a
    schema-only stream file so the output tree mirrors the input 1:1
    (skippable via ``write_empty_files``).

    Physical shape: rows are hash-repartitioned on ``file_index`` (each
    input file's survivors land wholly in one task; task count capped at
    a multiple of cluster parallelism) and sorted within the partition by
    (file_index, row_number); the task streams batches into one IPC writer
    per file, switching writers on file_index change — memory is one Arrow
    batch, never a whole file. Each file is written to an ATTEMPT-UNIQUE
    temp path (``.inprogress-<taskAttemptId>`` — Spark's output-committer
    pattern) and atomically renamed: a speculative or zombie retry of the
    same task writes its own temp file, so interleaved writes can never
    publish torn bytes, and the deterministic per-file content makes the
    last rename-wins outcome identical either way.

    Both output passes are distributed: the survivors stream through
    ``mapInArrow`` above, and inputs whose rows were all deduped away get
    their schema-only mirror files from a second distributed map over the
    anti-joined missing-file list — the driver never collects a per-file
    row or writes a file itself (at reference scale the input tree is
    ~10⁶ files; a driver loop over them would serialize the tail). The
    relative-path map reaches tasks as a broadcast-joined column on the
    rows, NOT as a closure-captured python list — a 10⁶-file listing in
    every task closure would cost tens of MB per task; as a broadcast
    relation it ships once per executor and each task sees only the paths
    of the rows it processes.

    Filesystem assumption: ``out_base`` must be a SHARED POSIX filesystem
    (NFS/Lustre/local) — the commit protocol is atomic same-directory
    ``os.replace`` from executor tasks, and the driver lists the input
    tree the executors then open; the reference's writer assumes the same
    (`DupeResolverThread.h:138-196`). On an object store rename is
    copy+delete and non-atomic, so a real deployment there should write
    through a committer (the Iceberg ``CheckpointStore`` seam in
    plans/pipeline.py) instead of this mirrored-tree format.

    Returns the (file_index, path, rows) summary DataFrame — one row per
    written file, zero-row entries included, already materialized: the
    write job runs exactly once inside this function and the summary is
    ``localCheckpoint(eager=True)``-ed, so re-consuming it later reads
    the checkpointed blocks — it never re-runs the side-effecting write
    plan, even after the session cache registry's ``release_all()``.
    Callers typically follow with ``validate_arrow_ipc`` below, the
    reference's re-read validation pass (`DupeResolverThread.h:399-428`).
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    files = (
        [in_base] if os.path.isfile(in_base) else discover_arrow_files(in_base, ext)
    )
    if not files:
        raise FileNotFoundError(f"no *{ext} files under {in_base}")
    base_dir = os.path.dirname(in_base) if os.path.isfile(in_base) else in_base
    rel_paths = [os.path.relpath(p, base_dir) for p in files]

    missing = [c for c in ("file_index", "row_number") if c not in df.columns]
    if missing:
        raise KeyError(f"df lacks identity columns {missing} (use read_arrow_ipc)")
    data_cols = [c for c in df.columns if c not in drop_columns]
    if "__rel" in data_cols:
        raise KeyError("column name '__rel' is reserved by write_arrow_ipc")
    out = df.select("file_index", "row_number", *data_cols)
    arrow_schema = to_arrow_schema(out.schema)
    data_schema = pa.schema([arrow_schema.field(c) for c in data_cols])

    spark = df.sparkSession
    # the path map rides the rows via a broadcast join (one copy per
    # executor), never the task closure (one copy per task)
    paths_df = spark.createDataFrame(
        list(enumerate(rel_paths)), "file_index long, __rel string"
    )
    out = out.join(F.broadcast(paths_df), "file_index").select(
        "file_index", "row_number", "__rel", *data_cols
    )
    n_parts = min(len(files), 4 * spark.sparkContext.defaultParallelism)
    out = out.repartition(n_parts, "file_index").sortWithinPartitions(
        "file_index", "row_number"
    )

    def _attempt_suffix() -> str:
        # attempt-unique temp name: concurrent attempts of the same task
        # (speculation, zombie retries) never share a temp file
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            return str(ctx.taskAttemptId())
        import uuid

        return uuid.uuid4().hex  # driver-side/test invocation

    def write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        results: list[tuple[int, str, int]] = []
        cur_fi, writer, sink, tmp, final, rows = -1, None, None, None, None, 0
        suffix = _attempt_suffix()

        def close_current():
            nonlocal writer, sink, rows
            if writer is not None:
                writer.close()
                sink.close()
                os.replace(tmp, final)
                results.append((cur_fi, final, rows))
                writer, sink, rows = None, None, 0

        def open_for(fi: int, rel: str):
            nonlocal cur_fi, writer, sink, tmp, final
            cur_fi = fi
            final = os.path.join(out_base, rel)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            tmp = f"{final}.inprogress-{suffix}"
            sink = pa.OSFile(tmp, "wb")
            writer = pa.ipc.new_stream(sink, data_schema)

        for b in batches:
            fi_arr = b.column("file_index").to_numpy(zero_copy_only=False)
            rel_arr = b.column("__rel")
            data = pa.RecordBatch.from_arrays(
                [b.column(c) for c in data_cols], schema=data_schema
            )
            # a batch may span a file boundary: split on file_index runs
            start = 0
            for i in range(1, len(fi_arr) + 1):
                if i == len(fi_arr) or fi_arr[i] != fi_arr[start]:
                    fi = int(fi_arr[start])
                    if fi != cur_fi:
                        close_current()
                        open_for(fi, rel_arr[start].as_py())
                    chunk = data.slice(start, i - start)
                    writer.write_batch(chunk)
                    rows += chunk.num_rows
                    start = i
        close_current()
        if results:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in results], pa.int64()),
                    pa.array([r[1] for r in results], pa.string()),
                    pa.array([r[2] for r in results], pa.int64()),
                ],
                names=["file_index", "path", "rows"],
            )

    # localCheckpoint(eager=True) materializes the side-effecting write job
    # exactly ONCE and truncates the lineage: every later consumer reads
    # the checkpointed blocks, so the summary stays decoupled from the
    # write plan even after cache.release_all() (a registry-tracked persist
    # would re-run the writes once released). The checkpointed relation is
    # one row per written file — broadcast-sized by construction.
    summary = out.mapInArrow(
        write, schema="file_index long, path string, rows long"
    ).localCheckpoint(eager=True)

    if write_empty_files:
        # inputs with zero survivors: schema-only mirror files, found by
        # anti-joining the (already driver-resident) input listing against
        # the written summary and created inside a distributed map — at
        # reference scale this tail can be most of a 10⁶-file tree
        all_files = spark.createDataFrame(
            list(enumerate(rel_paths)), "file_index long, rel string"
        )
        missing = all_files.join(summary, "file_index", "left_anti").repartition(
            min(max(len(files) // 256, 1), 4 * spark.sparkContext.defaultParallelism)
        )

        def write_empty(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            suffix = _attempt_suffix()
            results: list[tuple[int, str]] = []
            for b in batches:
                for fi, rel in zip(
                    b.column("file_index").to_pylist(), b.column("rel").to_pylist()
                ):
                    final = os.path.join(out_base, rel)
                    os.makedirs(os.path.dirname(final), exist_ok=True)
                    tmp = f"{final}.inprogress-{suffix}"
                    with pa.OSFile(tmp, "wb") as sink:
                        with pa.ipc.new_stream(sink, data_schema):
                            pass
                    os.replace(tmp, final)
                    results.append((fi, final))
            if results:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([r[0] for r in results], pa.int64()),
                        pa.array([r[1] for r in results], pa.string()),
                        pa.array([0] * len(results), pa.int64()),
                    ],
                    names=["file_index", "path", "rows"],
                )

        empties = missing.mapInArrow(
            write_empty, schema="file_index long, path string, rows long"
        ).localCheckpoint(eager=True)  # one-shot distributed empty tail
        summary = summary.unionByName(empties)
    return summary


def validate_arrow_ipc(
    spark: SparkSession, out_base: str, expected_rows: int, ext: str = ".arrow"
) -> int:
    """Post-write validation: re-read the output tree and compare the row
    count against the expected survivor count — the reference ships (but
    disables) the same re-read pass (`DupeResolverThread.h:399-428`); here
    it is cheap (count() over the pruned scan) and enabled."""
    actual = read_arrow_ipc(spark, out_base, columns=[], ext=ext).count()
    if actual != expected_rows:
        raise ValueError(
            f"arrow output validation failed: wrote {actual} rows under "
            f"{out_base}, expected {expected_rows}"
        )
    return actual


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
