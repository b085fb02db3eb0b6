"""Arrow IPC stream-format source (sources/arrow_ipc.py).

Mirrors the reference's input contract: recursive extension-filtered scan
in deterministic order (`/root/reference/CPPDeduper/CPPDeduper.cpp:50-62`),
per-file RecordBatchStreamReader iteration with (file_index, row_number)
identity (`ArrowLoaderThread.h:26-31,117-119`), column projection at the
reader (`ArrowLoaderThread.h:144-145`).
"""

import os

import pandas as pd
import pyarrow as pa
import pytest

from cpp_near_dedupe_spark.sources.arrow_ipc import (
    discover_arrow_files,
    read_arrow_ipc,
    validate_arrow_ipc,
    write_arrow_ipc,
    write_arrow_ipc_fixture,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("arrow_fix")
    # nested dir proves the recursive scan
    sub = d / "year=2026" / "crawl"
    sub.mkdir(parents=True)
    write_arrow_ipc_fixture(f"{SF_DIR}/documents.parquet", str(sub), n_files=3)
    return str(d)


def test_discover_recursive_sorted(fixture_dir):
    files = discover_arrow_files(fixture_dir)
    assert len(files) == 3
    assert files == sorted(files)
    assert all(f.endswith(".arrow") for f in files)


def test_roundtrip_matches_parquet(spark, fixture_dir):
    got = (
        read_arrow_ipc(spark, fixture_dir, columns=["doc_id", "text"])
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    # identity: fixture is sorted by doc_id, 3 contiguous chunks
    per = (len(exp) + 2) // 3
    assert got["file_index"].tolist() == [i // per for i in range(len(exp))]
    assert got["row_number"].tolist() == [i % per for i in range(len(exp))]


def test_identity_mode_without_id_column(spark, tmp_path):
    """Inputs with no id column get doc_id = file_index << 40 | row_number
    (the reference's (docId, rowNumber) identity, ArrowLoaderThread.h:26-31)."""
    d = str(tmp_path / "noid")
    os.makedirs(d)
    tbl = pa.table({"text": ["alpha beta", "gamma delta", "epsilon zeta"]})
    for i in range(2):
        with pa.OSFile(os.path.join(d, f"f{i}.arrow"), "wb") as sink:
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl)
    got = read_arrow_ipc(spark, d).toPandas().sort_values(["file_index", "row_number"])
    assert got["doc_id"].tolist() == [
        (fi << 40) | rn for fi in range(2) for rn in range(3)
    ]
    assert set(got.columns) == {"file_index", "row_number", "doc_id", "text"}


def test_column_projection_errors(spark, fixture_dir):
    with pytest.raises(KeyError):
        read_arrow_ipc(spark, fixture_dir, columns=["nope"])
    with pytest.raises(FileNotFoundError):
        read_arrow_ipc(spark, "/tmp/definitely_empty_dir_xyz")


def test_write_mirrored_tree_roundtrip(spark, fixture_dir, tmp_path):
    """The reference's .arrow → dedupe → .arrow workflow end-to-end
    (`DupeResolverThread.h:138-196`): read the stream fixture, dedupe,
    write survivors back mirroring the input tree, re-read and match the
    kept set; post-write row-count validation included (`:399-428`)."""
    from cpp_near_dedupe_spark.config import DedupeConfig
    from cpp_near_dedupe_spark.plans.pipeline import run_pipeline
    from pyspark.sql import functions as F

    out_dir = str(tmp_path / "deduped")
    docs = read_arrow_ipc(spark, fixture_dir)
    cfg = DedupeConfig(id_col="doc_id", text_col="text")
    res = run_pipeline(spark, docs.select("doc_id", "text"), cfg)
    kept = docs.join(
        res.resolved.filter(F.col("is_kept")).select("doc_id"), "doc_id", "left_semi"
    )
    n_kept = kept.count()
    assert n_kept < docs.count()  # the corpus has near-dups

    summary = write_arrow_ipc(kept, fixture_dir, out_dir).toPandas()
    # mirrored tree: same relative paths as the input files
    in_files = discover_arrow_files(fixture_dir)
    out_files = discover_arrow_files(out_dir)
    assert [os.path.relpath(p, out_dir) for p in out_files] == [
        os.path.relpath(p, fixture_dir) for p in in_files
    ]
    assert summary.rows.sum() == n_kept
    # re-read validation (reference's post-write pass, enabled here)
    assert validate_arrow_ipc(spark, out_dir, n_kept) == n_kept

    # survivors match the kept set exactly, schema passed through
    back = read_arrow_ipc(spark, out_dir).toPandas()
    kept_pdf = kept.toPandas()
    assert sorted(back.doc_id) == sorted(kept_pdf.doc_id)
    assert set(back.columns) >= set(kept_pdf.columns) - {"file_index", "row_number"}
    a = back.sort_values("doc_id").reset_index(drop=True)
    b = kept_pdf.sort_values("doc_id").reset_index(drop=True)
    assert a.text.tolist() == b.text.tolist()


def test_write_empty_file_mirrored(spark, tmp_path):
    """An input file whose rows are ALL deduped away still yields a
    schema-only stream file, keeping the tree mirror 1:1."""
    import pandas as pd

    src = str(tmp_path / "src")
    os.makedirs(src)
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": ["x", "y"]})
    for i in range(2):
        with pa.OSFile(os.path.join(src, f"f{i}.arrow"), "wb") as sink:
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl.slice(i, 1))
    df = read_arrow_ipc(spark, src)
    survivors = df.filter(df.file_index == 0)  # file 1 loses everything
    out = str(tmp_path / "out")
    write_arrow_ipc(survivors, src, out).collect()
    assert sorted(os.listdir(out)) == ["f0.arrow", "f1.arrow"]
    back = read_arrow_ipc(spark, out).toPandas()
    assert back.doc_id.tolist() == [0]
    assert validate_arrow_ipc(spark, out, 1) == 1
    with pytest.raises(ValueError):
        validate_arrow_ipc(spark, out, 2)


def test_e2e_dedupe_over_arrow_input(spark, fixture_dir):
    """A reference user's migration path: point the pipeline at a directory
    of .arrow stream files and dedupe it."""
    from cpp_near_dedupe_spark.config import DedupeConfig
    from cpp_near_dedupe_spark.plans.pipeline import run_pipeline
    from cpp_near_dedupe_spark.sources.pages import load_pages

    docs = load_pages(spark, fixture_dir)
    assert "file_index" in docs.columns  # went through the arrow source
    cfg = DedupeConfig(id_col="doc_id", text_col="text")
    res = run_pipeline(spark, docs.select("doc_id", "text"), cfg)
    out = res.resolved.toPandas()
    assert len(out) == docs.count()
    # parity with the same pipeline over the parquet original
    pq_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    res_pq = run_pipeline(spark, pq_docs.select("doc_id", "text"), cfg)
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = res_pq.resolved.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_write_many_files_distributed_empty_tail(spark, tmp_path):
    """r4: ~100 input files, a third losing ALL rows to dedupe — the
    schema-only mirror files come from a distributed map (no driver loop,
    no per-file collect), the summary includes their zero-row entries, and
    re-consuming the returned summary does not re-run the write job."""
    import pandas as pd

    src = str(tmp_path / "src")
    os.makedirs(src)
    n_files = 96
    for i in range(n_files):
        tbl = pa.table(
            {"doc_id": pa.array([i], pa.int64()), "text": [f"unique text {i}"]}
        )
        with pa.OSFile(os.path.join(src, f"f{i:03d}.arrow"), "wb") as sink:
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl)
    df = read_arrow_ipc(spark, src)
    survivors = df.filter(df.file_index % 3 != 0)  # every 3rd file emptied
    out = str(tmp_path / "out")
    summary = write_arrow_ipc(survivors, src, out)
    pdf = summary.toPandas()
    assert len(pdf) == n_files  # one summary row per mirrored file
    assert (pdf.rows == 0).sum() == n_files // 3
    assert len(discover_arrow_files(out)) == n_files
    # no stray temp files (attempt-unique .inprogress-* all renamed)
    assert not [f for f in os.listdir(out) if ".inprogress" in f]
    n_kept = survivors.count()
    assert validate_arrow_ipc(spark, out, n_kept) == n_kept
    # consuming the summary again must NOT rewrite (mtimes stable) — even
    # after the cache-lifecycle release (r5/ADVICE: the summary is
    # localCheckpoint-ed, not registry-persisted, so release_all cannot
    # re-expose the side-effecting write plan)
    from cpp_near_dedupe_spark.cache import release_all

    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    summary.count()
    release_all()
    summary.count()
    assert mtimes == {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }


def test_write_task_closures_exclude_path_listing():
    """r5 (VERDICT #6): the per-task write closure must NOT capture the
    full rel_paths listing (tens of MB per task at a 10⁶-file tree) — the
    path map rides the rows via a broadcast join instead. Pinned at the
    bytecode level: no nested code object of write_arrow_ipc closes over
    ``rel_paths``."""
    import types

    def nested_code(code):
        for c in code.co_consts:
            if isinstance(c, types.CodeType):
                yield c
                yield from nested_code(c)

    for code in nested_code(write_arrow_ipc.__code__):
        if code.co_name in ("write", "write_empty", "open_for", "close_current"):
            assert "rel_paths" not in code.co_freevars, code.co_name
