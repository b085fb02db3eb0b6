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
