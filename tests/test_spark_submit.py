"""spark-submit --py-files deployment smoke (north_rule: "run via
spark-submit --py-files on a multi-executor cluster"): the package is
zipped by tools/make_pyfiles.py, shipped via --py-files to a FRESH
spark-submit JVM (no repo dir on sys.path — the driver script chdirs to
/tmp), and the full pipeline runs end-to-end from the archive alone."""

import json
import os
import shutil
import subprocess
import sys

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER = """
import json
import os
import sys

os.chdir("/tmp")  # prove imports come from the --py-files archive
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("pyfiles-smoke")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from cpp_near_dedupe_spark.config import DedupeConfig
from cpp_near_dedupe_spark.plans.pipeline import run_pipeline

docs = (
    spark.read.parquet(sys.argv[1] + "/documents.parquet")
    .select("doc_id", "text")
)
res = run_pipeline(spark, docs, DedupeConfig())
kept = res.resolved.filter("is_kept").count()
total = docs.count()
print("PYFILES_RESULT " + json.dumps({"kept": kept, "total": total}))
spark.stop()
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    sys.path.insert(0, "/root/repo")
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "cpp_near_dedupe_spark.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(driver),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd="/tmp",
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("PYFILES_RESULT ")]
    assert line, out[-3000:]
    res = json.loads(line[0].split(" ", 1)[1])
    assert res["total"] == 500  # sf0.001 documents table
    assert 0 < res["kept"] < res["total"]  # dedupe removed something
