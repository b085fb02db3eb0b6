"""Build the --py-files archive for cluster submission.

``spark-submit --py-files <zip> driver.py`` ships the package to every
executor's PYTHONPATH — the standard deployment shape the north rule
names. The archive contains the ``cpp_near_dedupe_spark`` package only
(no tests, no caches); deterministic member order so rebuilds are
byte-stable.

Run: python3 tools/make_pyfiles.py [out.zip]   (default
/tmp/cpp_near_dedupe_spark.zip; prints the path)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str = "/tmp/cpp_near_dedupe_spark.zip") -> str:
    pkg_root = os.path.join(REPO, "cpp_near_dedupe_spark")
    members: list[str] = []
    for base, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                members.append(os.path.join(base, f))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for m in members:
            z.write(m, os.path.relpath(m, REPO))
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cpp_near_dedupe_spark.zip"))
