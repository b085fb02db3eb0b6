import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from cpp_near_dedupe_spark.session import build_session

    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_600():
    from cpp_near_dedupe_spark.sources.datagen import generate_pages

    return generate_pages(600, seed=42)
