from __future__ import annotations

import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_ROOT)

# Executors spawn fresh Python workers; put the repo + tests dirs on their
# path BEFORE the JVM starts so classes defined in test modules unpickle.
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO_ROOT, _TESTS_DIR, os.environ.get("PYTHONPATH", "")]
)

from appengine_mapreduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    conn = duckdb.connect()
    return conn


def register_duck_views(conn, sf_dir: str) -> None:
    from appengine_mapreduce_spark.plans.tables import TABLES

    for t in TABLES:
        conn.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
