"""Shared test fixtures: one local SparkSession + a DuckDB connection with
the driver's view registration (TESTDATA tables as views)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from cta_train_tracker_analytics_spark.data import TABLES  # noqa: E402
from cta_train_tracker_analytics_spark.session import get_spark  # noqa: E402

#: parity tests default to the smallest SF for speed; override via env.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cta-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
