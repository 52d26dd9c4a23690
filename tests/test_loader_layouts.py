"""The events loader must present ONE canonical ts type (TIMESTAMP_NTZ,
UTC wall time) for every layout the generator has shipped — and the
conversion must be session-timezone-independent (the r2 verify caught a
real 6h shift here; these tests pin the fix for both live layouts)."""

from __future__ import annotations

import pytest

from cta_train_tracker_analytics_spark.data import load

WALL = "2024-03-05 12:34:56.789012"


@pytest.fixture()
def chicago_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def _load_one(spark, tmp_path, df):
    df.coalesce(1).write.parquet(f"{tmp_path}/events.parquet")
    out = load(spark, str(tmp_path), "events")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    return str(out.select("ts").collect()[0].ts)


def test_ntz_micros_layout_passthrough(spark, tmp_path, chicago_tz):
    df = spark.sql(f"SELECT 1 AS event_id, TIMESTAMP_NTZ '{WALL}' AS ts")
    assert _load_one(spark, tmp_path, df) == WALL


def test_utc_instant_layout_rebuilt_from_epoch(spark, tmp_path, chicago_tz):
    """Adjusted-to-UTC micros must rebuild the UTC wall time from epoch
    micros — a plain cast would shift by the session offset (-6h here)."""
    df = spark.sql(
        f"SELECT 1 AS event_id, "
        f"timestamp_micros(unix_micros(TIMESTAMP '{WALL}Z')) AS ts"
    )
    assert _load_one(spark, tmp_path, df) == WALL
