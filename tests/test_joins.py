"""Unit tests for asof_join / range_join — tie handling, null payloads (the
round-2 struct-carry fix), tolerance, strict mode, outer semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=3, lv="L3"),
            Row(k="a", ts=5, lv="L5"),
            Row(k="b", ts=1, lv="B1"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=2, rv="R2", rx=20),
            Row(k="a", ts=3, rv=None, rx=30),
            Row(k="a", ts=4, rv="R4", rx=40),
            Row(k="c", ts=0, rv="C0", rx=0),
        ]
    )
    return left, right


def test_asof_backward_with_ties(spark, sides):
    left, right = sides
    out = {r["ts"]: r for r in asof_join(
        left, right, by=["k"], left_ts="ts", right_ts="ts"
    ).collect()}
    # tie at ts=3 matches the right row AT 3 — and its rv stays NULL (struct
    # carry: no backfill from the older R2 row — the round-2 bug fix)
    assert out[3]["ts_matched"] == 3 and out[3]["rv"] is None and out[3]["rx"] == 30
    assert out[5]["ts_matched"] == 4 and out[5]["rv"] == "R4"
    # unmatched left row keeps nulls (left-join semantics)
    assert out[1]["ts_matched"] is None and out[1]["rv"] is None


def test_asof_no_duplicate_columns(spark, sides):
    left, right = sides
    cols = asof_join(left, right, by=["k"], left_ts="ts", right_ts="ts").columns
    assert len(cols) == len(set(cols))
    assert cols == ["k", "ts", "lv", "rv", "rx", "ts_matched"]


def test_asof_strict(spark, sides):
    left, right = sides
    out = {r["ts"]: r for r in asof_join(
        left, right, by=["k"], left_ts="ts", right_ts="ts", strict=True
    ).collect()}
    # strict <: the tie at ts=3 now matches the EARLIER row (ts=2)
    assert out[3]["ts_matched"] == 2 and out[3]["rv"] == "R2"


def test_asof_tolerance(spark):
    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [Row(k="a", ts=base + dt.timedelta(seconds=100), lv=1)]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=base, rv="old")]
    )
    hit = asof_join(left, right, by=["k"], left_ts="ts", right_ts="ts",
                    tolerance_seconds=200).collect()[0]
    assert hit["rv"] == "old"
    miss = asof_join(left, right, by=["k"], left_ts="ts", right_ts="ts",
                     tolerance_seconds=50).collect()[0]
    assert miss["rv"] is None and miss["ts_matched"] is None


@pytest.fixture(scope="module")
def interval_sides(spark):
    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    points = spark.createDataFrame(
        [
            Row(k="a", pts=base + dt.timedelta(minutes=10), pid=1),
            Row(k="a", pts=base + dt.timedelta(minutes=90), pid=2),
            Row(k="b", pts=base, pid=3),
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(k="a", lo=base, hi=base + dt.timedelta(minutes=30), iid=10),
            Row(k="a", lo=base + dt.timedelta(hours=3), hi=base + dt.timedelta(hours=4), iid=11),
        ]
    )
    return points, intervals


def test_range_join_inner(spark, interval_sides):
    points, intervals = interval_sides
    out = range_join(
        points, intervals, by=["k"], point_ts="pts",
        lo=F.col("lo"), hi=F.col("hi"), bucket_seconds=600,
    ).collect()
    assert [(r["iid"], r["pid"]) for r in out] == [(10, 1)]


def test_range_join_left_keeps_unmatched_intervals(spark, interval_sides):
    points, intervals = interval_sides
    out = range_join(
        points, intervals, by=["k"], point_ts="pts",
        lo=F.col("lo"), hi=F.col("hi"), bucket_seconds=600, how="left",
    ).collect()
    by_iid = {r["iid"]: r for r in out}
    assert len(out) == 2
    assert by_iid[10]["pid"] == 1
    assert by_iid[11]["pid"] is None  # interval with no points survives


def test_range_join_rejects_unknown_how(spark, interval_sides):
    points, intervals = interval_sides
    with pytest.raises(ValueError, match="inner"):
        range_join(points, intervals, by=["k"], point_ts="pts",
                   lo=F.col("lo"), hi=F.col("hi"), bucket_seconds=600, how="outer")


def test_range_join_width_guard(spark, interval_sides):
    """An interval spanning > max_buckets buckets fails fast instead of
    exploding rows."""
    points, _ = interval_sides
    base = dt.datetime(2025, 1, 1)
    wide = spark.createDataFrame(
        [Row(k="a", lo=base, hi=base + dt.timedelta(seconds=20_000), iid=1)]
    )
    with pytest.raises(Exception, match="buckets"):
        range_join(points, wide, by=["k"], point_ts="pts",
                   lo=F.col("lo"), hi=F.col("hi"), bucket_seconds=1).collect()


def test_bucketed_reuse_invalidates_on_source_regeneration(spark, tmp_path):
    """The bucketed-table reuse cache fingerprints the SOURCE parquet
    (mtime+size) at write time: replacing the source at the same path must
    trigger a rebuild, never serve answers from the stale bucketed copy."""
    import os
    import shutil
    import time
    from pathlib import Path

    from cta_train_tracker_analytics_spark.plans.relational import join_bucketed_colocated

    src = Path("/root/testdata/sf0.001")
    sf_dir = tmp_path / "sf_regen"
    sf_dir.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(src / f"{t}.parquet", sf_dir / f"{t}.parquet")
    n1 = join_bucketed_colocated(spark, str(sf_dir)).count()
    marker = (
        Path("/tmp/cta_spark_engine_scratch") / sf_dir.name / "bucketed" / "SOURCE_FINGERPRINT"
    )
    fp1 = marker.read_text()
    # second call with untouched sources: reuse (marker unchanged)
    join_bucketed_colocated(spark, str(sf_dir)).count()
    assert marker.read_text() == fp1
    # regenerate the source in place: same path, new mtime
    now = time.time_ns()
    os.utime(sf_dir / "orders.parquet", ns=(now + 10**9, now + 10**9))
    n2 = join_bucketed_colocated(spark, str(sf_dir)).count()
    assert n2 == n1
    assert marker.read_text() != fp1, "stale bucketed tables served a regenerated source"


def test_approx_distinct_tracks_exact_counts(spark):
    """agg_approx_distinct now SURFACES its audit (r11 verdict #6): the
    exact per-day distinct count plus a boolean pinning the HLL estimate
    within ±10% (5x the configured 2% rsd). Assert the surfaced exact
    side against an independent computation and that every bound check
    passed — the same boolean the driver now hashes."""
    from pyspark.sql import functions as F

    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.plans.relational import agg_approx_distinct

    sf = "/root/testdata/sf0.01"
    rows = {r["d"]: r for r in agg_approx_distinct(spark, sf).collect()}
    exact = {
        r["d"]: r["n"]
        for r in load(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact) and rows
    for d, n in exact.items():
        assert rows[d]["n_users_exact"] == n
        assert rows[d]["within_10pct"] is True, (d, n)


def test_approx_quantile_rank_error_bound(spark):
    """Sketch-quality bound for agg_approx_quantile at a scale where the
    sketch is genuinely approximate (accuracy < group size would be the
    100 TB regime; here we force it with a tiny accuracy): the estimated
    quantile's true rank must sit within n/accuracy of the target rank."""
    from pyspark.sql import functions as F

    from cta_train_tracker_analytics_spark.data import load

    sf = "/root/testdata/sf0.01"
    ev = load(spark, sf, "events")
    acc = 100  # << group sizes (~2000), so the GK sketch actually compresses
    est = {
        r["event_type"]: r["p90"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", F.lit(0.9), F.lit(acc)).alias("p90"))
        .collect()
    }
    rows = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    sizes = {r["event_type"]: r["n"] for r in rows}
    for et, v in est.items():
        n = sizes[et]
        true_rank = (
            ev.filter((F.col("event_type") == et) & (F.col("value") <= v)).count()
        )
        assert abs(true_rank - 0.9 * n) <= n / acc + 1, (et, true_rank, 0.9 * n)
