"""Round-9 operator tests: exact_global_ntile semantics.

The operator replaces ``ntile(n).over(Window.orderBy(...))`` (a
single-partition plan) with a two-pass exact-rank computation, so these
tests pin that it matches SQL ntile EXACTLY on the shapes where the two
could drift: uneven N % n splits, N smaller than the tile count, heavy
duplicate values straddling tile boundaries, and tiny block sketches.
The comparison baseline is Spark's own ntile on the same data (fine at
test scale, where single-partition execution is harmless).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.operators.windows import exact_global_ntile


def _reference_ntile(df, n, value, tiebreak):
    w = Window.orderBy(value, tiebreak)
    return df.select(
        tiebreak, F.ntile(n).over(w).alias("tile")
    )


def _assert_matches_sql_ntile(df, n, value="v", tiebreak="id"):
    got = {
        r["id"]: r["tile"]
        for r in exact_global_ntile(df, n, value=value, tiebreak=tiebreak).collect()
    }
    want = {r["id"]: r["tile"] for r in _reference_ntile(df, n, value, tiebreak).collect()}
    assert got == want


def test_ntile_uneven_split(spark):
    # N=10 into 4 tiles: sizes 3,3,2,2 — the N % n boundary case
    df = spark.createDataFrame([Row(id=i, v=float(i * 7 % 10)) for i in range(10)])
    _assert_matches_sql_ntile(df, 4)


def test_ntile_fewer_rows_than_tiles(spark):
    # N=3 into 4 tiles: SQL ntile assigns 1,2,3 and leaves tile 4 empty
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(3)])
    _assert_matches_sql_ntile(df, 4)
    tiles = sorted(
        r["tile"]
        for r in exact_global_ntile(df, 4, value="v", tiebreak="id").collect()
    )
    assert tiles == [1, 2, 3]


def test_ntile_heavy_duplicates_across_boundaries(spark):
    # one value holds 60% of rows: duplicates straddle every tile cut, so
    # only the tiebreak decides membership — exactly like SQL ntile
    rows = [Row(id=i, v=5.0) for i in range(60)]
    rows += [Row(id=100 + i, v=float(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows)
    _assert_matches_sql_ntile(df, 4)


def test_ntile_single_row_and_exact_multiple(spark):
    one = spark.createDataFrame([Row(id=1, v=9.0)])
    _assert_matches_sql_ntile(one, 4)
    even = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(8)])
    _assert_matches_sql_ntile(even, 4)


def test_ntile_tiny_block_sketch_still_exact(spark):
    # n_blocks far above N: most blocks empty, bounds full of duplicates —
    # rank arithmetic must still be exact
    df = spark.createDataFrame([Row(id=i, v=float(i % 3)) for i in range(7)])
    got = {
        r["id"]: r["tile"]
        for r in exact_global_ntile(
            df, 3, value="v", tiebreak="id", n_blocks=64
        ).collect()
    }
    want = {r["id"]: r["tile"] for r in _reference_ntile(df, 3, "v", "id").collect()}
    assert got == want


def test_ntile_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    assert exact_global_ntile(df, 4, value="v", tiebreak="id").count() == 0
