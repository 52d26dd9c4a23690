"""Join operators Spark SQL lacks natively: as-of join and interval/range join.

Why these exist: the reference's curated fact table is an ordered per-key
event log — ``train_id`` + ``current_timestamp`` (reference
``get_train_status.py:113-114``; keyed store design ``main.tf:25-43``) — whose
natural analytics (match an observation to the latest prediction at or before
it; find observations inside an arrival window) are as-of and interval joins.

Both implementations avoid the naive nested-loop / cross-join plan, which is
the difference between working and not working at 100 TB:

- ``asof_join``: union + last-observation-carried-forward window. Exactly one
  shuffle on the key plus one sort — O(n log n) per partition, no pair
  blow-up, AQE-skew-friendly.
- ``range_join``: bucketize the time dimension so the interval predicate
  becomes an equi-join on (key, bucket), then re-filter exactly. Catalyst
  plans a shuffled hash/sort-merge join instead of BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (``< left_ts`` when ``strict``) per ``by`` key.

    Equivalent to DuckDB/pandas ``ASOF JOIN`` (backward direction), which
    Spark SQL has no native operator for. Implemented as the
    union + last-value-carried-forward window pattern:

    1. tag each side, union on (by, ts, side, payload-with-nulls),
    2. one window sorted by (ts, side) per key carries the latest right
       payload forward,
    3. keep left rows; optionally null matches older than ``tolerance_seconds``.

    Scale: a single hash shuffle on ``by`` + per-partition sort. No row
    multiplication, so it survives arbitrarily dense right sides (unlike a
    range self-join). Left-join semantics: unmatched left rows keep nulls.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != right_ts]
    by = list(by)

    left_payload = [c for c in left.columns if c not in by]
    # Right-side ties sort *before* the left row so `last()` sees them
    # (non-strict <=); strict mode sorts them after instead.
    right_side, left_side = (0, 1) if not strict else (1, 0)

    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged)
    for c in right_cols:
        carried = carried.withColumn(f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    carried = carried.withColumn("__r_ts", F.last("__r_ts", ignorenulls=True).over(w))

    out = carried.filter(F.col("__side") == left_side)
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col("__r_ts").cast("timestamp"))
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
        for c in right_cols:
            out = out.withColumn(f"__r_{c}", F.when(in_tol, F.col(f"__r_{c}")))
        out = out.withColumn("__r_ts", F.when(in_tol, F.col("__r_ts")))

    return out.select(
        *by,
        F.col("__ts").alias(left_ts),
        *left_payload,
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        F.col("__r_ts").alias(f"{right_ts}_matched"),
    )


def _epoch_us(col: Column) -> Column:
    # Microsecond precision: second-truncated epochs would silently change
    # the interval predicate for sub-second timestamps.
    return F.unix_micros(col.cast("timestamp"))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    by: Sequence[str],
    point_ts: str,
    lo: Column,
    hi: Column,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each interval row to the point rows with
    ``lo < point_ts <= hi`` per ``by`` key, without a nested-loop plan.

    The interval side is exploded to one row per covered time bucket
    (``sequence(floor(lo/w), floor(hi/w))``); the join then runs as an
    equi-join on (by, bucket) and re-applies the exact predicate. With
    ``bucket_seconds`` ≈ the typical interval width, replication is O(1)
    per interval and Catalyst plans a shuffled/broadcast *hash* join —
    the standard trick for making theta joins scale.

    ``points`` and ``intervals`` must not share column names apart from
    ``by``.
    """
    by = list(by)
    w = int(bucket_seconds) * 1_000_000

    iv = intervals.withColumn("__lo_e", _epoch_us(lo)).withColumn("__hi_e", _epoch_us(hi))
    iv = iv.withColumn(
        "__bucket",
        F.explode(F.sequence(F.expr(f"__lo_e div {w}"), F.expr(f"__hi_e div {w}"))),
    )
    pt = points.withColumn("__pt_e", _epoch_us(F.col(point_ts))).withColumn(
        "__bucket", F.expr(f"__pt_e div {w}")
    )

    joined = iv.join(pt, on=by + ["__bucket"], how=how).filter(
        (F.col("__pt_e") > F.col("__lo_e")) & (F.col("__pt_e") <= F.col("__hi_e"))
    )
    return joined.drop("__bucket", "__lo_e", "__hi_e", "__pt_e")
