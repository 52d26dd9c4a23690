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

Design notes (round-2 fixes):
- The carried right-side payload travels as ONE struct so every output field
  comes from the same matched right row (per-column ``last(ignorenulls)``
  could mix rows when the matched row holds NULLs).
- ``left_ts`` is excluded from the left payload (was emitted twice).
- ``range_join`` supports ``how in {"inner", "left"}``; left semantics are
  restored after the exact filter via an anti-join on an interval row id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join"]


def _epoch_us(col: Column, dtype: T.DataType) -> Column:
    """Microseconds since epoch, timezone-independent.

    Timestamp-family input → NTZ-to-NTZ diff (``unix_micros(cast(x as
    timestamp))`` would shift with the session zone; diffing two NTZ values
    does not). Integer input is interpreted as epoch SECONDS (the common
    epoch-column convention) — numeric types cannot cast to TIMESTAMP_NTZ.
    """
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return col.cast("bigint") * F.lit(1_000_000)
    ntz = col.cast("timestamp_ntz")
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), ntz
    )


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

    1. tag each side; the right side packs ``(right_ts, *right_cols)`` into a
       single struct so the match is all-or-nothing (one physical right row),
    2. union on (by, ts, side, payloads), one window sorted by (ts, side)
       per key carries the latest right struct forward,
    3. keep left rows; optionally null matches older than ``tolerance_seconds``.

    Scale: a single hash shuffle on ``by`` + per-partition sort. No row
    multiplication, so it survives arbitrarily dense right sides (unlike a
    range self-join). Left-join semantics: unmatched left rows keep nulls.
    Known limit: one extremely hot key serializes into one window partition.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != right_ts]
    by = list(by)
    right_cols = list(right_cols)

    left_payload = [c for c in left.columns if c not in by and c != left_ts]
    # Right-side ties sort *before* the left row so `last()` sees them
    # (non-strict <=); strict mode sorts them after instead.
    right_side, left_side = (0, 1) if not strict else (1, 0)

    r_struct_type = T.StructType(
        [T.StructField("__match_ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )

    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(
            F.col(right_ts).alias("__match_ts"),
            *[F.col(c) for c in right_cols],
        ).alias("__r"),
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "__r", F.last("__r", ignorenulls=True).over(w)
    )

    out = carried.filter(F.col("__side") == left_side)
    if tolerance_seconds is not None:
        ts_type = left.schema[left_ts].dataType
        in_tol = (
            _epoch_us(F.col("__ts"), ts_type)
            - _epoch_us(F.col("__r.__match_ts"), right.schema[right_ts].dataType)
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
        out = out.withColumn("__r", F.when(in_tol, F.col("__r")))

    return out.select(
        *by,
        F.col("__ts").alias(left_ts),
        *left_payload,
        *[F.col(f"__r.{c}").alias(c) for c in right_cols],
        F.col("__r.__match_ts").alias(f"{right_ts}_matched"),
    )


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
    equi-join on (by, bucket) and re-applies the exact predicate. A point
    belongs to exactly one bucket, so no dedup is needed post-join. With
    ``bucket_seconds`` ≈ the typical interval width, replication is O(1)
    per interval and Catalyst plans a shuffled/broadcast *hash* join —
    the standard trick for making theta joins scale.

    ``how``: "inner" (default) or "left" — left keeps intervals with no
    matching point (point columns null), restored via an anti-join on an
    internal interval row id after the exact filter.

    ``points`` and ``intervals`` must not share column names apart from
    ``by``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    by = list(by)
    w = int(bucket_seconds) * 1_000_000

    # lo/hi are expressions over `intervals`; their time family is taken from
    # point_ts's declared type (mixed families are unsupported).
    ts_type = points.schema[point_ts].dataType
    iv0 = intervals.withColumn("__iv_id", F.monotonically_increasing_id())
    iv = iv0.withColumn("__lo_e", _epoch_us(lo, ts_type)).withColumn(
        "__hi_e", _epoch_us(hi, ts_type)
    )
    # Guard: refuse intervals so wide the bucket explode would blow up rows
    # (unbounded sequence() would multiply the interval side arbitrarily).
    max_buckets = 10_000
    iv = iv.withColumn(
        "__hi_div",
        F.expr(
            f"case when (__hi_e div {w}) - (__lo_e div {w}) >= {max_buckets} "
            f"then cast(raise_error('range_join: interval spans more than "
            f"{max_buckets} buckets; raise bucket_seconds') as bigint) "
            f"else __hi_e div {w} end"
        ),
    )
    iv = iv.withColumn(
        "__bucket",
        F.explode(F.sequence(F.expr(f"__lo_e div {w}"), F.col("__hi_div"))),
    )
    pt = points.withColumn("__pt_e", _epoch_us(F.col(point_ts), ts_type)).withColumn(
        "__bucket", F.expr(f"__pt_e div {w}")
    )

    joined = iv.join(pt, on=by + ["__bucket"], how="inner").filter(
        (F.col("__pt_e") > F.col("__lo_e")) & (F.col("__pt_e") <= F.col("__hi_e"))
    )
    aux = ["__bucket", "__lo_e", "__hi_e", "__pt_e", "__hi_div", "__iv_id"]
    if how == "inner":
        return joined.drop(*aux)

    pt_payload = [c for c in points.columns if c not in by]
    matched = joined.select("__iv_id").distinct()
    unmatched = iv0.join(matched, on="__iv_id", how="left_anti").select(
        *[F.col(c) for c in intervals.columns],
        *[F.lit(None).cast(points.schema[c].dataType).alias(c) for c in pt_payload],
    )
    return joined.drop(*aux).unionByName(unmatched)
