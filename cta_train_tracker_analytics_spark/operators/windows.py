"""Window analytics over keyed event logs.

The reference's data model — ``train_id`` hash key + ``current_timestamp``
range key (``main.tf:30-31``, disabled DynamoDB table) and the 8-column fact
record (``get_train_status.py:110-122``) — exists precisely to answer these:
latest state per key, headways between consecutive arrivals, running counts
over a service day, top-k by delay frequency, rolling time-range frames
(SURVEY.md §2.5).

All functions take generic (df, key, ts) so they run unchanged on the CTA
fact table or the driver's ``events`` table. Every ordering includes a unique
tiebreaker column when provided — required for deterministic results (and
oracle hash-parity) when timestamps collide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "latest_state",
    "lag_gap_seconds",
    "running_agg",
    "rank_topk",
    "rolling_range_frame",
    "sessionize",
]


def _ordered(keys: Sequence[str], order: Sequence[Column]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*order)


def _epoch_us(col: Column) -> Column:
    """Microseconds since epoch via an NTZ-to-NTZ diff — unlike
    ``unix_micros(cast(x as timestamp))`` this never shifts with the session
    timezone, so results are deterministic under any driver session."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        col.cast("timestamp_ntz"),
    )


def latest_state(
    df: DataFrame, keys: Sequence[str], ts: str, tiebreak: str | None = None
) -> DataFrame:
    """Latest observation per key — reproduces the keyed-store point-read
    (reference ``main.tf:25-43``). `row_number()==1` over a descending sort;
    Spark executes this as a single shuffle + partial top-1 per key.
    """
    order = [F.col(ts).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = _ordered(keys, order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lag_gap_seconds(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_name: str = "gap_seconds",
    tiebreak: str | None = None,
    unit: str = "s",
) -> DataFrame:
    """Headway: time since the previous event per key
    (SURVEY.md §2.5 ``win_lag_headway``). NULL for each key's first event.
    ``unit``: "s" (default) or "us" for microsecond-resolution gaps.
    """
    order: list[Column] = [F.col(ts)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = _ordered(keys, order)
    prev = F.lag(F.col(ts)).over(w)
    gap = _epoch_us(F.col(ts)) - _epoch_us(prev)
    if unit != "us":
        gap = gap / F.lit(1_000_000)
    return df.withColumn(gap_name, gap.cast("bigint"))


def running_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: Column,
    agg_name: str = "running",
    tiebreak: str | None = None,
) -> DataFrame:
    """Running sum of ``value`` over each key's event order
    (SURVEY.md §2.5 ``win_running``)."""
    order: list[Column] = [F.col(ts)]
    if tiebreak:
        order.append(F.col(tiebreak))
    w = _ordered(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(agg_name, F.sum(value).over(w))


def rank_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_name: str = "rnk",
    dense: bool = True,
) -> DataFrame:
    """Top-k rows per key by rank (SURVEY.md §2.5 ``win_rank_topk``).

    Uses dense_rank by default (ties share a rank, all kept ≤ k). Spark
    plans a single window sort; with AQE the shuffle output is coalesced.
    """
    w = _ordered(keys, order_by)
    rank_fn = F.dense_rank() if dense else F.row_number()
    return df.withColumn(rank_name, rank_fn.over(w)).filter(F.col(rank_name) <= k)


def rolling_range_frame(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: Column,
    preceding_seconds: int,
    agg_name: str = "rolling",
) -> DataFrame:
    """Rolling aggregate over a *time-range* frame, e.g. delayed trains in
    the trailing 15 minutes (SURVEY.md §2.5 ``win_frame_range``).

    Orders by epoch seconds so ``rangeBetween`` is a true time interval —
    rows with equal timestamps all enter the frame together (RANGE, not
    ROWS semantics).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(_epoch_us(F.col(ts)))
        .rangeBetween(-int(preceding_seconds) * 1_000_000, 0)
    )
    return df.withColumn(agg_name, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_seconds: int,
    tiebreak: str,
) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks when the gap
    between consecutive rows of a key exceeds ``gap_seconds``; session ids
    are the running sum of break flags (1-based per key, ordered by time).

    Returns the input plus a ``session_no`` column. ONE shuffle on the key
    serves the lag window and the running sum (same partitioning + sort —
    a single Window spec used by both, so the two cannot drift apart).
    The gap compare runs in MICROSECONDS on the NTZ timestamp — exact, and
    immune to the engine-dependent semantics of second-granularity diff
    functions (boundary counting vs flooring)."""
    w = Window.partitionBy(*keys).orderBy(ts, tiebreak)
    prev = F.lag(ts).over(w)
    # Column-API timestamp_diff on the ONE lag column: no interpolated SQL
    # OVER clause to keep in sync with `w`, and no unquoted-identifier trap
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col(ts))
    is_new = F.when(prev.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn("session_no", F.sum(is_new).over(w))
