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
    "exact_global_ntile",
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


def exact_global_ntile(
    df: DataFrame,
    n_tiles: int,
    value: str,
    tiebreak: str,
    tile_name: str = "tile",
    n_blocks: int = 64,
    accuracy: int = 10_000,
) -> DataFrame:
    """EXACT ntile(n) over a global total order — without the
    single-partition WindowExec that ``ntile().over(Window.orderBy(...))``
    plans (Spark moves EVERY row to one task; the one plan shape that
    cannot survive 100 TB).

    Two-pass exact-selection plan instead:

    1. One cheap aggregate sketches ~equi-depth block boundaries on
       ``value`` (``approx_percentile`` — map-side-combinable, bounded
       memory). Each row's block id is then a map-only comparison against
       the broadcast boundary array, so blocks are contiguous in the
       global (value, tiebreak) order by construction.
    2. Local ``row_number`` per block (hash-partitioned window — parallel),
       per-block counts rolled up to prefix offsets (a partition-less
       window over the N_BLOCKS-row *aggregate*, never over raw rows —
       the window-over-aggregates discipline tests/test_plans.py pins),
       broadcast back, and the tile becomes pure integer arithmetic on
       ``global_rank = offset + local_rank``:
       the first ``N mod n`` tiles hold ``N div n + 1`` rows, the rest
       ``N div n`` — exactly SQL ntile semantics.

    Block-size error from the sketch (~rows/accuracy per boundary) only
    skews block *sizes*, never rank correctness. Heavy duplicate values
    all land in one block (comparisons are strict), so a value occupying
    >1/n_blocks of the data bounds that block's size from below — the
    same skew exact ntile forces on ANY engine; raise ``n_blocks`` /
    ``accuracy`` to tighten everything else.

    Input contract (both checked/required, r9 verdict #7 + ADVICE):

    * ``value`` must be NON-NULL — nulls would sort into block 0
      Spark-style (NULLS FIRST), diverging from oracles that default to
      NULLS LAST. Guarded loudly: a null count rides along in the same
      boundary-sketch aggregate (zero extra scans) and any null raises
      ``ValueError`` when the sketch materializes.
    * ``df`` must be DETERMINISTIC across scans: the ranked branch and
      the per-block counts both derive from the unpinned input, so a
      sampled/rand-derived frame could yield offsets inconsistent with
      local ranks. Parquet-backed inputs (all registry callers) satisfy
      this; pin non-deterministic sources with ``localCheckpoint``
      before calling.

    Returns ``df`` plus an integer ``tile_name`` column in 1..n_tiles.
    """
    pcts = [i / n_blocks for i in range(1, n_blocks)]
    bounds = df.agg(
        F.approx_percentile(value, F.array(*[F.lit(p) for p in pcts]), accuracy).alias(
            "__bounds"
        ),
        F.count_if(F.col(value).isNull()).alias("__nulls"),
    )
    # Pin the 1-row boundary sketch: both downstream branches (the ranked
    # window and the per-block counts) consume it, and without the pin each
    # branch re-runs the full percentile pass over the source — one extra
    # whole-table scan for no information.
    bounds = bounds.localCheckpoint(eager=True)
    n_null = bounds.head()["__nulls"]
    if n_null:
        raise ValueError(
            f"exact_global_ntile: {value!r} has {n_null} NULL row(s); the "
            "tile arithmetic requires a total order on non-null values "
            "(Spark would sort nulls first, oracles commonly last). Filter "
            "or impute nulls before calling."
        )
    bounds = bounds.drop("__nulls")
    blk = F.aggregate(
        F.col("__bounds"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(value) > b, 1).otherwise(0),
    )
    base = df.crossJoin(F.broadcast(bounds)).withColumn("__blk", blk).drop("__bounds")

    w_local = Window.partitionBy("__blk").orderBy(value, tiebreak)
    ranked = base.withColumn("__rn", F.row_number().over(w_local))

    counts = base.groupBy("__blk").agg(F.count(F.lit(1)).alias("__cnt"))
    w_blocks = Window.orderBy("__blk")
    offsets = counts.select(
        "__blk",
        F.coalesce(
            F.sum("__cnt").over(w_blocks.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
        F.sum("__cnt")
        .over(
            w_blocks.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("__n"),
    )

    joined = (
        ranked.join(F.broadcast(offsets), "__blk")
        .withColumn("__rank0", (F.col("__off") + F.col("__rn") - 1).cast("bigint"))
        .withColumn("__nn", F.col("__n").cast("bigint"))
    )
    # SQL ntile: rem = N % n tiles of size (N div n + 1) come first, then
    # tiles of size N div n. All-BIGINT `div` arithmetic — exact at any N
    # (a double-division floor would lose exactness past 2^53 rows).
    n = int(n_tiles)
    tile = F.expr(
        f"""CAST(1 + CASE
            WHEN __rank0 < (__nn % {n}) * (__nn div {n} + 1)
            THEN __rank0 div (__nn div {n} + 1)
            ELSE (__nn % {n})
                 + (__rank0 - (__nn % {n}) * (__nn div {n} + 1))
                   div greatest(__nn div {n}, 1)
        END AS INT)"""
    )
    return joined.withColumn(tile_name, tile).drop(
        "__blk", "__rn", "__off", "__n", "__rank0", "__nn"
    )


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
