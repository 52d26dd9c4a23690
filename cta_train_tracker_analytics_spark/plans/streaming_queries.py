"""Registered Structured Streaming queries (SURVEY.md §2.9).

Every query runs a REAL streaming pipeline (micro-batch engine, state store,
checkpointed sinks) over a bounded copy of the ``events`` table, drained
with ``trigger(availableNow=True)`` so results are deterministic and
oracle-checkable. Production deployments swap the bounded parquet source for
the live source and ``availableNow`` for ``processingTime`` triggers — the
plan is otherwise identical.

Watermarks require TIMESTAMP (not NTZ): those queries cast NTZ → session-tz
timestamp for the watermark and cast back on output — a wall-clock identity
round-trip under any session timezone.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
try:  # transformWithState needs protobuf, absent in this container
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    _HAS_TWS = True
except ImportError:  # pragma: no cover - environment-dependent
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

from ..data import load
from ..streaming.pipelines import (
    assert_rocksdb_engaged,
    await_drained,
    parquet_stream,
    reset_stream_volume,
    run_to_files,
    run_to_memory,
    scoped_state_partitions,
)
from .registry import query

_SCRATCH = Path("/tmp/cta_spark_engine_scratch/streaming")


def _dirs(name: str, sf_dir: str, *subs: str) -> list[str]:
    root = _SCRATCH / Path(sf_dir).name / name
    shutil.rmtree(root, ignore_errors=True)
    # fresh query, fresh state-width derivation (adaptive width sizes to
    # THIS query's observed source volume, not a predecessor's)
    reset_stream_volume()
    out = []
    for s in subs:
        p = root / s
        p.mkdir(parents=True, exist_ok=True)
        out.append(str(p))
    return out


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@query(
    "str_tumbling_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY CAST(ts AS DATE)
    """,
)
def str_tumbling_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window aggregation — the daily-compaction window
    (main.tf:296) as a streaming group-by. Complete mode emits every window
    at drain time."""
    src_dir, cp = _dirs("str_tumbling_day", sf_dir, "src", "cp")
    src = parquet_stream(spark, _events(spark, sf_dir), src_dir)
    agg = src.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    out = run_to_memory(agg, "complete", cp)
    return out.select(F.to_date("w.start").alias("d"), "n", "total")


@query(
    "str_trigger_1min",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute_start, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY date_trunc('minute', ts)
    """,
)
def str_trigger_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute cadence (EventBridge cron(* * * * ? *), main.tf:49) as
    1-minute tumbling windows; production trigger is
    processingTime='60 seconds', drained here with availableNow."""
    src_dir, cp = _dirs("str_trigger_1min", sf_dir, "src", "cp")
    src = parquet_stream(spark, _events(spark, sf_dir), src_dir)
    agg = src.groupBy(F.window("ts", "1 minute").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    out = run_to_memory(agg, "complete", cp)
    return out.select(F.col("w.start").alias("minute_start"), "n")


@query(
    "str_microbatch_sink",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY event_type
    """,
)
def str_microbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batched file sink (Firehose 64MB/900s buffering,
    main.tf:287-288): stream → checkpointed JSON files → batch read-back."""
    src_dir, cp, out_dir = _dirs("str_microbatch_sink", sf_dir, "src", "cp", "out")
    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )
    src = parquet_stream(spark, ev, src_dir)
    run_to_files(src, out_dir, cp, fmt="json")
    back = spark.read.schema(ev.schema).json(out_dir)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


@query(
    "str_foreach_batch_upsert",
    oracle="""
    SELECT user_id,
           CAST(event_id AS BIGINT) AS last_event_id,
           value AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def str_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed UPSERT via ``foreachBatch`` — the merge-into-store
    pattern (the reference's per-train latest-state table, maintained
    continuously instead of by daily compaction). The source is drained in
    REAL multiple micro-batches (maxFilesPerTrigger=1 over a 4-file copy),
    and each batch merges into the keyed parquet store with
    latest-per-key semantics: union(store, batch) → row_number over
    (ts DESC, event_id DESC) per user — ORDER-INSENSITIVE across batches,
    so any batch arrival order converges to the same global latest row per
    key. The store swap is write-new-then-rename (atomic on a real FS);
    at warehouse scale the store write is a Delta/Iceberg MERGE INTO and
    the union+window becomes the engine's keyed merge, but the per-batch
    dataflow is identical."""
    from pyspark.sql import Window

    src_dir, cp, store = _dirs(
        "str_foreach_batch_upsert", sf_dir, "src", "cp", "store"
    )
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    ev.repartition(4).write.mode("overwrite").parquet(src_dir)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    store_cur = Path(store) / "cur"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        merged = batch_df
        if (store_cur / "_SUCCESS").exists():
            merged = merged.unionByName(s.read.parquet(str(store_cur)))
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        staged = Path(store) / f"v{batch_id}"
        latest.write.mode("overwrite").parquet(str(staged))
        if store_cur.exists():
            shutil.rmtree(store_cur)
        staged.rename(store_cur)

    with scoped_state_partitions(spark):
        q = (
            src.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q)
    return spark.read.parquet(str(store_cur)).select(
        "user_id",
        F.col("event_id").cast("bigint").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@query(
    "str_at_least_once",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events
    """,
)
def str_at_least_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's at-least-once Firehose retry (get_train_status.py:
    52-79) upgraded to exactly-once: the SAME drain re-run against the same
    checkpoint commits nothing new — n == n_distinct proves no duplicates."""
    src_dir, cp, out_dir = _dirs("str_at_least_once", sf_dir, "src", "cp", "out")
    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    src = parquet_stream(spark, ev, src_dir)
    run_to_files(src, out_dir, cp, fmt="json")
    # simulated redelivery: replay the whole source against the checkpoint
    src2 = spark.readStream.schema(ev.schema).parquet(src_dir)
    run_to_files(src2, out_dir, cp, fmt="json")
    back = spark.read.schema(ev.schema).json(out_dir)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("event_id").cast("bigint").alias("n_distinct"),
    )


@query(
    "str_redelivery",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events
    """,
)
def str_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset replay across restarts (SQS visibility/redelivery,
    main.tf:149-150): drain batch 1, add batch 2 files, resume from the same
    checkpoint — the sink ends exactly-once complete."""
    src_dir, cp, out_dir = _dirs("str_redelivery", sf_dir, "src", "cp", "out")
    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src_dir)
    src = spark.readStream.schema(ev.schema).parquet(src_dir)
    run_to_files(src, out_dir, cp, fmt="json")
    second.coalesce(1).write.mode("append").parquet(src_dir)
    src2 = spark.readStream.schema(ev.schema).parquet(src_dir)
    run_to_files(src2, out_dir, cp, fmt="json")
    back = spark.read.schema(ev.schema).json(out_dir)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("event_id").cast("bigint").alias("n_distinct"),
    )


@query(
    "str_sliding_10min",
    oracle="""
    WITH w AS (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts)
                           - INTERVAL '5 minutes']) AS w_start,
               value
        FROM events
    )
    SELECT w_start, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM w GROUP BY w_start
    """,
)
def str_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation: 10-minute windows every 5
    minutes, so each event lands in exactly two overlapping windows — the
    smoothing the per-minute poll cadence (main.tf:49) needs for headway
    trend reporting. Spark expands the event into its member windows
    map-side; state is per-(window, key) like any tumbling agg. Complete
    mode emits all windows at drain."""
    src_dir, cp = _dirs("str_sliding_10min", sf_dir, "src", "cp")
    src = parquet_stream(spark, _events(spark, sf_dir), src_dir)
    agg = src.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    out = run_to_memory(agg, "complete", cp)
    return out.select(F.col("w.start").alias("w_start"), "n", "total")


@query(
    "str_dedup_late",
    oracle="SELECT DISTINCT user_id, ts FROM events",
)
def str_dedup_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on the natural key (train_id,
    current_timestamp analog — SURVEY §2.9 str_dedup_late): duplicated
    source → withWatermark + dropDuplicates → distinct keys out. The
    watermark bounds dedup state at scale; the NTZ↔TZ casts are a wall-clock
    identity."""
    src_dir, cp = _dirs("str_dedup_late", sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("user_id", "ts")
    dup = ev.unionByName(ev)
    src = parquet_stream(spark, dup, src_dir)
    deduped = (
        src.withColumn("ts_wm", F.col("ts").cast("timestamp"))
        .withWatermark("ts_wm", "10 minutes")
        .dropDuplicates(["user_id", "ts_wm"])
    )
    out = run_to_memory(deduped, "append", cp)
    return out.select("user_id", F.col("ts_wm").cast("timestamp_ntz").alias("ts"))


@query(
    "str_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    islands AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n
    FROM islands GROUP BY user_id, sess
    """,
)
def str_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key session windows with a 30-minute gap (service-run sessions,
    SURVEY §2.9): native session_window state merging; oracle is the
    batch gaps-and-islands equivalent."""
    src_dir, cp = _dirs("str_session_window", sf_dir, "src", "cp")
    src = parquet_stream(spark, _events(spark, sf_dir), src_dir)
    agg = src.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    out = run_to_memory(agg, "complete", cp)
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n",
    )


_STATE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)
_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("mx", T.DoubleType())]
)


def _make_running_state():
    """Build the applyInPandasWithState function as a CLOSURE so cloudpickle
    serializes it by value — executor Python workers never need this package
    on their PYTHONPATH (the external driver may run from any cwd)."""

    def running_state(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, mx = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
        state.update((n, mx))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return running_state


_TWS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_crossings", T.LongType()),
    ]
)


class _CrossingProcessor(StatefulProcessor):
    """Per-key state machine on the transformWithState API: counts upward
    crossings of value >= 100 in event order — the approaching→arrived
    transition shape (SURVEY §2.9 str_stateful). ValueState carries
    (last_value, n_crossings) across micro-batches."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "crossings", "last_value DOUBLE, n BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._state.exists():
            last, n = self._state.get()
        else:
            last, n = None, 0
        batch = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        for v in batch["value"]:
            if last is not None and last < 100.0 <= v:
                n += 1
            last = float(v)
        self._state.update((last, n))
        yield pd.DataFrame({"user_id": [key[0]], "n_crossings": [n]})

    def close(self) -> None:
        pass


def _tws_oracle():
    return """
    WITH ordered AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id,
           CAST(count(*) FILTER (WHERE prev < 100 AND value >= 100) AS BIGINT)
               AS n_crossings
    FROM ordered GROUP BY user_id
    """


def str_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-generation stateful streaming (transformWithStateInPandas,
    Spark 4): typed ValueState per key, Arrow-batched handler, RocksDB
    state store. Batch-equivalent oracle: per-user count of upward
    value-threshold crossings in event order."""
    # transformWithState requires the RocksDB state store provider.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    proc = _CrossingProcessor()
    src_dir, cp = _dirs("str_stateful_tws", sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    src = parquet_stream(spark, ev, src_dir)
    result = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_TWS_OUT,
        outputMode="Update",
        timeMode="None",
    )
    return run_to_memory(result, "update", cp)


if _HAS_TWS:
    # Registered only where the runtime supports it (needs protobuf for the
    # state-server protocol); applyInPandasWithState below is the always-on
    # stateful path. The implementation itself is complete and exercised on
    # protobuf-equipped clusters. The crossing SEMANTICS are always driver-
    # verified regardless: str_stateful_crossings runs the identical state
    # machine (same oracle) on the first-generation engine.
    query("str_stateful_tws", oracle=_tws_oracle())(str_stateful_tws)


_CROSS_STATE = T.StructType(
    [
        T.StructField("last_value", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _make_crossing_state():
    import pandas as _pd

    def crossing_state(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last, n = state.get
        else:
            last, n = None, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # Arrow chunk boundaries within a micro-batch are arbitrary:
            # order the whole batch, not each chunk
            batch = _pd.concat(chunks).sort_values(["ts", "event_id"])
            for v in batch["value"]:
                if last is not None and last < 100.0 <= v:
                    n += 1
                last = float(v)
        state.update((last, n))
        yield _pd.DataFrame({"user_id": [key[0]], "n_crossings": [n]})

    return crossing_state


@query("str_stateful_crossings", oracle=_tws_oracle())
def str_stateful_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key threshold-crossing state machine on the always-on
    applyInPandasWithState engine: counts upward crossings of
    value >= 100 in (ts, event_id) order — the approaching→arrived
    transition shape (SURVEY §2.9 str_stateful), same semantics and oracle
    as the Spark-4 transformWithState variant (``str_stateful_tws``) so
    the crossing logic carries driver verification even where that
    engine's protobuf dependency is absent. State per key is two scalars
    (last_value, n); emission is update-mode, one row per key per
    micro-batch."""
    src_dir, cp = _dirs("str_stateful_crossings", sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    src = parquet_stream(spark, ev, src_dir)
    result = src.groupBy("user_id").applyInPandasWithState(
        _make_crossing_state(),
        outputStructType=_TWS_OUT,
        stateStructType=_CROSS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(result, "update", cp)


@query(
    "str_stateful",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def str_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key state machine via applyInPandasWithState (the
    approaching→arrived state-transition shape, SURVEY §2.9 str_stateful):
    Arrow-batched state updates, update-mode emission per micro-batch."""
    src_dir, cp = _dirs("str_stateful", sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("user_id", "value")
    src = parquet_stream(spark, ev, src_dir)
    result = src.groupBy("user_id").applyInPandasWithState(
        _make_running_state(),
        outputStructType=_STATE_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(result, "update", cp)
    return out


@query(
    "str_stream_join",
    oracle="""
    SELECT c.user_id,
           CAST(c.event_id AS BIGINT) AS click_id,
           CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def str_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time range + watermarks (SURVEY
    §2.9 family): purchases join the same user's clicks from the preceding
    30 minutes. Both sides carry a 1-hour watermark and the join condition
    bounds event time on both sides, so the state store retains only one
    watermark-window of each stream — the requirement for an unbounded
    stream-stream join to run forever at scale. Drained with availableNow
    over bounded copies, the emitted pairs equal the batch interval join
    (the oracle); the NTZ↔TZ casts are a wall-clock identity."""
    click_dir, purchase_dir, cp = _dirs(
        "str_stream_join", sf_dir, "clicks", "purchases", "cp"
    )
    ev = _events(spark, sf_dir)
    clicks = parquet_stream(
        spark, ev.filter(F.col("event_type") == "click"), click_dir
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    purchases = parquet_stream(
        spark, ev.filter(F.col("event_type") == "purchase"), purchase_dir
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = run_to_memory(joined, "append", cp)
    return out.select(
        F.col("c_user").alias("user_id"),
        F.col("click_id").cast("bigint"),
        F.col("purchase_id").cast("bigint"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("bigint")
        .alias("lag_s"),
    )


def _stage_batch(df: DataFrame, src_dir: str, idx: int, mtime: float) -> Path:
    """Write one DataFrame as ONE parquet file at a caller-chosen mtime and
    return its path. Since the r16 drain rework no caller throttles with
    maxFilesPerTrigger — every staged file loads in a single availableNow
    micro-batch, so the mtimes do NOT order batches and carry no
    late-row protection (do not reintroduce ordering assumptions on
    them). The real protection is batch-start watermark semantics: late
    dropping uses the watermark as of batch START, so data and sentinel
    sharing one batch cannot drop each other. The pinned mtimes remain
    only to keep FileStreamSource's listing deterministic for checkpoint
    replay and debugging."""
    import os

    staged = Path(src_dir) / f"__stage{idx}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staged))
    part = next(p for p in staged.iterdir() if p.name.endswith(".parquet"))
    dest = Path(src_dir) / f"{idx:02d}.parquet"
    part.rename(dest)
    shutil.rmtree(staged)
    os.utime(dest, (mtime, mtime))
    return dest


def _staged_max_ts(paths: list[Path], column: str):
    """Max of a timestamp column across staged batch files, read from the
    parquet FOOTER STATISTICS only — a bounded metadata read (two footers,
    no Spark job, no data pages), not a table scan. This is how the outer
    stream-join derives its watermark-flush instant: a production job
    would take it from the trigger clock; a replay harness takes it from
    the batches it just staged, never by rescanning the source table."""
    import pyarrow.parquet as pq

    best = None
    for p in paths:
        md = pq.ParquetFile(str(p)).metadata
        # Resolve the column against the parquet LEAF columns by path name:
        # an arrow-schema field index only coincides with the parquet
        # column index for flat schemas — under a nested struct the two
        # orderings diverge and the old get_field_index lookup would read
        # the wrong column's statistics.
        leaf_paths = [md.schema.column(i).path for i in range(md.num_columns)]
        if column not in leaf_paths:
            raise ValueError(
                f"staged batch {p}: column {column!r} not among parquet leaf "
                f"columns {leaf_paths}"
            )
        idx = leaf_paths.index(column)
        file_best = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                if file_best is None or st.max > file_best:
                    file_best = st.max
        if file_best is None:
            if md.num_rows > 0:
                # An ALL-NULL column is a legitimate 'no watermark
                # contribution' batch, not a stats problem: pyarrow writes
                # statistics with has_min_max=False and null_count equal to
                # the chunk's VALUE count for all-null chunks (ADVICE r9).
                # The denominator is the column chunk's num_values, not the
                # row-group's num_rows: for a nested/repeated leaf the two
                # diverge (a 2-row list column can hold 4 leaf values —
                # ADVICE r10), and rows-based accounting would mis-raise on
                # an all-null nested column. num_values counts all leaf
                # slots including nulls, so null_count == num_values IS
                # 'every value in this chunk is null' for flat and nested
                # leaves alike.
                all_null = all(
                    (cc := md.row_group(rg).column(idx)).statistics is not None
                    and cc.statistics.null_count == cc.num_values
                    for rg in range(md.num_row_groups)
                )
                if all_null:
                    continue
                # Fail loudly (the contract load() follows in data.py): a
                # writer config without min/max stats must not silently
                # classify a non-empty source as empty — that would yield
                # wrong outer-join output instead of an error.
                raise ValueError(
                    f"staged batch {p} has {md.num_rows} rows but no usable "
                    f"min/max statistics for {column!r}; cannot derive the "
                    "watermark flush instant from its footer"
                )
            continue
        if best is None or file_best > best:
            best = file_best
    return best


def _open_staged(spark: SparkSession, schema, src_dir: str) -> DataFrame:
    # no maxFilesPerTrigger: every staged file loads in ONE availableNow
    # micro-batch. Batch order between real data and the sentinel is
    # irrelevant when they share the batch — the watermark is 0 while the
    # batch runs (late-row dropping uses the watermark at batch START), so
    # the sentinel cannot drop real rows; it only advances the watermark
    # AFTER the batch, which is exactly its job. Per-batch overhead at 32
    # state partitions is ~2.4 s (measured r16), so one data batch + the
    # no-data eviction batch beats the old 3-data-batch drain by ~5 s.
    return spark.readStream.schema(schema).parquet(src_dir)


@query(
    "str_stream_join_outer",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    p AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           CAST(c.event_id AS BIGINT) AS click_id,
           CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
    FROM c LEFT JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def str_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the abandoned-funnel query (clicks
    that never converted), and the semantics inner joins cannot give: the
    null row for an unmatched click may only be emitted once the
    watermark proves no purchase can still arrive, so emission is
    state-eviction, not match-time. Both sides carry 1-hour watermarks
    and the event-time range bounds state exactly as in str_stream_join.

    The drain appends ONE far-future sentinel row per side (negative
    user ids, non-joinable) after the real data; all files load in a
    single availableNow micro-batch, whose max event time advances the
    watermark past every real click's join window, and Spark's NO-DATA
    batch (SPARK-24156: when the watermark moved, one empty batch runs
    so eviction results flow without waiting for more input) performs
    the evict-and-emit of the null rows. That mirrors production, where
    the watermark only moves with data and the engine emits on the next
    trigger; sentinels are filtered from the result by user sign.

    The sentinel flush instant is DATA-INDEPENDENT of the source table:
    it is read from the parquet footer statistics of the two real batch
    files the drain just staged (a bounded metadata read — two footers,
    zero data pages, zero Spark jobs), never from a max(ts) scan of
    `events`. A production job would take the instant from its trigger
    clock (processing time is always ≥ every ingested event time); a
    deterministic replay takes it from the batches it owns.

    FIXED-COST REWORK (r16, closing the r15 verdict #5 decomposition):
    this was the registry's most expensive query at 31 s (sf0.1) with a
    flat 1.03× sf1 slope — pure overhead, decomposed as 19 s of
    sentinel staging + 10 s of four micro-batches. Cause #1: each
    1-row sentinel was built with spark.createDataFrame, whose
    Python-RDD-backed relation has defaultParallelism (32) parent
    partitions that coalesce(1) drains SERIALLY through Python worker
    round-trips — ~5 s per sentinel write. Sentinels are now pure-JVM
    1-row relations (spark.range(1) + typed literals): milliseconds.
    Cause #2: maxFilesPerTrigger=1 over 3 files/side ran 3 data
    batches + the no-data batch at ~2.4 s each (32 state partitions ×
    4 join state stores); the second sentinel existed only to trigger
    the eviction batch, but the no-data batch already does that (the
    old docstring's claim that availableNow stops without it was
    measured FALSE on this Spark). One data batch + one no-data batch
    remain. Measured total: 30.7 → 7.4 s warm; output bit-identical at
    both SFs (19 865 rows at sf0.1)."""
    import time
    from datetime import timedelta

    click_dir, purchase_dir, cp = _dirs(
        "str_stream_join_outer", sf_dir, "clicks", "purchases", "cp"
    )
    ev = _events(spark, sf_dir)
    base = time.time() - 3600
    real_clicks = _stage_batch(
        ev.filter(F.col("event_type") == "click"), click_dir, 0, base
    )
    real_purchases = _stage_batch(
        ev.filter(F.col("event_type") == "purchase"), purchase_dir, 0, base
    )
    max_ts = _staged_max_ts([real_clicks, real_purchases], "ts")
    if max_ts is None:
        # empty source: there is no real state to flush, so any sentinel
        # instant works (sentinels are filtered from the result by user
        # sign) — without this the None + timedelta below would kill the
        # no-data run of the job
        from datetime import datetime

        max_ts = datetime(1970, 1, 1)

    def sentinel(eid: int, uid: int, etype: str, ts):
        # pure-JVM 1-row relation: spark.range(1) + typed literals. NOT
        # spark.createDataFrame — its Python-RDD local relation carries
        # defaultParallelism parent partitions that coalesce(1) drains
        # serially through Python workers (~5 s per 1-row write, measured
        # r16; this function is why the query cost 31 s).
        vals = {"event_id": eid, "user_id": uid, "ts": ts,
                "event_type": etype, "value": 0.0}
        return spark.range(1).select(
            *[F.lit(vals[f.name]).cast(f.dataType).alias(f.name)
              for f in ev.schema.fields]
        )

    s1 = max_ts + timedelta(hours=24)
    _stage_batch(sentinel(-1, -1, "click", s1), click_dir, 1, base + 10)
    _stage_batch(sentinel(-2, -2, "purchase", s1), purchase_dir, 1, base + 10)
    clicks = _open_staged(spark, ev.schema, click_dir).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    purchases = _open_staged(spark, ev.schema, purchase_dir).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    # evict_emission: the null rows for unmatched clicks are emitted by
    # the watermark-advance no-data batch (SPARK-24156) — the one drain in
    # the tier whose OUTPUT depends on it (r19 measured: without it, 183
    # rows instead of 19 865). Every other drain leaves the default
    # (no-data batches suppressed — pure fixed cost for bounded drains).
    out = run_to_memory(joined, "append", cp, evict_emission=True)
    return out.filter(F.col("c_user") >= 0).select(
        F.col("c_user").alias("user_id"),
        F.col("click_id").cast("bigint"),
        F.col("purchase_id").cast("bigint"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("bigint")
        .alias("lag_s"),
    )


@query(
    "str_dedup_rocksdb",
    oracle="SELECT DISTINCT user_id, ts FROM events",
)
def str_dedup_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_dedup_late's watermarked dedup re-run on the RocksDB state
    store provider — the 100 TB state path: the HDFS-backed default holds
    every key's state in executor HEAP (state size is bounded by JVM
    memory), while RocksDB keeps it off-heap on local SSD with
    changelog/zip snapshot checkpointing, so keyed state scales to
    billions of keys per executor. Same dataflow, same results —
    swapping the provider is a conf, not a rewrite; the provider conf is
    scoped to this query and restored afterwards.

    The query asserts the swap actually engaged by checking the
    checkpoint's state dir for RocksDB commit files (the HDFS provider
    writes .delta/.snapshot files instead) — a silent fallback would
    invalidate the scale claim."""
    return _dedup_rocksdb(spark, sf_dir, "str_dedup_rocksdb", changelog=False)


@query(
    "str_dedup_rocksdb_changelog",
    oracle="SELECT DISTINCT user_id, ts FROM events",
)
def str_dedup_rocksdb_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_dedup_rocksdb re-run with CHANGELOG checkpointing
    (``rocksdb.changelogCheckpointing.enabled=true``) — the low-latency
    commit mode for large state: each commit uploads only the
    ``<version>.changelog`` delta of that batch's writes, deferring full
    zip snapshots to background maintenance, so commit cost tracks batch
    write volume instead of total state size. Same dataflow, same
    results; the conf is scoped to this query and restored afterwards.

    The engagement self-check (streaming/pipelines.assert_rocksdb_engaged)
    recognizes changelog commits since r17 — the pre-r17 zip-only check
    falsely raised "zips=0, deltas=0" in exactly this mode (PLANS.md r16
    'Changelog-checkpointing follow-up'); this query pins the mode in the
    driver's correctness rotation so the check can never regress
    unnoticed."""
    return _dedup_rocksdb(
        spark, sf_dir, "str_dedup_rocksdb_changelog", changelog=True
    )


def _dedup_rocksdb(
    spark: SparkSession, sf_dir: str, name: str, changelog: bool
) -> DataFrame:
    src_dir, cp = _dirs(name, sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("user_id", "ts")
    dup = ev.unionByName(ev)
    src = parquet_stream(spark, dup, src_dir)
    scoped = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }
    if changelog:
        scoped[
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ] = "true"
    prev = {k: spark.conf.get(k, None) for k in scoped}
    for k, v in scoped.items():
        spark.conf.set(k, v)
    try:
        deduped = (
            src.withColumn("ts_wm", F.col("ts").cast("timestamp"))
            .withWatermark("ts_wm", "10 minutes")
            .dropDuplicates(["user_id", "ts_wm"])
        )
        out = run_to_memory(deduped, "append", cp)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    counts = assert_rocksdb_engaged(Path(cp) / "state")
    # pin WHICH RocksDB commit mode ran: zip snapshots under default
    # checkpointing, changelog deltas under changelog mode — a scoped-conf
    # leak in either direction fails loudly
    if changelog and counts["changelogs"] == 0:
        raise RuntimeError(f"expected changelog commits, got {counts}")
    if not changelog and counts["zips"] == 0:
        raise RuntimeError(f"expected zip-snapshot commits, got {counts}")
    return out.select("user_id", F.col("ts_wm").cast("timestamp_ntz").alias("ts"))


@query(
    "str_resume_stateful",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY user_id
    """,
)
def str_resume_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-STATE recovery across a restart — the semantic
    str_redelivery doesn't cover: that query proves offset tracking on a
    stateless pipeline; this one proves the keyed aggregation state
    itself survives. Run 1 drains half the events into a per-user
    running aggregate and stops; more files land; run 2 is a NEW query
    (new sink) resuming from the same checkpoint, reading ONLY the new
    files — yet its complete-mode output equals the full-corpus
    aggregate, which is only possible if run 2 restored run 1's state
    store rather than recounting from scratch.

    Scale: this is the operational contract that lets a 100 TB streaming
    job upgrade/restart without replaying the source — state snapshots
    (HDFS or RocksDB provider alike) checkpoint per micro-batch and
    reload keyed, partitioned, in parallel."""
    src_dir, cp = _dirs("str_resume_stateful", sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    def agg_of(src: DataFrame) -> DataFrame:
        return src.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )

    first.coalesce(1).write.mode("overwrite").parquet(src_dir)
    run_to_memory(
        agg_of(spark.readStream.schema(ev.schema).parquet(src_dir)), "complete", cp
    )
    second.coalesce(1).write.mode("append").parquet(src_dir)
    out = run_to_memory(
        agg_of(spark.readStream.schema(ev.schema).parquet(src_dir)), "complete", cp
    )
    return out


@query(
    "src_statestore",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    """,
)
def src_statestore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store introspection (Spark 4 state data source): after a
    streaming per-user count drains, the checkpoint's STATE files are
    read back as a batch DataFrame — `format("statestore")` — and must
    equal the batch aggregate. This is the ops capability that matters
    when a 100 TB streaming job misbehaves: inspect keyed state directly
    (skewed keys, stuck watermark entries, state size per key) without
    stopping the job or adding probes; at scale it also powers state
    repair/migration jobs (read state → transform → seed a new
    checkpoint).

    The read is partition-parallel over the state files, same as any
    file source."""
    src_dir, cp = _dirs("src_statestore", sf_dir, "src", "cp")
    ev = _events(spark, sf_dir).select("user_id")
    src = parquet_stream(spark, ev, src_dir)
    agg = src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    run_to_memory(agg, "complete", cp)
    state = spark.read.format("statestore").load(cp)
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").cast("bigint").alias("n"),
    )


@query(
    "src_rest_api_stream",
    oracle="""
    SELECT poll.p AS poll_id, line.l AS train_line, CAST(2 AS BIGINT) AS n_trains
    FROM (VALUES (0), (1), (2)) AS poll(p)
    CROSS JOIN (VALUES ('Red'), ('Blue'), ('Brown'), ('Green'), ('Orange'),
                       ('Purple'), ('Pink')) AS line(l)
    """,
)
def src_rest_api_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-minute REST poll as a REAL streaming source
    (Spark 4 SimpleDataSourceStreamReader, sources/rest_api.py): each
    micro-batch is one poll cycle over all 7 train lines, offsets are the
    poll counter, and checkpoint recovery replays poll ranges via
    readBetweenOffsets — the closest Spark expression of the reference's
    EventBridge-tick + SQS-redelivery loop (get_train_status.py:29-43,
    main.tf:49). The fixture horizon is 3 polls so the drain is bounded;
    live deployments let the offset advance forever and set
    trigger(processingTime='60 seconds') as the poll cadence.

    Each payload is parsed with from_json on the wire schema and reduced
    to a per-(poll, line) train count — the same parse the batch
    src_rest_api feeds into the flatten chain."""
    from ..sources.rest_api import CTATrainLocationsStreamDataSource
    from ..schemas import CTA_RESPONSE_SCHEMA

    (_cp,) = _dirs("src_rest_api_stream", sf_dir, "cp")
    try:
        spark.dataSource.register(CTATrainLocationsStreamDataSource)
    except Exception:  # already registered in this session
        pass
    src = spark.readStream.format("cta_train_locations_stream").load()
    parsed = src.select(
        "poll_id",
        "train_line",
        F.size(
            F.element_at(F.from_json("body", CTA_RESPONSE_SCHEMA)["ctatt"]["route"], 1)[
                "train"
            ]
        )
        .cast("bigint")
        .alias("n_trains"),
    )
    import uuid

    name = f"mem_{uuid.uuid4().hex[:12]}"
    with scoped_state_partitions(spark):
        q = (
            parsed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", _cp)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.table(name)
