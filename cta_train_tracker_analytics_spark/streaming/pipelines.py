"""Streaming pipeline building blocks.

Mapping from the reference's managed-service semantics (SURVEY.md §2.9):

- EventBridge 1-min cron            → ``trigger(processingTime="60 seconds")``
  (tests/verification run ``trigger(availableNow=True)`` to drain bounded
  fixture data deterministically)
- Firehose 64 MB/900 s buffering    → file-sink micro-batches +
  ``maxRecordsPerFile``
- Firehose partial-batch retry ×5   → checkpointed exactly-once file sink;
  task retries subsume record-level redrive
- SQS visibility/redelivery         → source replay from checkpoint offsets
- at-least-once duplicates          → ``withWatermark().dropDuplicates()``
- daily 00:01 compaction            → 1-day tumbling window / daily batch job
- per-train sessions / state        → ``session_window`` /
  ``applyInPandasWithState``

All helpers run real Structured Streaming queries (micro-batch engine, state
store, checkpoints) against bounded file sources, so semantics — not mocks —
are what tests and the driver verify.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_stream(
    spark: SparkSession, df: DataFrame, source_dir: str, single_file: bool = True
) -> DataFrame:
    """Materialize ``df`` as a parquet dir and open it as a stream source.
    ``single_file`` keeps ingestion to one micro-batch (deterministic
    results for dedup/state queries under availableNow)."""
    writer = df.coalesce(1) if single_file else df
    writer.write.mode("overwrite").parquet(source_dir)
    return spark.readStream.schema(df.schema).parquet(source_dir)


def run_to_memory(
    sdf: DataFrame, output_mode: str, checkpoint_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Drain a bounded stream into an in-memory sink (availableNow) and
    return the sink table as a DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = sdf.sparkSession
    return spark.table(name)


def run_to_files(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "json",
    timeout_sec: int = 120,
) -> None:
    """Drain a bounded stream into a checkpointed file sink — the
    exactly-once replacement for the reference's Firehose retry loop.
    Re-running with the same checkpoint is a no-op (offsets committed),
    which is precisely the at-least-once → exactly-once upgrade."""
    q = (
        sdf.writeStream.format(fmt)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
