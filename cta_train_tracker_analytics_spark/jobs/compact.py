"""Daily compaction job — SURVEY.md §3.3.

Reference: ``bucket_raw_data.py:76-117`` lists yesterday's ``raw/Y/M/D/``
JSONL files, reads them all into RAM (256 MB Lambda), infers a schema, writes
one Parquet file to ``processed/load_date=YYYY-MM-DD/``.

Spark shape — one declarative line, distributed and spill-safe:
read(schema).json(raw glob) → withColumn(load_date) → write.partitionBy.
Deviations (recorded per SURVEY §7): schema is declared, not inferred; output
file count is Spark-managed (coalesce(1) mirrors the reference's single-file
choice when requested).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.jsonl import date_path, read_jsonl


def compact_day(
    spark: SparkSession,
    raw_root: str,
    curated_root: str,
    day: dt.date,
    schema: T.StructType,
    single_file: bool = True,
) -> str:
    """Compact one day of raw JSONL into a Hive-partitioned Parquet layout.

    Returns the curated root. Partition pruning on ``load_date`` is then
    automatic for readers (PruneFileSourcePartitions) — the manual prefix
    listing of ``bucket_raw_data.py:29-40`` disappears.
    """
    src = date_path(raw_root, day.year, day.month, day.day)
    df = read_jsonl(spark, src, schema).withColumn("load_date", F.lit(day))
    if single_file:
        # Mirrors the reference's one-file-per-day output
        # (bucket_raw_data.py:56-61). At 100 TB drop this: let Spark write
        # one file per task and let AQE coalesce small partitions.
        df = df.coalesce(1)
    # Dynamic partition overwrite: re-running a day replaces only that day's
    # partition, never the whole curated zone (idempotent daily job).
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("load_date")
        .parquet(curated_root)
    )
    return curated_root
