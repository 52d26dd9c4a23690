"""JSONL source/sink — the raw-zone wire format.

Reference: newline-delimited JSON objects appended to ``raw/YYYY/MM/DD/``
(``get_train_status.py:46-49`` for the record encoding,
``bucket_raw_data.py:43-53`` for the line-wise parse that skips blanks).

Spark-first mapping: ``spark.read.schema(S).json(path)`` — explicit schema
always (SURVEY §1.3: never infer in production paths); the blank-line skip
and UTF-8 handling are native to the JSON datasource. Appending is
``mode("append")`` on the writer; at-least-once retry semantics from the
reference's Firehose loop are subsumed by Spark task retries + committed
output files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """src_jsonl (bucket_raw_data.py:43-53): newline-delimited JSON →
    DataFrame with a declared schema. PERMISSIVE keeps corrupt lines as
    nulls; pass ``mode="FAILFAST"`` options upstream for the reference's
    raising behavior."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """snk_jsonl_append (get_train_status.py:52-79): append JSON-lines files
    under ``path``. One file per task; the writer commits atomically, so the
    reference's partial-batch redrive has no analog to hand-code."""
    df.write.mode(mode).json(path)


def date_path(root: str, year: int, month: int, day: int) -> str:
    """Zero-padded raw-zone date path ``root/YYYY/MM/DD`` —
    bucket_raw_data.py:90-94."""
    return f"{root}/{year:04d}/{month:02d}/{day:02d}"
