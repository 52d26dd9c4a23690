"""The reference's core ingest dataflow (SURVEY.md §3.2) as ONE streaming
query.

Reference chain: SQS trigger → REST poll → parse → guard → flatten →
JSONL append with partial-batch retries (get_train_status.py:82-138 +
Firehose buffering, main.tf:287-288).

Spark shape: a file-watched poll directory stands in for the per-minute
fetch (each dropped file = one poll result; a production deployment swaps
this for the rate-source-triggered driver fetch or the custom DataSource in
sources/rest_api.py) → explicit-schema parse → the flatten chain →
checkpointed JSON append sink. The checkpoint upgrades the reference's
at-least-once Firehose retry loop to exactly-once file output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.flatten import flatten_positions
from ..schemas import CTA_RESPONSE_SCHEMA

#: One poll record on disk: the API payload plus the trigger's line name.
POLL_SCHEMA = T.StructType(
    [
        T.StructField("train_line", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def ingest_stream(
    spark: SparkSession,
    poll_dir: str,
    raw_out_dir: str,
    checkpoint_dir: str,
    observed_date=None,
    observed_ts=None,
    timeout_sec: int | None = None,
) -> None:
    """Drain pending poll files through parse→flatten→JSONL-append.

    ``observed_date``/``observed_ts`` literals pin the observation clock for
    deterministic tests (the reference mocks datetime.now the same way);
    production leaves them None → America/Chicago wall clock.
    """
    polls = spark.readStream.schema(POLL_SCHEMA).json(poll_dir)
    parsed = polls.select(
        F.from_json("body", CTA_RESPONSE_SCHEMA).getField("ctatt").alias("ctatt"),
        "train_line",
    )
    flat = flatten_positions(
        parsed,
        observed_date=observed_date,
        observed_ts=observed_ts,
        # a poll batch must not die because one line's payload is degenerate;
        # broken documents contribute zero rows (the reference isolates this
        # per-Lambda-invocation instead)
        require_route=False,
    )
    from .pipelines import await_drained, scoped_state_partitions

    with scoped_state_partitions(flat.sparkSession):
        q = (
            flat.writeStream.format("json")
            .option("path", raw_out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q, timeout_sec)


def read_raw(spark: SparkSession, raw_out_dir: str) -> DataFrame:
    """Read back the curated 8-column JSONL zone with its declared schema."""
    from ..schemas import TRAIN_STATUS_SCHEMA

    return spark.read.schema(TRAIN_STATUS_SCHEMA).json(raw_out_dir)
