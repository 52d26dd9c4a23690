"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Each table is one parquet file under ``{sf_dir}/{name}.parquet``. At cluster
scale these would be partitioned directories / catalog tables; the loader is
the single seam where that swap happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects natively. Read nanos as long and truncate to micros —
        # the same ns→µs truncation DuckDB applies — then present as NTZ
        # so every engine table carries naive timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API surface)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
