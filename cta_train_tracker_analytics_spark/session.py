"""SparkSession factory.

The reference pins all wall-clock work to America/Chicago
(``get_train_status.py:91-92``, ``bucket_raw_data.py:84-85``). For
analytics/oracle parity we run the session in UTC (DuckDB compares
timestamps as naive/UTC); CTA-ingest code paths that need Chicago local
time use ``F.convert_timezone`` explicitly instead of leaning on the
session zone, so the same plan is correct under any session timezone.

Scale posture: these configs are written for a real cluster (AQE on,
shuffle partitions sized by env, adaptive coalescing + skew-join) and
merely *tested* on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

CHICAGO_TZ = "America/Chicago"


def get_spark(
    app_name: str = "cta-spark-analytics",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local-mode parallelism so the bench
    driver controls core count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS), which Spark's reader
        # rejects natively; read nanos as long once, engine-wide (data.load
        # applies the ns→µs truncation). Set here so reads don't mutate conf.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # At 100 TB the default 128 MB split is fine; keep it explicit so a
        # cluster deploy tunes it consciously rather than by accident.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        # keep catalog metadata out of the repo working dir (bucketed-table
        # data always carries an explicit path; this covers the warehouse)
        .config("spark.sql.warehouse.dir", "/tmp/cta_spark_warehouse")
        # Long-lived sessions accumulate dead broadcast/checkpoint blocks
        # until a JVM GC lets the ContextCleaner see the weak refs die; with
        # a large heap that can take hours. Periodic GC bounds block-manager
        # growth (default is 30min — far too lazy for a query-per-second
        # analytics session).
        .config("spark.cleaner.periodicGC.interval", "1min")
        # Disable PySpark's per-Column-call Python call-site capture
        # (Spark 4 DataFrame debugging): every Column/functions call pays
        # ~8 extra py4j round-trips (PySparkCurrentOrigin get/set/clear +
        # getActiveSession) purely to decorate error messages with Python
        # line numbers. Measured r19: F.col 13 -> 3 round-trips, Column
        # == 37 -> 7; plan construction is single-threaded driver time
        # re-paid per run (guide §5). Diagnostics-only: plans, results
        # and JVM-side error classes are unchanged — re-enable when
        # debugging a failing expression interactively.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
