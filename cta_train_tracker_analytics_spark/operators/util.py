"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ONLY when the input arrives in fewer partitions than the
    cluster can use — e.g. a single small parquet file feeding a CPU-heavy
    map stage (shingling, pandas decode, vector math), which would otherwise
    run single-threaded regardless of core count.

    At real scale the scan already yields ≥ parallelism partitions and this
    is a no-op — no extra shuffle is introduced. Keyed spread keeps rows of
    one key co-located when a groupBy on that key follows.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        # JVM-side partition count: skips df.rdd's Java→Python conversion
        # plan (serializer setup per call). Never executes a job here —
        # spread() is only applied to scan-rooted frames (no AQE stages).
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # pragma: no cover - e.g. Spark Connect
        n = df.rdd.getNumPartitions()
    if n >= max(2, target // 2):
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
