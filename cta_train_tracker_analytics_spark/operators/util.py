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


def maybe_broadcast(df: DataFrame, *, bounded: bool = False) -> DataFrame:
    """Broadcast policy for join sides, centralized (round-6 verdict #5).

    ``bounded=True`` — the caller asserts the side is PROVABLY tiny at any
    scale factor (a constant-size dimension like nation/region/dim_lines,
    a one-row aggregate, a top-k result): hint ``broadcast`` so the plan
    is pinned and plan tests can assert it.

    ``bounded=False`` (default) — the side grows with the data (customer,
    part, any per-key aggregate over a growing domain): return the frame
    UNHINTED and let the optimizer decide from measured sizes —
    statically via ``spark.sql.autoBroadcastJoinThreshold`` against
    catalog/file statistics, and at runtime via AQE's post-shuffle size
    check. At TPC-H test scale these sides still broadcast (they are under
    the 10 MB threshold); at 100 TB the same code degrades gracefully to a
    shuffle join instead of OOMing the driver with a forced hint.
    """
    from pyspark.sql import functions as F

    return F.broadcast(df) if bounded else df
