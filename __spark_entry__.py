"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``cta_train_tracker_analytics_spark``; this module only
re-exports its query registry (``plans/registry.py``) to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cta_train_tracker_analytics_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full star join (lineitem⋈orders⋈customer⋈nation⋈region, small dims
    broadcast) + grouped aggregation — scan, broadcast join, shuffled join,
    partial+final agg in one plan.
    """
    from cta_train_tracker_analytics_spark.plans.relational import flagship_region_pricing

    return flagship_region_pricing(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    """
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys missing here (streaming/state ops)
    get the driver's weaker rows-only check."""
    return registry.all_oracles()
