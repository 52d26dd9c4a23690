"""Pin the private-API probe inside spread() (operators/util.py).

spread() asks the JVM for the partition count via
``df._jdf.queryExecution().toRdd().getNumPartitions()`` — private API, with
a documented fallback to ``df.rdd``. If a Spark bump removes or renames the
probe, the fallback silently changes spread()'s cost profile (a Python RDD
conversion per call); this test fails loudly instead so the bump is noticed
and the probe re-pointed."""

from __future__ import annotations


def test_spread_jvm_probe_api_exists(spark):
    df = spark.range(10)
    qe = df._jdf.queryExecution()
    n = qe.toRdd().getNumPartitions()
    assert n == df.rdd.getNumPartitions()


def test_spread_noop_on_well_partitioned_input(spark):
    from cta_train_tracker_analytics_spark.operators.util import spread

    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    assert spread(wide) is wide  # no repartition inserted
    narrow = spark.range(0, 1000, 1, 1)
    assert spread(narrow) is not narrow
