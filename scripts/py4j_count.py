#!/usr/bin/env python
"""Count py4j round-trips per query BUILD (plan-function call) — the
driver-side single-threaded cost the r18 single-parse rework attacks
(guide §5: the driver is one process; planning precedes every submission).

Counts are deterministic (unlike timings), so this can run under load.
Prints queries sorted by round-trips, descending.

Usage: python scripts/py4j_count.py [name,name,...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cta_train_tracker_analytics_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark(app_name="py4j-count")
    from cta_train_tracker_analytics_spark.data import TABLES, load
    from cta_train_tracker_analytics_spark.plans import registry
    import bench

    for t in TABLES:
        load(spark, SF_DIR, t).count()

    gw_client = spark.sparkContext._gateway._gateway_client
    orig = gw_client.send_command
    counter = {"n": 0}

    def counted(*a, **kw):
        counter["n"] += 1
        return orig(*a, **kw)

    gw_client.send_command = counted

    queries = registry.all_queries()
    names = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else [n for n in bench.HEADLINE if n in queries]
    )
    rows = []
    for name in names:
        counter["n"] = 0
        try:
            queries[name](spark, SF_DIR)
        except Exception as e:  # streaming queries need their drains; skip
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            continue
        rows.append((counter["n"], name))
    rows.sort(reverse=True)
    for n, name in rows:
        print(f"{n:7d}  {name}")


if __name__ == "__main__":
    main()
