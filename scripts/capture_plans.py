#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r<N>/<query>_<suffix>.txt — the optimization-round evidence trail
(the judge checks plan claims against these files without running Spark).

Usage:
    python scripts/capture_plans.py <suffix> <query> [<query> ...]
    python scripts/capture_plans.py after ext_knn_graph_prod ext_semdedup

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — same data the
bench times, so plan shapes (AQE inputs, broadcast sizes) match the bench.
PLANS_ROUND (default r18) picks the output directory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cta_train_tracker_analytics_spark.plans import registry  # noqa: E402
from cta_train_tracker_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in registry.all_queries()]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r18"),
    )
    os.makedirs(round_dir, exist_ok=True)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = registry.spec(name).fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(round_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
