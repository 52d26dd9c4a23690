#!/usr/bin/env python
"""Split each heavy query's bench-protocol time into BUILD (plan-function
call: driver-side n-count jobs + eager localCheckpoint materialization)
vs ACTION (the timed .count() job chain) — guide §1: find where the time
goes before touching anything. Run 3× per query, report each split's min.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cta_train_tracker_analytics_spark.session import get_spark
from cta_train_tracker_analytics_spark.data import TABLES, load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "ext_knn_graph_prod",
    "ext_knn_graph_ivf_hier",
    "ext_knn_graph_ivf_sharded",
    "ext_sim_search_pq",
    "ext_sim_search_ivf_3level",
    "ext_sim_search_pq_rerank",
    "ext_dedup_embed_banded",
    "ext_knn_graph_prod_recall",
    "job_prep_training_corpus",
    "ext_lm_perplexity",
    "ext_dsir_weights",
    "ext_tfidf_cosine_pairs",
    "ext_hard_negatives",
    "ext_dedup_minhash_twostage",
]


def main():
    spark = get_spark(app_name="overhead-profile")
    from cta_train_tracker_analytics_spark.plans import registry

    for t in TABLES:
        load(spark, SF_DIR, t).count()

    queries = registry.all_queries()
    print(f"{'query':34s} {'build_min':>9s} {'action_min':>10s} {'total':>7s}")
    for name in NAMES:
        fn = queries[name]
        builds, actions = [], []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            actions.append(t2 - t1)
        print(
            f"{name:34s} {min(builds):9.3f} {min(actions):10.3f} "
            f"{min(b + a for b, a in zip(builds, actions)):7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
