"""Round-13 adjudication of the 12 r12 driver-bench regression flags.

Recipe (PLANS.md round-10, memory): fresh process, warm tables, then per
query N runs (8 for >=1s floors, 16 for sub-second — JIT keeps declining
for ~8 runs); record min + median + spread. 3 non-iterative CONTROLS of
similar magnitude run interleaved; if controls also sit well above their
floors, the drift is machine-global.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FLAGS = [
    "ext_ks_test",             # 6.49x — the headline
    "ext_kmeans_update",       # 2.27x
    "ext_auc",                 # 2.17x
    "ext_repetition_stats",    # 2.17x
    "ext_pmi_collocations",    # 2.16x
    "ext_graph_triangles",     # 1.85x
    "ext_tfidf_cosine_pairs",  # 1.84x
    "job_incremental_agg_retract",  # 1.83x
    "ext_bm25",                # 1.79x
    "ext_semdedup",            # 1.78x
    "ext_mad_outliers",        # 1.56x
    "ext_sim_search_pq_rerank",  # 1.5x
]
CONTROLS = ["agg_runs_test", "win_anomaly_zscore", "agg_weighted_median",
            "ext_tfidf_topk", "ext_sim_recall"]

from cta_train_tracker_analytics_spark.session import get_spark
from cta_train_tracker_analytics_spark.data import TABLES, load
from cta_train_tracker_analytics_spark.plans import registry

sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark(app_name="adjudicate-r13")
for t in TABLES:
    load(spark, sf_dir, t).count()

be = json.load(open("/root/repo/BENCH_DETAIL.json"))["best_ever"]
queries = registry.all_queries()

out = {}
for name in FLAGS + CONTROLS:
    floor = be.get(name)
    n_runs = 8 if (floor or 1.0) >= 1.0 else 16
    runs = []
    fn = queries[name]
    for _ in range(n_runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    runs_s = sorted(runs)
    rec = {
        "floor": floor,
        "min": round(runs_s[0], 3),
        "median": round(runs_s[len(runs_s) // 2], 3),
        "max": round(runs_s[-1], 3),
        "ratio_min": round(runs_s[0] / floor, 2) if floor else None,
        "kind": "CONTROL" if name in CONTROLS else "FLAG",
        "runs": [round(r, 3) for r in runs],
    }
    out[name] = rec
    print(f"{rec['kind']:7s} {name:32s} floor={floor} min={rec['min']} "
          f"med={rec['median']} ratio_min={rec['ratio_min']}", flush=True)

with open("/tmp/adjudicate_r13.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("WROTE /tmp/adjudicate_r13.json")
