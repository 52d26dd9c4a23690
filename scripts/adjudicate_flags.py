"""Fresh-process adjudication of driver-bench regression flags.

Recipe (PLANS.md round-10, kept verbatim since): fresh process, warm
tables, then per query N runs (8 for >=1s floors, 16 for sub-second —
JIT keeps declining for ~8 runs); record min + median + spread.
Non-iterative CONTROLS of similar magnitude run interleaved; if the
controls also sit well above their floors, the drift is machine-global,
not the flagged query's plan.

Generalized in round 14 (was hard-coded to the 12 r12 flags —
scripts/adjudicate_r13_runs.json holds that session's output):

    python scripts/adjudicate_flags.py --flags ext_decontaminate \\
        --controls agg_runs_test,win_anomaly_zscore --out /tmp/adj.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the r13 session's lists, kept as defaults for provenance
DEFAULT_FLAGS = [
    "ext_ks_test", "ext_kmeans_update", "ext_auc", "ext_repetition_stats",
    "ext_pmi_collocations", "ext_graph_triangles", "ext_tfidf_cosine_pairs",
    "job_incremental_agg_retract", "ext_bm25", "ext_semdedup",
    "ext_mad_outliers", "ext_sim_search_pq_rerank",
]
DEFAULT_CONTROLS = ["agg_runs_test", "win_anomaly_zscore",
                    "agg_weighted_median", "ext_tfidf_topk", "ext_sim_recall"]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--flags", default=",".join(DEFAULT_FLAGS))
    ap.add_argument("--controls", default=",".join(DEFAULT_CONTROLS))
    ap.add_argument("--out", default="/tmp/adjudicate.json")
    args = ap.parse_args()
    flags = [n for n in args.flags.split(",") if n]
    controls = [n for n in args.controls.split(",") if n]

    from cta_train_tracker_analytics_spark.data import TABLES, load
    from cta_train_tracker_analytics_spark.plans import registry
    from cta_train_tracker_analytics_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark(app_name="adjudicate-flags")
    for t in TABLES:
        load(spark, sf_dir, t).count()

    be = json.load(open(os.path.join(repo, "BENCH_DETAIL.json")))["best_ever"]
    queries = registry.all_queries()

    out = {}
    for name in flags + controls:
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
            "kind": "CONTROL" if name in controls else "FLAG",
            "runs": [round(r, 3) for r in runs],
        }
        out[name] = rec
        print(f"{rec['kind']:7s} {name:32s} floor={floor} min={rec['min']} "
              f"med={rec['median']} ratio_min={rec['ratio_min']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"WROTE {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
