"""nprobe COST curve for the prod ANN composition (round 14).

The r13 recall work established nprobe as the family's primary
recall/cost dial (full-graph edge recall@3 on the clustered mixture:
0.617 at nprobe=2 → 0.703 at nprobe=4) with the cost side argued as
"candidate volume scales linearly with nprobe" but never WALL-CLOCK
measured on the shipped composition. This probe measures it: the prod
assignment (sharded two-level, 4 branches, residence cap) at nprobe
1 / 2 / 4 on the 20k clustered mixture corpus (recall_probe's
generator, same seeds), timing the full graph build (assignment +
cell self-join + top-3) and computing full-graph edge recall@3 for
each point — one table of (nprobe, build_sec, recall) that makes the
dial's price explicit. Records BENCH_DETAIL["nprobe_curve"].

Usage: python scripts/nprobe_curve_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

from pyspark.sql import functions as F

NPROBES = [1, 2, 4]

REPO_ROOT = os.path.dirname(_SCRIPTS)
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")


def main() -> int:
    import recall_probe
    from spill_cap_experiment import _exact_recall, _graph

    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import (
        ivf_assign_sharded_multi,
    )
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-nprobe-curve")
    recall_probe.generate(spark)  # mixture corpus, cached by marker
    d = recall_probe.MIXTURE_DIR

    emb = load(spark, d, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells = max(8, math.ceil(n / 250))
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    cap = 2 * math.ceil(n / n_cells)
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )

    curve = {}
    for nprobe in NPROBES:
        best = None
        edges = None
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            asg = ivf_assign_sharded_multi(
                emb, centroids, n_coarse, nprobe,
                residence_cap=cap, n_branches=4,
            )
            edges = _graph(spark, asg)
            edges.count()
            sec = time.perf_counter() - t0
            best = sec if best is None or sec < best else best
        recall = _exact_recall(spark, d, edges)
        curve[f"nprobe_{nprobe}"] = {"build_sec": round(best, 3),
                                     "full_graph_recall_at3": recall}
        print(f"# nprobe={nprobe}: build={best:.3f}s recall@3={recall}",
              file=sys.stderr)

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    detail["nprobe_curve"] = {
        "dataset": f"recall_probe mixture corpus (N={n}, "
                   f"{recall_probe.MIX_CLUSTERS} clusters, noise "
                   f"{recall_probe.MIX_NOISE}), prod knobs "
                   f"(cells={n_cells}, coarse={n_coarse}, cap={cap}, "
                   "branches=4, residence cap on)",
        **curve,
    }
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"nprobe_curve": detail["nprobe_curve"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
