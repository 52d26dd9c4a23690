"""Hard(er)-bound residence-cap EXPERIMENT for the prod ANN family
(round 14; decision evidence for the r15 re-key queued in PLANS.md).

The shipped cap (operators/similarity.py::ivf_assign_sharded_multi)
bounds ORIGINAL probe-1 residents at ``cap`` and swaps overflow to the
vector's second-best probed leaf — but swapped-in rows do not count
against the destination's cap, so under Zipf cluster mass the max cell
runs past the cap (measured r14: 794 vs cap 500 at N=200k, 1.6x; 2757
uncapped). This script measures the candidate replacement WITHOUT
touching product code: a closed-form RANK-BAND SPILL over the top-KEEP
scored leaf candidates —

    band = min((occ - 1) // cap, KEEP - 1)
    residence = candidates[band]

i.e. the first ``cap`` residents stay, the next ``cap`` demote to their
2nd-best leaf, the next to their 3rd, ... Each source cell sends at most
``cap`` rows to any band, so a destination receives swapped-in mass only
from bands of DIFFERENT source cells — not a hard bound either, but the
spread is geometric rather than all-overflow-to-second-best. The probed
set for the graph build stays the shipped top-2; the (rare) overflow
row whose residence falls outside it simply carries its residence cell
as an extra probe row, exactly like the shipped swap keeps the old
argmax probed.

Measured per corpus (the r14 Zipf mixture, N=20k and 200k): max/p99
probe-1 occupancy, graph-build wall time (the prod self-join shape),
and — at 20k, where the exact graph fits in numpy — full-graph edge
recall@3 vs the shipped swap. Records under
BENCH_DETAIL.json["spill_cap_experiment"].

Usage: python scripts/spill_cap_experiment.py [--skip-200k]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

BASE_DIR = "/tmp/cta_skewmix_20k"
BIG_DIR = "/tmp/cta_skewmix_200k"
KEEP = 4  # candidate leaves kept for spill (nprobe=2 shipped + 2 spare)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")


def _knobs(n: int):
    n_cells = max(8, math.ceil(n / 250))
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    cap = 2 * math.ceil(n / n_cells)
    return n_cells, n_coarse, cap


def _assignments(spark, sf_dir: str, variant: str):
    """(id, vec, v_nrm, probe, cell) rows under the shipped swap cap or
    the experimental rank-band spill."""
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import (
        ivf_assign_sharded_multi,
    )

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells, n_coarse, cap = _knobs(n)
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    if variant == "swap":
        return (
            ivf_assign_sharded_multi(
                emb, centroids, n_coarse, 2, residence_cap=cap, n_branches=4
            ),
            cap,
        )
    # spill: fetch top-KEEP candidates uncapped, then re-label probe 1
    asg = ivf_assign_sharded_multi(
        emb, centroids, n_coarse, KEEP, residence_cap=None, n_branches=4
    )
    cands = asg.groupBy("id").agg(
        F.first("vec").alias("vec"),
        F.first("v_nrm").alias("v_nrm"),
        # probe order IS candidate rank (posexplode upstream)
        F.array_sort(
            F.collect_list(F.struct(F.col("probe"), F.col("cell")))
        ).alias("cands"),
    )
    # affinity to the first-choice cell for the occupancy rank: rescore
    # cos(vec, centroid[c1]) — same quantity the shipped window ranks on
    c1 = cands.withColumn("c1", F.get("cands", 0)["cell"])
    cent = centroids.select(
        F.col("cent_id").alias("c1"), F.col("c_vec").alias("c1_vec")
    )
    from cta_train_tracker_analytics_spark.operators.similarity import dot, norm

    scored = c1.join(F.broadcast(cent), "c1").withColumn(
        "aff", dot(F.col("vec"), F.col("c1_vec")) / (F.col("v_nrm") * norm(F.col("c1_vec")))
    )
    occ_w = Window.partitionBy("c1").orderBy(F.col("aff").desc(), F.col("id").asc())
    banded = scored.withColumn("occ", F.row_number().over(occ_w)).withColumn(
        "band",
        F.least(
            ((F.col("occ") - 1) / F.lit(cap)).cast("int"),
            F.size("cands") - 1,
        ),
    )
    # residence = cands[band]; probes emitted: residence first, then the
    # shipped top-2 probed set minus the residence (dedup), capped at 3
    # rows so non-overflow vectors emit exactly the shipped 2 rows
    out = banded.select(
        "id",
        "vec",
        "v_nrm",
        F.array_distinct(
            F.concat(
                F.array(F.get("cands", F.col("band"))["cell"]),
                F.slice(F.transform("cands", lambda c: c["cell"]), 1, 2),
            )
        ).alias("cells"),
    ).select(
        "id", "vec", "v_nrm", F.posexplode(F.expr("slice(cells, 1, 3)"))
    ).select(
        "id", "vec", "v_nrm", (F.col("pos") + 1).alias("probe"),
        F.col("col").alias("cell"),
    )
    return out, cap


def _occupancy(asg) -> dict:
    rows = (
        asg.filter(F.col("probe") == 1)
        .groupBy("cell")
        .count()
        .select(
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.99)").alias("p99"),
            F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
        )
        .collect()[0]
    )
    return {"max": int(rows["mx"]), "p99": float(rows["p99"]),
            "residence_sum_sq": int(rows["sum_sq"])}


def _graph(spark, asg):
    """prod's graph build verbatim over an assignment table."""
    from cta_train_tracker_analytics_spark.operators.similarity import dot as sdot
    from cta_train_tracker_analytics_spark.plans.llm import _pinned_shuffle_width

    width = _pinned_shuffle_width(spark)
    asg = asg.localCheckpoint(eager=True)
    left = asg.repartition(width, "cell").select(
        F.col("id").alias("vec_id"), F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"), "cell",
    )
    right = asg.filter(F.col("probe") == 1).repartition(width, "cell").select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"), "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = sdot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        pairs.select("vec_id", "neighbor_id", cs.alias("cs"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("vec_id", "neighbor_id")
    )


def _exact_recall(spark, sf_dir: str, got_edges) -> float:
    import numpy as np

    from cta_train_tracker_analytics_spark.data import load

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    v = np.array([r["embedding"] for r in rows], dtype="float64")
    order = np.argsort(ids)
    ids, v = ids[order], v[order]
    nrm = np.linalg.norm(v, axis=1)
    sims = (v @ v.T) / np.outer(nrm, nrm)
    np.fill_diagonal(sims, -np.inf)
    top3 = np.argpartition(-sims, 3, axis=1)[:, :3]
    exact = {(int(ids[i]), int(ids[j])) for i in range(len(ids)) for j in top3[i]}
    got = {(r["vec_id"], r["neighbor_id"]) for r in got_edges.collect()}
    return round(len(exact & got) / len(exact), 4)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-200k", action="store_true")
    args = ap.parse_args()

    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-spill-experiment")
    record: dict = {"keep": KEEP}
    dirs = [("n20k", BASE_DIR)] + ([] if args.skip_200k else [("n200k", BIG_DIR)])
    for label, d in dirs:
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            print(f"# {label}: {d} absent — run clustered_slope_probe first",
                  file=sys.stderr)
            continue
        load(spark, d, "embeddings").count()
        rec: dict = {}
        for variant in ("swap", "spill"):
            asg, cap = _assignments(spark, d, variant)
            asg = asg.localCheckpoint(eager=True)
            occ = _occupancy(asg)
            t0 = time.perf_counter()
            edges = _graph(spark, asg)
            n_edges = edges.count()
            build_sec = round(time.perf_counter() - t0, 3)
            rec[variant] = {"cap": cap, "occupancy": occ,
                            "graph_build_sec": build_sec, "n_edges": n_edges}
            if label == "n20k":
                rec[variant]["full_graph_recall_at3"] = _exact_recall(
                    spark, d, edges
                )
            print(f"# {label}/{variant}: occ_max={occ['max']} "
                  f"p99={occ['p99']:.0f} sumsq={occ['residence_sum_sq']} "
                  f"build={build_sec}s recall="
                  f"{rec[variant].get('full_graph_recall_at3')}", file=sys.stderr)
        record[label] = rec

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    detail["spill_cap_experiment"] = record
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"spill_cap_experiment": record}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
