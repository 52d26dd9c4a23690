#!/usr/bin/env python
"""Decompose the two sf10-probe superlinear flags (round 15).

scripts/sf10_probe.py measured the second decade (sf1 -> sf10, 200k ->
2M vectors) and flagged ext_knn_graph_ivf_multi at 24.45x and
ext_dedup_embed_banded at 18.2x while their siblings stayed sub-8x.
This probe attributes each flag to its cost component so the verdicts
rest on measured decomposition, not plausible stories:

- ivf_multi: time the ASSIGNMENT stage (ivf_assign_multi — flat
  broadcast argmax, N x k cosine folds) separately from the full query.
  With the corpus-adaptive k = ceil(N/250), flat scoring is O(N*k) =
  O(N^2/250): the fold count grows 100x across the decade while the
  graph join grows ~10x. If assignment wall tracks the fold count, the
  flag is the documented flat-assignment quadratic (the exact cost the
  two-level family — hier/sharded/prod — was built to remove), not a
  plan regression.
- banded: count TABLES (4 + planes - 8, planes = ceil(log2(N/64))) and
  the actual candidate structure at both scales through the operator's
  own helpers (projection_planes / adaptive_planes — table t uses plane
  rows [t*planes, (t+1)*planes), identical to lsh_banded_pairs): bucket
  rows, sum-of-|bucket|^2 collision volume, and distinct verified
  pairs. Model: tables grow 8 -> 11 => 11/8 * 10 = 13.75x candidate
  volume for 10x rows; anything above that is bucket skew (sum |b|^2
  under non-uniform sign-bucket occupancy), both priced in the
  operator docstring's "within a log factor of linear".

Usage: python scripts/second_decade_probe.py
Prints one JSON line; paste the table into PLANS.md.
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

import sf1_probe
import sf10_probe


def banded_structure(spark, sf_dir: str) -> dict:
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import (
        LSH_PLANES,
        adaptive_planes,
        dot,
        projection_planes,
    )
    from cta_train_tracker_analytics_spark.operators.util import spread

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    planes = adaptive_planes(n)
    tables = 4 + max(0, planes - LSH_PLANES)
    coefs = projection_planes(64, tables * planes)
    from cta_train_tracker_analytics_spark.operators.similarity import _lit_matrix

    projs = F.transform(_lit_matrix(coefs), lambda row: dot(F.col("embedding"), row))
    buckets = F.array(
        *[
            sum(
                (
                    F.when(
                        F.element_at("__projs", t * planes + p + 1) >= 0, 1 << p
                    ).otherwise(0)
                    for p in range(planes)
                ),
                F.lit(0),
            ).cast("int")
            for t in range(tables)
        ]
    )
    tagged = (
        spread(emb)
        .select(F.col("vec_id").alias("id"), projs.alias("__projs"))
        .select("id", buckets.alias("bks"))
        .select("id", F.posexplode("bks").alias("table", "bucket"))
    )
    occ = tagged.groupBy("table", "bucket").agg(F.count("*").alias("c"))
    row = occ.agg(
        F.sum(F.expr("c * (c - 1) / 2")).alias("collisions"),
        F.max("c").alias("max_bucket"),
        F.expr("sum(c) / count(*)").alias("avg_bucket"),
    ).collect()[0]
    return {
        "n": n,
        "planes": planes,
        "tables": tables,
        "collision_pairs_with_multiplicity": int(row["collisions"]),
        "max_bucket": int(row["max_bucket"]),
        "avg_bucket": round(float(row["avg_bucket"]), 1),
    }


def ivf_multi_assignment(spark, sf_dir: str) -> dict:
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import (
        ivf_assign_multi,
    )

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells = max(8, math.ceil(n / 250))
    cents = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        ivf_assign_multi(emb, cents, 2).count()
        sec = time.perf_counter() - t0
        best = sec if best is None or sec < best else best
    return {"n": n, "n_cells": n_cells, "score_folds": n * n_cells,
            "assign_sec": round(best, 3)}


def main() -> int:
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-second-decade-probe")
    out: dict = {"banded": {}, "ivf_multi": {}}
    for label, d in (("sf1", sf1_probe.SF1_DIR), ("sf10", sf10_probe.SF10_DIR)):
        out["banded"][label] = banded_structure(spark, d)
        print(f"# banded {label}: {out['banded'][label]}", file=sys.stderr)
        out["ivf_multi"][label] = ivf_multi_assignment(spark, d)
        print(f"# ivf_multi {label}: {out['ivf_multi'][label]}", file=sys.stderr)
    b1, b10 = out["banded"]["sf1"], out["banded"]["sf10"]
    out["banded"]["collision_ratio"] = round(
        b10["collision_pairs_with_multiplicity"]
        / b1["collision_pairs_with_multiplicity"], 2,
    )
    out["banded"]["table_model_ratio"] = round(10 * b10["tables"] / b1["tables"], 2)
    i1, i10 = out["ivf_multi"]["sf1"], out["ivf_multi"]["sf10"]
    out["ivf_multi"]["fold_ratio"] = round(i10["score_folds"] / i1["score_folds"], 1)
    out["ivf_multi"]["assign_wall_ratio"] = round(
        i10["assign_sec"] / i1["assign_sec"], 2
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
