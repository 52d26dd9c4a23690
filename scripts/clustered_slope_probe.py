"""Clustered/skewed-corpus wall-time slope for the prod ANN family
(r13 verdict #5).

The residence cap in ``ivf_assign_sharded_multi`` (operators/similarity.py)
exists to bound Sum(|cell|^2) pair volume under SKEW, and its recall on a
clustered corpus is measured (scripts/recall_probe.py, BENCH_DETAIL
``recall_uniform.mixture``) — but the family's wall-time SLOPE had only
been measured on the sf1 copy corpus, which is uniform WITHIN a copy, so
the cap machinery never bound anything there. This probe measures the
missing number: a 10x scale-up on a corpus with genuinely SKEWED cluster
mass (Zipf-weighted Gaussian mixture — the worst realistic case for a
cell-blocked self-join), timing ext_knn_graph_prod and
ext_knn_graph_ivf_multi at both scales, and recording the max probe-1
cell occupancy against prod's cap = 2*ceil(N/n_cells) with and without
the cap applied.

Corpus: 100 Gaussian clusters (dim 64, noise 0.1 — same regime as the
recall probe's mixture) whose sizes follow p_j proportional to 1/(j+1):
the top cluster holds ~19% of all mass, ~48x the uniform share, so the
pre-cap residence argmax concentrates hard and the cap has real work to
do. N = 20_000 and 200_000 (10x).

Usage:
    python scripts/clustered_slope_probe.py           # generate + probe
    python scripts/clustered_slope_probe.py --regen   # force regeneration
Records under BENCH_DETAIL.json["clustered_slope_probe"].
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_DIR = "/tmp/cta_skewmix_20k"
BIG_DIR = "/tmp/cta_skewmix_200k"
N_BASE = 20_000
SCALE = 10
DIM = 64
N_CLUSTERS = 100
NOISE = 0.1
SEED = 4242
QUERIES = ["ext_knn_graph_prod", "ext_knn_graph_ivf_multi"]

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")


def _gen_corpus(spark, dirname: str, n: int, regen: bool) -> None:
    import shutil

    import numpy as np

    dest = os.path.join(dirname, "embeddings.parquet")
    if os.path.exists(dest) and not regen:
        return
    shutil.rmtree(dirname, ignore_errors=True)
    os.makedirs(dirname, exist_ok=True)
    rng = np.random.default_rng(SEED)
    mu = rng.standard_normal((N_CLUSTERS, DIM))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    # Zipf cluster mass: p_j ~ 1/(j+1). Top cluster ~ H_100^-1 ~ 0.193.
    w = 1.0 / (np.arange(N_CLUSTERS) + 1.0)
    w /= w.sum()
    lab = rng.choice(N_CLUSTERS, size=n, p=w)
    v = mu[lab] + NOISE * rng.standard_normal((n, DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    rows = [
        (int(i), [float(x) for x in v[i]], int(lab[i] % 10)) for i in range(n)
    ]
    spark.createDataFrame(rows, schema).repartition(8).write.parquet(dest)
    top = int(np.bincount(lab, minlength=N_CLUSTERS).max())
    print(f"# generated skew corpus {dirname}: N={n}, top cluster {top} rows "
          f"({top / n:.1%} of mass)", file=sys.stderr)


def _time(spark, fn, sf_dir: str, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        sec = time.perf_counter() - t0
        best = sec if best is None or sec < best else best
    return round(best, 3)


def _occupancy(spark, sf_dir: str) -> dict:
    """Max probe-1 cell occupancy with prod's knobs (llm.py
    ext_knn_graph_prod: n_cells=max(8,ceil(N/250)),
    n_coarse=max(2,min(n_cells-1,ceil(sqrt(n_cells)))),
    cap=2*ceil(N/n_cells), nprobe=2, n_branches=4), capped vs uncapped."""
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import (
        ivf_assign_sharded_multi,
    )

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells = max(8, math.ceil(n / 250))
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    cap = 2 * math.ceil(n / n_cells)
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    out = {"n": n, "n_cells": n_cells, "n_coarse": n_coarse, "cap": cap}
    for key, rc in (("capped", cap), ("uncapped", None)):
        asg = ivf_assign_sharded_multi(
            emb, centroids, n_coarse, 2, residence_cap=rc, n_branches=4
        )
        occ = (
            asg.filter(F.col("probe") == 1)
            .groupBy("cell")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        out[f"max_cell_{key}"] = int(occ)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.plans import registry
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-clustered-slope")
    _gen_corpus(spark, BASE_DIR, N_BASE, args.regen)
    _gen_corpus(spark, BIG_DIR, N_BASE * SCALE, args.regen)
    for d in (BASE_DIR, BIG_DIR):
        load(spark, d, "embeddings").count()  # warm footers

    queries = registry.all_queries()
    probe: dict[str, dict] = {}
    for name in QUERIES:
        fn = queries[name]
        s_base = _time(spark, fn, BASE_DIR, args.runs)
        s_big = _time(spark, fn, BIG_DIR, args.runs)
        ratio = round(s_big / s_base, 2) if s_base > 0 else None
        probe[name] = {
            "n20k_sec": s_base, "n200k_sec": s_big, "ratio": ratio,
        }
        print(f"# {name}: 20k={s_base}s 200k={s_big}s ratio={ratio}",
              file=sys.stderr)

    occ = {"n20k": _occupancy(spark, BASE_DIR),
           "n200k": _occupancy(spark, BIG_DIR)}
    for k, o in occ.items():
        print(f"# occupancy {k}: cap={o['cap']} max_capped="
              f"{o['max_cell_capped']} max_uncapped={o['max_cell_uncapped']}",
              file=sys.stderr)

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    detail["clustered_slope_probe"] = {
        "dataset": (
            f"{N_CLUSTERS} Gaussian clusters dim {DIM} noise {NOISE}, "
            f"Zipf cluster mass (top ~19%), N={N_BASE} and {N_BASE * SCALE}"
        ),
        "queries": probe,
        "occupancy": occ,
    }
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"clustered_slope_probe": detail["clustered_slope_probe"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
