"""Recall probe on a NON-CLUSTERED corpus (round-12, r11 verdict #3).

The sf1 probe corpus (/tmp/cta_sf1) is built from sign-modulated copies
of sf0.1 — copies of a vector are ~orthogonal, which keeps LSH/IVF cost
growth honest, but it also makes every vector's true neighbors live in
its own copy's sub-corpus, where the quantizer separates them easily:
the ≈1.0 recall r11 recorded at sf1 is partly an artifact of that
construction. This probe builds a UNIFORM corpus of the same size
(20 000 unit vectors, dim 64, seeded — the honest worst case: all
cosines concentrate near 0, cells carve the sphere arbitrarily) and
records what the corpus-adaptive cell count (⌈N/250⌉ → 80 cells here)
actually costs in recall at nprobe 1 and 2, for:

- the flat IVF graph build (ext_knn_graph_recall, nprobe 1 row),
- the multi-probe graph build (same query, nprobe 2 row),
- the production composition ext_knn_graph_prod (sharded tree,
  nprobe 2, residence cap) — edge recall vs the exact top-3 graph of
  the 50 smallest-id seeds, computed here brute-force,
- similarity search recall@10 (ext_sim_recall, nprobe 1).

Results land in BENCH_DETAIL.json["recall_uniform"] (merged, same
carry-forward contract as the other probe sections) and print as a
table for PLANS.md. The same metrics are re-run on /tmp/cta_sf1 for the
clustered-vs-uniform contrast line.

Usage: python scripts/recall_probe.py [--regen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

UNIFORM_DIR = "/tmp/cta_sf1_uniform"
COPY_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/cta_sf1")
N_VECS = 20_000
DIM = 64
SEED = 1234
N_SEEDS = 50  # ext_knn_graph_recall's seed-sample size

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")


def generate(spark, regen: bool = False) -> None:
    dest = os.path.join(UNIFORM_DIR, "embeddings.parquet")
    if os.path.exists(dest) and not regen:
        return
    import shutil

    import numpy as np

    shutil.rmtree(UNIFORM_DIR, ignore_errors=True)
    os.makedirs(UNIFORM_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    v = rng.standard_normal((N_VECS, DIM)).astype("float32")
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [
        (int(i), [float(x) for x in v[i]], int(i % 10)) for i in range(N_VECS)
    ]
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
    spark.createDataFrame(rows, schema).repartition(8).write.parquet(dest)
    print(f"# generated uniform corpus: {N_VECS} x {DIM}", file=sys.stderr)


def graph_recall(spark, sf_dir: str) -> dict[int, float]:
    """Mean per-seed edge recall@3 from ext_knn_graph_recall, per nprobe."""
    from cta_train_tracker_analytics_spark.plans import registry

    rows = registry.all_queries()["ext_knn_graph_recall"](spark, sf_dir).collect()
    agg: dict[int, list[float]] = {}
    for r in rows:
        agg.setdefault(r["nprobe"], []).append(r["recall"])
    return {k: round(sum(v) / len(v), 4) for k, v in sorted(agg.items())}


def sim_recall(spark, sf_dir: str) -> float:
    """Mean recall@10 of IVF search (nprobe 1) from ext_sim_recall."""
    from cta_train_tracker_analytics_spark.plans import registry

    rows = registry.all_queries()["ext_sim_recall"](spark, sf_dir).collect()
    return round(sum(r["recall"] for r in rows) / len(rows), 4)


def prod_edge_recall(spark, sf_dir: str) -> float:
    """Edge recall@3 of ext_knn_graph_prod vs the exact graph, over the
    50 smallest-id seeds (the same seed rule the recall query uses)."""
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import dot, norm
    from cta_train_tracker_analytics_spark.plans import registry

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    seeds = emb.orderBy("vec_id").limit(N_SEEDS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cand = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    scored = (
        cand.crossJoin(F.broadcast(seeds))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            (
                dot(F.col("qe"), F.col("ce"))
                / (norm(F.col("qe")) * norm(F.col("ce")))
            ).alias("cs"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cs").desc(), "cid")
    exact = {
        (r["qid"], r["cid"])
        for r in scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    seed_ids = {q for q, _ in exact}
    got = {
        (r["vec_id"], r["neighbor_id"])
        for r in registry.all_queries()["ext_knn_graph_prod"](spark, sf_dir)
        .filter(F.col("vec_id").isin(list(seed_ids)))
        .collect()
    }
    return round(len(exact & got) / len(exact), 4)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-recall-probe")
    generate(spark, regen=args.regen)

    record: dict[str, dict] = {}
    for label, d in (("uniform", UNIFORM_DIR), ("clustered_copies", COPY_DIR)):
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            print(f"# skipping {label}: {d} absent", file=sys.stderr)
            continue
        g = graph_recall(spark, d)
        s = sim_recall(spark, d)
        p = prod_edge_recall(spark, d)
        record[label] = {
            "graph_recall_at3_nprobe1": g.get(1),
            "graph_recall_at3_nprobe2": g.get(2),
            "sim_recall_at10_nprobe1": s,
            "prod_edge_recall_at3": p,
        }
        print(f"# {label}: graph@3 np1={g.get(1)} np2={g.get(2)} "
              f"sim@10 np1={s} prod@3={p}", file=sys.stderr)

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    prior = detail.get("recall_uniform", {})
    detail["recall_uniform"] = {
        **prior,
        "dataset": {
            "uniform": f"{N_VECS} seeded unit vectors, dim {DIM}, "
                       f"cells=ceil(N/250)=80",
            "clustered_copies": "the sf1 probe corpus (sign-modulated copies)",
        },
        **record,
    }
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"recall_uniform": record}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
