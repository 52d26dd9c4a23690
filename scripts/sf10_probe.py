"""sf10 scale probe (round-15): extend the slope ledger to TWO decades.

The sf1 probe (scripts/sf1_probe.py) measures the 10x slope sf0.1->sf1
for every registered query; its docstring claims — and the plan
docstrings argue — that the measured linearity extrapolates. But
superlinear effects often appear only past the first decade (candidate
sets crossing block-size knees, AQE coalescing regime changes, broadcast
thresholds, in-memory->spill transitions). This probe measures the
SECOND decade, sf1 -> sf10, for the most expensive headline queries —
the ANN/graph/dedup family whose 100 TB story matters most.

Dataset: /tmp/cta_sf10 = 10 key-shifted copies of the synthesized sf1
dataset (which is itself 10 shape-preserving copies of the read-only
sf0.1 testdata), with the same corpus-pathology safeguards:

- keys shift by i * 10^12 per copy — sf1 keys occupy [0, ~9.1e10], so
  the sf1 probe's 10^10 offset would COLLIDE at this level; 10^12
  leaves three orders of headroom and stays far under 2^63.
- documents get a second per-copy token prefix (namespace ``d{i}y``,
  distinct from sf1's ``c{i}x``), so the 100x corpus still contains no
  cross-copy near-duplicates and shingle/minhash candidate volume grows
  linearly in the data, not quadratically in the copies.
- embeddings get a second deterministic sign modulation with a
  different phase constant: copies of copies stay ~orthogonal pairwise
  (random-sign inner products concentrate near 0), so LSH/IVF bucket
  occupancy scales like a genuinely larger corpus.

Records BENCH_DETAIL["sf10_probe"] (a bench.py-foreign section, carried
forward by every bench run). A ratio ~= 10 over sf1 is linear; anything
past SUPERLINEAR_RATIO flags for a plan audit.

Usage:
    python scripts/sf10_probe.py                # generate + probe top set
    python scripts/sf10_probe.py --queries a,b  # explicit list
    python scripts/sf10_probe.py --regen        # force regeneration
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import sf1_probe

SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/cta_sf10")
COPIES = 10
OFFSET = 1_000_000_000_000  # 10^12: sf1 keys reach ~9.1e10, sf0.1 offset
                            # was 10^10 — reusing it here would collide
SUPERLINEAR_RATIO = 15.0

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")

#: default probe set: the perennial top of the closing-bench table — the
#: ANN graph/search family, the heavy dedup pipelines, and the corpus
#: prep job. These are the queries whose plans the 100 TB claims are
#: really about; the cheap tail's second decade adds nothing the first
#: decade's fixed-overhead-dominated slopes didn't already show.
DEFAULT_QUERIES = [
    "ext_knn_graph_prod",
    "ext_knn_graph_ivf_hier",
    "ext_knn_graph_ivf_sharded",
    "ext_knn_graph_ivf_multi",
    "ext_sim_search_pq_rerank",
    "ext_sim_search_pq",
    "job_prep_training_corpus",
    "ext_tfidf_cosine_pairs",
    "ext_dedup_minhash_twostage",
    "ext_dedup_embed_banded",
]


def _copy_variant(df, table: str, i: int):
    """sf1's shape-preserving mutations, re-parameterized for the second
    decade (wider key offset, distinct doc-token namespace, different
    sign-modulation phase)."""
    out = df
    for k in sf1_probe._SHIFT.get(table, []):
        out = out.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("bigint"))
    if table == "documents" and i > 0:
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"d{i}y"), w),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings" and i > 0:
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x
                    * F.when(
                        F.sin(j.cast("double") * 37.719 + F.lit(float(i)) * 41.113)
                        > 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                ).cast("float"),
            ),
        )
    return out


def generate(spark, regen: bool = False) -> dict[str, int]:
    from cta_train_tracker_analytics_spark.data import TABLES, load

    sf1_probe.generate(spark)  # source dataset, cached by its marker
    marker = os.path.join(SF10_DIR, "_GENERATED.json")
    if os.path.exists(marker) and not regen:
        with open(marker) as f:
            return json.load(f)
    shutil.rmtree(SF10_DIR, ignore_errors=True)
    os.makedirs(SF10_DIR, exist_ok=True)
    rows: dict[str, int] = {}
    for t in TABLES:
        src = load(spark, sf1_probe.SF1_DIR, t)
        if t in sf1_probe._PASSTHROUGH:
            scaled = src
        else:
            scaled = _copy_variant(src, t, 0)
            for i in range(1, COPIES):
                scaled = scaled.unionByName(_copy_variant(src, t, i))
        dest = os.path.join(SF10_DIR, f"{t}.parquet")
        parts = 64 if t in ("lineitem", "orders", "events") else 16
        scaled.repartition(parts).write.mode("overwrite").parquet(dest)
        rows[t] = spark.read.parquet(dest).count()
        print(f"# generated sf10 {t}: {rows[t]} rows", file=sys.stderr)
    with open(marker, "w") as f:
        json.dump(rows, f)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--queries", default="", help="comma-separated override")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from cta_train_tracker_analytics_spark.data import TABLES, load
    from cta_train_tracker_analytics_spark.plans import registry
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-sf10-probe")
    rows = generate(spark, regen=args.regen)

    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else DEFAULT_QUERIES
    )
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    for t in TABLES:  # warmup both scales
        load(spark, sf1_probe.SF1_DIR, t).count()
        load(spark, SF10_DIR, t).count()

    probe: dict[str, dict] = {}
    superlinear: list[str] = []
    for name in names:
        fn = queries[name]
        s1 = sf1_probe._time(spark, fn, sf1_probe.SF1_DIR, args.runs)
        s10 = sf1_probe._time(spark, fn, SF10_DIR, args.runs)
        ratio = round(s10 / s1, 2) if s1 > 0 else None
        probe[name] = {"sf1_sec": s1, "sf10_sec": s10, "ratio": ratio,
                       "runs": args.runs}
        flag = ""
        if ratio is not None and ratio > SUPERLINEAR_RATIO:
            superlinear.append(name)
            flag = "  <-- SUPERLINEAR"
        print(f"# {name}: sf1={s1}s sf10={s10}s ratio={ratio}{flag}",
              file=sys.stderr)

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    prior = detail.get("sf10_probe", {})
    detail["sf10_probe"] = {
        "dataset": {
            "dir": SF10_DIR,
            "construction": f"{COPIES} key-shifted copies of the synthesized "
                            "sf1 (second-namespace token prefixes, "
                            "re-phased sign-modulated embeddings)",
            "rows": rows,
        },
        "method": "min of per-row `runs` per scale, one warmed session "
                  "(rows without a runs field predate the r16 annotation "
                  "and used 2)",
        "superlinear_threshold": SUPERLINEAR_RATIO,
        "queries": {**prior.get("queries", {}), **probe},
        "superlinear": sorted(
            (set(prior.get("superlinear", [])) - set(probe)) | set(superlinear)
        ),
    }
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"sf10_probe": {"n": len(probe),
                                     "superlinear": superlinear}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
