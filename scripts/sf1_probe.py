"""sf1 scale probe (round-9): measure the 10× scaling slope of the
headline-slowest queries.

The 100 TB claims in the plan docstrings are design arguments; this
script turns them into measured slopes. It synthesizes an sf1-sized
dataset as 10 key-shifted copies of the read-only sf0.1 tables (the
driver's testdata is never modified), re-times the N slowest headline
queries at BOTH scales in one session, and records sec-per-query plus
the sf1/sf0.1 ratio under BENCH_DETAIL.json["sf1_probe"]. A ratio ≈ 10
is linear scaling; anything > SUPERLINEAR_RATIO is flagged for a
follow-up plan audit.

Copy construction preserves workload SHAPE, not just row count:
- All keys (and their foreign-key references) shift by i·10^10 per copy,
  so join fan-outs, group cardinalities and per-key distributions are
  exactly 10× the originals.
- documents.text gets a per-copy token prefix (every word), so copies
  are NOT near-duplicates of each other: shingle/minhash pipelines see a
  10×-larger corpus with the same intra-corpus similarity structure. A
  verbatim 10× copy would instead make every doc a 10-way near-dup
  cluster — candidate pairs would grow quadratically IN THE DATA and the
  probe would report engine superlinearity that is actually corpus
  pathology.
- embeddings get a deterministic per-(copy, component) sign modulation:
  copies of a vector are ~orthogonal, so ANN/LSH bucket occupancy grows
  ~linearly instead of stacking 10 identical vectors in every bucket.
- region/nation are fixed-size dimensions and copy through unchanged.

Usage:
    python scripts/sf1_probe.py                 # generate (if absent) + probe
    python scripts/sf1_probe.py --regen         # force regeneration
    python scripts/sf1_probe.py --top 15        # how many slowest queries
    python scripts/sf1_probe.py --queries a,b   # explicit list instead
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/cta_sf1")
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
OFFSET = 10_000_000_000  # per-copy key shift; far above any sf0.1 key
SUPERLINEAR_RATIO = 15.0

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")

#: key columns shifted per copy (FK references shift with their PKs)
_SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_PASSTHROUGH = ["region", "nation"]


def _copy_variant(df, table: str, i: int):
    out = df
    for k in _SHIFT.get(table, []):
        out = out.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("bigint"))
    if table == "documents" and i > 0:
        # prefix EVERY token: shingles/minhashes of different copies share
        # nothing, so the corpus is 10× larger, not 10× duplicated
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"c{i}x"), w),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings" and i > 0:
        # deterministic pseudo-random sign per (copy, component): copies of
        # the same vector become ~orthogonal (random-sign inner product
        # concentrates near 0), mimicking a genuinely larger corpus
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x
                    * F.when(
                        F.sin(j.cast("double") * 12.9898 + F.lit(float(i)) * 78.233)
                        > 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                ).cast("float"),
            ),
        )
    return out


def generate(spark, regen: bool = False) -> dict[str, int]:
    from cta_train_tracker_analytics_spark.data import TABLES, load

    marker = os.path.join(SF1_DIR, "_GENERATED.json")
    if os.path.exists(marker) and not regen:
        with open(marker) as f:
            return json.load(f)
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    os.makedirs(SF1_DIR, exist_ok=True)
    rows: dict[str, int] = {}
    for t in TABLES:
        src = load(spark, SRC_DIR, t)
        if t in _PASSTHROUGH:
            scaled = src
        else:
            scaled = _copy_variant(src, t, 0)
            for i in range(1, COPIES):
                scaled = scaled.unionByName(_copy_variant(src, t, i))
        dest = os.path.join(SF1_DIR, f"{t}.parquet")
        # keep file counts reasonable: ~32 output files for the big facts
        parts = 32 if t in ("lineitem", "orders", "events") else 8
        scaled.repartition(parts).write.mode("overwrite").parquet(dest)
        rows[t] = spark.read.parquet(dest).count()
        print(f"# generated {t}: {rows[t]} rows", file=sys.stderr)
    with open(marker, "w") as f:
        json.dump(rows, f)
    return rows


def slowest_headline(top: int) -> list[str]:
    import bench

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    q = {k: v for k, v in detail.get("queries", {}).items() if k in bench.HEADLINE}
    return [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:top]]


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


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--queries", default="", help="comma-separated override")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from cta_train_tracker_analytics_spark.plans import registry
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-sf1-probe")
    rows = generate(spark, regen=args.regen)

    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else slowest_headline(args.top)
    )
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warmup both datasets (footer reads, codegen)
    from cta_train_tracker_analytics_spark.data import TABLES, load

    for t in TABLES:
        load(spark, SRC_DIR, t).count()
        load(spark, SF1_DIR, t).count()

    probe: dict[str, dict] = {}
    superlinear: list[str] = []
    for name in names:
        fn = queries[name]
        s01 = _time(spark, fn, SRC_DIR, args.runs)
        s1 = _time(spark, fn, SF1_DIR, args.runs)
        ratio = round(s1 / s01, 2) if s01 > 0 else None
        probe[name] = {"sf0_1_sec": s01, "sf1_sec": s1, "ratio": ratio}
        flag = ""
        if ratio is not None and ratio > SUPERLINEAR_RATIO:
            superlinear.append(name)
            flag = "  <-- SUPERLINEAR"
        print(f"# {name}: sf0.1={s01}s sf1={s1}s ratio={ratio}{flag}",
              file=sys.stderr)

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    # MERGE into any prior probe record: a targeted --queries run must not
    # clobber the full sweep's evidence (same rule bench.py follows for
    # its own sections of this file)
    prior_probe = detail.get("sf1_probe", {})
    merged_queries = {**prior_probe.get("queries", {}), **probe}
    merged_superlinear = sorted(
        (set(prior_probe.get("superlinear", [])) - set(probe)) | set(superlinear)
    )
    detail["sf1_probe"] = {
        "dataset": {
            "dir": SF1_DIR,
            "construction": f"{COPIES} key-shifted copies of sf0.1 "
                            "(token-prefixed docs, sign-modulated embeddings)",
            "rows": rows,
        },
        "method": f"min of {args.runs} runs per scale, one warmed session",
        "superlinear_threshold": SUPERLINEAR_RATIO,
        "queries": merged_queries,
        "superlinear": merged_superlinear,
    }
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"sf1_probe": {"n": len(probe), "superlinear": superlinear}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
