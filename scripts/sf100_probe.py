"""sf100 scale probe (round-17): a THIRD measured decade for the
production-path queries.

The sf1 ledger (250 queries) and sf10 ledger (107 queries) measure the
first two decades; the 100 TB claims ride on the PRODUCTION family —
two-level ANN (prod/hier/sharded), PQ/ADC search, two-stage minhash
dedup, the corpus-prep job, DSIR — whose measured slopes are 2.2–7.5×
per decade. This probe measures them across a third decade
(sf10 → sf100: documents 500k → 5M, embeddings 200k → 2M, customer
1.5M → 15M), where the corpus-adaptive knobs move again (k = ⌈N/250⌉
reaches 8000 cells at 2M vectors) and any hidden quadratic would be
~100× louder than at sf10.

Dataset: /tmp/cta_sf100 = 10 key-shifted copies of the synthesized sf10
dataset, restricted to the TABLES the probed family loads (documents,
embeddings, customer — generating 600M lineitem rows for queries that
never read them would burn disk and minutes for nothing; the
restriction is recorded in the dataset record). Third-decade
pathology safeguards, same pattern as sf10:

- keys shift by i * 10^14 per copy — sf10 keys reach ~9.1e12, so 10^14
  leaves an order of headroom and stays far under 2^63.
- documents get a third per-copy token prefix (namespace ``e{i}z``,
  distinct from sf1's ``c{i}x`` and sf10's ``d{i}y``): the 1000× corpus
  still contains no cross-copy near-duplicates, so shingle/minhash
  candidate volume keeps growing linearly in the data.
- embeddings get a third deterministic sign modulation with fresh phase
  constants: copies-of-copies-of-copies stay ~orthogonal pairwise, so
  IVF/LSH occupancy scales like a genuinely larger corpus.

Also records the ADAPTIVE spatial join's candidate structure at sf100
(two aggregates, not the 420B-output-row join): the coordinate lattice
still has 480 positions at 15M points, so the distance-kernel candidate
volume stays EXACTLY 7776 across all three decades while the flat
grid's grows as 9N²/288 (~7×10¹² here).

Records BENCH_DETAIL["sf100_probe"] (bench.py-foreign, carried forward).

Usage:
    python scripts/sf100_probe.py                  # generate + default set
    python scripts/sf100_probe.py --queries a,b --runs 1
    python scripts/sf100_probe.py --regen
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import sf1_probe
import sf10_probe

SF100_DIR = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/cta_sf100")
COPIES = 10
OFFSET = 100_000_000_000_000  # 10^14: sf10 keys reach ~9.1e12
SUPERLINEAR_RATIO = 15.0

#: only the tables the probed production family loads (see module doc)
TABLES_SUBSET = ["customer", "documents", "embeddings"]

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL_PATH = os.path.join(REPO_ROOT, "BENCH_DETAIL.json")

#: the production family: every member's docstring claims a linear-ish
#: decade; sf100 is where a hidden quadratic would be unmissable. The
#: heavy graph builds (prod/hier/sharded knn, ~10–15 min/run here) are
#: represented by ext_knn_graph_prod via --queries/--runs on a second
#: invocation rather than bundled into the default set.
DEFAULT_QUERIES = [
    "ext_sim_search_ivf_sharded",
    "ext_sim_search_ivf_3level",
    "ext_sim_search_pq_rerank",
    "ext_sim_search_pq",
    "ext_dedup_minhash_twostage",
    "job_prep_training_corpus",
    "ext_dsir_weights",
    "ext_dedup_cluster_lsss",
    "ext_bpe_merges",
    # r17 verdict #6: the next tier of >2 s-at-sf10 document-pipeline
    # queries over the probe's table subset
    "ext_dedup_minhash",
    "ext_decontaminate",
    "ext_lm_perplexity",
]


def _copy_variant(df, table: str, i: int):
    out = df
    for k in sf1_probe._SHIFT.get(table, []):
        out = out.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("bigint"))
    if table == "documents" and i > 0:
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"e{i}z"), w),
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
                        F.sin(j.cast("double") * 43.777 + F.lit(float(i)) * 47.093)
                        > 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                ).cast("float"),
            ),
        )
    return out


def generate(spark, regen: bool = False) -> dict[str, int]:
    from cta_train_tracker_analytics_spark.data import load

    sf10_probe.generate(spark)  # source dataset, cached by its marker
    marker = os.path.join(SF100_DIR, "_GENERATED.json")
    if os.path.exists(marker) and not regen:
        with open(marker) as f:
            return json.load(f)
    shutil.rmtree(SF100_DIR, ignore_errors=True)
    os.makedirs(SF100_DIR, exist_ok=True)
    rows: dict[str, int] = {}
    for t in TABLES_SUBSET:
        src = load(spark, sf10_probe.SF10_DIR, t)
        scaled = _copy_variant(src, t, 0)
        for i in range(1, COPIES):
            scaled = scaled.unionByName(_copy_variant(src, t, i))
        dest = os.path.join(SF100_DIR, f"{t}.parquet")
        parts = 64
        scaled.repartition(parts).write.mode("overwrite").parquet(dest)
        rows[t] = spark.read.parquet(dest).count()
        print(f"# generated sf100 {t}: {rows[t]} rows", file=sys.stderr)
    with open(marker, "w") as f:
        json.dump(rows, f)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--queries", default="", help="comma-separated override")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-spatial-structure", action="store_true")
    args = ap.parse_args()

    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.plans import registry
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-sf100-probe")
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

    for t in TABLES_SUBSET:  # warmup both scales
        load(spark, sf10_probe.SF10_DIR, t).count()
        load(spark, SF100_DIR, t).count()

    with open(DETAIL_PATH) as f:
        detail = json.load(f)
    prior = detail.get("sf100_probe", {})
    sf10_rows = detail.get("sf10_probe", {}).get("queries", {})

    probe: dict[str, dict] = {}
    superlinear: list[str] = []
    failed: list[str] = []
    for name in names:
        fn = queries[name]
        try:
            s100 = sf1_probe._time(spark, fn, SF100_DIR, args.runs)
        except Exception as e:  # a third-decade failure IS the finding:
            # record it against the query instead of losing the whole run.
            # Failures are ledgered under their OWN key (ADVICE r17) —
            # a transient OOM/env failure is not an adjudicated slope.
            msg = str(e).split("\n")[0][:300]
            probe[name] = {"sf100_error": msg, "runs": args.runs}
            failed.append(name)
            print(f"# {name}: sf100 FAILED: {msg}", file=sys.stderr)
            continue
        # reuse the ledgered sf10 wall when available (same protocol)
        # instead of re-burning two sf10 runs per query
        s10 = (sf10_rows.get(name) or {}).get("sf10_sec")
        if s10 is None:
            s10 = sf1_probe._time(spark, fn, sf10_probe.SF10_DIR, args.runs)
        ratio = round(s100 / s10, 2) if s10 else None
        probe[name] = {"sf10_sec": s10, "sf100_sec": s100, "ratio": ratio,
                       "runs": args.runs}
        flag = ""
        if ratio is not None and ratio > SUPERLINEAR_RATIO:
            superlinear.append(name)
            flag = "  <-- SUPERLINEAR"
        print(f"# {name}: sf10={s10}s sf100={s100}s ratio={ratio}{flag}",
              file=sys.stderr)

    spatial = prior.get("spatial_grid_structure")
    if not args.skip_spatial_structure and spatial is None:
        import second_decade_probe

        spatial = second_decade_probe.spatial_grid_structure(spark, SF100_DIR)
        print(f"# spatial structure sf100: {spatial}", file=sys.stderr)

    detail["sf100_probe"] = {
        "dataset": {
            "dir": SF100_DIR,
            "construction": f"{COPIES} key-shifted copies of the synthesized "
                            "sf10 (third-namespace token prefixes e{i}z, "
                            "third-phase sign-modulated embeddings), "
                            "RESTRICTED to the tables the production family "
                            "loads",
            "tables": TABLES_SUBSET,
            "rows": rows,
        },
        "method": "min of per-row `runs` per scale, one warmed session; "
                  "sf10 side reused from the sf10_probe ledger when present",
        "superlinear_threshold": SUPERLINEAR_RATIO,
        "queries": {**prior.get("queries", {}), **probe},
        "superlinear": sorted(
            (set(prior.get("superlinear", [])) - set(probe)) | set(superlinear)
        ),
        "failed": sorted(
            (set(prior.get("failed", [])) - set(probe)) | set(failed)
        ),
        "spatial_grid_structure": spatial,
    }
    with open(DETAIL_PATH, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"sf100_probe": {"n": len(probe),
                                      "superlinear": superlinear,
                                      "failed": failed}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
