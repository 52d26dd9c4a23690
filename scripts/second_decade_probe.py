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

Extended r16 (r15 verdict #4): the probe now emits a record for EVERY
decomposed query — the two measured structure probes above PLUS the
full flat-assign class ledger (hard_negatives, knn_graph, knn_graph_ivf,
sim_search_ivf, sim_search_ivf_nprobe: analytic fold model n·k =
n²/250 joined with the measured sf10_probe walls and a per-query cause
attribution) — and MERGES the section into BENCH_DETAIL.json itself,
so the records survive bench merges instead of living in PLANS.md
prose. The expensive measured probes (banded bucket structure,
ivf_multi assignment wall) are carried forward from the existing
section when present; pass --remeasure to re-run them (needs the
/tmp/cta_sf1 + /tmp/cta_sf10 datasets).

Usage: python scripts/second_decade_probe.py [--remeasure] [--no-write]
Prints the section as one JSON line and (unless --no-write) merges it
into BENCH_DETAIL.json under "second_decade_probe".
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


#: Per-query cause attribution for every sf10-probe superlinear
#: (PLANS.md round-15, batches 1-5 — carried here so the records survive
#: bench merges). The flat-assign members share the analytic fold model
#: computed in flat_assign_ledger(); banded and ivf_multi additionally
#: carry the MEASURED structure probes above.
FLAT_ASSIGN_CAUSES = {
    "ext_knn_graph_ivf": (
        "flat broadcast-argmax assignment: O(N·k)=O(N²/250) interpreted "
        "folds once k tracks N; join stays linear (|cell|≈250). "
        "Two-level family (hier/sharded/prod, 6.4-7.5x same decade) "
        "replaces exactly this stage."
    ),
    "ext_knn_graph_ivf_multi": (
        "same flat assignment at nprobe=2; the measured ivf_multi record "
        "decomposes the assignment stage to 88% of sf10 wall "
        "(263.8 of 300.8 s)."
    ),
    "ext_knn_graph": (
        "flat assignment (pinned via localCheckpoint since r11 — no "
        "re-evaluation factor remains); quadratic is intrinsic to "
        "single-level assignment. Label×cell block join is linear."
    ),
    "ext_hard_negatives": (
        "flat assignment, pinned; mildest of the class (17.9x) because "
        "the label-mismatch residual filter trims in-cell pairs while "
        "the assignment quadratic dominates."
    ),
    "ext_sim_search_ivf": (
        "flat assignment; wall is POST ivf_topk adaptive-pin fix "
        "(51.0x unpinned -> 27.8x pinned, r15 A/B 218 vs 75 s at "
        "200k×800) — remaining slope is the intrinsic fold growth."
    ),
    "ext_sim_search_ivf_nprobe": (
        "flat assignment at nprobe=2, post pin fix (88.1x -> 31.8x); "
        "query-side probe expansion adds broadcast rows only."
    ),
    "ext_dedup_embed_banded": (
        "candidate volume, not assignment: rows x10 × tables x1.6 "
        "(adaptive planes) × occupancy x1.25 × bucket skew x1.34 — the "
        "measured banded record below; O(N log N) by design, priced in "
        "the operator docstring."
    ),
    "str_session_window": (
        "state-partition granularity, not plan (r17): the bounded-drain "
        "default STREAM_STATE_PARTITIONS=8 leaves ~1.25M rows/partition "
        "at sf10 and the per-partition session merge crosses its "
        "in-memory knee (15.47x). Measured counterfactual at 32 "
        "partitions, same code: sf10 43.1 s, ratio 6.6 — the linear "
        "class. This IS the deployment knob the pipelines.py docstring "
        "documents (size state partitions to peak state volume before "
        "first start); 8 remains the right default at the verified SFs "
        "(sf1: 3.97 s at 8 vs 6.52 s at 32)."
    ),
}

#: members whose record is a measured-volume story, not the N·k fold model
_NO_FOLD_MODEL = {"ext_dedup_embed_banded", "str_session_window"}


def spatial_grid_structure(spark, sf_dir: str) -> dict:
    """Candidate-volume decomposition for join_spatial_grid WITHOUT
    running the join (its sf10 run is ~42 min): candidates per cell =
    left 3×3 replicas × right residents, so total candidates =
    Σ_cell 9·|cell|² over home cells — two cheap aggregates. The demo
    extent is FIXED (lat∈[-6,6), lon∈[-12,12): 288 one-degree cells),
    so key-shifted scale copies densify the same cells and candidate
    volume grows as 9N²/288 — quadratic by dataset construction, the
    exact 'urban density' hazard the operator docstring prices with
    finer cells."""
    from cta_train_tracker_analytics_spark.data import load

    pts = load(spark, sf_dir, "customer").select(
        (((F.col("c_custkey") * 37) % 240) / 20.0 - 6.0).alias("lat"),
        (((F.col("c_custkey") * 73) % 480) / 20.0 - 12.0).alias("lon"),
    ).select(
        "lat", "lon", F.floor("lat").alias("clat"), F.floor("lon").alias("clon")
    )
    occ = pts.groupBy("clat", "clon").count()
    row = occ.agg(
        F.count("*").alias("cells"),
        F.sum("count").alias("n"),
        F.max("count").alias("max_cell"),
        F.sum(F.col("count") * F.col("count") * 9).alias("candidates"),
    ).collect()[0]
    # the r17 ADAPTIVE variant's decomposition: the coordinate dictionary
    # bounds the distance-kernel candidate volume by DISTINCT-position
    # occupancy (Σ_cell 9·|positions|²), while the expansion emits exactly
    # the output rows (Σ_same C(n,2) + Σ_cross n_a·n_b) — computed here
    # algebraically from position occupancies, no join run.
    pos = pts.groupBy("lat", "lon", "clat", "clon").agg(
        F.count(F.lit(1)).alias("occ")
    )
    arow = (
        pos.groupBy("clat", "clon")
        .agg(F.count(F.lit(1)).alias("p"))
        .agg(
            F.count("*").alias("cells"),
            F.sum("p").alias("positions"),
            F.max("p").alias("max_pos_cell"),
            F.sum(F.col("p") * F.col("p") * 9).alias("cand"),
        )
        .collect()[0]
    )
    same = pos.agg(
        F.sum(F.col("occ") * (F.col("occ") - 1) / 2).alias("pairs")
    ).collect()[0]["pairs"]
    lex_lt = (F.col("a.lat") < F.col("b.lat")) | (
        (F.col("a.lat") == F.col("b.lat")) & (F.col("a.lon") < F.col("b.lon"))
    )
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    dist = 2 * 6371.0 * F.asin(
        F.sqrt(
            F.pow(F.sin(dlat), 2)
            + F.cos(F.radians("a.lat")) * F.cos(F.radians("b.lat"))
            * F.pow(F.sin(dlon), 2)
        )
    )
    cross = (
        pos.alias("a")
        .join(pos.alias("b"), ["clat", "clon"], "inner")
        .filter(lex_lt & (dist <= 100.0))
        .agg(F.sum(F.col("a.occ") * F.col("b.occ")).alias("pairs"))
        .collect()[0]["pairs"]
    )  # same-cell cross pairs only — a lower bound is enough for the
    # ledger's order-of-magnitude output argument; the registered query
    # does the full 3×3 neighborhood.
    return {
        "n": int(row["n"]),
        "cells": int(row["cells"]),
        "max_cell": int(row["max_cell"]),
        "candidate_pairs_with_replication": int(row["candidates"]),
        "adaptive": {
            "positions": int(arow["positions"]),
            "max_pos_cell": int(arow["max_pos_cell"]),
            "candidate_pairs_with_replication": int(arow["cand"]),
            "output_rows_same_position": int(same),
            "output_rows_cross_same_cell_lb": int(cross),
        },
    }


def bpe_structure(spark, sf_dir: str) -> dict:
    """Volume decomposition for ext_bpe_merges (r16 verdict #3): token
    rows, pair rows (the dominant stream), pairs/token (= mean token
    length − 1 — the probe corpora LENGTHEN tokens with per-copy
    prefixes, so this is where the superlinear slope lives), and the
    distinct-pair vocabulary (must stay alphabet-bounded for the
    map-side collapse argument). Three aggregates, no full query run."""
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.functions.text import tokens

    t = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.length("tok") >= 2)
    )
    row = t.agg(
        F.count(F.lit(1)).alias("tokens"),
        F.sum(F.length("tok") - 1).alias("pair_rows"),
    ).collect()[0]
    pairs = t.select(
        "tok", F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i")
    ).select(F.expr("substring(tok, i, 2)").alias("pair"))
    vocab = pairs.agg(F.count_distinct("pair").alias("v")).collect()[0]["v"]
    return {
        "tokens": int(row["tokens"]),
        "pair_rows": int(row["pair_rows"]),
        "pairs_per_token": round(row["pair_rows"] / row["tokens"], 2),
        "distinct_pairs": int(vocab),
    }


def flat_assign_ledger(detail: dict) -> dict:
    """Analytic fold-model decomposition for every attributed superlinear,
    joined with the measured sf10_probe walls already in BENCH_DETAIL.
    Pure arithmetic — no Spark session needed."""
    probe = detail.get("sf10_probe", {})
    rows = probe.get("dataset", {}).get("rows", {})
    n10 = rows.get("embeddings", 200000)
    # read the sf1 row count from the sf1 probe's own dataset record —
    # deriving it as n10 // 10 would silently mis-model fold_ratio if the
    # probe datasets were ever regenerated at a different decade ratio
    # (ADVICE r16)
    n1 = (
        detail.get("sf1_probe", {})
        .get("dataset", {})
        .get("rows", {})
        .get("embeddings", n10 // 10)
    )
    k1, k10 = max(8, math.ceil(n1 / 250)), max(8, math.ceil(n10 / 250))
    ledger = {}
    for name, cause in FLAT_ASSIGN_CAUSES.items():
        wall = probe.get("queries", {}).get(name, {})
        rec = {"cause": cause, "wall_sf1_sec": wall.get("sf1_sec"),
               "wall_sf10_sec": wall.get("sf10_sec"),
               "wall_ratio": wall.get("ratio")}
        if name not in _NO_FOLD_MODEL:  # fold model applies
            rec["fold_model"] = {
                "sf1": {"n": n1, "n_cells": k1, "score_folds": n1 * k1},
                "sf10": {"n": n10, "n_cells": k10, "score_folds": n10 * k10},
                "fold_ratio": round((n10 * k10) / (n1 * k1), 1),
            }
        ledger[name] = rec
    return ledger


def merge_into_bench_detail(section: dict, detail_path: str) -> None:
    """Write the section under BENCH_DETAIL['second_decade_probe'] —
    bench.py carries foreign sections forward, so one write persists."""
    with open(detail_path) as f:
        detail = json.load(f)
    detail["second_decade_probe"] = section
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")


def measured_probes(remeasure: bool, prior: dict) -> dict:
    """The measured structure probes; carried from the prior section
    unless --remeasure (they need the sf1/sf10 datasets; banded +
    ivf_multi are the expensive ones, spatial_grid is two aggregates)."""
    spatial_current = "adaptive" in prior.get("spatial_grid", {}).get("sf1", {})
    if (
        not remeasure
        and spatial_current
        and {"banded", "ivf_multi", "spatial_grid", "bpe"} <= set(prior)
    ):
        return {
            k: prior[k] for k in ("banded", "ivf_multi", "spatial_grid", "bpe")
        }
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="cta-second-decade-probe")
    out: dict = {"banded": {}, "ivf_multi": {}, "spatial_grid": {}, "bpe": {}}
    reuse_heavy = not remeasure and {"banded", "ivf_multi"} <= set(prior)
    if reuse_heavy:
        out["banded"], out["ivf_multi"] = prior["banded"], prior["ivf_multi"]
    for label, d in (("sf1", sf1_probe.SF1_DIR), ("sf10", sf10_probe.SF10_DIR)):
        if not reuse_heavy:
            out["banded"][label] = banded_structure(spark, d)
            print(f"# banded {label}: {out['banded'][label]}", file=sys.stderr)
            out["ivf_multi"][label] = ivf_multi_assignment(spark, d)
            print(f"# ivf_multi {label}: {out['ivf_multi'][label]}",
                  file=sys.stderr)
        out["spatial_grid"][label] = spatial_grid_structure(spark, d)
        print(f"# spatial_grid {label}: {out['spatial_grid'][label]}",
              file=sys.stderr)
        out["bpe"][label] = bpe_structure(spark, d)
        print(f"# bpe {label}: {out['bpe'][label]}", file=sys.stderr)
    g1, g10 = out["spatial_grid"]["sf1"], out["spatial_grid"]["sf10"]
    out["spatial_grid"]["candidate_ratio"] = round(
        g10["candidate_pairs_with_replication"]
        / g1["candidate_pairs_with_replication"], 2,
    )
    out["spatial_grid"]["candidate_ratio_adaptive"] = round(
        g10["adaptive"]["candidate_pairs_with_replication"]
        / g1["adaptive"]["candidate_pairs_with_replication"], 2,
    )
    out["spatial_grid"]["cause"] = (
        "fixed 288-cell extent: scale copies densify the same cells, so "
        "the flat grid's candidates grow 9N^2/288 — quadratic by dataset "
        "construction; its sf10 run was killed at 55 min (~42 min/run "
        "implied). IMPLEMENTED (r17): join_spatial_grid_adaptive — the "
        "coordinate-dictionary variant bounds distance-kernel candidates "
        "by DISTINCT-position occupancy (candidate_ratio_adaptive above; "
        "flat on the 480-position lattice) and the expansion emits only "
        "output rows, which grow quadratically BY CONTRACT under "
        "densification (every co-located pair is a result row) — see the "
        "adaptive.output_rows_* fields and the sf10_probe wall rows."
    )
    p1, p10 = out["bpe"]["sf1"], out["bpe"]["sf10"]
    out["bpe"]["pair_row_ratio"] = round(p10["pair_rows"] / p1["pair_rows"], 2)
    out["bpe"]["cause"] = (
        "pair rows = Σ(len(tok)−1): the probe corpora LENGTHEN tokens with "
        "per-copy prefixes (sf1 c{i}x, sf10 adds d{i}y), so pairs/token "
        "grows each decade and pair volume outruns 10× — superlinear in "
        "the DATA, linear in the engine (vocabulary stays alphabet-"
        "bounded, aggregate collapses map-side). Plan re-keyed r17 to a "
        "position-explode + codegen substring (3.09 → 0.69 s at sf1: the "
        "old transform-lambda ran interpreted)."
    )
    if reuse_heavy:
        return out
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
    return out


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--remeasure", action="store_true")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    detail_path = os.path.join(
        os.path.dirname(_SCRIPTS), "BENCH_DETAIL.json"
    )
    with open(detail_path) as f:
        detail = json.load(f)
    prior = detail.get("second_decade_probe", {})

    section = measured_probes(args.remeasure, prior)
    section["decomposed"] = flat_assign_ledger(detail)
    if not args.no_write:
        merge_into_bench_detail(section, detail_path)
        print(f"# merged into {detail_path}", file=sys.stderr)
    print(json.dumps(section))
    return 0


if __name__ == "__main__":
    sys.exit(main())
