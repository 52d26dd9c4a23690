"""Round-13 pins.

The headline: the production kNN-graph composition's TREE-REGIME recall
(r12 verdict #3), pinned with the HONEST metric. ext_knn_graph_prod_recall
hash-checks the shipped composition every round, but at driver scale
(sf0.01) the tree degenerates to flat multi-probe (3 coarse branches <= 4
probed), so the tree-approximation regime lived only in probe scripts —
and the r13 re-measurement found those probe figures (0.81 uniform) were
artifacts of CENTROID-COINCIDENT seeds: the honest full-graph edge
recall@3 is 0.15 on a uniform corpus (probed-fraction-bound — no
structure to exploit) and 0.62 on a genuinely clustered one (within-
cluster cos ~0.6, the regime where the tree's branch knob acts: 0.514 at
2 branches -> 0.617 at 4, vs flat IVF's 0.722 at the same nprobe).

This test forces the tree regime at test scale — 4000 CLUSTERED seeded
vectors (40 Gaussian clusters, noise 0.1), n_cells=64, n_coarse=8 (>
n_branches=4, so branch selection genuinely prunes leaves) — through the
SAME operator seam the prod query calls (ivf_assign_sharded_multi with
prod's residence cap) and the same downstream graph plan, and pins the
FULL-GRAPH edge recall@3 (every vector a query — no seed bias possible)
against the exact brute-force graph. A quantizer regression (e.g. a
branch-selection bug that survives the flat regime) now fails a test
instead of waiting for the next manual probe run.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from cta_train_tracker_analytics_spark.operators.similarity import (
    dot as sdot,
)
from cta_train_tracker_analytics_spark.operators.similarity import (
    ivf_assign_sharded_multi,
)

N_VECS = 4000
DIM = 32
SEED = 424213
N_CLUSTERS = 40   # ~100 vectors/cluster; within-cluster cos ~0.61
NOISE = 0.1
N_CELLS = 64      # forced: ceil(N/250)=16 would stay in the flat regime
N_COARSE = 8      # ceil(sqrt(64)); > n_branches so branches prune leaves
N_BRANCHES = 4    # prod's shipped branch count
NPROBE = 2        # prod's shipped probe count
#: Measured at exactly this seeded regime: 0.7777 at 4 branches, 0.6436
#: at 2 branches — the floor sits between them, so a regression to
#: 2-branch-equivalent quantization FAILS while the shipped 4-branch
#: form passes with margin. Everything is deterministic (seeded corpus,
#: id tiebreaks), so this is a pin, not a statistical bound.
RECALL_FLOOR = 0.70


def _clustered_unit_vectors() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    mu = rng.standard_normal((N_CLUSTERS, DIM))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    lab = rng.integers(0, N_CLUSTERS, N_VECS)
    v = mu[lab] + NOISE * rng.standard_normal((N_VECS, DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")
    return v


def _tree_regime_recall(spark, nprobe: int):
    """Full-graph edge recall@3 of the prod composition at ``nprobe`` in
    the forced tree regime on the seeded 4k clustered corpus, plus the
    assignment DataFrame (for regime-sanity assertions). Shared by the
    nprobe=2 pin (r12 verdict #3) and the nprobe=4 escalation pin (r14
    verdict #5)."""
    v = _clustered_unit_vectors()
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v[i]]) for i in range(N_VECS)], schema
    ).repartition(8)

    # prod's exact knob derivations, with n_cells forced into the tree
    # regime (llm.py::ext_knn_graph_prod uses n_cells = max(8, ceil(N/250)),
    # n_coarse = max(2, min(n_cells-1, ceil(sqrt(n_cells)))), cap =
    # 2*ceil(N/n_cells) — the same formulas evaluated here at N_CELLS=64)
    assert N_COARSE == max(2, min(N_CELLS - 1, math.ceil(math.sqrt(N_CELLS))))
    assert N_COARSE > N_BRANCHES, "not a tree: branch selection prunes nothing"
    cap = 2 * math.ceil(N_VECS / N_CELLS)
    centroids = emb.orderBy("vec_id").limit(N_CELLS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_sharded_multi(
        emb, centroids, N_COARSE, nprobe,
        residence_cap=cap, n_branches=N_BRANCHES,
    ).localCheckpoint(eager=True)

    # the family graph plan, verbatim from ext_knn_graph_prod
    left = assigned.select(
        F.col("id").alias("vec_id"), F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"), "cell",
    )
    right = assigned.filter(F.col("probe") == 1).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"), "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = sdot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    got = {
        (r["vec_id"], r["neighbor_id"])
        for r in pairs.select("vec_id", "neighbor_id", cs.alias("cs"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }

    # exact top-3 graph, brute force in numpy over the SAME float32-cast
    # coordinates the engine saw (cosines in float64, like the engine)
    v64 = v.astype("float64")
    sims = v64 @ v64.T
    nrm = np.linalg.norm(v64, axis=1)
    sims /= np.outer(nrm, nrm)
    np.fill_diagonal(sims, -np.inf)
    top3 = np.argpartition(-sims, 3, axis=1)[:, :3]
    exact = set()
    for i in range(N_VECS):
        order = top3[i][np.lexsort((top3[i], -sims[i, top3[i]]))]
        for j in order:
            exact.add((i, int(j)))

    return len(exact & got) / len(exact), assigned


def test_prod_tree_regime_edge_recall_pin(spark):
    recall, assigned = _tree_regime_recall(spark, NPROBE)
    assert recall >= RECALL_FLOOR, (
        f"tree-regime FULL-GRAPH edge recall@3 {recall:.4f} < {RECALL_FLOOR} "
        f"at {N_CELLS} cells / {N_COARSE} coarse / {N_BRANCHES} branches on "
        "the clustered test corpus — the quantizer lost the r13-measured "
        "quality (this exact seeded regime reads 0.7777 at 4 branches and "
        "0.6436 at 2, so a branch-selection regression lands below the floor)"
    )

    # regime sanity: every vector kept its nprobe distinct probed cells
    # (the contract the graph plan relies on; the cap bounds KEPT original
    # residents — overflow ARRIVALS may push a cell past it by design, so
    # occupancy itself is not asserted here)
    per_vec = assigned.groupBy("id").agg(
        F.countDistinct("cell").alias("nc"), F.count("*").alias("np")
    )
    bad = per_vec.filter((F.col("nc") != NPROBE) | (F.col("np") != NPROBE)).count()
    assert bad == 0


#: nprobe=4 on the SAME seeded regime (r14 verdict #5: the documented
#: escalation path — measured 0.703 full-graph recall@3 at 20k mixture
#: scale, reproduced from two independent harnesses in r14). Measured here
#: at test scale: 0.8568 (vs 0.7777 at nprobe=2), so the floor sits above
#: the nprobe=2 reading — a regression that makes the escalation dial a
#: no-op (nprobe=4 quantizing like nprobe=2) FAILS, while the shipped form
#: passes with margin. Deterministic seeded corpus: a pin, not a bound.
NPROBE_ESCALATED = 4
RECALL_FLOOR_NP4 = 0.82


def test_prod_tree_regime_nprobe4_escalation_pin(spark):
    recall, _ = _tree_regime_recall(spark, NPROBE_ESCALATED)
    assert recall >= RECALL_FLOOR_NP4, (
        f"tree-regime FULL-GRAPH edge recall@3 {recall:.4f} < "
        f"{RECALL_FLOOR_NP4} at nprobe={NPROBE_ESCALATED} — the documented "
        "escalation path (PLANS.md r14 nprobe curve: +22% cost for +12pp "
        "recall at production scale) lost its measured quality; the floor "
        "sits above the nprobe=2 reading (0.7777), so an escalation-dial "
        "no-op regression cannot pass"
    )
