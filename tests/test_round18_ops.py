"""Round-18 operator tests: the THREE-level sharded IVF assignment
(r17 verdict #1 — the next rung past the two-level form's measured
N·√k fold growth; BENCH_DETAIL sf100_probe read ext_sim_search_ivf_sharded
at 17.1× for decade 3, converging on the designed 31.6×/decade asymptote).

Pins: (a) the collapse equivalence — with n_mid = k every leaf is its own
mid, so the 3-level tree degenerates to the two-level sharded tree and the
assignments must agree cell-for-cell; (b) the physical contract — the mid
and leaf shard tables reach vectors ONLY through shuffle_hash-pinned
equi-joins (locally both are tiny and AQE would otherwise broadcast them,
reintroducing a super-k^(1/3) per-task structure); (c) the row contract —
every input row exactly once; (d) a recall floor for the registered search
query's quantizer in a forced tree regime, with the depth-for-cost recall
trade measured against the two-level form on the same budget (the floor
guards against routing regressions; the multi-probe pins in
test_round13_ops.py remain the family's recall knob).
"""

from __future__ import annotations

import math
import re

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from cta_train_tracker_analytics_spark.data import load
from cta_train_tracker_analytics_spark.operators.similarity import (
    ivf_assign_sharded,
    ivf_assign_sharded_3level,
)

from conftest import SF_DIR


def _corpus_and_centroids(spark, n_cells: int = 8):
    emb = load(spark, SF_DIR, "embeddings").filter(F.col("embedding").isNotNull())
    cents = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    return emb, cents


def test_3level_collapses_to_sharded_when_mids_are_leaves(spark):
    """With n_mid = k every leaf's nearest mid is itself (cos = 1, id-asc
    tie order, distinct vectors), each mid shard holds exactly that leaf,
    and level 2's branch descent IS the two-level descent — so the
    assignments must agree cell-for-cell. A divergence means one of the
    three argmax levels lost the family total order (cos DESC, id ASC)."""
    emb, cents = _corpus_and_centroids(spark)
    k = cents.count()
    two = {
        r["id"]: r["cell"]
        for r in ivf_assign_sharded(emb, cents, n_coarse=3).collect()
    }
    three = {
        r["id"]: r["cell"]
        for r in ivf_assign_sharded_3level(emb, cents, n_top=3, n_mid=k).collect()
    }
    assert len(three) == len(two) > 0
    assert three == two
    assert len(set(three.values())) >= 2  # routing actually exercised


def test_3level_genuine_tree_row_contract(spark):
    """In a genuine 3-level regime (n_top < n_mid < k) every input row
    appears exactly once, every assigned cell is a real centroid id, and
    assignment routes to >= 2 distinct cells."""
    emb, cents = _corpus_and_centroids(spark)
    n = emb.count()
    out = ivf_assign_sharded_3level(emb, cents, n_top=2, n_mid=4).collect()
    assert len(out) == n
    ids = [r["id"] for r in out]
    assert len(set(ids)) == n
    cent_ids = {r["cent_id"] for r in cents.collect()}
    cells = [r["cell"] for r in out if r["cell"] is not None]
    assert set(cells) <= cent_ids
    assert len(set(cells)) >= 2


def test_3level_shard_tables_never_broadcast(spark):
    """The 100 TB contract: the mid map rides ONLY the shuffled hash join
    on top_id and the leaf map ONLY the one on mid_id. The only broadcast
    rows are the single-row O(k^(1/3)) top arrays (one for the corpus
    descent, one inside each centroid-side build), riding
    BroadcastNestedLoopJoins of ONE row each."""
    emb, cents = _corpus_and_centroids(spark)
    p = (
        ivf_assign_sharded_3level(emb, cents, n_top=2, n_mid=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"ShuffledHashJoin.*top_id", p)
    assert re.search(r"ShuffledHashJoin.*mid_id", p)
    assert "BroadcastHashJoin" not in p  # shard maps never ride a broadcast
    assert "CartesianProduct" not in p


# ---- recall floor (r17 verdict #1: "a recall floor pinned like nprobe's")

N_VECS = 4000
DIM = 32
SEED = 424218
N_CLUSTERS = 40
NOISE = 0.1
N_CELLS = 64      # forced tree regime: ceil(N/250)=16 would stay flat-ish
N_TOP = 4         # ceil(cbrt(64))
N_MID = 16        # ceil(64^(2/3))
TOPK = 10
#: Measured at exactly this seeded regime (deterministic corpus + id
#: tiebreaks — a pin, not a statistical bound): single-probe top-10 recall
#: vs exact is 0.5125 through the balanced THREE-level quantizer,
#: 0.5609 through the two-level sharded quantizer on the same
#: (64-cell, 8-coarse) budget, and 0.5859 with the mid level flattened to
#: n_mid = n_top + 1 (nearly two-level). The ordering is the honest
#: price of depth: each greedy descent level can strand a query one
#: branch away from its neighbors, so recall falls monotonically as the
#: tree deepens — ~5 pp per added level here — which is exactly what the
#: O(N^1.5) → O(N^4/3) assignment-cost drop buys. The family's measured
#: recall knob (multi-probe, test_round13_ops.py) is the buy-back path.
#: The floor sits well under the shipped 0.5125 but far above what any
#: routing regression reads (a broken argmax order or a dropped shard
#: join craters toward the random-cell baseline), so the pin catches
#: regressions without freezing the measured value itself.
RECALL_FLOOR_3LEVEL = 0.45


def _clustered_unit_vectors() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    mu = rng.standard_normal((N_CLUSTERS, DIM))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    lab = rng.integers(0, N_CLUSTERS, N_VECS)
    v = mu[lab] + NOISE * rng.standard_normal((N_VECS, DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")
    return v


def _search_recall_3level(spark, n_top: int, n_mid: int) -> float:
    """Top-10 recall@10 of single-cell search through the 3-level quantizer
    against the exact brute-force top-10, for the 64 lowest-id query
    vectors, on the seeded clustered corpus in the forced tree regime."""
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
    cents = emb.orderBy("vec_id").limit(N_CELLS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_sharded_3level(
        emb, cents, n_top=n_top, n_mid=n_mid
    ).localCheckpoint(eager=True)

    from cta_train_tracker_analytics_spark.operators.similarity import dot as sdot
    from pyspark.sql import Window

    n_queries = 64
    qside = F.broadcast(
        assigned.filter(F.col("id") < n_queries).select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("q_vec"),
            F.col("v_nrm").alias("q_nrm"),
            "cell",
        )
    )
    cand = qside.join(assigned, "cell").filter(
        F.col("query_id") != F.col("id")
    ).select(
        "query_id",
        F.col("id").alias("vec_id"),
        (sdot(F.col("q_vec"), F.col("vec")) / (F.col("q_nrm") * F.col("v_nrm"))).alias(
            "cs"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), "vec_id")
    got = {
        (r["query_id"], r["vec_id"])
        for r in cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .collect()
    }

    v64 = v.astype("float64")
    sims = v64 @ v64.T
    nrm = np.linalg.norm(v64, axis=1)
    sims /= np.outer(nrm, nrm)
    np.fill_diagonal(sims, -np.inf)
    exact = set()
    for i in range(n_queries):
        top = np.argpartition(-sims[i], TOPK)[:TOPK]
        for j in top:
            exact.add((i, int(j)))
    return len(exact & got) / len(exact)


def test_3level_search_recall_floor(spark):
    recall = _search_recall_3level(spark, N_TOP, N_MID)
    assert recall >= RECALL_FLOOR_3LEVEL, (
        f"3-level single-probe top-{TOPK} recall {recall:.4f} < "
        f"{RECALL_FLOOR_3LEVEL} at {N_CELLS} cells / {N_TOP} tops / "
        f"{N_MID} mids on the seeded clustered corpus — the quantizer lost "
        "its measured quality (this regime reads 0.5125 shipped vs 0.5609 "
        "for the two-level form on the same budget; a routing regression "
        "craters toward the random-cell baseline, far below the floor)"
    )


def test_lit_matrix_exact(spark):
    """_lit_matrix's single-expr form must be BIT-identical to the
    per-element F.lit form for every literal family it carries (PQ
    codebooks: x/4000.0 non-terminating binaries; projection planes:
    ±1e6-range integer-valued doubles) plus repr edge shapes (exponent
    notation, negative zero is not used but tiny/huge magnitudes are
    covered). repr() is the shortest round-trip decimal and the SQL
    lexer's `...D` literal parses with the same correctly-rounded
    IEEE-754 semantics as F.lit's direct transfer."""
    import struct

    from pyspark.sql import functions as F

    from cta_train_tracker_analytics_spark.operators.similarity import (
        _lit_matrix,
        pq_codebooks,
        projection_planes,
    )

    matrices = [m for m in pq_codebooks()]
    matrices.append(projection_planes(64, 12))
    matrices.append([[1e-17, -3.5e300, 7.1, 0.1 + 0.2, 123456789.0]])
    for rows in matrices:
        old = F.array(*[F.array(*[F.lit(float(x)) for x in r]) for r in rows])
        got = spark.range(1).select(
            _lit_matrix(rows).alias("new"), old.alias("old")
        ).collect()[0]
        bits = lambda v: struct.pack("<d", v)  # noqa: E731
        assert [
            [bits(x) for x in r] for r in got["new"]
        ] == [[bits(x) for x in r] for r in got["old"]]


def test_sql_fragment_twins_exact(spark):
    """The r18 single-parse expression rework must be PLAN-IDENTICAL to
    the r17 Column-form construction (not merely value-equal):
    Dataset.sameSemantics compares canonicalized analyzed plans, so a True
    here guarantees bit-identical execution for every input. Covers the
    dot/norm fragments and the two assignment shapes whose inner
    expressions were re-rendered as expr() strings."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from cta_train_tracker_analytics_spark.operators.similarity import (
        dot,
        dot_sql,
        norm,
        norm_sql,
        ivf_assign,
        ivf_assign_multi,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(i, [float(i + d) / 7.0 for d in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, schema)

    # dot/norm fragments vs Column forms
    old = df.select(
        dot(F.col("embedding"), F.col("embedding")).alias("d"),
        norm(F.col("embedding")).alias("n"),
    )
    new = df.select(
        F.expr(dot_sql("embedding", "embedding")).alias("d"),
        F.expr(norm_sql("embedding")).alias("n"),
    )
    assert old.sameSemantics(new)

    # whole-operator equivalence: the new ivf_assign / ivf_assign_multi
    # vs an inline replica of the r17 Column-form construction
    cents_df = df.limit(4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )

    def old_ivf_assign(d, centroids):
        cents = F.broadcast(
            centroids.select(
                F.struct(
                    F.col("cent_id"),
                    F.col("c_vec"),
                    norm(F.col("c_vec")).alias("c_nrm"),
                ).alias("c")
            ).agg(F.array_sort(F.collect_list("c")).alias("cents"))
        )
        scored = d.crossJoin(cents).select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
            norm(F.col("embedding")).alias("v_nrm"),
            F.col("cents"),
        ).select(
            "id",
            "vec",
            "v_nrm",
            "cents",
            F.transform(
                "cents",
                lambda c: dot(F.col("vec"), c["c_vec"])
                / (F.col("v_nrm") * c["c_nrm"]),
            ).alias("cs_arr"),
        )
        return scored.select(
            "id",
            "vec",
            "v_nrm",
            F.element_at(
                "cents",
                F.array_position(F.col("cs_arr"), F.array_max("cs_arr")).cast(
                    "int"
                ),
            )["cent_id"].alias("cell"),
        )

    def old_ivf_assign_multi(d, centroids, nprobe):
        cents = F.broadcast(
            centroids.select(
                F.struct(
                    F.col("cent_id"),
                    F.col("c_vec"),
                    norm(F.col("c_vec")).alias("c_nrm"),
                ).alias("c")
            ).agg(F.array_sort(F.collect_list("c")).alias("cents"))
        )
        scored = d.crossJoin(cents).select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("vec"),
            norm(F.col("embedding")).alias("v_nrm"),
            F.col("cents"),
        ).select(
            "id",
            "vec",
            "v_nrm",
            F.slice(
                F.array_sort(
                    F.transform(
                        "cents",
                        lambda c: F.struct(
                            (
                                -(
                                    dot(F.col("vec"), c["c_vec"])
                                    / (F.col("v_nrm") * c["c_nrm"])
                                )
                            ).alias("ncs"),
                            c["cent_id"].alias("cent_id"),
                        ),
                    )
                ),
                1,
                nprobe,
            ).alias("probes"),
        )
        return scored.select(
            "id", "vec", "v_nrm", F.posexplode("probes")
        ).select(
            "id",
            "vec",
            "v_nrm",
            (F.col("pos") + 1).alias("probe"),
            F.col("col.cent_id").alias("cell"),
        )

    assert ivf_assign(df, cents_df).sameSemantics(old_ivf_assign(df, cents_df))
    assert ivf_assign_multi(df, cents_df, 2).sameSemantics(
        old_ivf_assign_multi(df, cents_df, 2)
    )
