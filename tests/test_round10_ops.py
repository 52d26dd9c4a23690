"""Round-10 operator tests: the kNN-graph recall audit.

``ext_knn_graph_recall`` measures graph-edge recall@3 of the
cell-blocked graph against the exact graph, per seed and per nprobe
level. These tests pin the audit's structural invariants — the ones the
DuckDB hash comparison can't express as clearly: full seed coverage at
both probe levels, the exact denominator, and hit-count monotonicity in
nprobe (a superset of probed cells can displace an exact-top-3 edge from
the approximate top-3 only by deeper exact-top-3 edges, so per-seed hits
never decrease as nprobe grows).
"""

from __future__ import annotations

from cta_train_tracker_analytics_spark.plans import registry

from conftest import SF_DIR


def test_knn_graph_recall_invariants(spark):
    from pyspark.sql import functions as F

    from cta_train_tracker_analytics_spark.data import load

    corpus_n = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    rows = registry.all_queries()["ext_knn_graph_recall"](spark, SF_DIR).collect()
    by_lvl: dict[int, dict[int, object]] = {1: {}, 2: {}}
    for r in rows:
        assert r.nprobe in (1, 2)
        assert r.n_exact == 3  # 50 seeds in a ≥500-vector corpus: always 3
        assert 0 <= r.n_hit <= r.n_exact
        assert abs(r.recall - r.n_hit / r.n_exact) < 5e-5  # recall rounds to 4dp
        assert r.query_id not in by_lvl[r.nprobe]
        by_lvl[r.nprobe][r.query_id] = r
    # every seed is audited at BOTH probe levels; the seed rule is the 50
    # smallest EXISTING ids (corpus-derived, not a literal id predicate —
    # ADVICE r10), so the realized count is min(50, corpus)
    assert set(by_lvl[1]) == set(by_lvl[2])
    assert len(by_lvl[1]) == min(50, corpus_n)
    # widening the probe set never loses a hit
    for qid, r1 in by_lvl[1].items():
        assert by_lvl[2][qid].n_hit >= r1.n_hit
    # the knob does something on this corpus: strictly more hits in total
    assert sum(r.n_hit for r in by_lvl[2].values()) > sum(
        r.n_hit for r in by_lvl[1].values()
    )


def test_two_level_assignment_matches_flat_on_separated_clusters(spark):
    """ivf_assign_two_level must agree with the flat argmax whenever the
    quantizer tree routes correctly — i.e. on well-separated clusters
    where every leaf centroid sits in the branch of its own cluster's
    coarse centroid and every vector's nearest leaf is in the branch its
    coarse argmax picks. The two-level form exists to cut the per-vector
    scoring cost from O(k) to O(√k); on separable data it must NOT change
    a single assignment. (Near branch boundaries the forms may disagree —
    that approximation is documented and measured by the recall audit,
    not pinned here.)"""
    from pyspark.sql import Row

    from cta_train_tracker_analytics_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_two_level,
    )

    # two well-separated directions in 6-d; two leaves per direction
    dir_a, dir_b = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0, 0.0, 0.0]

    def perturb(base, i, eps):
        v = list(base)
        v[2 + (i % 4)] += eps * (1 + i % 3)
        return v

    leaves = [
        Row(cent_id=1, c_vec=perturb(dir_a, 0, 0.05)),  # branch A (coarse)
        Row(cent_id=2, c_vec=perturb(dir_b, 1, 0.05)),  # branch B (coarse)
        Row(cent_id=3, c_vec=perturb(dir_a, 2, 0.09)),  # branch A leaf
        Row(cent_id=4, c_vec=perturb(dir_b, 3, 0.09)),  # branch B leaf
    ]
    cents = spark.createDataFrame(leaves, "cent_id bigint, c_vec array<double>")
    vecs = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=perturb(dir_a if i % 2 == 0 else dir_b, i, 0.03))
            for i in range(40)
        ],
        "vec_id bigint, embedding array<double>",
    )
    flat = {r["id"]: r["cell"] for r in ivf_assign(vecs, cents).collect()}
    hier = {
        r["id"]: r["cell"]
        for r in ivf_assign_two_level(vecs, cents, n_coarse=2).collect()
    }
    assert len(flat) == len(hier) == 40
    assert hier == flat
    # sanity: both branches actually used, so the tree routing was exercised
    assert len(set(hier.values())) >= 2


def test_ntile_null_value_raises(spark):
    """exact_global_ntile's null guard: a NULL in the value column must
    fail loudly (engines disagree on null sort order), not silently land
    in tile 1."""
    import pytest
    from pyspark.sql import Row

    from cta_train_tracker_analytics_spark.operators.windows import exact_global_ntile

    df = spark.createDataFrame(
        [Row(id=1, v=1.0), Row(id=2, v=None), Row(id=3, v=3.0)],
        "id bigint, v double",
    )
    with pytest.raises(ValueError, match="NULL"):
        exact_global_ntile(df, 2, value="v", tiebreak="id")
