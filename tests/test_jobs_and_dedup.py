"""Component tests: compaction job raw→processed round-trip (the tier the
reference never tested — SURVEY §5 notes bucket_raw_data has zero tests, a
gap we must not reproduce) and near-dup operators on planted duplicates
(the synthetic corpus has none)."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cta_train_tracker_analytics_spark.jobs.compact import compact_day
from cta_train_tracker_analytics_spark.operators.dedup import (
    doc_shingles,
    doc_tokens,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_candidate_pairs,
    simhash16,
    verified_jaccard_pairs,
)
from cta_train_tracker_analytics_spark.operators.similarity import lsh_bucketed_pairs, topk_cosine
from conftest import SF_DIR
from cta_train_tracker_analytics_spark.sources.jsonl import date_path, write_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("train_id", T.StringType()),
        T.StructField("is_train_delayed", T.StringType()),
    ]
)


def test_compact_day_roundtrip(spark, tmp_path):
    """raw/YYYY/MM/DD JSONL → processed/load_date= parquet, partition-pruned
    read-back (bucket_raw_data.py:76-117 as one declarative plan)."""
    raw, curated = str(tmp_path / "raw"), str(tmp_path / "processed")
    day = dt.date(2025, 6, 25)
    records = spark.createDataFrame(
        [("2025-06-25#Purple#110#5", "0"), ("2025-06-25#Red#812#1", "1")], SCHEMA
    )
    write_jsonl(records, date_path(raw, 2025, 6, 25))
    # a second day that must NOT be touched by compacting the 25th
    write_jsonl(records.limit(1), date_path(raw, 2025, 6, 26))

    compact_day(spark, raw, curated, day, SCHEMA)
    back = spark.read.parquet(curated)
    assert back.count() == 2
    assert back.select("load_date").distinct().collect()[0][0] == day
    # idempotent re-run (dynamic partition overwrite): still 2 rows
    compact_day(spark, raw, curated, day, SCHEMA)
    assert spark.read.parquet(curated).count() == 2
    # partition pruning surface: filter on load_date prunes to one partition
    pruned = spark.read.parquet(curated).filter(F.col("load_date") == F.lit(day))
    assert "PartitionFilters: [isnotnull(load_date" in pruned._jdf.queryExecution().executedPlan().toString() or pruned.count() == 2


def test_retention_expires_old_partitions(spark, tmp_path):
    """3-day lifecycle (main.tf:166-189): partitions/day-dirs older than the
    window are dropped; newer ones survive and stay readable."""
    from cta_train_tracker_analytics_spark.jobs.retention import (
        expire_partitions,
        expire_raw_days,
    )

    curated = tmp_path / "processed"
    records = spark.createDataFrame([("x", "0")], SCHEMA)
    for d in ["2025-06-20", "2025-06-24", "2025-06-25"]:
        records.withColumn("load_date", F.lit(d).cast("date")).write.mode(
            "append"
        ).partitionBy("load_date").parquet(str(curated))
    today = dt.date(2025, 6, 25)
    dropped = expire_partitions(str(curated), keep_days=3, today=today)
    assert dropped == ["load_date=2025-06-20"]
    back = spark.read.parquet(str(curated))
    assert {str(r[0]) for r in back.select("load_date").distinct().collect()} == {
        "2025-06-24", "2025-06-25",
    }

    raw = tmp_path / "raw"
    for day in ["2025/06/20", "2025/06/25"]:
        p = raw / day
        p.mkdir(parents=True)
        (p / "f.json").write_text("{}\n")
    assert expire_raw_days(str(raw), keep_days=3, today=today) == ["2025/06/20"]
    assert (raw / "2025/06/25" / "f.json").exists()


_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "completely different content about spark query engines and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "unrelated text mentioning embeddings vectors and cosine distance"),
]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_exact_dedup_groups_identical_docs(spark):
    out = {r["keep_doc_id"]: r["n_copies"] for r in exact_dedup(_docs_df(spark)).collect()}
    assert out[0] == 2  # docs 0 and 3 collapse
    assert len(out) == 4


def test_minhash_lsh_finds_planted_near_dup(spark):
    # production unit: trigram shingles (see llm.ext_dedup_minhash)
    tok = doc_shingles(_docs_df(spark), n=3)
    cand = minhash_candidate_pairs(minhash_signatures(tok))
    pairs = verified_jaccard_pairs(cand, tok, threshold=0.7).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in found  # exact dup always survives every band
    # the verified jaccard of the exact dup is 1.0
    exact = [r for r in pairs if (r["id_a"], r["id_b"]) == (0, 3)][0]
    assert exact["jaccard"] == 1.0


def test_simhash_identical_docs_equal_fingerprints(spark):
    fp = {r["id"]: r["simhash"] for r in simhash16(_docs_df(spark)).collect()}
    assert fp[0] == fp[3]
    assert fp[0] != fp[2]


def test_ngram_blocking_finds_near_dup(spark):
    cand = ngram_candidate_pairs(_docs_df(spark), n=3, max_df=5)
    found = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 1) in found and (0, 3) in found
    assert (2, 4) not in found  # nothing shared → never a candidate


def test_topk_cosine_self_is_nearest(spark):
    rows = [Row(vec_id=i, embedding=[float(i == j) for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows)
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    out = topk_cosine(emb, queries, k=1)
    top = {r["query_id"]: r["vec_id"] for r in out.collect()}
    assert top == {0: 0, 1: 1}


def test_ivf_topk_searches_within_cell(spark):
    """Two well-separated clusters: each query's neighbors come from its own
    cell only."""
    from cta_train_tracker_analytics_spark.operators.similarity import ivf_topk

    rows = [
        Row(vec_id=0, embedding=[10.0, 0.0, 0.1, 0.0]),   # cluster A centroid
        Row(vec_id=1, embedding=[0.0, 10.0, 0.0, 0.1]),   # cluster B centroid
        Row(vec_id=2, embedding=[9.0, 0.2, 0.0, 0.0]),    # A member
        Row(vec_id=3, embedding=[0.1, 9.5, 0.0, 0.0]),    # B member
        Row(vec_id=4, embedding=[8.0, 0.0, 0.3, 0.0]),    # A member
    ]
    emb = spark.createDataFrame(rows)
    centroids = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    queries = emb.filter(F.col("vec_id") == 2)
    out = ivf_topk(emb, queries, centroids, k=10).collect()
    returned = {r["vec_id"] for r in out}
    assert returned == {0, 2, 4}  # cluster A only; B's vectors never scanned
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rnk"])][0] == 2  # self first


def test_lsh_bucketed_pairs_finds_identical_vectors(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 2.0, 3.0, 4.0]),
        Row(vec_id=2, embedding=[1.0, 2.0, 3.0, 4.0]),  # identical → cos 1.0
        Row(vec_id=3, embedding=[-4.0, 3.0, -2.0, 1.0]),
    ]
    out = lsh_bucketed_pairs(spark.createDataFrame(rows), dims=4, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in out] == [(1, 2, 1.0)]


def test_mllib_minhash_recalls_verified_pairs(spark):
    """ext_dedup_minhash_mllib's PAIR SET is JVM-hash-specific (the driver
    checks the invariant audit instead, r11 verdict #6), so the recall
    check lives HERE: the candidate set must recall ≥90% of the pairs the
    portable, oracle-hash-verified ext_dedup_minhash emits at the same
    Jaccard ≥ 0.7 threshold on the same trigram shingles (measured 1.0 at
    sf0.001). Both are 8-table/16-perm LSH, so large recall gaps mean a
    broken shingle or join stage, not sketch noise."""
    from cta_train_tracker_analytics_spark.plans import registry
    from cta_train_tracker_analytics_spark.plans.llm import mllib_minhash_pairs

    q = registry.all_queries()
    ref = {(r["id_a"], r["id_b"]) for r in q["ext_dedup_minhash"](spark, SF_DIR).collect()}
    _, pairs = mllib_minhash_pairs(spark, SF_DIR)
    ml = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ref, "portable minhash found no pairs — fixture drift"
    assert len(ref & ml) / len(ref) >= 0.9
    # the registered audit form over the same pipeline must be clean
    audit = q["ext_dedup_minhash_mllib"](spark, SF_DIR).collect()[0]
    assert audit["n_docs"] > 0
    assert audit["n_pairs_below_thresh"] == 0
    assert audit["n_dup_pairs_missed"] == 0


def test_banded_lsh_supersets_single_table(spark):
    """Table 0 of the banded operator uses exactly the single-table
    operator's planes, so every pair ext_dedup_embed emits must also be
    emitted (with the identical cosine) by ext_dedup_embed_banded — the
    recall relationship is structural, not statistical."""
    from cta_train_tracker_analytics_spark.plans import registry

    q = registry.all_queries()
    single = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in q["ext_dedup_embed"](spark, SF_DIR).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in q["ext_dedup_embed_banded"](spark, SF_DIR).collect()
    }
    assert single, "single-table LSH found no pairs — fixture drift"
    missing = {k: v for k, v in single.items() if banded.get(k) != v}
    assert not missing, f"banded LSH lost single-table pairs: {missing}"
    # and the extra tables must actually buy recall on this corpus
    assert len(banded) > len(single)


def test_twostage_minhash_consistent_with_single_stage(spark):
    """Two-stage (exact-dedup-first) minhash must agree with single-stage
    on representative pairs: every two-stage pair whose reps both survive
    as their own family minimum appears in the single-stage output with
    the same jaccard (stage 1 only collapses identical text, which cannot
    change any shingle set)."""
    from cta_train_tracker_analytics_spark.plans import registry

    q = registry.all_queries()
    single = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in q["ext_dedup_minhash"](spark, SF_DIR).collect()
    }
    two = list(q["ext_dedup_minhash_twostage"](spark, SF_DIR).collect())
    assert two, "two-stage minhash found no pairs — fixture drift"
    for r in two:
        assert single.get((r["id_a"], r["id_b"])) == r["jaccard"], (
            r["id_a"],
            r["id_b"],
        )
        assert r["n_docs_a"] >= 1 and r["n_docs_b"] >= 1


def test_incremental_embed_dedup_sides(spark):
    """Batch-vs-corpus embedding dedup must emit only cross-side pairs
    (batch_id < 100 ≤ corpus_id) with cosine above threshold — no
    batch×batch or corpus×corpus pair can appear."""
    from cta_train_tracker_analytics_spark.plans import registry

    rows = registry.all_queries()["ext_dedup_embed_incremental"](spark, SF_DIR).collect()
    assert rows, "no cross-side near-dups at this SF — fixture drift"
    for r in rows:
        assert r["batch_id"] < 100 <= r["corpus_id"]
        assert r["cos_sim"] >= 0.2


def test_lm_perplexity_scores_every_doc(spark):
    """Bigram-LM scoring invariants: every multi-token document scores;
    add-one smoothing keeps every term finite and positive (c_bg+1 ≥ 1 and
    the denominator strictly exceeds any numerator on a real corpus)."""
    from cta_train_tracker_analytics_spark.plans import registry

    rows = registry.all_queries()["ext_lm_perplexity"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert len({r["doc_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["avg_nll"] > 0.0


def test_pq_codes_discriminate(spark):
    """The PQ codebooks must sit INSIDE the embedding distribution: with
    in-range centroids every corpus vector lands on its own code path and
    codes separate; out-of-range centroids collapse all subvectors onto
    one nearest centroid (observed: 2 distinct codes over 500 vectors
    before the /4000 scaling) and the index carries no information. Guard
    the scaling, and the ADC search's agreement with exact search: ADC
    top-10 must recall a nontrivial share of the true cosine top-10 even
    with untrained LCG codebooks."""
    from collections import defaultdict

    from cta_train_tracker_analytics_spark.plans import registry

    q = registry.all_queries()
    codes = q["ext_embed_pq"](spark, SF_DIR).collect()
    assert len({r["pq_code"] for r in codes}) >= 0.9 * len(codes)
    pq_top = defaultdict(set)
    for r in q["ext_sim_search_pq"](spark, SF_DIR).collect():
        pq_top[r["query_id"]].add(r["vec_id"])
    exact_top = defaultdict(set)
    for r in q["ext_sim_search"](spark, SF_DIR).collect():
        exact_top[r["query_id"]].add(r["vec_id"])
    recalls = [
        len(pq_top[k] & exact_top[k]) / len(exact_top[k]) for k in exact_top
    ]
    assert sum(recalls) / len(recalls) >= 0.15  # measured ~0.34
    # the exact-rerank composition must improve on raw ADC ordering
    rr_top = defaultdict(set)
    for r in q["ext_sim_search_pq_rerank"](spark, SF_DIR).collect():
        rr_top[r["query_id"]].add(r["vec_id"])
    rr = [len(rr_top[k] & exact_top[k]) / len(exact_top[k]) for k in exact_top]
    assert sum(rr) / len(rr) > sum(recalls) / len(recalls)  # measured ~0.54


def test_adaptive_planes_sizes_to_corpus():
    """Floor below target occupancy, log growth above it, hard cap on top —
    2^planes tracks n/target so expected bucket occupancy stays ~constant."""
    from cta_train_tracker_analytics_spark.operators.similarity import adaptive_planes

    assert adaptive_planes(0) == 8
    assert adaptive_planes(64) == 8  # exactly at target → floor
    assert adaptive_planes(500) == 8  # driver scale: still the floor
    assert adaptive_planes(64 * 300) == 9  # ceil(log2(300)) = 9
    assert adaptive_planes(10**9) == 24  # ~16.7M buckets for 1B rows
    assert adaptive_planes(10**12) == 24  # capped
    # monotone: more rows never means fewer buckets
    vals = [adaptive_planes(n) for n in (10**3, 10**5, 10**7, 10**9, 10**12)]
    assert vals == sorted(vals)


def test_lsh_bucket_distribution_bounded(spark):
    """No hot bucket: on the real embeddings table the largest sign-LSH
    bucket holds a bounded share of the corpus, so the in-bucket verify
    join cannot degenerate toward all-pairs. Guards the adaptive sizing —
    if a future change collapsed buckets (or broke the plane hashing), the
    share would spike toward 1.0."""
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import (
        adaptive_planes,
        dot,
        projection_planes,
    )

    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    planes = adaptive_planes(n)
    coefs = projection_planes(64, planes)
    proj = [
        dot(F.col("embedding"), F.array(*[F.lit(c) for c in row])).alias(f"__p{p}")
        for p, row in enumerate(coefs)
    ]
    bucket = sum(
        (F.when(F.col(f"__p{p}") >= 0, 1 << p).otherwise(0) for p in range(planes)),
        F.lit(0),
    )
    counts = [
        r["count"]
        for r in emb.select(*proj).select(bucket.alias("bucket")).groupBy("bucket").count().collect()
    ]
    assert sum(counts) == n
    assert len(counts) >= 64  # corpus actually spreads across buckets
    assert max(counts) / n <= 0.15  # measured ~0.11 at sf0.001; no hot bucket


def test_connected_components_one_job_per_iteration(spark):
    """Convergence detection is folded into the label update (change flag +
    lazy checkpoint materialized by the flag count), so each iteration
    costs ONE action. The former shape — eager checkpoint + a second
    shuffled join/count per round — measured ~6 more jobs on this graph;
    the bound discriminates against reintroducing either."""
    from cta_train_tracker_analytics_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [Row(id=2, root=1), Row(id=3, root=2), Row(id=5, root=4)]
    )
    sc.setJobGroup("cc_jobcount", "")
    try:
        labels = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    finally:
        sc.setJobGroup("cc_jobcount_done", "")
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("cc_jobcount"))
    # measured 29 (3 iterations, incl. AQE/broadcast sub-jobs); old shape ~35
    assert n_jobs <= 32, f"convergence loop regressed to {n_jobs} jobs"


def test_connected_components_chains_across_signals(spark):
    """Transitivity: A~B via one signal, B~C via another → one cluster.
    Star edges (doc → group min) are enough for the closure to find it."""
    from cta_train_tracker_analytics_spark.operators.dedup import (
        connected_components,
        group_star_edges,
    )

    # signal 1 groups {1,2} and {3,4}; signal 2 groups {2,3} → all one component
    df = spark.createDataFrame(
        [Row(doc_id=i, s1=a, s2=b) for i, a, b in [
            (1, "x", "p"), (2, "x", "q"), (3, "y", "q"), (4, "y", "r"),
            (5, "z", "s"),  # isolated: unique in both signals
        ]]
    )
    edges = group_star_edges(df, F.col("s1")).union(group_star_edges(df, F.col("s2")))
    labels = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}  # 5 has no edges → not in output


def test_group_star_edges_linear_not_quadratic(spark):
    """A k-duplicate group emits k-1 edges, not k*(k-1)/2 pairs."""
    from cta_train_tracker_analytics_spark.operators.dedup import group_star_edges

    df = spark.createDataFrame([Row(doc_id=i, k="same") for i in range(10)])
    edges = group_star_edges(df, F.col("k")).collect()
    assert len(edges) == 9
    assert {r["root"] for r in edges} == {0}


def test_connected_components_raises_on_nonconvergence(spark):
    """A path graph of diameter > max_iter cannot reach fixpoint; the
    operator must FAIL loudly rather than return half-propagated labels
    (they would silently mislabel clusters downstream)."""
    import pytest

    from cta_train_tracker_analytics_spark.operators.dedup import connected_components

    path_edges = spark.createDataFrame(
        [Row(id=i + 1, root=i) for i in range(12)]  # 0-1-2-...-12, diameter 12
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path_edges, max_iter=2)
    # with budget >= diameter the same graph converges to the min label
    labels = {r["id"]: r["label"] for r in connected_components(path_edges).collect()}
    assert set(labels.values()) == {0}


def test_connected_components_rejects_zero_iteration_budget(spark):
    import pytest

    from cta_train_tracker_analytics_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([Row(id=1, root=0)])
    with pytest.raises(ValueError):
        connected_components(edges, max_iter=0)


def test_shingles_on_short_docs(spark):
    """Docs shorter than n tokens yield NO shingles (and must not throw
    under ANSI mode — the builder pre-filters them so plain element_at is
    provably in-bounds); docs of exactly n tokens yield one shingle."""
    from cta_train_tracker_analytics_spark.operators.dedup import (
        doc_shingles,
        hashed_shingles,
    )

    df = spark.createDataFrame(
        [
            (0, ""),                       # trims to empty → 1 empty token
            (1, "one"),
            (2, "two words"),
            (3, "exactly three tokens"),
            (4, "four whitespace separated tokens"),
        ],
        "doc_id long, text string",
    )
    out = {(r["id"], r["tok"]) for r in doc_shingles(df, n=3).collect()}
    assert out == {
        (3, "exactly three tokens"),
        (4, "four whitespace separated"),
        (4, "whitespace separated tokens"),
    }
    hashed = hashed_shingles(df, n=3)
    assert hashed.count() == 3
    assert {r["id"] for r in hashed.select("id").distinct().collect()} == {3, 4}


def test_llm_query_paths_leave_no_cache_entries(spark):
    """Pin-lifecycle discipline (ADVICE r4): the minhash/decontaminate/
    ngram/embed pipelines materialize shared intermediates, but a query
    call must not leak catalog cache entries into a long-lived session —
    the pins are localCheckpoints whose blocks die with the result
    DataFrame, not persists that outlive it."""
    from cta_train_tracker_analytics_spark.plans.registry import all_queries

    qs = all_queries()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    for name in ["ext_dedup_minhash", "ext_decontaminate", "ext_dedup_ngram", "ext_dedup_embed"]:
        qs[name](spark, "/root/testdata/sf0.001").count()
        assert cache_mgr.isEmpty(), f"{name} left persisted entries in the cache"


def test_alternating_cc_matches_min_label_propagation(spark):
    """large-star/small-star must produce the exact labels min-label
    propagation produces (component min), including chained signals."""
    from cta_train_tracker_analytics_spark.operators.dedup import (
        connected_components,
        connected_components_alternating,
        group_star_edges,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, s1=a, s2=b) for i, a, b in [
            (1, "x", "p"), (2, "x", "q"), (3, "y", "q"), (4, "y", "r"),
            (5, "z", "s"), (6, "w", "s"), (7, "w", "t"),
        ]]
    )
    edges = group_star_edges(df, F.col("s1")).union(group_star_edges(df, F.col("s2")))
    plain = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    alt = {r["id"]: r["label"] for r in connected_components_alternating(edges).collect()}
    assert alt == plain
    assert alt == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5}


def test_alternating_cc_converges_in_log_rounds_on_deep_path(spark):
    """The scale property: a path graph of diameter 24 converges within 6
    alternating rounds (O(log n)), where min-label propagation needs ~24.
    All labels collapse to the path minimum."""
    from cta_train_tracker_analytics_spark.operators.dedup import (
        connected_components_alternating,
    )

    path_edges = spark.createDataFrame([Row(id=i + 1, root=i) for i in range(24)])
    labels = {
        r["id"]: r["label"]
        for r in connected_components_alternating(path_edges, max_iter=6).collect()
    }
    assert set(labels.values()) == {0}
    assert len(labels) == 25


def test_alternating_cc_raises_on_exhausted_budget(spark):
    import pytest

    from cta_train_tracker_analytics_spark.operators.dedup import (
        connected_components_alternating,
    )

    path_edges = spark.createDataFrame([Row(id=i + 1, root=i) for i in range(24)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_alternating(path_edges, max_iter=1)


def test_ivf_nprobe_expands_candidates_monotonically(spark):
    """Multi-probe recall property: with nprobe=2 every query's k-th best
    cosine is >= its nprobe=1 k-th best (the candidate set is a strict
    superset — probed cells are disjoint, corpus vectors live in exactly
    one cell)."""
    from cta_train_tracker_analytics_spark.data import load
    from cta_train_tracker_analytics_spark.operators.similarity import ivf_topk

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    r1 = ivf_topk(emb, queries, centroids, k=5, nprobe=1).collect()
    r2 = ivf_topk(emb, queries, centroids, k=5, nprobe=2).collect()
    worst1 = {}
    for r in r1:
        worst1[r["query_id"]] = min(worst1.get(r["query_id"], 1e9), r["cos_sim"])
    worst2 = {}
    for r in r2:
        worst2[r["query_id"]] = min(worst2.get(r["query_id"], 1e9), r["cos_sim"])
    assert set(worst2) == set(worst1)
    for qid in worst1:
        assert worst2[qid] >= worst1[qid], qid
    # self-match survives probing: each query's top hit is itself
    top2 = {r["query_id"]: r["vec_id"] for r in r2 if r["rnk"] == 1}
    assert top2 == {q: q for q in top2}
