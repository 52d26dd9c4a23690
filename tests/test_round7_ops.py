"""Round-7 hardening tests: block-skew bound for the blocked kNN graph,
the centralized broadcast policy helper, lazy plan builders (no Spark jobs
at DataFrame construction), and the overflow-safe bootstrap LCG.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.data import TABLES, load
from cta_train_tracker_analytics_spark.operators.util import maybe_broadcast
from cta_train_tracker_analytics_spark.plans import registry
from cta_train_tracker_analytics_spark.plans.warehouse import _bootstrap_unif

from conftest import SF_DIR

SF001 = "/root/testdata/sf0.01"


def test_knn_graph_block_skew_bounded(spark):
    """ext_knn_graph's cost is Σ_b |b|² (equi-join on the block key); a
    skewed block is locally quadratic. Since the round-10 re-key the
    block is the COMPOSITE (label, IVF cell) — quantify its skew on the
    sf0.01 corpus with the query's own assignment: no single composite
    block may contribute more than 40% of the total pair work — the
    measured bound that keeps the documented 'bounded blocks' claim
    honest instead of aspirational (r6 verdict #7, re-keyed r10)."""
    import math

    from cta_train_tracker_analytics_spark.operators.similarity import ivf_assign

    emb = load(spark, SF001, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    blocks = (
        ivf_assign(emb, centroids)
        .join(emb.select(F.col("vec_id").alias("id"), "label"), "id")
        .groupBy("label", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sizes = [r["n"] for r in blocks]
    work = [n * n for n in sizes]
    max_share = max(work) / sum(work)
    assert len(sizes) >= 2
    assert max_share < 0.40, f"max block share {max_share:.2f} of pair work"


def test_maybe_broadcast_policy(spark):
    """bounded=True pins the hint; bounded=False returns the frame
    UNHINTED so the optimizer decides from measured sizes."""
    df = spark.range(10)
    assert maybe_broadcast(df) is df
    hinted = maybe_broadcast(df, bounded=True)
    assert hinted is not df
    joined = spark.range(1000).join(hinted, "id")
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p


def test_unhinted_customer_joins_still_broadcast_at_test_scale(spark):
    """The warehouse queries that moved from F.broadcast(customer) to the
    unhinted maybe_broadcast must keep their broadcast-hash-join shape at
    test scale (customer is far under autoBroadcastJoinThreshold) — the
    policy change affects 100 TB behavior (graceful shuffle degrade), not
    the small-SF plan."""
    for name in ("agg_weighted_median", "win_leave_one_out"):
        df = registry.all_queries()[name](spark, SF_DIR)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p, name


def _non_source_jobs(spark, group: str) -> list[str]:
    """Names of jobs in ``group`` that are NOT parquet footer/schema reads
    (``spark.read.parquet`` launches one tiny 'parquet at ...' job per
    call; that is source metadata, not query execution)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    names = []
    for j in sc.statusTracker().getJobIdsForGroup(group):
        name = store.job(j).name()
        if not name.startswith("parquet at"):
            names.append(name)
    return names


def test_heavy_hitters_plan_builder_is_lazy(spark):
    """Constructing agg_heavy_hitters' DataFrame must execute no part of
    the query (r6 ADVICE: the eager events.count() baked a stale total
    into the plan); the total is now a broadcast one-row aggregate, so
    the only jobs at construction are parquet schema reads."""
    sc = spark.sparkContext
    sc.setJobGroup("lazy_hh", "laziness check", False)
    try:
        registry.all_queries()["agg_heavy_hitters"](spark, SF_DIR)
        extra = _non_source_jobs(spark, "lazy_hh")
    finally:
        sc.setJobGroup(None, None, False)
    assert extra == [], f"plan construction ran non-source jobs: {extra}"


def test_triangles_builder_runs_no_scan_jobs(spark):
    """Same laziness contract for ext_graph_triangles: N and the edge
    count are broadcast one-row aggregates, so building the plan executes
    nothing beyond source schema reads. (ext_pagerank is exempt: its
    iterate-as-checkpoints loop necessarily materializes upstream stages
    per localCheckpoint under AQE — the round-7 change removed its
    SEPARATE driver-side count scan, folding N into the same broadcast,
    but the iteration itself still runs at build by design.)"""
    sc = spark.sparkContext
    sc.setJobGroup("lazy_graph", "laziness check", False)
    try:
        registry.all_queries()["ext_graph_triangles"](spark, SF_DIR)
        extra = _non_source_jobs(spark, "lazy_graph")
    finally:
        sc.setJobGroup(None, None, False)
    assert extra == [], f"plan construction ran non-source jobs: {extra}"


def test_bootstrap_unif_no_bigint_overflow(spark):
    """The bootstrap LCG must stay in [0, 1) for event_ids far beyond the
    ~42M point where the unreduced product 1103515245*(id*200+rep)
    crossed 2^63 (negative unif ⇒ every Poisson weight 0 ⇒ CI collapse,
    silently, only on the Spark side). Checked at 10^12 ids."""
    df = spark.range(10**12, 10**12 + 1000).select(
        F.col("id").alias("event_id"), (F.col("id") % 200).alias("rep")
    )
    stats = df.select(
        F.min(_bootstrap_unif(F.col("event_id"), F.col("rep"))).alias("lo"),
        F.max(_bootstrap_unif(F.col("event_id"), F.col("rep"))).alias("hi"),
        F.countDistinct(
            F.round(_bootstrap_unif(F.col("event_id"), F.col("rep")), 6)
        ).alias("nd"),
    ).collect()[0]
    assert 0.0 <= stats["lo"] <= stats["hi"] < 1.0
    assert stats["nd"] > 100  # still well-spread, not degenerate


def test_frame_sample_consistent_char_units(spark, duck):
    """ext_frame_sample on multibyte text: frame count and frame
    addressing now share ONE unit (characters), so the sampled frame is
    always addressable — frame_byte must never be the ascii('')=0
    sentinel produced by the old bytes-count/chars-address mismatch, and
    Spark must agree with the oracle formula on the same rows."""
    import duckdb

    text = "é" * 150  # 150 chars, 300 UTF-8 bytes
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    df.createOrReplaceTempView("_r7_docs")
    out = spark.sql(
        """
        SELECT doc_id, n_frames, idx,
               ascii(substring(text, CAST(idx * n_frames / k AS INT) * 100 + 1, 1))
                   AS frame_byte
        FROM (
          SELECT doc_id, text,
                 CAST(length(text) / 100 AS BIGINT) AS n_frames,
                 least(8, CAST(length(text) / 100 AS BIGINT)) AS k,
                 explode(sequence(0, least(8, CAST(length(text) / 100 AS BIGINT)) - 1)) AS idx
          FROM _r7_docs
        )
        """
    ).collect()
    # 150 chars → 1 frame; old byte-derived count said 3 frames, two of
    # which addressed past the 150-char string (frame_byte = 0).
    assert len(out) == 1
    assert out[0]["n_frames"] == 1
    assert out[0]["frame_byte"] == 233  # é code point, not the 0 sentinel

    con = duckdb.connect()
    oracle = con.execute(
        "SELECT length(?) // 100 AS n_frames, ascii(substr(?, 1, 1)) AS fb",
        [text, text],
    ).fetchone()
    con.close()
    assert oracle[0] == 1 and oracle[1] == 233


def test_partitioned_sinks_survive_empty_input(spark, tmp_path):
    """Empty increments are routine at scale (a day with no data, a
    retention sweep that expired everything, a backfill range matching
    zero rows). A partitioned write of zero rows lays down only _SUCCESS —
    no part files, no partition dirs — and the old inference-based
    read-back died with AnalysisException. Every read-after-write now goes
    through data.read_back (schema-on-read): the whole registry must
    BUILD AND RUN against fully-empty tables. This sweeps the exact six
    queries that failed (job_backfill_idempotent, job_retention,
    join_dpp_partitioned, snk_parquet_partitioned, job_compact_day,
    snk_training_shards) plus representatives of every operator family."""
    from cta_train_tracker_analytics_spark.data import TABLES

    empty_dir = str(tmp_path / "empty_sf")
    for t in TABLES:
        load(spark, SF_DIR, t).limit(0).write.parquet(f"{empty_dir}/{t}.parquet")

    names = [
        # the six previously-crashing partitioned write→read round trips
        "job_backfill_idempotent",
        "job_retention",
        "join_dpp_partitioned",
        "snk_parquet_partitioned",
        "job_compact_day",
        "snk_training_shards",
        # family representatives: agg, window, join, dedup, ANN, text,
        # sketch, stats, graph, incremental
        "flagship_region_pricing",
        "win_latest_state",
        "join_asof",
        "ext_dedup_minhash",
        "ext_dedup_embed",
        "ext_sim_search",
        "ext_text_stats",
        "agg_heavy_hitters",
        "agg_kll_quantiles",
        "ext_auc",
        "ext_pagerank",
        "job_incremental_agg",
        # streaming: the outer stream-join derived its watermark-flush
        # sentinels from max(ts), which is NULL on an empty source
        "str_stream_join_outer",
    ]
    queries = registry.all_queries()
    for name in names:
        n = queries[name](spark, empty_dir).count()
        assert n >= 0, name  # must not raise; zero-or-aggregate rows ok


def test_registry_survives_null_payloads(spark, tmp_path):
    """Dirty corpora carry null payloads (missing media, null text from a
    failed extraction, null metric values); operators must skip or
    propagate them, never crash a worker. Discovered crashers, fixed:
    ext_dedup_minhash_mllib (MLlib's LSH hash UDF evaluated ahead of the
    empty-set filter inside the fused join stage — needs the materialized
    barrier), src_binary (encode(None) in the staging loop), and
    ext_multimodal_cols (len(None) in the decode batch). Sweep those
    three plus text/embedding/value-consuming representatives against
    10%-null-injected tables."""
    from cta_train_tracker_analytics_spark.data import TABLES

    null_dir = str(tmp_path / "null_sf")
    nullable = {
        "documents": ["text", "lang", "source"],
        "embeddings": ["embedding"],
        "events": ["value", "event_type"],
    }
    for t in TABLES:
        df = load(spark, SF_DIR, t)
        for c in nullable.get(t, []):
            df = df.withColumn(
                c,
                F.when(
                    F.crc32(
                        F.concat(F.lit(c), F.col(df.columns[0]).cast("string"))
                    )
                    % 10
                    == 0,
                    F.lit(None),
                ).otherwise(F.col(c)),
            )
        if t == "documents":
            # blank text is a distinct dirty class from null: [''] token
            # artifacts, zero-length divisions (quality model), 0-byte
            # blobs the binaryFile index silently skips
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 13 == 0, F.lit(""))
                .when(F.col("doc_id") % 17 == 0, F.lit("  \t \n "))
                .otherwise(F.col("text")),
            )
        if t == "events":
            # non-finite metrics: the statistics tier gates these via
            # _finite_values / WHERE isfinite(value) on both engines
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 19 == 0, F.lit(float("nan")))
                .when(F.col("event_id") % 23 == 0, F.lit(float("inf")))
                .otherwise(F.col("value")),
            )
        df.write.parquet(f"{null_dir}/{t}.parquet")

    names = [
        "ext_dedup_minhash_mllib",
        "src_binary",
        "ext_multimodal_cols",
        "ext_dedup_minhash",
        "ext_dedup_embed",
        "ext_sim_search",
        "ext_text_stats",
        "ext_quality_filter",
        "ext_lm_perplexity",
        "agg_delay_rate",
        "ext_tfidf_topk",
        "agg_heavy_hitters",
        # blank-text crashers/mismatchers, fixed: quality model divided by
        # n_chars=0; winnow/blob rows existed on only one engine
        "ext_quality_model",
        "ext_fingerprint_winnow",
        # NaN/Inf crashers, fixed via the statistics tier's finite gate
        "win_anomaly_zscore",
        "ext_drift_psi",
        "win_rolling_median",
        "ext_bootstrap_ci",
    ]
    queries = registry.all_queries()
    for name in names:
        n = queries[name](spark, null_dir).count()
        assert n >= 0, name


def test_ivf_centroid_seeding_is_id_agnostic(spark, tmp_path):
    """IVF/k-means centroid seeding must not assume the id space starts at
    0: the old `filter(vec_id < 8)` seed yielded ZERO centroids on a
    shifted id space (any real corpus with snowflake/UUID-derived ids),
    and assignment then died with element_at(-1) on the empty distance
    array. Seeding is now the 8 smallest ids — identical on driver data,
    defined on any id space."""
    shifted_dir = str(tmp_path / "shifted_sf")
    for t in TABLES:
        df = load(spark, SF_DIR, t)
        if t == "embeddings":
            df = df.withColumn("vec_id", (F.col("vec_id") + 10**10).cast("bigint"))
        if t == "documents":
            df = df.withColumn("doc_id", (F.col("doc_id") + 10**10).cast("bigint"))
        df.write.parquet(f"{shifted_dir}/{t}.parquet")

    queries = registry.all_queries()
    for name in ("ext_kmeans_update", "ext_semdedup"):
        n = queries[name](spark, shifted_dir).count()
        assert n > 0, name  # centroids exist, assignment runs
    # query-set filters (vec_id < 5) legitimately select nothing on a
    # shifted space — empty result, no crash, oracle agrees
    assert queries["ext_sim_search_ivf"](spark, shifted_dir).count() == 0


def test_rounded_mean_is_cross_engine_exact_at_half_boundary(spark, duck):
    """round(x, 4) on a double mean is NOT cross-engine reproducible at
    .00005 boundaries: Spark rounds the shortest-decimal repr (-9.38375 →
    -9.3838) while DuckDB rounds the binary value (→ -9.3837), and DuckDB
    degrades every decimal division to DOUBLE so decimal math can't save
    it. The integer half-away form agg_seasonality_profile uses —
    (|cents|·200 + n) div (2n), then /10000.0 — must agree bit-for-bit on
    the exact cell the round-7 negative-values sweep caught flipping."""
    import duckdb

    cents, n = -7507, 8  # mean = -9.38375, the observed boundary cell
    row = spark.sql(
        f"""SELECT (CASE WHEN {cents} >= 0
                    THEN ({cents} * 200 + {n}) div (2 * {n})
                    ELSE -((-({cents}) * 200 + {n}) div (2 * {n})) END)
                   / CAST(10000.0 AS DOUBLE) AS v"""
    ).collect()[0]
    con = duckdb.connect()
    oracle = con.execute(
        f"""SELECT (CASE WHEN {cents} >= 0
                    THEN ({cents} * 200 + {n}) // (2 * {n})
                    ELSE -((-({cents}) * 200 + {n}) // (2 * {n})) END)
                   / 10000.0"""
    ).fetchone()[0]
    con.close()
    # DuckDB returns DECIMAL for bigint/decimal-literal division; the
    # driver's pandas conversion maps it to float64 — compare as floats
    assert row["v"] == float(oracle) == -9.3838
