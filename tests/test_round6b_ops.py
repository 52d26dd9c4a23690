"""Semantic invariants for the round-6 batch-B operators (SCD2, gap
fill, substring/paragraph dedup, PMI collocations, bloom prefilter) —
properties the DuckDB parity hash can confirm but not explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.plans import registry

from conftest import SF_DIR


def q(spark, name):
    return registry.all_queries()[name](spark, SF_DIR)


# --- job_scd2 -----------------------------------------------------------


def test_scd2_intervals_contiguous_and_single_current(spark):
    """Each key's version intervals chain: valid_to(v) == valid_from(v+1),
    exactly one open interval per key, versions start at 1 and are dense."""
    rows = q(spark, "job_scd2").orderBy("user_id", "version").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, spans in by_user.items():
        assert [s.version for s in spans] == list(range(1, len(spans) + 1))
        assert sum(1 for s in spans if s.is_current) == 1
        assert spans[-1].is_current and spans[-1].valid_to is None
        for a, b in zip(spans, spans[1:]):
            assert a.valid_to == b.valid_from, (user, a.version)
            # a run ends because the state changed
            assert a.state != b.state, (user, a.version)


def test_scd2_event_count_conserved(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = q(spark, "job_scd2").agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()


# --- win_gap_fill_locf --------------------------------------------------


def test_gap_fill_grid_is_dense_minutes(spark):
    """Grid rows per user = minutes between first and last observation
    inclusive — no holes, no extrapolation beyond the observed span."""
    df = q(spark, "win_gap_fill_locf")
    agg = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("minute").alias("mn"),
        F.max("minute").alias("mx"),
    )
    for r in agg.collect():
        span_min = (r.mx - r.mn).total_seconds() / 60
        assert r.n == span_min + 1, (r.user_id, r.n, span_min)


def test_gap_fill_locf_never_null_and_carries_forward(spark):
    """After the first observation every minute has a value; unobserved
    minutes repeat the previous minute's filled value."""
    rows = (
        q(spark, "win_gap_fill_locf").orderBy("user_id", "minute").collect()
    )
    prev: dict[int, float] = {}
    for r in rows:
        assert r.value_filled is not None  # grid starts AT an observation
        if not r.is_observed:
            assert r.value_filled == prev[r.user_id]
        prev[r.user_id] = r.value_filled


# --- ext_dedup_substring ------------------------------------------------


def test_substring_dedup_counts_every_doc_once(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = q(spark, "ext_dedup_substring")
    assert df.count() == docs.count()
    assert df.select("doc_id").distinct().count() == docs.count()


def test_substring_dedup_flags_planted_verbatim_copy(spark):
    """Two docs sharing a verbatim 8-token run must both report at least
    one duplicated span; fully-unique synthetic docs report zero."""
    from cta_train_tracker_analytics_spark.plans.llm import (
        ext_dedup_substring,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, f"{shared} unique one tail tokens here now", "en", "s", 1),
            (2, f"other head words lead {shared}", "en", "s", 1),
            (3, "totally distinct words q w e r t y u i o p", "en", "s", 1),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r for r in ext_dedup_substring(spark, d).collect()
        }
        assert out[1].n_dup_spans >= 1
        assert out[2].n_dup_spans >= 1
        assert out[3].n_dup_spans == 0 and out[3].keep


# --- ext_dedup_paragraph ------------------------------------------------


def test_paragraph_dedup_keeps_exactly_one_owner_per_shared_chunk(spark):
    """Token conservation: every chunk is kept in exactly one document
    (its min-doc_id owner); kept counts never exceed chunk counts."""
    df = q(spark, "ext_dedup_paragraph")
    assert df.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    # reconstruct: kept_text token count == 20*full kept chunks (+ tail);
    # weaker invariant that's cheap: kept_text empty iff n_kept == 0
    bad = df.filter(
        ((F.col("n_kept") == 0) & (F.col("kept_text") != ""))
        | ((F.col("n_kept") > 0) & (F.col("kept_text") == ""))
    )
    assert bad.count() == 0


def test_paragraph_dedup_rewrites_cross_doc_copy(spark):
    from cta_train_tracker_analytics_spark.plans.llm import (
        ext_dedup_paragraph,
    )
    import tempfile

    toks20 = " ".join(f"w{i}" for i in range(20))
    with tempfile.TemporaryDirectory() as d:
        rows = [
            (1, toks20, "en", "s", 1),  # owner
            (2, toks20 + " " + " ".join(f"x{i}" for i in range(20)), "en", "s", 1),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in ext_dedup_paragraph(spark, d).collect()}
        assert out[1].n_kept == 1  # owns its chunk
        assert out[2].n_kept == 1  # lost the shared chunk, kept the x-chunk
        assert out[2].kept_text == " ".join(f"x{i}" for i in range(20))


# --- ext_pmi_collocations ----------------------------------------------


def test_pmi_top20_sorted_and_supported(spark):
    rows = q(spark, "ext_pmi_collocations").collect()
    assert len(rows) == 20
    assert all(r.nab >= 5 for r in rows)
    keys = [(-r.pmi, r.a, r.b) for r in rows]
    assert keys == sorted(keys)


# --- ext_bloom_prefilter ------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    """Every corpus doc whose text hash equals a benchmark hash MUST be a
    bloom hit and verified contaminated — bloom filters never drop true
    members. False positives are allowed (and expected) but must carry
    contaminated=false."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from cta_train_tracker_analytics_spark.functions.text import hash60

    g = docs.select("doc_id", hash60(F.col("text")).alias("gh"))
    bench = g.filter(F.col("doc_id") < 50).select("gh").distinct()
    true_members = (
        g.filter(F.col("doc_id") >= 50)
        .join(bench, "gh", "left_semi")
        .select("doc_id")
    )
    out = q(spark, "ext_bloom_prefilter")
    flagged = out.filter(F.col("contaminated")).select("doc_id")
    missed = true_members.exceptAll(flagged)
    assert missed.count() == 0
    extra = flagged.exceptAll(true_members)
    assert extra.count() == 0  # contaminated == exact membership


# --- agg_funnel ---------------------------------------------------------


def test_funnel_is_monotone_nonincreasing(spark):
    rows = {r.step: r for r in q(spark, "agg_funnel").collect()}
    assert rows[1].n_users >= rows[2].n_users >= rows[3].n_users
    assert rows[1].conv_from_top == 1.0
    assert 0 <= rows[3].conv_from_top <= rows[2].conv_from_top <= 1.0


def test_funnel_respects_event_order(spark):
    """A user whose only click precedes their first view must not count
    as converted at step 2."""
    from cta_train_tracker_analytics_spark.plans.relational import agg_funnel
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: proper view -> click -> purchase
        (1, t0, 1, "view", 1.0, ""),
        (2, t0 + m, 1, "click", 1.0, ""),
        (3, t0 + 2 * m, 1, "purchase", 1.0, ""),
        # user 2: click BEFORE first view — never advances
        (4, t0, 2, "click", 1.0, ""),
        (5, t0 + m, 2, "view", 1.0, ""),
        # user 3: view only
        (6, t0, 3, "view", 1.0, ""),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        out = {r.step: r for r in agg_funnel(spark, d).collect()}
        assert out[1].n_users == 3
        assert out[2].n_users == 1
        assert out[3].n_users == 1


# --- win_anomaly_zscore -------------------------------------------------


def test_anomaly_zscore_all_flagged_exceed_three_sigma(spark):
    rows = q(spark, "win_anomaly_zscore").collect()
    assert all(abs(r.zscore) > 3 for r in rows)


# --- ext_minhash_accuracy ----------------------------------------------


def test_minhash_accuracy_bounds_and_quantization(spark):
    """Estimates are quantized to k/16; both scores live in [0, 1]; the
    error column is literally |est − exact| on the rounded values."""
    rows = q(spark, "ext_minhash_accuracy").collect()
    assert rows, "LSH candidate set should not be empty"
    for r in rows:
        assert 0.0 <= r.est_j <= 1.0 and 0.0 <= r.exact_j <= 1.0
        assert abs(r.est_j * 16 - round(r.est_j * 16)) < 1e-6
        assert abs(r.abs_err - round(abs(r.est_j - r.exact_j), 4)) < 1e-9


def test_minhash_accuracy_covers_verified_pairs(spark):
    """Every pair the production minhash op verifies at ≥0.7 appears in
    the audit with exact_j ≥ 0.7 — the audit sees the full candidate set."""
    verified = {
        (r.id_a, r.id_b)
        for r in q(spark, "ext_dedup_minhash").collect()
    }
    audit = {
        (r.id_a, r.id_b): r.exact_j
        for r in q(spark, "ext_minhash_accuracy").collect()
    }
    for pair in verified:
        assert pair in audit and audit[pair] >= 0.7


# --- ext_knn_graph ------------------------------------------------------


def test_knn_graph_blocked_topk_invariants(spark):
    """≤3 neighbors per vector, no self-edges, neighbors share the
    vector's block label, ranks dense from 1."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = q(spark, "ext_knn_graph").orderBy("vec_id", "rnk").collect()
    per_vec: dict[int, list] = {}
    for r in rows:
        assert r.vec_id != r.neighbor_id
        assert labels[r.vec_id] == labels[r.neighbor_id]
        per_vec.setdefault(r.vec_id, []).append(r)
    for vec, nbrs in per_vec.items():
        assert 1 <= len(nbrs) <= 3
        assert [n.rnk for n in nbrs] == list(range(1, len(nbrs) + 1))
        sims = [n.cos_sim for n in nbrs]
        assert sims == sorted(sims, reverse=True)
