"""Semantic invariants for the round-6 training-pipeline operators —
properties the DuckDB parity hash can confirm but not explain. Each test
states the contract a 100 TB deployment relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.plans import registry

from conftest import SF_DIR


def q(spark, name):
    return registry.all_queries()[name](spark, SF_DIR)


def test_seq_pack_offsets_are_gapless(spark):
    """Within a packer bucket, each doc's tok_offset equals the sum of all
    preceding docs' token counts — no token is lost or double-packed."""
    rows = q(spark, "ext_seq_pack").orderBy("bucket", "doc_id").collect()
    by_bucket: dict[int, int] = {}
    for r in rows:
        expected = by_bucket.get(r.bucket, 0)
        assert r.tok_offset == expected, (r.doc_id, r.tok_offset, expected)
        by_bucket[r.bucket] = expected + r.n_tok
        assert r.n_seqs == r.seq_last - r.seq_first + 1
        assert r.n_seqs >= 1


def test_seq_pack_covers_every_document(spark):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert q(spark, "ext_seq_pack").count() == n_docs


def test_repetition_stats_fractions_bounded(spark):
    df = q(spark, "ext_repetition_stats")
    bad = df.filter(
        (F.col("top_unigram_frac") <= 0)
        | (F.col("top_unigram_frac") > 1)
        | (F.col("dup_token_frac") < 0)
        | (F.col("dup_token_frac") >= 1)
        | (F.col("dup_bigram_frac") < 0)
        | (F.col("dup_bigram_frac") >= 1)
    )
    assert bad.count() == 0


def test_repetition_dup_token_frac_consistent_with_top(spark):
    """A doc whose top unigram repeats must have dup occurrences."""
    rows = q(spark, "ext_repetition_stats").collect()
    for r in rows:
        if r.top_unigram_frac * r.n_tokens >= 2:
            assert r.dup_token_frac > 0


def test_bm25_scores_positive_and_sorted(spark):
    rows = q(spark, "ext_bm25").collect()
    assert 0 < len(rows) <= 20
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_domain_cap_enforces_quota(spark):
    df = q(spark, "ext_domain_cap")
    over = df.groupBy("source").count().filter(F.col("count") > 20)
    assert over.count() == 0
    assert df.filter(F.col("pick") > 20).count() == 0


def test_domain_cap_is_deterministic(spark):
    a = sorted((r.doc_id, r.source) for r in q(spark, "ext_domain_cap").collect())
    b = sorted((r.doc_id, r.source) for r in q(spark, "ext_domain_cap").collect())
    assert a == b


def test_embed_quantize_values_in_int8_range(spark):
    df = q(spark, "ext_embed_quantize")
    bad = df.filter((F.col("q_min") < -127) | (F.col("q_max") > 127))
    assert bad.count() == 0
    # unit-norm property: a vector scaled by 127/||v|| has max |coord| <= 127
    assert df.filter(F.col("l2_norm") <= 0).count() == 0


def test_kmeans_update_partitions_corpus(spark):
    """Every embedding lands in exactly one cell; member counts add up."""
    emb_n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    df = q(spark, "ext_kmeans_update")
    # n_members is repeated across the d positions of a cell
    per_cell = df.groupBy("cell").agg(
        F.countDistinct("n_members").alias("distinct_counts"),
        F.max("n_members").alias("n"),
    )
    assert per_cell.filter(F.col("distinct_counts") != 1).count() == 0
    total = per_cell.agg(F.sum("n")).collect()[0][0]
    assert total == emb_n


def test_mix_weights_sum_to_one(spark):
    rows = q(spark, "ext_mix_weights").collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4


def test_vocab_topk_descending_and_limited(spark):
    rows = q(spark, "ext_vocab_topk").collect()
    assert len(rows) <= 100
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
