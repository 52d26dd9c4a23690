"""End-to-end training-corpus preparation: the pipeline an LLM data team
actually runs, composed from this engine's own operators —

    quality gate → exact dedup → MinHash-LSH near-dup removal → shard plan

Each stage is the registered operator's building block (functions/text.py,
operators/dedup.py), so the composition inherits their scale shapes: the
quality gate is map-only, exact dedup is one hash aggregate, near-dup is
the banded LSH equi-join (never all-pairs), and the shard plan is one
aggregate over hash-assigned shards. Nothing collects on the driver.

Near-dup policy: from every verified pair (id_a < id_b, jaccard ≥ 0.7)
the LARGER id drops — the deterministic keep-first rule. Note pair-drop
is per-edge, not per-component: A~B and B~C drops B and C even if A~C
was never a candidate. That is the standard one-pass policy; the
cluster-accurate variant routes pairs through connected components
(ext_dedup_cluster) first and keeps one doc per component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60, quality_features, token_count
from ..operators.dedup import (
    hashed_shingles,
    minhash_candidate_pairs,
    minhash_signatures,
    verified_jaccard_pairs,
)


def quality_gate(docs: DataFrame) -> DataFrame:
    """The ext_quality_filter predicate as a reusable stage (map-only)."""
    f = quality_features(F.col("text"))
    alpha_ratio = f["n_alpha"] / f["n_chars"].cast("double")
    digit_ratio = f["n_digits"] / f["n_chars"].cast("double")
    return docs.filter(
        f["n_tokens"].between(5, 500) & (alpha_ratio >= 0.5) & (digit_ratio <= 0.3)
    )


def drop_exact_dups(docs: DataFrame) -> DataFrame:
    """Keep the min doc_id per sha256 content hash — one window over the
    hash partition (equivalently a self-join against exact_dedup's keeper
    set, but the window needs no second pass)."""
    w_min = F.min("doc_id").over(Window.partitionBy(F.sha2(F.col("text"), 256)))
    return docs.withColumn("__keep", F.col("doc_id") == w_min).filter("__keep").drop(
        "__keep"
    )


def drop_near_dups(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """MinHash-LSH near-dup removal on the surviving set: drop the larger
    id of every verified pair. Anti-join against the drop set — the drop
    set is LSH-bounded (linear), so the anti-join hashes a small side."""
    tok = hashed_shingles(docs, n=3, distinct=False).localCheckpoint(eager=True)
    sig = minhash_signatures(tok).localCheckpoint(eager=True)
    pairs = verified_jaccard_pairs(
        minhash_candidate_pairs(sig), tok, threshold, distinct_sets=True
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.join(drops, "doc_id", "left_anti")


def shard_plan(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """Deterministic shard manifest over the cleaned corpus: per-shard doc
    and token totals plus id range — what a shard writer consumes."""
    shard = hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % n_shards
    return (
        docs.select("doc_id", "text", shard.cast("bigint").alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )


def prep_training_corpus(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """The full pipeline; returns the shard manifest of the cleaned set.

    The gated+exact-deduped base is pinned (localCheckpoint, reclaimed with
    the result): it feeds the shingle build, the near-dup anti-join, and
    the shard aggregate — unpinned, the quality gate and the dedup window
    would replay once per consumer."""
    base = drop_exact_dups(quality_gate(docs)).localCheckpoint(eager=True)
    return shard_plan(drop_near_dups(base, threshold))
