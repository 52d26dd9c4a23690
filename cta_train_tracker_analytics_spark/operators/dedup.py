"""Deduplication operators for LLM training-data pipelines (north star;
SURVEY.md §2.11): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design — the one rule: **never compare all pairs**. Every near-dup
operator here blocks candidates through an equi-joinable key (LSH band
bucket, simhash band, rare n-gram) so Catalyst plans shuffled hash joins on
bounded buckets; the exact similarity check runs only inside buckets. At
100 TB the bucket join shuffles O(docs × bands) rows — linear, not
quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_PRIME,
    fingerprint,
    hash60,
    minhash_params,
    tokens,
)

__all__ = [
    "exact_dedup",
    "doc_tokens",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash16",
    "ngram_candidate_pairs",
    "verified_jaccard_pairs",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one surviving row (min id) per sha256.
    A single hash aggregate — the cheapest possible full-corpus dedup."""
    return df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash")).agg(
        F.min(id_col).cast("bigint").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )


def doc_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tok) distinct token pairs — the exploded set representation every
    set-similarity operator shares."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def minhash_signatures(tok_df: DataFrame) -> DataFrame:
    """MinHash signatures: K permutations of a 60-bit token hash, min per doc.

    One explode + one hash aggregate: (id, i, mh). The permutation constants
    are LCG-derived (functions/text.py) so oracles can replicate exactly.
    """
    h = tok_df.select("id", (hash60(F.col("tok")) % MINHASH_PRIME).alias("hv"))
    perms = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for i, (a, b) in enumerate(minhash_params())
        ]
    )
    exploded = h.select("id", "hv", F.explode(perms).alias("p"))
    return exploded.groupBy("id", F.col("p.i").alias("i")).agg(
        F.min((F.col("p.a") * F.col("hv") + F.col("p.b")) % MINHASH_PRIME).alias("mh")
    )


def minhash_candidate_pairs(sig: DataFrame) -> DataFrame:
    """LSH banding: equal (band, band-signature) → candidate pair. The join
    key is the md5 of the band's ordered minhash values, so buckets are
    equi-joinable strings. Returns distinct (id_a, id_b), id_a < id_b."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    banded = sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
    band_sig = banded.groupBy("id", "band").agg(
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list(F.format_string("%02d:%d", F.col("i"), F.col("mh")))))).alias(
            "band_hash"
        )
    )
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def verified_jaccard_pairs(
    candidates: DataFrame, tok_df: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard verification, candidates only: intersection via a
    two-way equi-join on token, union by |A|+|B|−|A∩B|. No pair blow-up —
    the candidate set is already blocked."""
    sizes = tok_df.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        candidates.join(tok_df.select(F.col("id").alias("id_a"), "tok"), "id_a")
        .join(tok_df.select(F.col("id").alias("id_b"), "tok"), ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        F.col("id_a").cast("bigint"),
        F.col("id_b").cast("bigint"),
        "jaccard",
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: per bit, sum +1/−1 over distinct token hashes; the
    fingerprint packs positive bits. 16 integer sums per token — linear work,
    exact integer arithmetic (oracle-reproducible)."""
    tok = doc_tokens(df, text_col, id_col)
    h = tok.select("id", (hash60(F.col("tok"))).alias("hv"))
    bits = F.array(*[F.lit(j) for j in range(16)])
    per_bit = h.select("id", "hv", F.explode(bits).alias("j")).withColumn(
        "w", F.when(F.expr("shiftright(hv, j) % 2") == 1, 1).otherwise(-1)
    )
    sums = per_bit.groupBy("id", "j").agg(F.sum("w").alias("s"))
    return sums.groupBy("id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1, j)")).otherwise(0))
        .cast("bigint")
        .alias("simhash")
    )


def ngram_candidate_pairs(
    df: DataFrame,
    n: int = 3,
    max_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocking by *rare* word n-grams: docs sharing an n-gram whose document
    frequency ≤ ``max_df`` become candidates. The df cap is the scale lever —
    common n-grams (the quadratic ones) never join."""
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts"))
    # n-gram via sliding window over the token array — pure higher-order fns.
    ngrams = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("ts") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("ts", i + 1, n)),
            )
        ).alias("ng"),
    ).filter(F.length("ng") > 0)
    ngrams = ngrams.filter(F.size(F.split(F.col("ng"), " ")) == n).distinct()
    rare = (
        ngrams.groupBy("ng")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .filter(F.col("dfreq").between(2, max_df))
    )
    blocked = ngrams.join(rare.select("ng"), "ng")
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(b, (F.col("a.ng") == F.col("b.ng")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def latest_fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-fingerprint dedup: groups by the whitespace/case-normalized
    md5 fingerprint, keeps the lowest id."""
    return df.groupBy(fingerprint(F.col(text_col)).alias("fp")).agg(
        F.min(id_col).cast("bigint").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )
