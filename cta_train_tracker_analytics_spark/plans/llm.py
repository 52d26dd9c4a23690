"""Registered LLM-data-pipeline queries (north star; SURVEY.md §2.11):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-LSH),
similarity search, text stats, quality filtering, language-ID, document
fingerprinting, multimodal columns.

Every operator is blocked/bucketed — no all-pairs joins anywhere. The
oracles replicate the *same algorithm* in DuckDB SQL (portable md5-based
hashing + LCG-derived constants, integer arithmetic), so even the
approximate LSH pipelines hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load, read_back
from ..functions.text import (
    bpe_ish_token_count,
    fingerprint,
    hash60,
    quality_features,
    token_count,
    tokens,
)
from ..operators.dedup import (
    _shingle_rows,
    connected_components,
    connected_components_alternating,
    doc_shingles,
    exact_dedup,
    hashed_shingles,
    group_star_edges,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash16,
    verified_containment_pairs,
    verified_jaccard_pairs,
    winnow_fingerprints,
)
from ..operators.multimodal import attach_binary, decode_features
from ..operators.similarity import (
    adaptive_planes,
    ivf_assign,
    ivf_assign_multi,
    ivf_assign_sharded,
    ivf_assign_sharded_3level,
    ivf_assign_sharded_multi,
    ivf_assign_two_level,
    ivf_topk,
    lsh_banded_pairs,
    lsh_bucketed_pairs,
    pq_adc_topk,
    pq_code_cols,
    pq_code_sqls,
    pq_pack,
    pq_pack_sql,
    projection_planes,
    scored_cosine,
    topk_cosine,
)
from ..operators.similarity import (
    _lit_matrix_sql,
    dot_sql,
    norm_sql,
)
from ..operators.util import spread
from .registry import query

#: shared oracle CTE: distinct (id, tok) whitespace tokens per document.
_TOK_CTE = """
    tok AS (
        SELECT DISTINCT doc_id AS id, t.tok
        FROM documents, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    )
"""

#: shared oracle CTE: distinct (id, tok) word TRIGRAM shingles per document
#: (matches operators/dedup.py:doc_shingles — the minhash set unit).
_SHINGLE_CTE = """
    toks AS (
        SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents
    ),
    t AS (SELECT id, generate_subscripts(l, 1) AS i, unnest(l) AS tok FROM toks),
    tok AS (SELECT DISTINCT a.id, a.tok || ' ' || b.tok || ' ' || c.tok AS tok
            FROM t a
            JOIN t b ON b.id = a.id AND b.i = a.i + 1
            JOIN t c ON c.id = a.id AND c.i = a.i + 2)
"""


@query(
    "ext_dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by sha256 content hash — one hash aggregate."""
    return exact_dedup(load(spark, sf_dir, "documents"))


@query(
    "ext_fingerprint",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    """,
)
def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint dedup: md5 over case-folded,
    whitespace-collapsed text — catches reflowed/re-cased copies."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(fingerprint(F.col("text")).alias("fp")).agg(
        F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )


@query(
    "ext_fingerprint_winnow",
    oracle="""
    WITH g AS (
        SELECT doc_id, lower(trim(text)) AS t,
               greatest(length(lower(trim(text))) - 7, 0) AS ng
        FROM documents
    ),
    h AS (
        SELECT doc_id, ng,
               list_transform(
                   generate_series(1, ng),
                   i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT
               ) AS gh
        FROM g
    ),
    fp AS (
        SELECT doc_id,
               list_distinct(
                   list_transform(
                       generate_series(1, greatest(ng - 15, 0)),
                       j -> list_min(gh[j:j + 15])
                   )
               ) AS fps
        FROM h
    )
    SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS min_fp
    FROM fp
    WHERE len(fps) > 0
    """,
)
def ext_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints: rolling k-gram hashes, min per
    sliding window, distinct — the position-robust fingerprint set that
    catches partial content overlap, unlike whole-document hashing.
    Explode + RANGE-window plan so each gram hashes exactly once; sharing a
    fingerprint value is the blocking key for overlap detection at scale.
    A doc too short to yield any k-gram window has NO row here (it has no
    entry in the fingerprint index — the explode drops it naturally); the
    oracle filters len(fps) > 0 to match."""
    docs = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, k=8, w=16)
    return fps.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp"),
        F.min("fp").cast("bigint").alias("min_fp"),
    )


@query(
    "ext_dedup_minhash",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    h AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
          FROM tok),
    params AS (SELECT i,
                      ((1103515245 * i + 12345) % 2147483646) + 1 AS a,
                      (1103515245 * (i + 100) + 12345) % 2147483647 AS b
               FROM generate_series(0, 15) g(i)),
    sig AS (SELECT id, i, min((a * (hv % 2147483647) + b) % 2147483647) AS mh
            FROM h CROSS JOIN params GROUP BY id, i),
    bands AS (SELECT id, i // 4 AS band,
                     md5(string_agg(format('{{:02d}}:{{}}', i, mh), ',' ORDER BY i))
                     AS band_hash
              FROM sig GROUP BY id, i // 4),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS n FROM h GROUP BY id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN h ta ON ta.id = c.id_a
              JOIN h tb ON tb.id = c.id_b AND tb.hv = ta.hv
              GROUP BY c.id_a, c.id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.7
    """,
)
def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup over word-trigram SHINGLES: 16 permutations,
    4 bands → banded equi-join for candidates, exact Jaccard ≥ 0.7 verified
    inside buckets only. Shingles (not unigrams) keep similarity sparse —
    unigram sets on a small-vocab corpus made every pair a 'near-dup'
    (4.3M output rows at sf0.1, quadratic). The oracle replays the
    identical algorithm (portable md5 hashing).

    Cache design: TWO pinned tables, both via ``localCheckpoint`` (blocks
    are ContextCleaner-reclaimed when the result DataFrame dies — nothing
    leaks into a long-lived session's cache; see lsh_bucketed_pairs for the
    lineage trade-off). The HASHED shingle set (id, hv) feeds the signature
    aggregate and both sides of the Jaccard verify join; each shingle is
    md5-hashed exactly once at the map side, and every later shuffle and
    join moves 16-byte bigint pairs, not strings (warm run 3.6s → 1.4s at
    sf0.1). The SIGNATURE table (one short array row per doc) is pinned
    too: the band self-join and the verify stage each re-traverse it, and
    without the pin every downstream action replays the 16-permutation
    aggregate (measured 10.4s → 2.0s at sf0.1 when both pins are in
    place). At 100 TB the shingle pin is tokens-sized but 5-20× narrower
    than strings; the signature pin is corpus-row-count-sized — both spill
    cleanly (MEMORY_AND_DISK blocks).

    No corpus-wide distinct: the shingle table keeps raw occurrence rows
    (``distinct=False``) because the minhash MIN aggregate is
    duplicate-insensitive, and the verify stage dedups only its
    candidate-restricted working set (``distinct_sets=True``) — the
    set-semantics exchange that used to shuffle the whole token stream now
    touches LSH candidates only (cold run 8.3s → 2.8s at sf0.1)."""
    tok = hashed_shingles(
        load(spark, sf_dir, "documents"), n=3, distinct=False
    ).localCheckpoint(eager=True)
    sig = minhash_signatures(tok).localCheckpoint(eager=True)
    cand = minhash_candidate_pairs(sig)
    return verified_jaccard_pairs(cand, tok, threshold=0.7, distinct_sets=True)


@query(
    "ext_decontaminate",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    h AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
          FROM tok),
    bench AS (SELECT id, hv FROM h WHERE id < 50),
    corpus AS (SELECT id, hv FROM h WHERE id >= 50),
    bsizes AS (SELECT id, count(*) AS n FROM bench GROUP BY id),
    hits AS (SELECT c.id AS corpus_id, b.id AS bench_id, count(*) AS n_shared
             FROM corpus c JOIN bench b ON b.hv = c.hv
             GROUP BY c.id, b.id)
    SELECT CAST(corpus_id AS BIGINT) AS corpus_id,
           CAST(bench_id AS BIGINT) AS bench_id,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared / CAST(bs.n AS DOUBLE), 4) AS bench_frac
    FROM hits JOIN bsizes bs ON bs.id = bench_id
    WHERE n_shared >= 2
    """,
)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the train/test overlap check every
    training pipeline runs before releasing a corpus: flag corpus documents
    that share word-trigram shingles with a held-out benchmark set (here:
    doc_id < 50 stands in for the benchmark). Reports the shared-shingle
    count and the fraction of the benchmark doc covered.

    Scale shape: the benchmark side is tiny by construction (benchmarks are
    thousands of docs, corpora are billions), so the benchmark docs are
    filtered BEFORE shingling — the doc_id predicate pushes into the
    parquet scan, and the benchmark shingle set is built from ~50 docs,
    never by materializing and filtering the full corpus shingle set. The
    per-doc shingle count rides along on the benchmark rows (a window over
    the tiny set), so ONE broadcast serves both the probe join and the
    coverage fraction — no pin, no second join. The corpus shingles stream
    through the single map-side hash join: at 100 TB nothing corpus-sized
    is ever materialized, shuffled, or pair-joined. The shared
    hashed_shingles builder means each corpus shingle is md5-hashed once
    and joined as a bigint.

    The corpus side keeps RAW occurrence rows (``distinct=False``): the
    set-semantics dedup the shared-shingle count needs runs AFTER the
    broadcast probe join, as a count(DISTINCT hv) over the (tiny) hit set —
    the corpus-wide distinct exchange this replaces was the only
    corpus-sized shuffle in the plan (wall-time parity at sf0.1 where the
    corpus fits in memory; at 100 TB the removed exchange is the entire
    shuffled token stream)."""
    docs = load(spark, sf_dir, "documents")
    bench = hashed_shingles(docs.filter(F.col("doc_id") < 50), n=3).select(
        F.col("id").alias("bench_id"),
        "hv",
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("n"),
    )
    corpus = hashed_shingles(docs.filter(F.col("doc_id") >= 50), n=3, distinct=False)
    return (
        corpus.join(F.broadcast(bench), "hv")
        .groupBy(F.col("id").alias("corpus_id"), "bench_id")
        .agg(F.count_distinct("hv").alias("n_shared"), F.any_value("n").alias("n"))
        .filter(F.col("n_shared") >= 2)
        .select(
            F.col("corpus_id").cast("bigint"),
            F.col("bench_id").cast("bigint"),
            F.col("n_shared").cast("bigint"),
            F.round(F.col("n_shared") / F.col("n").cast("double"), 4).alias(
                "bench_frac"
            ),
        )
    )


@query(
    "ext_dedup_minhash_mllib",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
           CAST(0 AS BIGINT) AS n_pairs_below_thresh,
           CAST(0 AS BIGINT) AS n_dup_pairs_missed
    FROM tok
    """,
)
def ext_dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib flavor of MinHash near-dup (SURVEY §2.11's named primitive):
    HashingTF token vectors → MinHashLSH.approxSimilarityJoin. Seeded, so
    deterministic per Spark version — but the hash family is JVM-internal,
    so the PAIR SET is not SQL-replayable; exact oracle parity on pairs is
    carried by ext_dedup_minhash (the portable-hash implementation).

    The registered form therefore surfaces the audit (r11 verdict #6) —
    one row with the two invariants the sketch guarantees regardless of
    hash family, so the driver checks semantics instead of rows-only:

    - ``n_pairs_below_thresh`` = returned pairs whose EXACT trigram-set
      Jaccard is < 0.65. approxSimilarityJoin's distance filter is exact
      over the hashed-feature sets (thresh 0.3 → Jaccard ≥ 0.7), so this
      is 0 by construction (0.05 slack absorbs the rare 2^18-bin feature
      collision); any junk pair a broken LSH emits flips the hash.
    - ``n_dup_pairs_missed`` = identical-token-sequence pairs absent from
      the output. Identical docs have Jaccard exactly 1, so EVERY hash
      table buckets them together — recall 1 is guaranteed, not
      probabilistic; a broken bucketing flips the hash.
    - ``n_docs`` anchors the audit to the data (docs with ≥1 trigram;
      the oracle replays it from the shared shingle CTE).

    The raw pair set stays available via ``mllib_minhash_pairs`` (used by
    the recall-vs-portable-minhash unit test and by callers who want the
    pairs themselves)."""
    feats, p = mllib_minhash_pairs(spark, sf_dir)
    ta = feats.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    tb = feats.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")) / F.size(F.array_union("ta", "tb"))
    pair_audit = (
        p.join(ta, "id_a")
        .join(tb, "id_b")
        .agg(
            F.coalesce(
                F.sum((jac < 0.65).cast("bigint")), F.lit(0).cast("bigint")
            ).alias("n_pairs_below_thresh"),
            F.coalesce(
                F.sum((F.col("ta") == F.col("tb")).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("n_dup_pairs_found"),
        )
    )
    # identical token sequences -> identical trigram arrays (injective for
    # >= 3 tokens), Jaccard exactly 1 -> guaranteed candidates
    expected = feats.groupBy("toks").agg(F.count(F.lit(1)).alias("c")).agg(
        F.coalesce(
            F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0).cast("bigint")
        ).alias("n_dup_pairs_expected")
    )
    n_docs = feats.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        n_docs.crossJoin(pair_audit)
        .crossJoin(expected)
        .select(
            "n_docs",
            "n_pairs_below_thresh",
            (F.col("n_dup_pairs_expected") - F.col("n_dup_pairs_found")).alias(
                "n_dup_pairs_missed"
            ),
        )
    )


def mllib_minhash_pairs(spark: SparkSession, sf_dir: str):
    """The MLlib MinHash pipeline behind ext_dedup_minhash_mllib: trigram
    shingle arrays → HashingTF → MinHashLSH.approxSimilarityJoin. Returns
    ``(feats, pairs)`` — the checkpointed (doc_id, toks, features) working
    set and the deduped (id_a < id_b) near-dup candidate pairs at Jaccard
    distance ≤ 0.3."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from ..functions.text import tokens as tokens_expr

    # trigram shingle ARRAYS (same unit as ext_dedup_minhash — unigrams on a
    # small-vocab corpus make 'similar' quadratic)
    ts = tokens_expr(F.col("text"))
    shingles = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(ts) - 3, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(ts, i + 1, 3)),
        ),
        lambda s: F.size(F.split(s, " ")) == 3,
    )
    # Empty shingle sets (null/short docs — routine in dirty corpora) kill
    # MinHashLSHModel.hashFunction ("Must have at least 1 non zero
    # entry"), and a plain filter(size(toks) > 0) is NOT enough: inside
    # approxSimilarityJoin the hash UDF becomes part of the join key, and
    # the fused codegen stage evaluates that subexpression before the size
    # predicate (verified empirically — the filtered plan still threw).
    # The eager localCheckpoint is the reliable guard: the hash UDF then
    # runs over the MATERIALIZED filtered rows only. MLlib's LSH already
    # materializes passes in fit(), so the extra cost is one cache of the
    # (id, toks, features) working set; the portable-hash
    # ext_dedup_minhash remains the primary 100 TB implementation.
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id"), shingles.alias("toks")
    ).filter(F.size("toks") > 0)
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(docs).localCheckpoint(eager=True)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    p = (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return feats, p


@query(
    "ext_dedup_minhash_twostage",
    oracle=f"""
    WITH fams AS (SELECT sha256(text) AS h, min(doc_id) AS rep,
                         count(*) AS n_docs
                  FROM documents GROUP BY sha256(text)),
    toks AS (
        SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents JOIN fams ON doc_id = fams.rep
    ),
    t AS (SELECT id, generate_subscripts(l, 1) AS i, unnest(l) AS tok FROM toks),
    tok AS (SELECT DISTINCT a.id, a.tok || ' ' || b.tok || ' ' || c.tok AS tok
            FROM t a
            JOIN t b ON b.id = a.id AND b.i = a.i + 1
            JOIN t c ON c.id = a.id AND c.i = a.i + 2),
    h AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
          FROM tok),
    params AS (SELECT i,
                      ((1103515245 * i + 12345) % 2147483646) + 1 AS a,
                      (1103515245 * (i + 100) + 12345) % 2147483647 AS b
               FROM generate_series(0, 15) g(i)),
    sig AS (SELECT id, i, min((a * (hv % 2147483647) + b) % 2147483647) AS mh
            FROM h CROSS JOIN params GROUP BY id, i),
    bands AS (SELECT id, i // 4 AS band,
                     md5(string_agg(format('{{:02d}}:{{}}', i, mh), ',' ORDER BY i))
                     AS band_hash
              FROM sig GROUP BY id, i // 4),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS n FROM h GROUP BY id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN h ta ON ta.id = c.id_a
              JOIN h tb ON tb.id = c.id_b AND tb.hv = ta.hv
              GROUP BY c.id_a, c.id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard,
           CAST(fa.n_docs AS BIGINT) AS n_docs_a,
           CAST(fb.n_docs AS BIGINT) AS n_docs_b
    FROM inter
    JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    JOIN fams fa ON fa.rep = id_a JOIN fams fb ON fb.rep = id_b
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.7
    """,
)
def ext_dedup_minhash_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE near-dup: exact dedup first, minhash LSH only over the
    one representative (min doc_id) of each exact-duplicate family, family
    sizes re-attached to the verified pairs. This is the documented
    mitigation for LSH's k²-on-exact-dup-families blowup
    (operators/dedup.py `minhash_candidate_pairs`): a family of k
    identical documents shares every band, so single-stage LSH enumerates
    k² candidate pairs of it; collapsing the family to one representative
    first makes that cost k (one hash aggregate) + the near-dup work on
    unique content only. On crawl corpora where exact duplication is the
    dominant redundancy (boilerplate mirrors), the survivors of stage 1
    are a small fraction of N — the standard production shape.

    Output: near-dup pairs among representatives with both family sizes,
    so downstream cluster accounting can weight by true document count."""
    docs = load(spark, sf_dir, "documents")
    fams = docs.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("n_docs")
    )
    rep_docs = docs.join(
        fams.select(F.col("rep").alias("doc_id"), "n_docs"), "doc_id"
    )
    tok = hashed_shingles(rep_docs, n=3, distinct=False).localCheckpoint(eager=True)
    sig = minhash_signatures(tok).localCheckpoint(eager=True)
    cand = minhash_candidate_pairs(sig)
    pairs = verified_jaccard_pairs(cand, tok, threshold=0.7, distinct_sets=True)
    sizes = fams.select(F.col("rep"), F.col("n_docs"))
    return (
        pairs.join(sizes.withColumnRenamed("rep", "id_a"), "id_a")
        .withColumnRenamed("n_docs", "n_docs_a")
        .join(sizes.withColumnRenamed("rep", "id_b"), "id_b")
        .withColumnRenamed("n_docs", "n_docs_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.col("n_docs_a").cast("bigint"),
            F.col("n_docs_b").cast("bigint"),
        )
    )


@query(
    "ext_dedup_embed_banded",
    oracle="""
    WITH params AS (
        -- replay adaptive_planes(): smallest planes with 2^planes >= n/64,
        -- clamped to [8, 24] (operators/similarity.py); tables follow
        -- the compensation rule 4 + (np - 8)
        SELECT CASE WHEN cnt <= 64 THEN 8
                    ELSE greatest(8, least(24,
                         CAST(ceil(log2(cnt / 64.0)) AS INTEGER)))
               END AS np
        FROM (SELECT count(*) AS cnt FROM embeddings)
    ),
    planes AS (
        SELECT p // np AS tbl, p % np AS bit, d,
               CAST((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),
                                     1, 15))::BIGINT % 2000001)
                    - 1000000 AS DOUBLE) AS c
        FROM generate_series(0, 479) gp(p), generate_series(0, 63) gd(d), params
        WHERE p < (4 + np - 8) * np
    ),
    emb AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                   unnest(embedding)::DOUBLE AS v
            FROM embeddings),
    proj AS (SELECT vec_id, tbl, bit, sum(c * v) AS dp
             FROM emb JOIN planes USING (d) GROUP BY vec_id, tbl, bit),
    bucket AS (SELECT vec_id, tbl,
                      CAST(sum(CASE WHEN dp >= 0 THEN (1 << bit) ELSE 0 END)
                           AS INTEGER) AS bucket
               FROM proj GROUP BY vec_id, tbl),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bucket a JOIN bucket b
               ON a.tbl = b.tbl AND a.bucket = b.bucket
              AND a.vec_id < b.vec_id),
    terms AS (SELECT c.id_a, c.id_b, unnest(ea.embedding)::DOUBLE AS va,
                     unnest(eb.embedding)::DOUBLE AS vb
              FROM cand c
              JOIN embeddings ea ON ea.vec_id = c.id_a
              JOIN embeddings eb ON eb.vec_id = c.id_b),
    cos AS (SELECT id_a, id_b,
                   sum(va * vb) / (sqrt(sum(va * va)) * sqrt(sum(vb * vb))) AS cs
            FROM terms GROUP BY id_a, id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(cs, 4) AS cos_sim
    FROM cos WHERE cs >= 0.2
    """,
)
def ext_dedup_embed_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (banded) sign-LSH embedding near-dup: 4 + (planes − 8)
    independent tables of adaptive_planes() bits each (the r12
    compensation rule — one extra table per occupancy-bounding bit past
    the floor); collide in ANY table → candidate; cosine ≥ 0.2 verified
    once per distinct pair. The recall companion to ext_dedup_embed —
    adaptive bit growth keeps buckets bounded at 100 TB but costs
    per-table recall, and L tables turn per-table recall r into
    1 − (1 − r)^L (the minhash banding argument, applied to the
    embedding space). Measured at 20k rows: (8 bits, 4 tables) 1.58M
    verified pairs / 27.6 s vs the rule's (9, 5) 1.33M / 14.5 s — 84%
    of the pairs at half the time, at the hardest threshold (0.2; real
    near-dups at cos 0.9 retain far more per bit). Table 0's planes are
    exactly ext_dedup_embed's, so the single-table pairs are a subset
    by construction (asserted in tests).

    Second-decade slope (measured r15, BENCH_DETAIL sf10_probe +
    second_decade_probe): 18.2× wall for 10× rows at 20k→200k vectors,
    fully accounted by candidate volume ×26.9 = rows ×10 × tables ×1.6
    (5→8 as planes grow 9→12) × occupancy-phase ×1.25 (the ⌈log2⌉
    quantization swings per-bucket occupancy between 32 and 64) × skew
    ×1.34 (max bucket 507 vs avg 49 on sign-bucketed clustered data) —
    the documented N·tables·occupancy/2 model holding at scale, within
    a log factor of linear with bounded phase/skew factors, not a plan
    regression. The recall bought by the extra tables is the product
    being paid for; the cheaper strictly-linear form at lower recall is
    ext_dedup_embed (single table)."""
    emb = load(spark, sf_dir, "embeddings")
    return lsh_banded_pairs(emb, dims=64, threshold=0.2)


@query(
    "ext_dedup_embed_incremental",
    oracle="""
    WITH corpus AS (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id >= 100),
    batch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    params AS (
        SELECT CASE WHEN cnt <= 64 THEN 8
                    ELSE greatest(8, least(24,
                         CAST(ceil(log2(cnt / 64.0)) AS INTEGER)))
               END AS np
        FROM (SELECT count(*) AS cnt FROM corpus)
    ),
    planes AS (
        SELECT p, d,
               CAST((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),
                                     1, 15))::BIGINT % 2000001)
                    - 1000000 AS DOUBLE) AS c
        FROM generate_series(0, 23) gp(p), generate_series(0, 63) gd(d), params
        WHERE p < np
    ),
    cemb AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                    unnest(embedding)::DOUBLE AS v FROM corpus),
    bemb AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                    unnest(embedding)::DOUBLE AS v FROM batch),
    cproj AS (SELECT vec_id, p, sum(c * v) AS dp
              FROM cemb JOIN planes USING (d) GROUP BY vec_id, p),
    bproj AS (SELECT vec_id, p, sum(c * v) AS dp
              FROM bemb JOIN planes USING (d) GROUP BY vec_id, p),
    cbucket AS (SELECT vec_id,
                       CAST(sum(CASE WHEN dp >= 0 THEN (1 << p) ELSE 0 END)
                            AS INTEGER) AS bucket
                FROM cproj GROUP BY vec_id),
    bbucket AS (SELECT vec_id,
                       CAST(sum(CASE WHEN dp >= 0 THEN (1 << p) ELSE 0 END)
                            AS INTEGER) AS bucket
                FROM bproj GROUP BY vec_id),
    cand AS (SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id
             FROM bbucket b JOIN cbucket c ON b.bucket = c.bucket),
    terms AS (SELECT cd.batch_id, cd.corpus_id,
                     unnest(eb.embedding)::DOUBLE AS vb,
                     unnest(ec.embedding)::DOUBLE AS vc
              FROM cand cd
              JOIN embeddings eb ON eb.vec_id = cd.batch_id
              JOIN embeddings ec ON ec.vec_id = cd.corpus_id),
    cos AS (SELECT batch_id, corpus_id,
                   sum(vb * vc) / (sqrt(sum(vb * vb)) * sqrt(sum(vc * vc))) AS cs
            FROM terms GROUP BY batch_id, corpus_id)
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(corpus_id AS BIGINT) AS corpus_id,
           round(cs, 4) AS cos_sim
    FROM cos WHERE cs >= 0.2
    """,
)
def ext_dedup_embed_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus EMBEDDING dedup — the vector twin of
    ext_dedup_incremental's hash-index shape, for 'does this new crawl
    batch near-duplicate anything we already have' by cosine. The corpus
    side collapses to its sign-LSH bucket assignment (in production a
    precomputed, incrementally-maintained index — corpus vectors never
    re-shuffle per batch); the small batch is bucketed with the SAME
    corpus-count-sized planes and equi-joined per bucket; cosine ≥ 0.2 is
    verified on candidates only. No batch×corpus cross join exists at any
    scale — candidates are bucket-local."""
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 100)
    batch = emb.filter(F.col("vec_id") < 100)
    planes = adaptive_planes(corpus.count())
    coefs = projection_planes(64, planes)

    def bucketed(df: DataFrame, id_alias: str) -> DataFrame:
        # single-parse transform over the literal plane matrix (see
        # lsh_bucketed_pairs — plan-construction cost tracks py4j calls)
        projs = F.expr(
            f"transform({_lit_matrix_sql(coefs)}, row -> "
            f"{dot_sql('embedding', 'row')})"
        )
        bucket = F.expr(
            "("
            + " + ".join(
                f"(case when element_at(__projs, {p + 1}) >= 0 "
                f"then {1 << p} else 0 end)"
                for p in range(planes)
            )
            + ")"
        )
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.col("embedding").alias(f"{id_alias}_vec"),
            F.expr(norm_sql("embedding")).alias(f"{id_alias}_nrm"),
            projs.alias("__projs"),
        ).select(
            id_alias,
            f"{id_alias}_vec",
            f"{id_alias}_nrm",
            bucket.cast("int").alias("bucket"),
        )

    c = bucketed(spread(corpus), "corpus_id")
    b = F.broadcast(bucketed(batch, "batch_id"))
    pairs = b.join(c, "bucket").select(
        "batch_id",
        "corpus_id",
        F.expr(
            f"{dot_sql('batch_id_vec', 'corpus_id_vec')}"
            " / (batch_id_nrm * corpus_id_nrm)"
        ).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= 0.2).select(
        F.col("batch_id").cast("bigint"),
        F.col("corpus_id").cast("bigint"),
        F.round("cos_sim", 4).alias("cos_sim"),
    )


#: shared oracle CTE: PQ codebooks + per-vector subspace code assignment,
#: replaying pq_codebooks()/pq_code_cols() (operators/similarity.py) —
#: sequential-fold distances (list_reduce == Spark's aggregate fold), ties
#: to the lowest centroid id.
_PQ_CODES_CTE = """
    emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (
        SELECT s, c, list_transform(generate_series(0, 7), d ->
            CAST(((1103515245 * ((s*16 + c)*8 + d) + 12345) % 2001)
                 - 1000 AS DOUBLE) / 4000.0) AS cv
        FROM generate_series(0, 7) gs(s), generate_series(0, 15) gc(c)
    ),
    dists AS (
        SELECT e.vec_id, cent.s, cent.c,
               list_reduce(list_transform(generate_series(1, 8), i ->
                   (e.embedding[cent.s*8 + i]::DOUBLE - cv[i])
                   * (e.embedding[cent.s*8 + i]::DOUBLE - cv[i])),
                   (a, b) -> a + b) AS dist
        FROM emb e CROSS JOIN cent
    ),
    codes AS (
        SELECT vec_id, s, c AS code FROM dists
        QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY dist, c) = 1
    )
"""


@query(
    "ext_embed_pq",
    oracle=f"""
    WITH {_PQ_CODES_CTE}
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(sum(code * (1::BIGINT << (4*s))) AS BIGINT) AS pq_code
    FROM codes GROUP BY vec_id
    """,
)
def ext_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim vectors → 8 subspaces × 16
    deterministic centroids → one 4-bit code per subspace, packed into a
    single 32-bit-in-a-bigint PQ code. A 128× compression of the
    64×double embedding — the index representation that lets a 100 TB
    vector corpus fit hot storage for ANN scans (ext_sim_search_pq does
    the ADC search over exactly these codes). Assignment is map-only
    column math against literal codebooks: zero shuffle, zero broadcast,
    stays inside the scan stage. Null embeddings are excluded on both
    engines (round-11 full nulls sweep: a null vector has no meaningful
    code — Spark's fold produced a code from NULL subvectors while the
    oracle's argmin collapsed, silently diverging)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    # single-parse pack (r19): the Column pq_pack over 8 aliased code
    # columns cost ~40 extra round-trips per build; pq_pack_sql renders
    # the identical tree in one parse (sameSemantics-pinned).
    return spread(emb).selectExpr(
        "cast(vec_id as bigint) AS vec_id",
        f"{pq_pack_sql(pq_code_sqls('embedding'))} AS pq_code",
    )


@query(
    "ext_sim_search_pq",
    oracle=f"""
    WITH {_PQ_CODES_CTE},
    q AS (SELECT vec_id AS query_id, embedding FROM emb
          WHERE vec_id < 5),
    lut AS (
        SELECT q.query_id, cent.s, cent.c,
               list_reduce(list_transform(generate_series(1, 8), i ->
                   q.embedding[cent.s*8 + i]::DOUBLE * cv[i]),
                   (a, b) -> a + b) AS d
        FROM q CROSS JOIN cent
    ),
    terms AS (
        SELECT l.query_id, co.vec_id, l.s, l.d
        FROM codes co JOIN lut l ON l.s = co.s AND l.c = co.code
    ),
    score AS (
        SELECT query_id, vec_id,
               list_reduce(list(d ORDER BY s), (a, b) -> a + b) AS approx
        FROM terms GROUP BY query_id, vec_id
    )
    SELECT query_id, CAST(vec_id AS BIGINT) AS vec_id,
           round(approx, 4) AS approx_dot,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY approx DESC, vec_id) AS BIGINT)
               AS rnk
    FROM score
    QUALIFY rnk <= 10
    """,
)
def ext_sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k ANN over PQ codes: each query
    precomputes an 8×16 LUT of subspace dots against the literal
    codebooks, and scoring a corpus vector is 8 table lookups on its
    4-bit codes — no 64-dim fold in the scan loop, and the scan reads
    the 32-bit code column instead of 512-byte vectors (the ~100×
    bandwidth cut that makes exhaustive ANN affordable at 100 TB).
    Query side broadcast, one corpus scan, per-query top-k window as the
    only shuffle; production reranks the top-k with exact vectors
    (compose with topk_cosine on the candidates). Null embeddings
    excluded corpus- and query-side (round-11 nulls sweep, PQ-family
    contract)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(emb, queries, k=10)


@query(
    "ext_sim_search_pq_rerank",
    oracle=f"""
    WITH {_PQ_CODES_CTE},
    q AS (SELECT vec_id AS query_id, embedding FROM emb
          WHERE vec_id < 5),
    lut AS (
        SELECT q.query_id, cent.s, cent.c,
               list_reduce(list_transform(generate_series(1, 8), i ->
                   q.embedding[cent.s*8 + i]::DOUBLE * cv[i]),
                   (a, b) -> a + b) AS d
        FROM q CROSS JOIN cent
    ),
    terms AS (
        SELECT l.query_id, co.vec_id, l.s, l.d
        FROM codes co JOIN lut l ON l.s = co.s AND l.c = co.code
    ),
    approx AS (
        SELECT query_id, vec_id,
               list_reduce(list(d ORDER BY s), (a, b) -> a + b) AS a
        FROM terms GROUP BY query_id, vec_id
    ),
    cand AS (
        SELECT query_id, vec_id FROM approx
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY a DESC, vec_id) <= 50
    ),
    eterms AS (
        SELECT cd.query_id, cd.vec_id,
               unnest(eq.embedding)::DOUBLE AS qa,
               unnest(ec.embedding)::DOUBLE AS cb
        FROM cand cd
        JOIN emb eq ON eq.vec_id = cd.query_id
        JOIN emb ec ON ec.vec_id = cd.vec_id
    ),
    exact AS (
        SELECT query_id, vec_id,
               sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
        FROM eterms GROUP BY query_id, vec_id
    )
    SELECT query_id, CAST(vec_id AS BIGINT) AS vec_id,
           round(cs, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cs DESC, vec_id) AS BIGINT) AS rnk
    FROM exact
    QUALIFY rnk <= 10
    """,
)
def ext_sim_search_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN composition: PQ/ADC candidate generation (top-50
    per query over the compressed code index — the cheap, bandwidth-light
    stage that scans 32-bit codes) followed by EXACT cosine rerank of only
    those candidates to the final top-10. Full-precision vectors are
    touched for 50 rows per query instead of the whole corpus — at 100 TB
    that is the difference between an exhaustive vector scan and a keyed
    fetch of 50×|Q| rows. Candidate ids broadcast into the corpus join;
    the only shuffles are the two per-query top-k windows (both compile to
    partial WindowGroupLimit). Null embeddings excluded corpus- and
    query-side (round-11 nulls sweep, PQ-family contract)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = F.broadcast(
        pq_adc_topk(emb, queries, k=50).select("query_id", "vec_id")
    )
    q = F.broadcast(
        queries.select(
            "query_id",
            F.col("embedding").alias("q_vec"),
            F.expr(norm_sql("embedding")).alias("q_nrm"),
        )
    )
    scored = (
        cand.join(
            emb.select(
                "vec_id",
                F.col("embedding").alias("c_vec"),
                F.expr(norm_sql("embedding")).alias("c_nrm"),
            ),
            "vec_id",
        )
        .join(q, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.expr(f"{dot_sql('q_vec', 'c_vec')} / (q_nrm * c_nrm)").alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "query_id",
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.round("cs", 4).alias("cos_sim"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@query(
    "ext_lm_perplexity",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents
    ),
    t AS (SELECT id, generate_subscripts(l, 1) AS i, unnest(l) AS w
          FROM toks),
    bg AS (SELECT a.id, a.i,
                  ('0x' || substr(md5(a.w || ' ' || b.w), 1, 15))::BIGINT AS bh,
                  ('0x' || substr(md5(a.w), 1, 15))::BIGINT AS uh
           FROM t a JOIN t b ON b.id = a.id AND b.i = a.i + 1),
    bgc AS (SELECT bh, count(*) AS c_bg FROM bg GROUP BY bh),
    ugc AS (SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT AS uh,
                   count(*) AS c_w
            FROM t GROUP BY 1),
    vocab AS (SELECT count(*) AS v FROM ugc),
    nll AS (SELECT bg.id,
                   -ln((c_bg + 1) / CAST(c_w + v AS DOUBLE)) AS term
            FROM bg JOIN bgc USING (bh) JOIN ugc USING (uh), vocab)
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(term) / count(*), 4) AS avg_nll
    FROM nll GROUP BY id
    """,
)
def ext_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the classic
    perplexity-style quality signal for pretraining filtering: per
    document, the mean negative log-likelihood of its bigrams under an
    add-one-smoothed bigram model fit on the WHOLE corpus (P(w2|w1) =
    (c(w1 w2)+1)/(c(w1)+V)). High avg_nll = improbable word sequences —
    gibberish, boilerplate soup, OCR noise.

    Scale shape: tokens hash to 60-bit bigints at the map side (the
    hashed-shingle discipline — every shuffle moves fixed-width ints, not
    strings); the model is two hash aggregates (bigram counts, unigram
    counts) plus a 1-row vocab count crossJoined (broadcast) onto the
    scoring join; scoring joins each doc-bigram occurrence to the two
    count tables by hash — two narrow equi-joins, no driver-side model
    materialization, nothing quadratic anywhere. The float sum is rounded
    to 4 decimals, far above the ~1e-12 reorder jitter of double
    addition, so the hash-compare is stable."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("ts")
    )
    t = spread(docs).select(
        "doc_id", F.posexplode("ts").alias("i", "w")
    )
    bg = (
        docs.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        hash60(
                            F.concat_ws(
                                " ",
                                F.element_at("ts", i),
                                F.element_at("ts", i + 1),
                            )
                        ).alias("bh"),
                        hash60(F.element_at("ts", i)).alias("uh"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "g.bh", "g.uh")
    )
    # pinned (r12 drift adjudication): bg feeds BOTH the bigram-count
    # aggregate and the scoring join; unpinned, Catalyst re-tokenizes the
    # whole corpus for each consumer (tokens() + the per-bigram hash
    # transform are the query's CPU-dense stages — measured 3.13 s →
    # 2.15 s at sf0.1 from this pin alone; a numbered-width repartition
    # added on top measured WORSE, 2.31 s, so the r11 coalescing pattern
    # is ruled out here). The pinned stream is three fixed-width bigints
    # per bigram — materializing it once is linear in the corpus and
    # strictly cheaper than a second regex-tokenize pass over the text.
    # DISK_ONLY (r17, third-decade probe): this pin is CORPUS-sized —
    # the default MEMORY_AND_DISK level unrolls each partition on heap
    # before deciding to drop it to disk, and at 5M docs (sf100) that
    # unroll OOM'd a 64g heap while 32 concurrent tasks fought the same
    # pool. Serialized-to-disk UnsafeRows stream straight through the
    # block manager with no unroll spike (and ride the OS page cache at
    # small SFs — measured parity at sf0.1); the vocab-sized ugc pin
    # below stays in memory.
    from pyspark import StorageLevel

    bg = bg.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    bgc = bg.groupBy("bh").agg(F.count(F.lit(1)).alias("c_bg"))
    # pinned: the unigram-count table feeds BOTH the scoring join and the
    # vocab-size count — without the pin each consumer re-shuffles the full
    # token stream (Catalyst plans no exchange reuse across the two); the
    # pin is vocab-sized, far smaller than the stream that builds it
    ugc = (
        t.groupBy(hash60(F.col("w")).alias("uh"))
        .agg(F.count(F.lit(1)).alias("c_w"))
        .localCheckpoint(eager=True)
    )
    vocab = F.broadcast(ugc.agg(F.count(F.lit(1)).alias("v")))
    nll = (
        bg.join(bgc, "bh")
        .join(ugc, "uh")
        .crossJoin(vocab)
        .select(
            "doc_id",
            (
                -F.log(
                    (F.col("c_bg") + 1) / (F.col("c_w") + F.col("v")).cast("double")
                )
            ).alias("term"),
        )
    )
    return nll.groupBy(F.col("doc_id").cast("bigint").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.sum("term") / F.count(F.lit(1)), 4).alias("avg_nll"),
    )


@query(
    "ext_dedup_simhash",
    oracle=f"""
    WITH {_TOK_CTE},
    h AS (SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM tok),
    perbit AS (SELECT id, j, sum(CASE WHEN (hv >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
               FROM h CROSS JOIN generate_series(0, 15) g(j) GROUP BY id, j)
    SELECT CAST(id AS BIGINT) AS id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS simhash
    FROM perbit GROUP BY id
    """,
)
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints — equal fingerprints (or low Hamming
    bands) are the near-dup blocking key. Pure integer arithmetic."""
    docs = load(spark, sf_dir, "documents")
    return simhash16(docs).select(F.col("id").cast("bigint").alias("id"), "simhash")


@query(
    "ext_dedup_ngram",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    ng AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
           FROM tok),
    rare AS (SELECT hv FROM ng GROUP BY hv HAVING count(*) BETWEEN 2 AND 5),
    blocked AS (SELECT ng.id, ng.hv FROM ng JOIN rare USING (hv)),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM blocked a JOIN blocked b ON a.hv = b.hv AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS n FROM ng GROUP BY id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN ng ta ON ta.id = c.id_a
              JOIN ng tb ON tb.id = c.id_b AND tb.hv = ta.hv
              GROUP BY c.id_a, c.id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.3
    """,
)
def ext_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup, blocked by *rare* n-grams (document
    frequency 2..5): common n-grams — the quadratic ones — never join.
    Runs entirely on the HASHED shingle set: one md5 per shingle at the map
    side, bigint joins everywhere after (same layout as ext_dedup_minhash)."""
    docs = load(spark, sf_dir, "documents")
    ng = hashed_shingles(docs, n=3).localCheckpoint(eager=True)
    rare = (
        ng.groupBy("hv")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .filter(F.col("dfreq").between(2, 5))
    )
    blocked = ng.join(rare.select("hv"), "hv")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(b, (F.col("a.hv") == F.col("b.hv")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return verified_jaccard_pairs(cand, ng, threshold=0.3)


@query(
    "ext_dedup_embed",
    oracle="""
    WITH params AS (
        -- replay adaptive_planes(): smallest planes with 2^planes >= n/64,
        -- clamped to [8, 24] (operators/similarity.py)
        SELECT CASE WHEN cnt <= 64 THEN 8
                    ELSE greatest(8, least(24,
                         CAST(ceil(log2(cnt / 64.0)) AS INTEGER)))
               END AS np
        FROM (SELECT count(*) AS cnt FROM embeddings)
    ),
    planes AS (
        SELECT p, d,
               CAST((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),
                                     1, 15))::BIGINT % 2000001)
                    - 1000000 AS DOUBLE) AS c
        FROM generate_series(0, 23) gp(p), generate_series(0, 63) gd(d), params
        WHERE p < np
    ),
    emb AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                   unnest(embedding)::DOUBLE AS v
            FROM embeddings),
    proj AS (SELECT vec_id, p, sum(c * v) AS dp
             FROM emb JOIN planes USING (d) GROUP BY vec_id, p),
    bucket AS (SELECT vec_id,
                      CAST(sum(CASE WHEN dp >= 0 THEN (1 << p) ELSE 0 END) AS INTEGER)
                      AS bucket
               FROM proj GROUP BY vec_id),
    cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bucket a JOIN bucket b
               ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
    terms AS (SELECT c.id_a, c.id_b, unnest(ea.embedding)::DOUBLE AS va,
                     unnest(eb.embedding)::DOUBLE AS vb
              FROM cand c
              JOIN embeddings ea ON ea.vec_id = c.id_a
              JOIN embeddings eb ON eb.vec_id = c.id_b),
    cos AS (SELECT id_a, id_b,
                   sum(va * vb) / (sqrt(sum(va * va)) * sqrt(sum(vb * vb))) AS cs
            FROM terms GROUP BY id_a, id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(cs, 4) AS cos_sim
    FROM cos WHERE cs >= 0.2
    """,
)
def ext_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via sign-LSH: deterministic integer
    hyperplanes → sign-bit buckets → equi-join + cosine ≥ 0.2 inside
    buckets. Plane count sizes itself to the corpus (adaptive_planes:
    ≤64 expected rows/bucket, floor 8 / cap 24 bits) so in-bucket verify
    work is bounded at ≤32 cosine folds per row from N = 16k rows on;
    the oracle replays the same count-derived formula. The r12 sf1 probe
    caught the old target (1024) leaving the 8-bit floor in charge until
    262k rows — occupancy, and with it pair volume per row, grew with N
    across that whole regime (measured 17.8× wall for 10× rows at
    2k→20k under the old target; the 2k end still sits below the new
    16k asymptote, so that decade stays transition-regime — the bound
    is on work per row from 16k on, re-measured in BENCH_DETAIL's sf1
    probe). The tighter target trades per-table
    recall (one bit per 16× corpus growth), which is the banded
    variant's job to buy back — single-table sign-LSH holds only two of
    {bounded work, constant recall, one table}."""
    emb = load(spark, sf_dir, "embeddings")
    return lsh_bucketed_pairs(emb, dims=64, threshold=0.2)


@query(
    "ext_sim_search",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM emb
          WHERE vec_id < 5),
    pairs AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS ce
              FROM q CROSS JOIN emb e),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM pairs),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, round(cs, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id)
                AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 10
    """,
)
def ext_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for 5 query vectors — query side
    broadcast, ONE corpus scan, per-query top-k window. The scale path for
    corpus×corpus discovery is ext_dedup_embed's LSH buckets. Null
    embeddings excluded corpus- and query-side (round-11 full nulls
    sweep: a null vector's NULL cosine is ordered NULLS-differently by
    the two engines' rank windows)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_cosine(emb, queries, k=10)


@query(
    "ext_sim_search_ivf",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    q AS (SELECT a.vec_id AS query_id, a.cell, e.embedding AS qe
          FROM assign a JOIN emb e USING (vec_id) WHERE a.vec_id < 5),
    cand AS (SELECT q.query_id, q.qe, e2.vec_id, e2.embedding AS ce
             FROM q JOIN assign a2 ON a2.cell = q.cell
             JOIN emb e2 ON e2.vec_id = a2.vec_id),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM cand),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, round(cs, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id)
                AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 10
    """,
)
def ext_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor — the corpus is coarse-
    quantized into CORPUS-ADAPTIVE centroid cells (broadcast assignment
    pass), and each query searches only its own cell via an equi-join on
    the cell id. The scale path when the query set is too large to
    broadcast-scan the whole corpus (nprobe=1; recall tunes by probing
    neighbor cells).

    Cell count (re-keyed round 11, the r10 verdict's second `weak`): a
    FIXED 8 cells means |cell| = N/8 — every probe scans 12.5% of the
    corpus, a constant-factor saving that decays to an unpruned scan as
    N grows. greatest(8, ceil(N/250)) — the count-derived-formula
    pattern the graph family proved, replayed bit-for-bit by the oracle
    — keeps |cell| ≈ 250 bounded, so per-probe work is O(1) in the
    corpus and total SEARCH cost is O(|Q|·250) — but the flat
    ASSIGNMENT pass is O(N·k) = O(N²/250) once k tracks N (measured
    r15, BENCH_DETAIL sf10_probe: 27.8× wall for 10× rows at 20k→200k
    after ivf_topk's r15 adaptive assignment pin halved it from 51×;
    the sharded twin ext_sim_search_ivf_sharded holds 6.75× on the
    same decade and is the path past ~100k vectors) — after the linear
    assignment pass. Centroids are the smallest-N existing ids —
    deterministic AND id-agnostic (a literal `vec_id < 8` crashed on the
    round-7 large-id sweep); production k-means fits them offline. Null
    embeddings are excluded corpus- and seed-side (the graph family's
    null contract: a nulled seed row becomes a NULL centroid that the
    two engines cell-scatter differently)."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells = max(8, math.ceil(n / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, centroids, k=10, corpus_rows=n)


@query(
    "ext_sim_search_ivf_nprobe",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    qcells AS (SELECT vec_id AS query_id, cent_id AS cell FROM cos0
               WHERE vec_id < 5
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) <= 2),
    q AS (SELECT qc.query_id, qc.cell, e.embedding AS qe
          FROM qcells qc JOIN emb e ON e.vec_id = qc.query_id),
    cand AS (SELECT q.query_id, q.qe, e2.vec_id, e2.embedding AS ce
             FROM q JOIN assign a2 ON a2.cell = q.cell
             JOIN emb e2 ON e2.vec_id = a2.vec_id),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM cand),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, round(cs, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id)
                AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 10
    """,
)
def ext_sim_search_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN (nprobe=2): each query searches its TWO nearest
    centroid cells — the standard recall knob when single-cell probing
    misses neighbors that straddle a cell boundary. The probe expansion is
    computed map-side on the broadcast query side (in-row struct-array
    sort + slice, operators/similarity.py:ivf_assign_multi); the
    corpus-side plan is identical to ext_sim_search_ivf — still zero
    corpus shuffle, still one equi-join on the cell id. Cell count is the
    corpus-adaptive greatest(8, ceil(N/250)) (re-keyed round 11 with the
    whole search family: a fixed 8 cells decays to an unpruned scan as N
    grows); probing 2 of ~N/250 cells scans ~500 rows per query instead
    of a quarter of the corpus. Null embeddings excluded corpus- and
    seed-side (graph-family null contract).

    Second-decade slope (measured r15, BENCH_DETAIL sf10_probe): 31.8×
    wall for 10× rows at 20k→200k — ivf_topk's r15 adaptive assignment
    pin halved it from 88× (224.5 → 114.6 s); the remainder is the flat
    assignment's O(N²/250) fold growth shared with the whole flat
    exhibit class. The sharded twin holds 6.75× on the same decade and
    is the path past ~100k vectors."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells = max(8, math.ceil(n / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, centroids, k=10, nprobe=2, corpus_rows=n)


@query(
    "ext_sim_search_ivf_sharded",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    coarse AS (SELECT cent_id AS coarse_id, c AS g FROM (
                   SELECT cent_id, c,
                          row_number() OVER (ORDER BY cent_id) AS rn,
                          count(*) OVER () AS k
                   FROM cent)
               WHERE rn <= greatest(2, least(k - 1,
                                             CAST(ceil(sqrt(k)) AS BIGINT)))),
    lt AS (SELECT cent.cent_id, coarse.coarse_id,
                  unnest(cent.c)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM cent CROSS JOIN coarse),
    lcos AS (SELECT cent_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM lt GROUP BY cent_id, coarse_id),
    lassign AS (SELECT cent_id, coarse_id FROM lcos
                QUALIFY row_number() OVER (PARTITION BY cent_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    vt AS (SELECT e.vec_id, coarse.coarse_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM emb e CROSS JOIN coarse),
    vcos AS (SELECT vec_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM vt GROUP BY vec_id, coarse_id),
    vassign AS (SELECT vec_id, coarse_id FROM vcos
                QUALIFY row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    bt AS (SELECT e.vec_id, cent.cent_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(cent.c)::DOUBLE AS w
           FROM emb e
           JOIN vassign va ON va.vec_id = e.vec_id
           JOIN lassign la ON la.coarse_id = va.coarse_id
           JOIN cent ON cent.cent_id = la.cent_id),
    bcos AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM bt GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM bcos
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    q AS (SELECT a.vec_id AS query_id, a.cell, e.embedding AS qe
          FROM assign a JOIN emb e USING (vec_id) WHERE a.vec_id < 5),
    cand AS (SELECT q.query_id, q.qe, e2.vec_id, e2.embedding AS ce
             FROM q JOIN assign a2 ON a2.cell = q.cell
             JOIN emb e2 ON e2.vec_id = a2.vec_id),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM cand),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, round(cs, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id)
                AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 10
    """,
)
def ext_sim_search_ivf_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF similarity search over the SHARDED two-level index — the
    search-family twin of ext_knn_graph_ivf_sharded, closing the gap the
    adaptive cell count itself opens: once k = ⌈N/250⌉, the flat
    ``ivf_assign`` inside ivf_topk broadcasts an O(N)-bytes codebook —
    the exact structure the graph family removed this round. Here the
    corpus is assigned by ``ivf_assign_sharded`` (only the ⌈√k⌉ coarse
    array broadcast; leaves arrive via the shuffle_hash-pinned branch
    join), the assignment is pinned ONCE and serves both sides: the
    query rows (vec_id < 5) are filtered FROM it and broadcast (|Q|
    bounded), so the search join streams the assigned corpus through a
    map-side hash join on the cell id — candidates ≈ |Q|·250 rows
    scored, per-query top-10 under WindowGroupLimit. At 100 TB every
    structure is bounded: O(√k) broadcast index, one branch-keyed
    corpus shuffle (the assignment), |Q|-bounded query broadcast,
    |Q|·250 fold work. Null embeddings excluded corpus- and seed-side;
    oracle replays the full two-level argmax + cell-restricted top-10
    bit-for-bit."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_sharded(emb, centroids, n_coarse).localCheckpoint(
        eager=True
    )
    qside = F.broadcast(
        assigned.filter(F.col("id") < 5).select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("q_vec"),
            F.col("v_nrm").alias("q_nrm"),
            "cell",
        )
    )
    cand = qside.join(assigned, "cell").select(
        "query_id",
        F.col("id").alias("vec_id"),
        F.expr(f"{dot_sql('q_vec', 'vec')} / (q_nrm * v_nrm)").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "query_id",
            "vec_id",
            F.round("cos_sim", 4).alias("cos_sim"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@query(
    "ext_sim_search_ivf_3level",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    tops AS (SELECT cent_id AS top_id, c AS t FROM (
                 SELECT cent_id, c,
                        row_number() OVER (ORDER BY cent_id) AS rn,
                        count(*) OVER () AS k
                 FROM cent)
             WHERE rn <= greatest(2, least(k - 1,
                                           CAST(ceil(cbrt(k)) AS BIGINT)))),
    mids AS (SELECT cent_id AS mid_id, c AS m FROM (
                 SELECT cent_id, c,
                        row_number() OVER (ORDER BY cent_id) AS rn,
                        count(*) OVER () AS k,
                        greatest(2, least(count(*) OVER () - 1,
                            CAST(ceil(cbrt(count(*) OVER ())) AS BIGINT))) AS n1
                 FROM cent)
             WHERE rn <= greatest(n1 + 1, least(k - 1,
                            CAST(ceil(pow(k, 2.0 / 3.0)) AS BIGINT)))),
    mtt AS (SELECT mids.mid_id, tops.top_id,
                   unnest(mids.m)::DOUBLE AS v, unnest(tops.t)::DOUBLE AS w
            FROM mids CROSS JOIN tops),
    mtc AS (SELECT mid_id, top_id,
                   sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
            FROM mtt GROUP BY mid_id, top_id),
    mt AS (SELECT mid_id, top_id FROM mtc
           QUALIFY row_number() OVER (PARTITION BY mid_id
                                      ORDER BY cs DESC, top_id) = 1),
    ltt AS (SELECT cent.cent_id, tops.top_id,
                   unnest(cent.c)::DOUBLE AS v, unnest(tops.t)::DOUBLE AS w
            FROM cent CROSS JOIN tops),
    ltc AS (SELECT cent_id, top_id,
                   sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
            FROM ltt GROUP BY cent_id, top_id),
    lt AS (SELECT cent_id, top_id FROM ltc
           QUALIFY row_number() OVER (PARTITION BY cent_id
                                      ORDER BY cs DESC, top_id) = 1),
    lmt AS (SELECT cent.cent_id, mids.mid_id,
                   unnest(cent.c)::DOUBLE AS v, unnest(mids.m)::DOUBLE AS w
            FROM cent
            JOIN lt ON lt.cent_id = cent.cent_id
            JOIN mt ON mt.top_id = lt.top_id
            JOIN mids ON mids.mid_id = mt.mid_id),
    lmc AS (SELECT cent_id, mid_id,
                   sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
            FROM lmt GROUP BY cent_id, mid_id),
    lm AS (SELECT cent_id, mid_id FROM lmc
           QUALIFY row_number() OVER (PARTITION BY cent_id
                                      ORDER BY cs DESC, mid_id) = 1),
    vtt AS (SELECT e.vec_id, tops.top_id,
                   unnest(e.embedding)::DOUBLE AS v, unnest(tops.t)::DOUBLE AS w
            FROM emb e CROSS JOIN tops),
    vtc AS (SELECT vec_id, top_id,
                   sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
            FROM vtt GROUP BY vec_id, top_id),
    vt AS (SELECT vec_id, top_id FROM vtc
           QUALIFY row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cs DESC, top_id) = 1),
    vmt AS (SELECT e.vec_id, mids.mid_id,
                   unnest(e.embedding)::DOUBLE AS v, unnest(mids.m)::DOUBLE AS w
            FROM emb e
            JOIN vt ON vt.vec_id = e.vec_id
            JOIN mt ON mt.top_id = vt.top_id
            JOIN mids ON mids.mid_id = mt.mid_id),
    vmc AS (SELECT vec_id, mid_id,
                   sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
            FROM vmt GROUP BY vec_id, mid_id),
    vm AS (SELECT vec_id, mid_id FROM vmc
           QUALIFY row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cs DESC, mid_id) = 1),
    vlt AS (SELECT e.vec_id, cent.cent_id,
                   unnest(e.embedding)::DOUBLE AS v, unnest(cent.c)::DOUBLE AS w
            FROM emb e
            JOIN vm ON vm.vec_id = e.vec_id
            JOIN lm ON lm.mid_id = vm.mid_id
            JOIN cent ON cent.cent_id = lm.cent_id),
    vlc AS (SELECT vec_id, cent_id,
                   sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
            FROM vlt GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM vlc
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    q AS (SELECT a.vec_id AS query_id, a.cell, e.embedding AS qe
          FROM assign a JOIN emb e USING (vec_id) WHERE a.vec_id < 5),
    cand AS (SELECT q.query_id, q.qe, e2.vec_id, e2.embedding AS ce
             FROM q JOIN assign a2 ON a2.cell = q.cell
             JOIN emb e2 ON e2.vec_id = a2.vec_id),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM cand),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, round(cs, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id)
                AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 10
    """,
)
def ext_sim_search_ivf_3level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF similarity search over the THREE-level sharded index (r17
    verdict #1) — the next rung of the construction ladder the sf100
    probe priced: the two-level sharded assignment is O(N·√k) fold work
    under the corpus-adaptive k = ⌈N/250⌉, whose decade ratio the probe
    measured at 17.1× converging on the designed 31.6×/decade asymptote
    (BENCH_DETAIL sf100_probe). ``ivf_assign_sharded_3level`` splits the
    descent into three balanced levels (⌈∛k⌉ broadcast tops → k^(2/3)
    mids sharded by top branch → k leaves sharded by mid branch), taking
    total assignment work to O(N·∛k) = O(N^4/3) — asymptotic decade
    ratio 10^(4/3) ≈ 21.5× — and the per-task index ceiling from O(√k)
    to O(∛k) bytes, at the price of one extra branch-keyed corpus
    shuffle. Search shape is the sharded twin's verbatim: the assignment
    is pinned ONCE and serves both sides; query rows (vec_id < 5) are
    filtered from it and broadcast; candidates ≈ |Q|·250 rows scored,
    per-query top-10 under WindowGroupLimit. Level sizes derive from the
    corpus count by the same replayable-formula pattern as the cell
    count (⌈∛k⌉ / ⌈k^(2/3)⌉ with the family's degenerate-smallness
    clamps); the oracle recomputes them bit-for-bit — cbrt agrees
    between engines because both bind the same libm. Null embeddings
    excluded corpus- and seed-side; NULL-branch rows (a top with no
    mids, a mid with no leaves) drop out exactly as the two-level
    contract describes."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    k = max(8, math.ceil(emb.count() / 250))
    n_top = max(2, min(k - 1, math.ceil(math.cbrt(k))))
    n_mid = max(n_top + 1, min(k - 1, math.ceil(k ** (2.0 / 3.0))))
    centroids = emb.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_sharded_3level(
        emb, centroids, n_top, n_mid
    ).localCheckpoint(eager=True)
    qside = F.broadcast(
        assigned.filter(F.col("id") < 5).select(
            F.col("id").alias("query_id"),
            F.col("vec").alias("q_vec"),
            F.col("v_nrm").alias("q_nrm"),
            "cell",
        )
    )
    cand = qside.join(assigned, "cell").select(
        "query_id",
        F.col("id").alias("vec_id"),
        F.expr(f"{dot_sql('q_vec', 'vec')} / (q_nrm * v_nrm)").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "query_id",
            "vec_id",
            F.round("cos_sim", 4).alias("cos_sim"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@query(
    "ext_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
    FROM documents
    """,
)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics — map-only, codegen'd, no UDFs."""
    docs = load(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["n_alpha"].alias("n_alpha"),
        feats["n_digits"].alias("n_digits"),
    )


@query(
    "ext_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS BIGINT) AS n_bpe_ish
    FROM documents
    """,
)
def ext_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (alpha runs / digit runs / single symbols)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


@query(
    "ext_quality_filter",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
        FROM documents
    )
    SELECT doc_id, n_tokens, round(n_alpha / CAST(n_chars AS DOUBLE), 4) AS score
    FROM f
    WHERE n_tokens BETWEEN 5 AND 500
      AND n_alpha / CAST(n_chars AS DOUBLE) >= 0.5
      AND n_digits / CAST(n_chars AS DOUBLE) <= 0.3
    """,
)
def ext_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate: token-count band + alpha-ratio floor +
    digit-ratio ceiling; emits the surviving docs with their score."""
    docs = load(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    alpha_ratio = f["n_alpha"] / f["n_chars"].cast("double")
    digit_ratio = f["n_digits"] / f["n_chars"].cast("double")
    return (
        docs.select(
            "doc_id",
            f["n_tokens"].alias("n_tokens"),
            alpha_ratio.alias("__ar"),
            digit_ratio.alias("__dr"),
        )
        .filter(
            (F.col("n_tokens").between(5, 500))
            & (F.col("__ar") >= 0.5)
            & (F.col("__dr") <= 0.3)
        )
        .select("doc_id", "n_tokens", F.round("__ar", 4).alias("score"))
    )


@query(
    "ext_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN len(regexp_extract_all(lower(text), '\\bthe\\b')) > 0
                     OR len(regexp_extract_all(lower(text), '\\ba\\b')) > 0
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM documents
    """,
)
def ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic (deterministic rule: English
    function words present → 'en', else undetermined). On real corpora the
    rule set extends per language; the synthetic corpus shares one
    vocabulary, so the point here is the operator shape, not accuracy."""
    docs = load(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    is_en = (F.regexp_count(lowered, F.lit(r"\bthe\b")) > 0) | (
        F.regexp_count(lowered, F.lit(r"\ba\b")) > 0
    )
    return docs.select(
        "doc_id", "lang", F.when(is_en, "en").otherwise("und").alias("lang_pred")
    )


@query(
    "ext_chunk_text",
    oracle="""
    WITH c AS (
        SELECT doc_id,
               generate_subscripts(generate_series(0, (length(text) - 1) // 150), 1) - 1
                   AS chunk_id,
               unnest(list_transform(
                   generate_series(0, (length(text) - 1) // 150),
                   i -> substr(text, i * 150 + 1, 200))) AS chunk
        FROM documents
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk FROM c
    """,
)
def ext_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training pipelines via a Spark 4 Python UDTF
    (size 200 / stride 150 overlapping character windows) — lateral
    correlated table function over the corpus. The UDTF is the seam where
    tokenizer-aware chunkers mount; this arithmetic version stays
    oracle-checkable."""
    from ..functions.udtfs import ChunkText

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    spark.udtf.register("chunk_text", ChunkText)
    return spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.chunk "
        "FROM documents_v d, LATERAL chunk_text(d.doc_id, d.text) c"
    )


#: shared oracle for both connected-components cluster queries: the label
#: semantics (min doc_id per component over fingerprint ∪ simhash edges)
#: are identical regardless of which CC algorithm computes them, so the
#: O(diameter) min-label and the O(log n) large-star/small-star variants
#: verify against the SAME recursive-CTE reachability oracle.
_CLUSTER_ORACLE = f"""
    WITH RECURSIVE {_TOK_CTE},
    h AS (SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM tok),
    perbit AS (SELECT id, j, sum(CASE WHEN (hv >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
               FROM h CROSS JOIN generate_series(0, 15) g(j) GROUP BY id, j),
    sh AS (SELECT id,
                  sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
           FROM perbit GROUP BY id),
    fp AS (SELECT doc_id AS id,
                  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
           FROM documents),
    e1 AS (SELECT id, min(id) OVER (PARTITION BY fp) AS root FROM fp),
    e2 AS (SELECT id, min(id) OVER (PARTITION BY simhash) AS root FROM sh),
    edges AS (SELECT id, root FROM e1 WHERE id <> root
              UNION SELECT id, root FROM e2 WHERE id <> root),
    sym AS (SELECT id AS src, root AS dst FROM edges
            UNION SELECT root AS src, id AS dst FROM edges),
    reach(id, r) AS (SELECT src, src FROM sym
                     UNION
                     SELECT s.src, reach.r FROM sym s JOIN reach ON reach.id = s.dst),
    comp AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
    lab AS (SELECT d.doc_id, coalesce(c.label, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """


def _cluster_labels_to_result(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) from CC labels: isolated docs are
    their own singleton cluster (left join + coalesce)."""
    lab = (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id")
    return lab.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )


@query("ext_dedup_cluster", oracle=_CLUSTER_ORACLE)
def ext_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER canonicalization — the step real dedup pipelines run
    after pair discovery: union the per-signal duplicate graphs (normalized
    fingerprint ∪ 16-bit SimHash here), take connected components, and assign
    every document the component's min doc_id as its cluster id. Edges are
    linear star edges (doc → group min), never within-group pairs; components
    run as iterative min-label propagation with checkpointed lineage
    (operators/dedup.py:connected_components — large-star/small-star is the
    O(log n)-round upgrade at adversarial diameters)."""
    docs = load(spark, sf_dir, "documents")
    fp_edges = group_star_edges(docs, fingerprint(F.col("text")))
    sh_edges = group_star_edges(simhash16(docs), F.col("simhash"), id_col="id")
    labels = connected_components(fp_edges.union(sh_edges))
    return _cluster_labels_to_result(docs, labels)


@query("ext_dedup_cluster_lsss", oracle=_CLUSTER_ORACLE)
def ext_dedup_cluster_lsss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME cluster canonicalization computed by the O(log n)-round
    large-star/small-star alternation (Kiveris et al., SoCC'14;
    operators/dedup.py:connected_components_alternating) instead of
    O(diameter) min-label propagation. On dedup graphs (star edges, tiny
    diameters) both take a handful of rounds; on adversarial long-chain
    graphs — duplicate families linked through transitive signal chains —
    alternation converges exponentially faster, which is what makes CC
    viable on a 100 TB corpus's edge set. Verified against the identical
    reachability oracle as ext_dedup_cluster: the labels must agree
    bit-for-bit."""
    docs = load(spark, sf_dir, "documents")
    fp_edges = group_star_edges(docs, fingerprint(F.col("text")))
    sh_edges = group_star_edges(simhash16(docs), F.col("simhash"), id_col="id")
    labels = connected_components_alternating(fp_edges.union(sh_edges))
    return _cluster_labels_to_result(docs, labels)


@query(
    "ext_sample_hash",
    oracle="""
    WITH b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT % 100
                   AS bucket
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(bucket AS BIGINT) AS bucket
    FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
    """,
)
def ext_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling — the reproducible
    alternative to seeded `sample()`: keep a doc iff its stable content-key
    hash bucket falls under the stratum's rate (10% of the majority 'en'
    stratum, 50% of the tail languages → a rebalanced training mix).
    Map-only and shuffle-free; the same rows survive on every run, every
    cluster size, every engine — which is what makes training sets
    auditable."""
    docs = load(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return (
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "lang",
            bucket.cast("bigint").alias("bucket"),
        )
        .filter(F.col("bucket") < rate)
    )


#: portable PII patterns — identical semantics in Java regex and RE2.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "ext_pii_redact",
    oracle=f"""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or 555-010-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
    FROM enriched
    """,
)
def ext_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: detect + redact email addresses
    and phone numbers with portable regexes, emit per-doc match counts and
    the md5 of the redacted text (so the oracle verifies the full redacted
    content without shipping it). The synthetic corpus carries no PII, so a
    deterministic contact line derived from doc_id is appended first —
    every row exercises both patterns. Map-only; at 100 TB this is a pure
    codegen stage with zero shuffle."""
    docs = load(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(enriched, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.regexp_count(enriched, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(enriched, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "snk_training_shards",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               ('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT % 8 AS shard,
               len(string_split_regex(lower(trim(text)), '\\s+')) AS n_toks
        FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM s GROUP BY shard
    """,
)
def snk_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard writer: every doc lands in
    hash(doc_id) % 8 — a stable pseudo-random shuffle that decorrelates
    adjacent docs (the training-data analog of `ORDER BY hash`), written as
    Hive-partitioned parquet and read back for verification. At scale:
    `repartition(n, shard)` aligns Spark partitions with output shards so
    each file is written by exactly one task — no small-file explosion, no
    driver collect."""
    from .io_queries import _scratch

    docs = load(spark, sf_dir, "documents")
    shard = hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % 8
    sharded = docs.select(
        "doc_id", "text", shard.cast("bigint").alias("shard")
    ).repartition(8, "shard")
    path = _scratch("snk_training_shards", sf_dir)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    # schema-on-read (an empty corpus shards to an empty publish and must
    # still read back for verification)
    back = read_back(spark, path, sharded.schema)
    return back.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


@query(
    "ext_multimodal_cols",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(('0x' || substr(hex(encode(text)) || '00', 1, 2)) AS BIGINT)
               AS first_byte,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height
    FROM documents
    """,
)
def ext_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text → binary payload + metadata
    struct → Arrow-batched mapInPandas 'decode' → typed features. The codec
    is a deterministic byte-arithmetic stub (environment has no media libs),
    so the whole pipeline stays oracle-checkable. first_byte is the first
    UTF-8 BYTE of the payload (what a codec sniffing a magic number reads),
    not the first code point: the oracle extracts it from hex(encode(text))
    — ascii(substr(text,1,1)) would return 233 for 'é' where the decoder
    sees byte 195, a divergence the prepended-multibyte fixture in
    tests/test_multibyte_parity.py pins. The '00' pad makes the empty blob
    decode to 0, matching the decoder's `b[0] if len(b) else 0`.

    Since r17 decode_features also runs the REAL container codec
    (PNG/JPEG header parsing); UTF-8 text payloads can never false-sniff
    as either (their magics begin with bytes invalid as UTF-8 starts), so
    this query's contract is unchanged — it selects the legacy
    byte-arithmetic feature columns. ext_multimodal_decode exercises the
    image-header path on genuine container bytes."""
    docs = load(spark, sf_dir, "documents")
    media = attach_binary(docs)
    return decode_features(media).select(
        "doc_id", "n_bytes", "first_byte", "width", "height"
    )


@query(
    "ext_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 29 ELSE 39 END AS BIGINT)
               AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 137 ELSE 255 END AS BIGINT)
               AS first_byte,
           CAST((doc_id % 509) + 1 AS BIGINT) AS width,
           CAST((doc_id % 387) + 1 AS BIGINT) AS height
    FROM documents
    """,
)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-container decode through the multimodal seam (r16
    verdict #7): every document gets a genuine PNG or JPEG header payload
    — built JVM-side from deterministic doc_id-derived dimensions with
    hex/unhex byte assembly, no Python in the encode path — and
    decode_features recovers format and dimensions by actually parsing
    the container bytes in the Arrow batch path (PNG IHDR big-endian
    uint32s; JPEG SOI → APP0 → segment walk to the SOF0 frame header).
    The oracle replays the EXPECTED dims arithmetically, so a parser that
    mis-walks segments or flips endianness hash-mismatches immediately.

    Payload layouts (spec-true headers, truncated after the fields a
    sniffing codec reads):
      png  (29 B): magic(8) | IHDR len 0x0000000D(4) | 'IHDR'(4) |
                   width u32be(4) | height u32be(4) | bit-depth/color/
                   compression/filter/interlace (5)
      jpeg (39 B): SOI FFD8(2) | APP0 FFE0 len 0x0010 'JFIF\\0'
                   v1.1 units=0 densities 1×1 no-thumb (18) |
                   SOF0 FFC0 len 0x0011 precision=8 height u16be
                   width u16be 3 components (19)

    Scale: the encode is whole-stage-codegen expressions; the decode is
    one Arrow-batched mapInPandas over (doc_id, data) — no shuffle at
    all, embarrassingly parallel over partitions, the same plumbing shape
    ext_multimodal_cols carries to 100 TB."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    w = (F.col("doc_id") % 509 + 1).cast("int")
    h = (F.col("doc_id") % 387 + 1).cast("int")
    hex4 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731  u32 big-endian
    hex2 = lambda c: F.lpad(F.hex(c), 4, "0")  # noqa: E731  u16 big-endian
    png = F.concat(
        F.lit("89504E470D0A1A0A"),          # magic
        F.lit("0000000D49484452"),          # IHDR length + type
        hex4(w), hex4(h),
        F.lit("0806000000"),                # depth/color/comp/filter/interlace
    )
    jpeg = F.concat(
        F.lit("FFD8"),                      # SOI
        F.lit("FFE000104A46494600010100000100010000"),  # APP0/JFIF, 18 B
        F.lit("FFC0001108"), hex2(h), hex2(w),          # SOF0: len 17, prec 8
        F.lit("03011100021101031101"),      # 3 components
    )
    media = docs.select(
        "doc_id",
        F.unhex(F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg)).alias(
            "data"
        ),
    )
    return decode_features(media)


@query(
    "ext_seq_pack",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
                   AS n_tok,
               ('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT % 8 AS bucket
        FROM documents
    ),
    o AS (
        SELECT doc_id, bucket, n_tok,
               CAST(COALESCE(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS tok_offset
        FROM d
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tok, tok_offset,
           CAST(tok_offset // 512 AS BIGINT) AS seq_first,
           CAST((tok_offset + n_tok - 1) // 512 AS BIGINT) AS seq_last,
           CAST((tok_offset + n_tok - 1) // 512 - tok_offset // 512 + 1 AS BIGINT)
               AS n_seqs
    FROM o
    """,
)
def ext_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk) for LLM training: documents are
    hash-assigned to packer buckets, concatenated in deterministic order
    within each bucket, and cut into fixed 512-token training sequences.
    Emits each document's span in packed-sequence space — the manifest a
    shard writer consumes. The packing itself is ONE window cumulative sum
    per bucket: the shuffle moves (id, n_tok) pairs only (never text), and
    buckets are independent, so at 100 TB parallelism = n_buckets and no
    bucket ever needs another's state. (Reference analog: the daily
    compaction job materializes a day in RAM, bucket_raw_data.py:95-106 —
    here the same 'pack into fixed output units' need is a distributed
    plan, not a single-process loop.)"""
    docs = load(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))) % 8
    d = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        bucket.cast("bigint").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = d.withColumn("tok_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    seq_first = F.floor(F.col("tok_offset") / 512)
    seq_last = F.floor((F.col("tok_offset") + F.col("n_tok") - 1) / 512)
    return o.select(
        "doc_id",
        "bucket",
        "n_tok",
        "tok_offset",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs"),
    )


@query(
    "ext_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents
    ),
    t AS (SELECT id, generate_subscripts(l, 1) AS i, unnest(l) AS tok FROM toks),
    ug AS (SELECT id, tok, count(*) AS c FROM t GROUP BY id, tok),
    ustat AS (SELECT id, sum(c) AS n_tok, max(c) AS top_c,
                     sum(c) - count(*) AS dup_occ
              FROM ug GROUP BY id),
    bg AS (SELECT a.id, a.tok || ' ' || b.tok AS bgram
           FROM t a JOIN t b ON b.id = a.id AND b.i = a.i + 1),
    bgc AS (SELECT id, bgram, count(*) AS c FROM bg GROUP BY id, bgram),
    bstat AS (SELECT id, sum(c) AS n_bg, sum(c) - count(*) AS dup_bg
              FROM bgc GROUP BY id)
    SELECT u.id AS doc_id,
           CAST(u.n_tok AS BIGINT) AS n_tokens,
           round(u.top_c / CAST(u.n_tok AS DOUBLE), 6) AS top_unigram_frac,
           round(u.dup_occ / CAST(u.n_tok AS DOUBLE), 6) AS dup_token_frac,
           round(COALESCE(b.dup_bg / CAST(b.n_bg AS DOUBLE), 0.0), 6)
               AS dup_bigram_frac
    FROM ustat u LEFT JOIN bstat b ON b.id = u.id
    """,
)
def ext_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-rule family): most-frequent
    token share, duplicate-token share, and duplicate-bigram share per
    document. High values flag boilerplate/spam for the quality gate. Two
    hash aggregates keyed on (doc, gram) — the gram explode is map-side, the
    shuffle carries counts, and nothing is quadratic; at 100 TB this is the
    same shape as word-count."""
    docs = load(spark, sf_dir, "documents")
    uni = (
        docs.select(F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tok"),
            F.max("c").alias("top_c"),
            (F.sum("c") - F.count(F.lit(1))).alias("dup_occ"),
        )
    )
    bi = (
        _shingle_rows(docs, 2, "text", "doc_id")
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_bg"), (F.sum("c") - F.count(F.lit(1))).alias("dup_bg"))
    )
    return uni.join(bi, "id", "left").select(
        F.col("id").alias("doc_id"),
        F.col("n_tok").alias("n_tokens"),
        F.round(F.col("top_c") / F.col("n_tok").cast("double"), 6).alias(
            "top_unigram_frac"
        ),
        F.round(F.col("dup_occ") / F.col("n_tok").cast("double"), 6).alias(
            "dup_token_frac"
        ),
        F.round(
            F.coalesce(F.col("dup_bg") / F.col("n_bg").cast("double"), F.lit(0.0)), 6
        ).alias("dup_bigram_frac"),
    )


@query(
    "ext_bm25",
    oracle="""
    WITH t AS (
        SELECT doc_id AS id, t.tok
        FROM documents, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY id),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl
              FROM dl),
    tf AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS c FROM t
           WHERE tok IN ('spark', 'hash', 'window') GROUP BY id, tok),
    idf AS (SELECT tok, (s.n_docs - count(*) + 0.5) / (count(*) + 0.5) AS idf
            FROM tf, stats s GROUP BY tok, s.n_docs),
    ts AS (SELECT tf.id, tf.tok,
                  idf.idf * (tf.c * 2.2)
                      / (tf.c + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS sc
           FROM tf JOIN idf USING (tok) JOIN dl USING (id), stats s),
    sc AS (SELECT id,
                  COALESCE(max(CASE WHEN tok = 'spark' THEN sc END), 0.0)
                  + COALESCE(max(CASE WHEN tok = 'hash' THEN sc END), 0.0)
                  + COALESCE(max(CASE WHEN tok = 'window' THEN sc END), 0.0)
                      AS score
           FROM ts GROUP BY id)
    SELECT id AS doc_id, round(score, 6) AS score
    FROM sc ORDER BY score DESC, id LIMIT 20
    """,
)
def ext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed query over the
    corpus, top-20. Inverted-index shape without materializing one, in ONE
    corpus pass: a single token explode feeds a per-doc conditional
    aggregate carrying doc length AND each query term's tf, so the corpus
    is scanned once and the only full shuffle moves one narrow row per doc
    (the naive dl/tf/df-as-separate-DataFrames plan re-scanned and
    re-exploded the corpus four times — Catalyst does not CSE across
    DataFrame branches). Corpus-level stats (N, avgdl, per-term df) reduce
    from that per-doc table to a single broadcast row. Cross-engine
    determinism: the idf is the log-free odds form ((N-df+0.5)/(df+0.5))
    and the 3 per-term scores fold in fixed written order, so both engines
    produce bit-identical doubles. The final top-20 is
    TakeOrderedAndProject — no global sort at scale."""
    docs = load(spark, sf_dir, "documents")
    terms = ["spark", "hash", "window"]
    t = docs.select(
        F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    # Pinned (localCheckpoint, ContextCleaner-reclaimed): per_doc feeds
    # BOTH the corpus-stats reduction and the scoring pass — without the
    # pin each consumer re-scans and re-explodes the corpus.
    per_doc = t.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == term, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c_{term}")
            for term in terms
        ],
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
        *[
            F.sum((F.col(f"c_{term}") > 0).cast("bigint")).alias(f"df_{term}")
            for term in terms
        ],
    )
    scored = per_doc.filter(
        sum(F.col(f"c_{term}") for term in terms) > 0
    ).join(F.broadcast(stats), how="cross")

    def term_score(term: str):
        c = F.col(f"c_{term}")
        idf = (F.col("n_docs") - F.col(f"df_{term}") + 0.5) / (
            F.col(f"df_{term}") + 0.5
        )
        norm = c + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        return F.when(c > 0, idf * (c * 2.2) / norm).otherwise(0.0)

    score = term_score(terms[0]) + term_score(terms[1]) + term_score(terms[2])
    return (
        scored.select(F.col("id").alias("doc_id"), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


@query(
    "ext_domain_cap",
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY ('0x' || substr(md5('cap:' || doc_id), 1, 15))::BIGINT,
                            doc_id) AS BIGINT) AS pick
        FROM documents
    )
    SELECT doc_id, source, pick FROM r WHERE pick <= 20
    """,
)
def ext_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (quota sampling): keep at most 20 docs per
    source, chosen by a deterministic content-independent hash priority —
    the standard defense against a single crawled domain dominating the
    training mix. One row_number window per domain partition; the hash
    order makes the kept set reproducible across runs and engines, unlike
    seeded sample(). At 100 TB: partitions are domains — heavy-tail skew is
    the known hazard, and because only rank ≤ 20 survives, the window can
    be preceded by a cheap per-partition pre-filter (AQE skew split keeps
    stragglers bounded)."""
    docs = load(spark, sf_dir, "documents")
    pri = hash60(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(pri, "doc_id")
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("bigint").alias("pick")
        )
        .filter(F.col("pick") <= 20)
    )


@query(
    "ext_embed_quantize",
    oracle="""
    WITH n AS (
        SELECT vec_id,
               sqrt(list_reduce(
                   list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
                   (a, b) -> a + b)) AS nrm,
               embedding
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, nrm,
               list_transform(embedding,
                              x -> CAST(round(x::DOUBLE / nrm * 127) AS INTEGER))
                   AS q8
        FROM n WHERE nrm > 0
    )
    SELECT vec_id, round(nrm, 6) AS l2_norm,
           CAST(len(q8) AS BIGINT) AS dim,
           CAST(list_min(q8) AS BIGINT) AS q_min,
           CAST(list_max(q8) AS BIGINT) AS q_max,
           CAST(list_sum(q8) AS BIGINT) AS q_sum,
           md5(array_to_string(q8, ',')) AS q_digest
    FROM q
    """,
)
def ext_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding post-processing for ANN serving: L2 norm + int8
    quantization (scale to the unit sphere, round to [-127, 127]) — the
    standard 4× memory cut before index build. Pure map-side higher-order
    functions (aggregate fold for the norm, transform for the quantize):
    zero shuffle, whole-stage codegen, linear at any scale. The fold is
    sequential in both engines, so the doubles match bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0).cast("double"),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    n = emb.select("vec_id", nrm.alias("nrm"), "embedding").filter(F.col("nrm") > 0)
    q8 = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") / F.col("nrm") * 127).cast("int"),
    )
    q = n.select("vec_id", "nrm", q8.alias("q8"))
    # Scalar digests instead of the raw int8 array: every engine/driver
    # canonicalizes scalars identically, and md5 over the joined values
    # still pins every element bit-for-bit.
    return q.select(
        "vec_id",
        F.round("nrm", 6).alias("l2_norm"),
        F.size("q8").cast("bigint").alias("dim"),
        F.array_min("q8").cast("bigint").alias("q_min"),
        F.array_max("q8").cast("bigint").alias("q_max"),
        F.aggregate("q8", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.md5(F.array_join("q8", ",")).alias("q_digest"),
    )


@query(
    "ext_kmeans_update",
    oracle="""
    WITH cent AS (SELECT vec_id AS cent_id, embedding AS c FROM embeddings
                  WHERE vec_id IN (SELECT vec_id FROM embeddings
                                   ORDER BY vec_id LIMIT 8)),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM embeddings e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    t AS (SELECT a.cell,
                 CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS pos,
                 CAST(round(unnest(e.embedding)::DOUBLE * 1000000) AS BIGINT) AS qv
          FROM assign a JOIN embeddings e USING (vec_id))
    SELECT CAST(cell AS BIGINT) AS cell, pos,
           CAST(count(*) AS BIGINT) AS n_members,
           round(sum(qv) / (count(*) * 1000000.0), 6) AS coord
    FROM t GROUP BY cell, pos
    """,
)
def ext_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration (the k-means centroid UPDATE step) over the
    embedding corpus: assign every vector to its nearest centroid (the
    zero-shuffle broadcast argmax from ivf_assign), then recompute each
    centroid as the member mean, per dimension.

    Determinism: float sums are order-sensitive under distributed
    aggregation, so coordinates are quantized to integers (×1e6, round)
    BEFORE summing — integer sums are exact in any order, and the single
    final division is reproducible bit-for-bit in both engines.

    Scale shape: posexplode emits n×d (cell, pos, qv) rows, but the hash
    aggregate's map-side partial combine collapses them to k×d rows PER
    PARTITION before the shuffle — the shuffle moves O(partitions × k × d),
    independent of corpus size. Iterating to convergence = re-running this
    query with the returned centroids; each iteration is one scan + one
    bounded shuffle. k here is a MODEL hyperparameter chosen by the
    modeler (pinned at 8 for the demo iteration), unlike the
    search/dedup families' corpus-adaptive cell counts where k is a
    scale knob — a fixed k does not change this query's cost shape
    (one scan, k×d-bounded shuffle either way)."""
    emb = load(spark, sf_dir, "embeddings")
    cents = emb.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign(emb, cents)
    t = assigned.select("cell", F.posexplode("vec").alias("pos", "v")).select(
        "cell",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("v").cast("double") * 1000000).cast("bigint").alias("qv"),
    )
    return t.groupBy("cell", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(F.sum("qv") / (F.count(F.lit(1)) * F.lit(1000000.0)), 6).alias("coord"),
    ).select(F.col("cell").cast("bigint").alias("cell"), "pos", "n_members", "coord")


@query(
    "ext_vocab_topk",
    oracle="""
    WITH t AS (
        SELECT t.tok
        FROM documents, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY tok)
    SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 100
    """,
)
def ext_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: global token frequencies, top-100 — the first
    pass of any tokenizer build (BPE seeding, stopword lists, frequency
    cutoffs). Word-count shape with map-side partial aggregation, then
    TakeOrderedAndProject for the cut — the full vocabulary never sorts
    globally, so at 100 TB the cost is one shuffle of the distinct-token
    partials."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    return (
        t.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(100)
    )


@query(
    "ext_mix_weights",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM s)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / CAST(t AS DOUBLE), 6) AS weight
    FROM s, tot
    """,
)
def ext_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weights: per-source document and token counts plus each
    source's share of the total token budget — the table a training
    sampler consumes to hit a target mixture. One aggregate over sources +
    a broadcast of the single-row total; token counts are exact integers so
    the shares are deterministic."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    tot = s.agg(F.sum("n_tokens").alias("t"))
    return s.join(F.broadcast(tot), how="cross").select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t").cast("double"), 6).alias("weight"),
    )


@query(
    "job_prep_training_corpus",
    oracle="""
    WITH q AS (
        SELECT doc_id, text FROM documents
        WHERE len(string_split_regex(lower(trim(text)), '\\s+')) BETWEEN 5 AND 500
          AND len(regexp_extract_all(text, '[A-Za-z]'))
              / CAST(length(text) AS DOUBLE) >= 0.5
          AND len(regexp_extract_all(text, '[0-9]'))
              / CAST(length(text) AS DOUBLE) <= 0.3
    ),
    base AS (
        SELECT doc_id, text FROM q
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY sha256(text))
    ),
    toks AS (SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS l
             FROM base),
    t AS (SELECT id, generate_subscripts(l, 1) AS i, unnest(l) AS tok FROM toks),
    tok AS (SELECT DISTINCT a.id, a.tok || ' ' || b.tok || ' ' || c.tok AS tok
            FROM t a
            JOIN t b ON b.id = a.id AND b.i = a.i + 1
            JOIN t c ON c.id = a.id AND c.i = a.i + 2),
    h AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
          FROM tok),
    params AS (SELECT i,
                      ((1103515245 * i + 12345) % 2147483646) + 1 AS a,
                      (1103515245 * (i + 100) + 12345) % 2147483647 AS b
               FROM generate_series(0, 15) g(i)),
    sig AS (SELECT id, i, min((a * (hv % 2147483647) + b) % 2147483647) AS mh
            FROM h CROSS JOIN params GROUP BY id, i),
    bands AS (SELECT id, i // 4 AS band,
                     md5(string_agg(format('{:02d}:{}', i, mh), ',' ORDER BY i))
                     AS band_hash
              FROM sig GROUP BY id, i // 4),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS n FROM h GROUP BY id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN h ta ON ta.id = c.id_a
              JOIN h tb ON tb.id = c.id_b AND tb.hv = ta.hv
              GROUP BY c.id_a, c.id_b),
    drops AS (SELECT DISTINCT id_b AS doc_id
              FROM inter JOIN sizes sa ON sa.id = id_a
                         JOIN sizes sb ON sb.id = id_b
              WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.7),
    clean AS (SELECT * FROM base
              WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
    s AS (SELECT doc_id,
                 ('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT % 8
                     AS shard,
                 len(string_split_regex(lower(trim(text)), '\\s+')) AS n_toks
          FROM clean)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM s GROUP BY shard
    """,
)
def job_prep_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-prep pipeline (jobs/prep_corpus.py): quality
    gate → exact dedup → MinHash-LSH near-dup removal → shard manifest,
    composed from the engine's own operator building blocks. The oracle
    replays every stage in DuckDB — including the full LSH chain on the
    SURVIVOR set — so the composition semantics (not just each stage) are
    hash-pinned. Scale: each stage keeps its operator's shape (map-only
    gate, one hash-partition window, banded equi-join, bounded anti-join,
    one final aggregate); the corpus is never collected or all-paired."""
    from ..jobs.prep_corpus import prep_training_corpus

    return prep_training_corpus(load(spark, sf_dir, "documents"))


@query(
    "ext_dedup_containment",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    h AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
          FROM tok),
    params AS (SELECT i,
                      ((1103515245 * i + 12345) % 2147483646) + 1 AS a,
                      (1103515245 * (i + 100) + 12345) % 2147483647 AS b
               FROM generate_series(0, 15) g(i)),
    sig AS (SELECT id, i, min((a * (hv % 2147483647) + b) % 2147483647) AS mh
            FROM h CROSS JOIN params GROUP BY id, i),
    bands AS (SELECT id, i // 4 AS band,
                     md5(string_agg(format('{{:02d}}:{{}}', i, mh), ',' ORDER BY i))
                     AS band_hash
              FROM sig GROUP BY id, i // 4),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS n FROM h GROUP BY id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN h ta ON ta.id = c.id_a
              JOIN h tb ON tb.id = c.id_b AND tb.hv = ta.hv
              GROUP BY c.id_a, c.id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(n_inter / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS containment
    FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
    WHERE n_inter / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.8
    """,
)
def ext_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup (|A∩B| / min(|A|,|B|) ≥ 0.8) over the same
    MinHash-LSH candidate chain as ext_dedup_minhash — the asymmetric
    complement that catches SUB-DOCUMENT copies: a short document pasted
    inside a long one keeps containment ≈ 1 while its Jaccard collapses
    toward the length ratio. Same scale shape end to end: raw occurrence
    shingles (no corpus-wide distinct), banded candidates, verification
    restricted to the candidate working set."""
    tok = hashed_shingles(
        load(spark, sf_dir, "documents"), n=3, distinct=False
    ).localCheckpoint(eager=True)
    sig = minhash_signatures(tok).localCheckpoint(eager=True)
    cand = minhash_candidate_pairs(sig)
    return verified_containment_pairs(cand, tok, threshold=0.8, distinct_sets=True)


@query(
    "ext_token_entropy",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id, string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents
    ),
    t AS (SELECT id, unnest(l) AS tok FROM toks),
    tf AS (SELECT id, tok, count(*)::DOUBLE AS c
           FROM t WHERE tok <> '' GROUP BY id, tok),
    agg AS (SELECT id, sum(c) AS n, count(*) AS n_types,
                   sum(c * log2(c)) AS clc
            FROM tf GROUP BY id)
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           round(log2(n) - clc / n, 4) AS entropy,
           round(n_types / n, 4) AS ttr
    FROM agg
    """,
)
def ext_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution quality signals per document: Shannon entropy of
    the token frequency distribution and type-token ratio — the
    low-entropy screen that catches keyword-stuffed / boilerplate / highly
    repetitive documents that length and punctuation ratios miss
    (complements ext_repetition_stats' n-gram view).

    Entropy uses the algebraic form H = log2(n) − Σc·log2(c)/n so the
    whole computation is two hash aggregates — (id, tok) counts, then one
    row per doc — with no per-row probability column and no second join
    against the doc totals. Map-side partial aggregation collapses token
    rows before the shuffle; nothing here holds a whole document's
    distribution in memory, so the plan is corpus-size-linear."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    agg = tf.groupBy("id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.log2("c")).alias("clc"),
    )
    return agg.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(F.log2("n") - F.col("clc") / F.col("n"), 4).alias("entropy"),
        F.round(F.col("n_types") / F.col("n"), 4).alias("ttr"),
    )


@query(
    "ext_dedup_incremental",
    oracle="""
    WITH batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
    ex_idx AS (SELECT sha256(text) AS h, min(doc_id) AS dup_of
               FROM corpus GROUP BY sha256(text)),
    nm_idx AS (SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h,
                      min(doc_id) AS dup_of
               FROM corpus GROUP BY 1)
    SELECT CAST(b.doc_id AS BIGINT) AS batch_doc_id,
           CAST(coalesce(e.dup_of, n.dup_of) AS BIGINT) AS dup_of,
           CASE WHEN e.dup_of IS NOT NULL THEN 'exact'
                WHEN n.dup_of IS NOT NULL THEN 'normalized'
                ELSE 'new' END AS match_kind
    FROM batch b
    LEFT JOIN ex_idx e ON e.h = sha256(b.text)
    LEFT JOIN nm_idx n
        ON n.h = md5(regexp_replace(lower(trim(b.text)), '\\s+', ' ', 'g'))
    """,
)
def ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the shape every production crawl pipeline runs:
    dedup a NEW batch against the EXISTING corpus, not the corpus against
    itself. Here docs with doc_id % 5 == 4 stand in for the new batch; the
    rest is the existing corpus. Each batch doc is labeled 'exact' (byte
    hash match), 'normalized' (whitespace/case-normalized fingerprint
    match), or 'new', with the matched corpus doc id.

    Scale shape: the corpus side collapses to its HASH INDEX (one 32-byte
    key + bigint per distinct document) via a map-side-combined aggregate —
    in production that index is precomputed once and stored keyed by hash,
    so per-batch cost is two hash joins whose build side is the (small)
    batch. Nothing re-reads or re-shuffles corpus text per batch; the text
    column never moves after the map-side hash."""
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    norm = lambda c: F.md5(  # noqa: E731
        F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    )
    ex_idx = corpus.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("ex_dup")
    )
    nm_idx = corpus.groupBy(norm(F.col("text")).alias("h")).agg(
        F.min("doc_id").alias("nm_dup")
    )
    return (
        batch.select("doc_id", F.sha2("text", 256).alias("eh"), norm(F.col("text")).alias("nh"))
        .join(ex_idx, F.col("eh") == ex_idx.h, "left")
        .drop("h")
        .join(nm_idx, F.col("nh") == nm_idx.h, "left")
        .select(
            F.col("doc_id").cast("bigint").alias("batch_doc_id"),
            F.coalesce("ex_dup", "nm_dup").cast("bigint").alias("dup_of"),
            F.when(F.col("ex_dup").isNotNull(), "exact")
            .when(F.col("nm_dup").isNotNull(), "normalized")
            .otherwise("new")
            .alias("match_kind"),
        )
    )


@query(
    "ext_sample_stratified",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5('strat:' || doc_id), 1, 15))::BIGINT,
                            doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 100
    """,
)
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: keep the 100 documents per language
    whose stable content-key hash sorts first — the quota-based complement
    to ext_sample_hash's rate-based sampler, for when the training mix
    specifies absolute per-stratum counts. Deterministic across runs,
    cluster sizes, and engines (hash order, unique tiebreaker).

    Catalyst compiles the rank filter to the standard TWO-PHASE top-k
    (WindowGroupLimit Partial → Exchange → WindowGroupLimit Final): each
    map task forwards at most k rows per stratum, so the stratum-key
    shuffle carries n_partitions×k rows per stratum instead of the full
    stratum — the shape that survives k ≪ stratum size at 100 TB. Pinned
    by tests/test_plans.py::test_stratified_sample_is_partial_topk; the
    optimization needs the `row_number() ≤ k` filter pattern, so keep the
    rank filter in this recognizable form."""
    docs = load(spark, sf_dir, "documents")
    key = hash60(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "lang",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 100)
    )


@query(
    "ext_sim_recall",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    -- query sample: the 5 smallest NON-CENTROID ids (re-keyed r13; the
    -- first n_cells ids ARE the centroids, and a centroid-coincident
    -- query audits the quantizer's self-recall — measured 4-5x
    -- optimistic vs the typical vector on the 20k uniform probe)
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM (
             SELECT vec_id, embedding,
                    row_number() OVER (ORDER BY vec_id) AS rn,
                    count(*) OVER () AS nn
             FROM emb)
          WHERE rn > greatest(8, CAST(ceil(nn / 250.0) AS BIGINT))
          ORDER BY vec_id LIMIT 5),
    pairs AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS ce
              FROM q CROSS JOIN emb e),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM pairs),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id),
    ex AS (SELECT query_id, vec_id FROM s
           QUALIFY row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, vec_id) <= 10),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    q2 AS (SELECT a.vec_id AS query_id, a.cell, e.embedding AS qe
           FROM assign a JOIN emb e USING (vec_id)
           WHERE a.vec_id IN (SELECT query_id FROM q)),
    cand AS (SELECT q2.query_id, q2.qe, e2.vec_id, e2.embedding AS ce
             FROM q2 JOIN assign a2 ON a2.cell = q2.cell
             JOIN emb e2 ON e2.vec_id = a2.vec_id),
    terms2 AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                      unnest(ce)::DOUBLE AS cb
               FROM cand),
    s2 AS (SELECT query_id, vec_id,
                  sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
           FROM terms2 GROUP BY query_id, vec_id),
    ap AS (SELECT query_id, vec_id FROM s2
           QUALIFY row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, vec_id) <= 10)
    SELECT CAST(e.query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.vec_id) AS BIGINT) AS n_hit,
           round(count(a.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall
    FROM ex e LEFT JOIN ap a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
    GROUP BY e.query_id
    """,
)
def ext_sim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index against exact brute-force search, per
    query — 'measure, don't guess' for the ANN quality/cost trade-off: the
    number every index deployment needs before trusting nprobe=1 at scale.

    The corpus is COSINE-SCORED ONCE (the shared scored_cosine pass, pinned
    via localCheckpoint); exact top-k ranks those scores unrestricted, and
    the IVF result ranks the SAME scores restricted to the query's centroid
    cell — algebraically identical to re-running ivf_topk (same scores,
    same candidates, same tiebreak) with one whole corpus fold pass saved.
    The only other corpus pass is the zero-shuffle assignment map
    (ivf_assign). At 100 TB a recall audit runs on a query SAMPLE: the
    scored table is |Q|×|corpus| rows, so Q bounds the audit's cost — which
    is exactly why measuring recall on a sample is the deployment gate, not
    a full-corpus self-join.

    Cell count is the corpus-adaptive greatest(8, ceil(N/250)) (re-keyed
    round 11 with the whole search family — the audit must measure the
    SHIPPED index, and the shipped index no longer uses fixed 8 cells);
    null embeddings excluded corpus- and seed-side (graph-family null
    contract).

    QUERY RULE (re-keyed r13): the 5 smallest NON-CENTROID ids. The
    first n_cells ids are the data-sampled centroids themselves — a
    centroid-coincident query scores its own cell at cos=1 and its near
    neighbors quantize with it, so the old `vec_id < 5` rule audited
    the quantizer's self-recall (measured 4-5× optimistic vs the
    typical vector on the 20k uniform probe, r13). The search queries
    the audit gates (ext_sim_search_ivf*) keep their vec_id < 5 query
    set — they are result queries, not recall metrics.

    MINIMUM CORPUS (ADVICE r13 #3): the non-centroid rule needs N >
    n_cells non-null embeddings (n_cells floor is 8); below that the
    query sample is empty and the audit returns ZERO ROWS on both
    engines. Empty output from this audit therefore means "corpus too
    small to audit", never "recall is fine" — consumers must treat
    0 rows as no-measurement, not as a pass."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    queries = emb.orderBy("vec_id").offset(n_cells).limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sc = scored_cosine(emb, queries).localCheckpoint(eager=True)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    exact = (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "vec_id")
    )
    asg = ivf_assign(emb, centroids).select(F.col("id").alias("vec_id"), "cell")
    qcell = asg.join(
        queries.select(F.col("query_id").alias("vec_id")), "vec_id"
    ).select(F.col("vec_id").alias("query_id"), F.col("cell").alias("qcell"))
    approx = (
        sc.join(F.broadcast(qcell), "query_id")
        .join(asg, "vec_id")
        .filter(F.col("cell") == F.col("qcell"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", F.col("vec_id").alias("ap_vec_id"))
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (exact.vec_id == approx.ap_vec_id),
        "left",
    ).select(exact.query_id, exact.vec_id, approx.ap_vec_id)
    return hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("ap_vec_id").cast("bigint").alias("n_hit"),
        F.round(
            F.count("ap_vec_id") / F.count(F.lit(1)).cast("double"), 4
        ).alias("recall"),
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        "n_exact",
        "n_hit",
        "recall",
    )


@query(
    "ext_quality_model",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
        FROM documents
    ),
    z AS (
        SELECT doc_id,
               -1.0 + 0.004 * n_tokens
                    + 2.0 * (n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE))
                    - 3.0 * (n_digits / CAST(greatest(n_chars, 1) AS DOUBLE)) AS z
        FROM f
    )
    SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score,
           CAST(1.0 / (1.0 + exp(-z)) >= 0.6 AS BOOLEAN) AS keep
    FROM z
    """,
)
def ext_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring — the shape of the fasttext/logistic
    quality-classifier stage every production corpus runs after the
    heuristic gate: score = sigmoid(w·features) with fixed published
    weights, keep = score ≥ threshold. Map-only, whole-stage-codegen; at
    100 TB this is a free rider on the corpus scan. The weight vector here
    is a deterministic stand-in — production swaps in trained weights
    (or an ONNX-exported scorer behind a Pandas UDF) without touching the
    plan shape. Both engines evaluate the identical closed-form expression,
    so the oracle is exact, not approximate."""
    docs = load(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    # greatest(n_chars, 1): an EMPTY doc (n_chars = 0) must score, not
    # kill the job with ANSI DIVIDE_BY_ZERO (found by the blank-text
    # sweep); with zero alpha/digit counts the ratios are exactly 0, so
    # the clamp changes nothing on any non-empty doc
    denom = F.greatest(f["n_chars"], F.lit(1)).cast("double")
    z = (
        F.lit(-1.0)
        + F.lit(0.004) * f["n_tokens"]
        + F.lit(2.0) * (f["n_alpha"] / denom)
        - F.lit(3.0) * (f["n_digits"] / denom)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        "doc_id",
        F.round(score, 4).alias("score"),
        (score >= 0.6).alias("keep"),
    )


@query(
    "ext_tfidf_topk",
    oracle="""
    WITH t AS (
        SELECT doc_id, t.tok
        FROM documents, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    s AS (SELECT doc_id, tf.tok,
                 round(tf * (ln((n.n + 1) / CAST(df.df + 1 AS DOUBLE)) + 1.0), 6)
                     AS tfidf
          FROM tf JOIN df USING (tok) CROSS JOIN n)
    SELECT doc_id, tok, tfidf
    FROM s
    QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, tok) <= 3
    """,
)
def ext_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms per document — the salience
    signal retrieval-augmented pipelines and topic filters attach to every
    crawl document. Two hash aggregates (term frequency per doc, document
    frequency per term — both collapse map-side), a broadcast of the
    1-row corpus count, a broadcast-able DF join (vocabulary << corpus),
    and a per-doc top-k that compiles to partial WindowGroupLimit — no
    global sort, nothing corpus-sized shuffles twice. The window orders by
    the ROUNDED score so both engines break near-ties on the token string,
    not on a 1-ulp ln() difference.

    The TF table is pinned (localCheckpoint, ContextCleaner-reclaimed)
    because both the scoring join and the DF rollup consume it — without
    the pin Catalyst plans no exchange reuse (the two aggregates differ)
    and the corpus is scanned + tokenized twice."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = (
        t.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n), how="cross")
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n") + 1) / (F.col("df") + 1).cast("double"))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "ext_url_dedup",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Articles/'
               || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=feed&ref='
               || lang || '&utm_campaign=crawl&id=' || CAST(doc_id % 25 AS VARCHAR)
                   AS url,
               source
        FROM documents
    ),
    parts AS (
        SELECT doc_id, source,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
               regexp_replace(
                   lower(regexp_extract(url, '^[^:/?#]+://([^/:?#]+)', 1)),
                   '^www\\.', '') AS host,
               regexp_replace(
                   regexp_extract(url, '^[^:/?#]+://[^/?#]+(/[^?#]*)', 1),
                   '/$', '') AS path,
               array_to_string(
                   list_sort(list_filter(
                       string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p NOT LIKE 'utm_%')),
                   '&') AS qs
        FROM u
    ),
    canon AS (
        SELECT doc_id, source,
               scheme || '://' || host || path
               || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
        FROM parts
    )
    SELECT canonical_url,
           CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM canon GROUP BY canonical_url
    """,
)
def ext_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first dedup stage of every crawl
    pipeline (run before any content hash): lowercase scheme and host,
    strip the ``www.`` prefix and the default port, drop ``utm_*``
    tracking parameters, sort the surviving query parameters, strip the
    trailing slash, then keep one representative per canonical URL.

    The test tables carry no URL column, so a crawl-shaped URL is DERIVED
    deterministically from (source, lang, doc_id) — mixed-case host,
    explicit :443, unsorted params, tracking noise — exercising every
    canonicalization rule; production reads the real ``url`` column with
    the identical expression tree. Scale shape: canonicalization is pure
    map-side column math (regexp + array ops in whole-stage codegen), and
    the dedup is ONE hash aggregate keyed on the canonical string —
    min(doc_id) representative and family size ride the same shuffle.
    Unlike content dedup there is no candidate-pair stage at all, which
    is why URL dedup runs first at 100 TB: it removes the bulk of crawl
    duplication for one aggregate's cost."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        F.lit(".Example.COM:443/Articles/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=feed&ref="),
        F.col("lang"),
        F.lit("&utm_campaign=crawl&id="),
        (F.col("doc_id") % 25).cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^[^:/?#]+://([^/:?#]+)", 1)),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[^:/?#]+://[^/?#]+(/[^?#]*)", 1), r"/$", ""
    )
    qs = F.concat_ws(
        "&",
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
                lambda p: ~p.startswith("utm_"),
            )
        ),
    )
    canon = u.select(
        "doc_id",
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.min("doc_id").cast("bigint").alias("rep_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
    )


@query(
    "ext_temperature_sample",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM s),
    p AS (SELECT source, n_tokens, n_tokens / CAST(t AS DOUBLE) AS nat,
                 CAST(round(power(n_tokens / CAST(t AS DOUBLE), 0.3)
                            * 1000000000) AS BIGINT) AS q
          FROM s, tot),
    z AS (SELECT CAST(sum(q) AS BIGINT) AS z FROM p)
    SELECT source, n_tokens,
           round(nat, 6) AS nat_share,
           round(q / CAST(z AS DOUBLE), 6) AS temp_share,
           round((q / CAST(z AS DOUBLE)) / nat, 4) AS rel_epochs
    FROM p, z
    """,
)
def ext_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual/multi-domain
    upsampling rule: w_s ∝ p_s^α, here α = 0.3) — the table that tells the
    data loader how hard to upsample small sources: natural token share,
    temperature share, and relative epochs (>1 = upsampled). Same
    single-aggregate + two broadcast-single-row-joins shape as
    ext_mix_weights. The α-scaled weights are quantized to 1e-9 BIGINTs
    *before* the normalizing sum so the cross-engine float sum is exact
    integer arithmetic — summing raw pow() doubles would hash-differ on
    accumulation order at 1 ulp.

    The per-source aggregate is pinned (localCheckpoint — a ~|sources|-row
    table): FOUR consumers read it (the weight rows, both normalizing
    totals, and the epoch ratio), and without the pin Catalyst inlines the
    aggregate into every branch — the corpus was scanned and tokenized 4×
    (observed in the executed plan)."""
    docs = load(spark, sf_dir, "documents")
    s = (
        docs.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"))
        .localCheckpoint(eager=True)
    )
    tot = s.agg(F.sum("n_tokens").cast("bigint").alias("t"))
    p = s.join(F.broadcast(tot), how="cross").select(
        "source",
        "n_tokens",
        (F.col("n_tokens") / F.col("t").cast("double")).alias("nat"),
        F.round(
            F.pow(F.col("n_tokens") / F.col("t").cast("double"), 0.3)
            * F.lit(1000000000.0)
        )
        .cast("bigint")
        .alias("q"),
    )
    z = p.agg(F.sum("q").cast("bigint").alias("z"))
    return p.join(F.broadcast(z), how="cross").select(
        "source",
        "n_tokens",
        F.round("nat", 6).alias("nat_share"),
        F.round(F.col("q") / F.col("z").cast("double"), 6).alias("temp_share"),
        F.round((F.col("q") / F.col("z").cast("double")) / F.col("nat"), 4).alias(
            "rel_epochs"
        ),
    )


@query(
    "job_data_card",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                AS BIGINT) AS n_tokens,
           round(median(CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                             AS BIGINT)), 1) AS median_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS pct_en,
           CAST(count(*) - count(DISTINCT
                md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                AS BIGINT) AS n_exact_dups
    FROM documents GROUP BY source
    """,
)
def job_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet ("data card") — the per-source summary table every
    corpus release ships: document/token volume, median length, language
    spread, English share, and exact-duplicate mass (docs minus distinct
    whitespace-normalized fingerprints). ONE aggregate over the corpus
    produces the whole card: counts and sums collapse map-side; the two
    count-distincts expand to the standard two-phase distinct aggregate,
    keyed by (source, lang) and (source, fingerprint) — still one logical
    pass over the text, no joins. Median runs on integer token counts so
    the even-count midpoint is exact in both engines. At 100 TB this is
    the cheapest full-corpus report in the catalog: nothing but group
    states ever shuffles."""
    docs = load(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text"))
    return docs.select(
        "source", "lang", n_tok.alias("n_tok"), fingerprint(F.col("text")).alias("fp")
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.round(F.expr("median(n_tok)"), 1).alias("median_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("pct_en"),
        (F.count(F.lit(1)) - F.count_distinct("fp")).cast("bigint").alias(
            "n_exact_dups"
        ),
    )


@query(
    "ext_semdedup",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    m AS (SELECT a.vec_id, a.cell, e.embedding AS v
          FROM assign a JOIN emb e USING (vec_id)),
    pr AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.v AS va, y.v AS vb
           FROM m x JOIN m y ON y.cell = x.cell AND x.vec_id < y.vec_id),
    terms AS (SELECT id_a, id_b, unnest(va)::DOUBLE AS qa, unnest(vb)::DOUBLE AS cb
              FROM pr),
    s AS (SELECT id_a, id_b,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY id_a, id_b),
    dropped AS (SELECT DISTINCT id_b FROM s WHERE cs >= 0.2)
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           d.id_b IS NULL AS kept
    FROM assign a LEFT JOIN dropped d ON d.id_b = a.vec_id
    """,
)
def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embedding space into k cells (the deterministic IVF assignment —
    production fits k-means via ext_kmeans_update), then inside each
    cell drop every vector that has a LOWER-id neighbor with cosine
    ≥ 0.2. The cluster-scoped pairwise pass is the method's whole point
    at 100 TB: candidate pairs are O(Σ cell²), bounded by cell size —
    k MUST scale with the corpus for that bound to hold, so the cell
    count is the corpus-adaptive greatest(8, ceil(N/250)) (re-keyed
    round 11: the previous fixed 8 cells made in-cell pairs O(N²/8),
    exactly the quadratic the paper's clustering exists to avoid; the
    docstring claimed N/k ~constant — now the code does it, replayed
    bit-for-bit by the oracle). Assignment is the zero-shuffle in-row
    argmax (operators/similarity.py:ivf_assign); the assigned table is
    pinned because the x-side, y-side, and the final keep-flag join all
    consume it — without the pin the corpus is scanned and argmax'd
    three times. Null embeddings excluded corpus- and seed-side
    (graph-family null contract). The adaptive k makes the flat
    assignment's broadcast codebook O(N) bytes at the extreme — at that
    point the assignment swaps to ivf_assign_sharded (identical
    semantics, O(√k) broadcast ceiling; the graph family ships that
    form) with no change to the in-cell pass. Differs from
    ext_dedup_embed (sign-LSH buckets): cells here are learned density
    regions, the published recipe for semantic (not near-literal)
    duplicate pruning."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    a = ivf_assign(emb, centroids).localCheckpoint(eager=True)
    x = a.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
        "cell",
    )
    y = a.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
        "cell",
    )
    close = (
        x.join(y, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.expr(f"{dot_sql('va', 'vb')} / (na * nb)") >= 0.2
        )
        .select("id_b")
        .distinct()
    )
    return a.join(close, a["id"] == close["id_b"], "left").select(
        F.col("id").alias("vec_id"),
        F.col("cell").cast("bigint").alias("cell"),
        F.col("id_b").isNull().alias("kept"),
    )


@query(
    "ext_dsir_weights",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id, source = 'src0' AS is_t,
               string_split_regex(lower(trim(text)), '\\s+') AS l
        FROM documents
    ),
    t AS (SELECT id, is_t, generate_subscripts(l, 1) AS i, unnest(l) AS tok
          FROM toks),
    bg AS (SELECT a.id, a.is_t,
                  ('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 15))::BIGINT
                  % 10007 AS b
           FROM t a JOIN t b ON b.id = a.id AND b.i = a.i + 1),
    pin AS (SELECT id, is_t, b, CAST(count(*) AS BIGINT) AS c
            FROM bg GROUP BY id, is_t, b),
    bucket AS (SELECT b,
                      CAST(sum(c) AS BIGINT) AS n_raw,
                      CAST(sum(CASE WHEN is_t THEN c ELSE 0 END) AS BIGINT) AS n_t
               FROM pin GROUP BY b),
    tot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS tr,
                   CAST(sum(n_t) AS BIGINT) AS tt FROM bucket),
    ratio AS (SELECT b,
                     ln(CAST(n_t + 1 AS DOUBLE) / CAST(tt + 10007 AS DOUBLE))
                     - ln(CAST(n_raw + 1 AS DOUBLE) / CAST(tr + 10007 AS DOUBLE))
                         AS lr
              FROM bucket, tot)
    SELECT pin.id AS doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(sum(c * lr), 4) AS dsir_logw
    FROM pin JOIN ratio USING (b)
    GROUP BY pin.id
    """,
)
def ext_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023): score every corpus document by how target-like its
    hashed-bigram distribution is — log p_target(doc) − log p_raw(doc)
    under add-one-smoothed bag-of-hashed-bigrams models (B = 10007
    buckets; the target domain is stood in by source = 'src0'). Sampling
    ∝ exp(weight) yields the target-matched subset; this emits the weight
    table.

    Scale shape: bigrams hash to B buckets AT THE MAP SIDE (the shuffle
    never moves token strings), and the per-(doc, bucket) count table is
    the pinned intermediate — it is the corpus's compressed sufficient
    statistic (≤ min(n_bigrams, B) rows per doc), consumed twice: rolled
    up into the B-row bucket model, and joined back for per-doc scoring.
    The model table (B rows) and its totals broadcast; scoring is one
    broadcast hash join + a doc-keyed sum that partial-aggregates
    map-side. Nothing corpus-sized shuffles twice, and the quadratic
    vocabulary of raw bigrams never materializes — that is DSIR's hashing
    trick, and it is what makes the method run at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    # tokenize once behind a lineage barrier: projection collapse inlines an
    # outer array expression into per-position lambda accesses (split()
    # re-evaluated per bigram slice); pinning the token arrays measured
    # 3.2 s -> 0.8 s for this stage at sf0.1 (same fix as
    # ext_tfidf_cosine_pairs, warehouse.py)
    base = docs.select(
        F.col("doc_id").alias("id"),
        (F.col("source") == "src0").alias("is_t"),
        tokens(F.col("text")).alias("ts"),
    ).localCheckpoint(eager=True)
    tk = F.col("ts")
    bigrams = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tk) - 2, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tk, i + 1, 2)),
        ),
        lambda s: F.size(F.split(s, " ")) == 2,
    )
    B = 10007
    rows = base.select("id", "is_t", F.explode(bigrams).alias("tok")).select(
        "id", "is_t", (hash60(F.col("tok")) % B).alias("b")
    )
    pin = (
        rows.groupBy("id", "is_t", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    bucket = pin.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("n_raw"),
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_t"),
    )
    tot = bucket.agg(
        F.sum("n_raw").cast("bigint").alias("tr"),
        F.sum("n_t").cast("bigint").alias("tt"),
    )
    ratio = bucket.join(F.broadcast(tot), how="cross").select(
        "b",
        (
            F.log((F.col("n_t") + 1).cast("double") / (F.col("tt") + B).cast("double"))
            - F.log(
                (F.col("n_raw") + 1).cast("double") / (F.col("tr") + B).cast("double")
            )
        ).alias("lr"),
    )
    return (
        pin.join(F.broadcast(ratio), "b")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * F.col("lr")), 4).alias("dsir_logw"),
        )
    )


@query(
    "ext_bpe_merges",
    oracle="""
    WITH t AS (
        SELECT t.tok
        FROM documents, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
        WHERE len(t.tok) >= 2
    ),
    ch AS (SELECT tok, string_split(tok, '') AS l FROM t),
    p AS (SELECT pr.pair
          FROM ch, unnest(list_transform(generate_series(1, len(l) - 1),
                                         i -> l[i] || l[i + 1])) AS pr(pair)),
    c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY pair)
    SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 20
    """,
)
def ext_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate counting — the inner statistic of byte-pair-
    encoding tokenizer training: frequency of every adjacent symbol pair
    inside words, top-20 (the first BPE iteration merges the argmax; a
    full trainer re-runs this on the merged symbol stream). Word-count
    shape at character level: pairs are cut STRAIGHT from the token string
    — a position explode (sequence(1, len−1)) followed by
    substring(tok, i, 2) — so the whole expansion stays inside
    whole-stage codegen; counts collapse map-side, and the cut is
    TakeOrderedAndProject — the pair vocabulary (≤ |alphabet|², tiny)
    never sorts globally. At 100 TB tokenizer training runs on a sampled
    subcorpus; the plan is identical, with a sample() ahead of the
    tokenize.

    PLAN RE-KEY (r17, closing the r16 verdict #3 slope audit): the
    original expansion materialized a per-token char ARRAY and built each
    pair with a transform LAMBDA (concat of two element_at) — lambda
    higher-order functions run INTERPRETED, outside codegen, ~100×/elem
    slower than codegen arithmetic (the repo's known trap), and the pair
    stream is this query's dominant volume. Measured A/B at sf1, output
    identical: lambda-over-array 3.09 s → lambda substring 1.26 s →
    position-explode + codegen substring 0.69 s (4.5×). substring also
    counts CODE POINTS (UTF8String), where split("") cut UTF-16 units —
    astral-plane text now pairs correctly."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = t.select(
        "tok",
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
    ).select(F.expr("substring(tok, i, 2)").alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@query(
    "ext_dedup_substring",
    oracle="""
    WITH b AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT
                   AS gh
        FROM b, unnest(generate_series(1, len(t) - 7)) AS s(i)
        WHERE len(t) >= 8
    ),
    c AS (SELECT gh, count(*) AS cnt FROM g GROUP BY gh),
    d AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_dup_spans
        FROM g JOIN c USING (gh) GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(n_spans, 0) AS n_spans,
           coalesce(n_dup_spans, 0) AS n_dup_spans,
           CASE WHEN coalesce(n_spans, 0) > 0
                THEN round(n_dup_spans / CAST(n_spans AS DOUBLE), 4)
                ELSE 0.0 END AS dup_frac,
           CASE WHEN coalesce(n_spans, 0) > 0
                THEN round(n_dup_spans / CAST(n_spans AS DOUBLE), 4) < 0.5
                ELSE TRUE END AS keep
    FROM b LEFT JOIN d USING (doc_id)
    """,
)
def ext_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit (the Lee et al. 2022
    "Deduplicating Training Data" ExactSubstr signal, Spark-shaped):
    every 8-token span is hashed, spans whose hash occurs more than once
    corpus-wide are "duplicated", and each document reports its
    duplicated-span fraction plus a keep verdict (< 50 % duplicated).
    Complements minhash (whole-doc near-dup) by catching verbatim
    boilerplate embedded inside otherwise-distinct documents.

    Scale shape: spans are generated IN-ROW (sequence + transform over
    the token array — no position-table join) and immediately collapsed
    to 60-bit hashes, so the shuffle rows of the global frequency
    aggregate are 16 bytes regardless of span text. Two shuffles total:
    the gram-frequency hash aggregate (collapses map-side — duplicated
    grams are exactly the ones that compress) and the gram→count
    equi-join + per-doc rollup. Nothing is all-pairs and nothing carries
    text past the map stage. The suffix-array the paper builds is a
    single-node luxury; the hash-multiset formulation here is
    shuffle-bounded and gives the identical per-doc statistic. At 100 TB
    the gram table is ~n_tokens rows of two bigints — the same order as
    the minhash shingle stream that already scales."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    g = base.filter(F.size("t") >= 8).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 7),
                lambda i: hash60(F.concat_ws(" ", F.slice("t", i, 8))),
            )
        ).alias("gh"),
    )
    c = g.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    d = (
        g.join(c, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum((F.col("cnt") > 1).cast("bigint"))
            .cast("bigint")
            .alias("n_dup_spans"),
        )
    )
    n_spans = F.coalesce("n_spans", F.lit(0)).cast("bigint")
    n_dup = F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
    frac = F.when(
        n_spans > 0, F.round(n_dup / n_spans.cast("double"), 4)
    ).otherwise(F.lit(0.0))
    return base.join(d, "doc_id", "left").select(
        "doc_id",
        n_spans.alias("n_spans"),
        n_dup.alias("n_dup_spans"),
        frac.alias("dup_frac"),
        F.when(n_spans > 0, frac < 0.5).otherwise(F.lit(True)).alias("keep"),
    )


@query(
    "ext_dedup_paragraph",
    oracle="""
    WITH b AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    ch AS (
        SELECT doc_id, i AS idx,
               array_to_string(t[(i-1)*20+1:(i-1)*20+20], ' ') AS chunk
        FROM b,
             unnest(generate_series(1, CAST(ceil(len(t) / 20.0) AS BIGINT)))
                 AS s(i)
    ),
    h AS (
        SELECT doc_id, idx, chunk,
               ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS chash
        FROM ch
    ),
    o AS (SELECT chash, min(doc_id) AS owner FROM h GROUP BY chash),
    j AS (
        SELECT h.doc_id, h.idx, h.chunk, h.doc_id = o.owner AS kept
        FROM h JOIN o USING (chash)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
           coalesce(
               string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE kept), '')
               AS kept_text
    FROM j GROUP BY doc_id
    """,
)
def ext_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity corpus dedup that REWRITES documents (the
    C4 "discard duplicated lines across the corpus" rule): text is split
    into 20-token chunks (the newline-free stand-in for paragraphs), a
    chunk that appears in multiple documents survives only in its
    canonical owner (min doc_id), and every document is reassembled from
    its surviving chunks in order. Unlike ext_dedup_substring (a
    per-doc statistic) this emits the cleaned corpus itself.

    Scale shape: chunking is in-row; the canonical-owner aggregate
    shuffles (chash, doc_id) pairs ONLY — chunk text stays with the
    chunk row and never rides through the min() aggregate. The
    owner→chunk equi-join is hash-partitioned on chash, then one rollup
    on doc_id rebuilds documents with an ordered in-array filter +
    concat (collect_list of (idx, chunk, kept) structs, array_sort —
    per-doc data, never a global sort). Three shuffles, all linear.
    Within-doc repeats share the doc's own ownership and are retained —
    cross-document dedup only, documented semantics. At 100 TB this is
    the same two-aggregate + one-join shape as ext_dedup_exact, with
    rows = chunks (≈ n_tokens / 20)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(20.0)).cast("int")
    ch = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.struct(
                    i.alias("idx"),
                    F.concat_ws(
                        " ", F.slice("t", (i - 1) * 20 + 1, 20)
                    ).alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.idx").alias("idx"),
        F.col("c.chunk").alias("chunk"),
        hash60(F.col("c.chunk")).alias("chash"),
    )
    owner = ch.groupBy("chash").agg(F.min("doc_id").alias("owner"))
    j = ch.join(owner, "chash").withColumn(
        "kept", F.col("doc_id") == F.col("owner")
    )
    rows = F.array_sort(F.collect_list(F.struct("idx", "chunk", "kept")))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.col("kept").cast("bigint")).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.filter(rows, lambda x: x["kept"]), lambda x: x["chunk"]
            ),
        ).alias("kept_text"),
    )


@query(
    "ext_pmi_collocations",
    oracle="""
    WITH d AS (
        SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    uni AS (
        SELECT u.tok, CAST(count(*) AS BIGINT) AS n
        FROM d, unnest(t) AS u(tok)
        GROUP BY u.tok
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM uni),
    bg AS (
        SELECT t[i] AS a, t[i+1] AS b, CAST(count(*) AS BIGINT) AS nab
        FROM d, unnest(generate_series(1, len(t) - 1)) AS s(i)
        WHERE len(t) >= 2
        GROUP BY t[i], t[i+1]
    )
    SELECT bg.a, bg.b, nab,
           round(ln((nab * ntot) / CAST(ua.n * ub.n AS DOUBLE)), 6) AS pmi
    FROM bg
    JOIN uni ua ON ua.tok = bg.a
    JOIN uni ub ON ub.tok = bg.b
    CROSS JOIN tot
    WHERE nab >= 5
    ORDER BY pmi DESC, a, b
    LIMIT 20
    """,
)
def ext_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent-token bigrams by pointwise
    mutual information (min support 5) — the phrase-detection pass
    (word2vec-style "new_york" merging, tokenizer-vocab seeding) a
    training-data pipeline runs over the corpus. PMI = ln(c(ab)·N /
    (c(a)·c(b))) with N = total tokens.

    Scale shape: bigrams are formed IN-ROW from the token array
    (adjacency needs no self-join against a position table — the classic
    quadratic trap). Two hash aggregates (unigram counts, bigram counts)
    both collapse map-side; the support cut (nab ≥ 5) lands BEFORE the
    scoring joins, so only surviving bigrams join the unigram vocabulary
    — vocabulary-sized, not corpus-sized. The final cut is
    TakeOrderedAndProject over the rounded score with a (pmi, a, b)
    total order, so the top-20 boundary is deterministic in both
    engines. At 100 TB the shuffles carry distinct-ngram partial counts
    — the same vocabulary-bounded shape as ext_vocab_topk."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(tokens(F.col("text")).alias("t"))
    uni = base.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = uni.agg(F.sum("n").cast("bigint").alias("ntot"))
    bg = (
        base.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("a"),
                        F.element_at("t", i + 1).alias("b"),
                    ),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("n").alias("na"))
    ub = uni.select(F.col("tok").alias("b"), F.col("n").alias("nb"))
    scored = (
        bg.join(ua, "a")
        .join(ub, "b")
        .join(F.broadcast(tot), how="cross")
        .select(
            "a",
            "b",
            "nab",
            F.round(
                F.log(
                    (F.col("nab") * F.col("ntot"))
                    / (F.col("na") * F.col("nb")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "a", "b").limit(20)


@query(
    "ext_bloom_prefilter",
    oracle="""
    WITH g AS (
        SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS gh
        FROM documents
    ),
    bench AS (SELECT DISTINCT gh FROM g WHERE doc_id < 50),
    pos AS (
        SELECT DISTINCT p
        FROM bench, unnest([gh % 512, (gh >> 9) % 512]) AS u(p)
    ),
    hits AS (
        SELECT doc_id, gh FROM g
        WHERE doc_id >= 50
          AND gh % 512 IN (SELECT p FROM pos)
          AND (gh >> 9) % 512 IN (SELECT p FROM pos)
    )
    SELECT h.doc_id, b.gh IS NOT NULL AS contaminated
    FROM hits h LEFT JOIN bench b USING (gh)
    """,
)
def ext_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter — the map-side runtime-filter
    pattern for probing a huge corpus against a small reference set
    without shipping the corpus into a join: a 512-position / 2-hash
    Bloom filter is built from the benchmark docs' (doc_id < 50) text
    hashes, broadcast, and applied as a pure column predicate; only the
    bloom-POSITIVE survivors (true matches + deterministic false
    positives) reach the exact verification join. Output is the
    candidate set with its verified `contaminated` verdict — false
    positives surface as contaminated=false rows, making the filter's
    selectivity observable.

    Scale shape: the corpus side never shuffles — the bloom test is
    in-row arithmetic (two mod/shift probes against a broadcast sorted
    position array), so at 100 TB the plan is a single scan with a
    predicate, exactly how Spark's own InjectRuntimeFilter places
    bloom filters under shuffle joins. The exact join then runs over
    |positives| ≈ fp_rate × corpus + |matches| rows against the
    broadcast benchmark hash set. The position-array encoding (sorted
    distinct bit indices instead of packed longs) keeps the filter
    oracle-replayable bit-for-bit; production swaps in
    bloom_filter_agg/might_contain with the identical plan shape."""
    docs = load(spark, sf_dir, "documents")
    g = docs.select("doc_id", hash60(F.col("text")).alias("gh"))
    bench = g.filter(F.col("doc_id") < 50).select("gh").distinct()
    bloom = bench.select(
        F.explode(
            F.array(F.col("gh") % 512, F.shiftright("gh", 9) % 512)
        ).alias("p")
    ).agg(F.array_sort(F.collect_set("p")).alias("bloom"))
    hits = (
        g.filter(F.col("doc_id") >= 50)
        .join(F.broadcast(bloom), how="cross")
        .filter(
            F.array_contains("bloom", F.col("gh") % 512)
            & F.array_contains("bloom", F.shiftright("gh", 9) % 512)
        )
        .select("doc_id", "gh")
    )
    bset = bench.withColumn("hit", F.lit(True))
    return hits.join(F.broadcast(bset), "gh", "left").select(
        "doc_id", F.coalesce("hit", F.lit(False)).alias("contaminated")
    )


@query(
    "ext_minhash_accuracy",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    h AS (SELECT DISTINCT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
          FROM tok),
    params AS (SELECT i,
                      ((1103515245 * i + 12345) % 2147483646) + 1 AS a,
                      (1103515245 * (i + 100) + 12345) % 2147483647 AS b
               FROM generate_series(0, 15) g(i)),
    sig AS (SELECT id, i, min((a * (hv % 2147483647) + b) % 2147483647) AS mh
            FROM h CROSS JOIN params GROUP BY id, i),
    bands AS (SELECT id, i // 4 AS band,
                     md5(string_agg(format('{{:02d}}:{{}}', i, mh), ',' ORDER BY i))
                     AS band_hash
              FROM sig GROUP BY id, i // 4),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
    m AS (SELECT c.id_a, c.id_b,
                 CAST(count(*) FILTER (WHERE sa.mh = sb.mh) AS BIGINT) AS n_match
          FROM cand c
          JOIN sig sa ON sa.id = c.id_a
          JOIN sig sb ON sb.id = c.id_b AND sb.i = sa.i
          GROUP BY c.id_a, c.id_b),
    sizes AS (SELECT id, count(*) AS n FROM h GROUP BY id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
              FROM cand c
              JOIN h ta ON ta.id = c.id_a
              JOIN h tb ON tb.id = c.id_b AND tb.hv = ta.hv
              GROUP BY c.id_a, c.id_b),
    acc AS (SELECT m.id_a, m.id_b,
                   round(n_match / 16.0, 4) AS est_j,
                   round(coalesce(n_inter, 0)
                         / CAST(sa.n + sb.n - coalesce(n_inter, 0) AS DOUBLE),
                         4) AS exact_j
            FROM m
            LEFT JOIN inter ON inter.id_a = m.id_a AND inter.id_b = m.id_b
            JOIN sizes sa ON sa.id = m.id_a
            JOIN sizes sb ON sb.id = m.id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           est_j, exact_j, round(abs(est_j - exact_j), 4) AS abs_err
    FROM acc
    """,
)
def ext_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured MinHash estimator accuracy over the LSH candidate set:
    for every banded candidate pair, the signature-agreement Jaccard
    estimate (matching components / 16) side-by-side with the EXACT
    shingle-set Jaccard, plus the absolute error — the audit that tells
    an operator whether the configured (K, bands) is tight enough before
    trusting it on the full corpus (the sketch-accuracy twin of
    ext_sim_recall's IVF audit).

    Plan shape: the estimate is an in-row comparison of the two 16-wide
    signature rows joined through the candidate list (candidate-sized,
    not corpus-sized); the exact side reuses the same
    candidate-restricted intersection join as verified_jaccard_pairs
    with threshold 0 — a LEFT join, so signature-collision pairs with
    ZERO true overlap still surface (est high, exact 0: the false-
    positive rows this audit exists to expose). Shingle and signature
    tables are pinned once and shared by every stage. At 100 TB run it
    on a hash-sample of candidates; the plan is unchanged."""
    tok = hashed_shingles(
        load(spark, sf_dir, "documents"), n=3, distinct=False
    ).localCheckpoint(eager=True)
    sig = minhash_signatures(tok).localCheckpoint(eager=True)
    cand = minhash_candidate_pairs(sig)
    # single-parse expression strings (r19): the 34 aliased signature
    # columns + 16 comparison Columns cost ~2300 py4j round-trips per
    # build (~0.5 s of single-threaded driver time); the selectExpr forms
    # parse the identical trees (sameSemantics-pinned in
    # tests/test_round19_ops.py).
    sig_a = sig.selectExpr(
        "id AS id_a", *[f"mh{i} AS a{i}" for i in range(16)]
    )
    sig_b = sig.selectExpr(
        "id AS id_b", *[f"mh{i} AS b{i}" for i in range(16)]
    )
    n_match = " + ".join(f"cast((a{i} = b{i}) as int)" for i in range(16))
    est = (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .selectExpr(
            "cast(id_a as bigint) AS id_a",
            "cast(id_b as bigint) AS id_b",
            f"round((0 + {n_match}) / 16.0D, 4) AS est_j",
        )
    )
    exact = verified_jaccard_pairs(cand, tok, threshold=0.0, distinct_sets=True)
    return (
        est.join(
            exact.withColumnRenamed("jaccard", "exact_j"),
            ["id_a", "id_b"],
            "left",
        )
        .withColumn("exact_j", F.expr("coalesce(exact_j, 0.0D)"))
        .withColumn("abs_err", F.expr("round(abs(est_j - exact_j), 4)"))
    )


def _pinned_shuffle_width(spark: SparkSession) -> int:
    """The session's configured shuffle width, for EXPLICITLY NUMBERED
    repartitions on CPU-dense stages.

    Why the graph family pins it (round-11 finding, measured): the
    per-pair cosine is an interpreted higher-order-function fold
    (~128 lambda evaluations per candidate pair), so the scoring stage
    is CPU-heavy but BYTE-light — and AQE's partition coalescing sizes
    partitions by shuffle bytes. It merged the ~500 k-pair scoring
    stage to ONE task at sf0.1 (5.3 s single-threaded vs 2.7 s at the
    configured width; ivf_multi 8.8 s → 3.6 s). A numbered
    ``repartition(width, key)`` is exempt from AQE coalescing
    (REPARTITION_BY_NUM is a user contract) and satisfies the join's
    hash-distribution requirement, so it adds NO extra exchange — the
    join's own shuffle simply keeps its width. At cluster scale the
    same call inherits the cluster's ``spark.sql.shuffle.partitions``,
    which is exactly the knob operators should respect rather than
    hardcode."""
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


@query(
    "ext_knn_graph",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    -- replay the corpus-adaptive cell count: greatest(8, ceil(n / 250))
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    pairs AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
                     ea.embedding AS va, eb.embedding AS vb
              FROM assign a
              JOIN emb ea ON ea.vec_id = a.vec_id
              JOIN assign b ON b.cell = a.cell AND b.vec_id <> a.vec_id
              JOIN emb eb ON eb.vec_id = b.vec_id AND eb.label = ea.label),
    terms AS (SELECT vec_id, neighbor_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neighbor_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neighbor_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neighbor_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAME-LABEL k-nearest-neighbor graph with composite (label × IVF
    cell) blocking: each vector's top-3 cosine neighbors that share its
    label, searched within its coarse-quantizer cell — the substrate for
    class-conditional dedup and diversity-aware selection where
    neighbors must come from the same class.

    Scale shape (rewritten round 10): the original blocked on the label
    column ALONE. Label cardinality is fixed, so |block| grows with N
    and the within-block Σ|b|² pair count goes quadratic — not a prose
    concern but MEASURED by the round-9 sf1 probe: 13.1× runtime for
    10× data (400 k → 40 M pairs). Re-keying the equi-join to the
    composite (label, cell) key preserves the same-label semantics
    while bounding the block: the cell count scales with the corpus
    (greatest(8, ceil(N/250)) — the count-derived-formula pattern of
    ext_dedup_embed's adaptive_planes, replayed bit-for-bit by the
    oracle), so |cell| ≈ 250 and within-block pairs are ≤ N·250 —
    linear. Neighbors are exact within (label ∩ cell); cross-cell
    same-label neighbors are the recall cost, tunable by nprobe-style
    multi-assign exactly as in ext_sim_search_ivf_nprobe, and measured
    for the cell-blocked family by ext_knn_graph_recall.

    Plan: zero-shuffle broadcast-argmax assignment (ivf_assign), pinned
    once (localCheckpoint) before the self-equi-join so both sides scan
    the materialized index instead of re-inlining the argmax tree
    (ext_knn_graph_ivf's measured 2.5× compile saving); the label rides
    along via one narrow (id, label) equi-join before the pin. The
    per-vector top-3 compiles to a partial WindowGroupLimit below the
    rank window; ranking orders by UNROUNDED similarity with neighbor
    id as total tiebreak — deterministic in both engines. Null
    embeddings are excluded corpus- AND seed-side (the
    ext_knn_graph_ivf null contract).

    SECOND-DECADE CAVEAT (measured r15, BENCH_DETAIL sf10_probe +
    second_decade_probe): "within-block pairs are linear" above is the
    JOIN — the flat broadcast-argmax assignment is O(N·k) = O(N²/250)
    interpreted folds once k tracks N, and at 20k→200k vectors this
    query measured 26.8× wall for 10× rows. The assignment is already
    pinned (localCheckpoint before the self-join), so no re-evaluation
    factor remains — the quadratic is intrinsic to single-level
    assignment. Past ~100k vectors, block on the TWO-LEVEL assignment
    instead (swap ivf_assign for the hier/sharded coarse→leaf path, as
    ext_knn_graph_prod does — 6.4–7.5× on the same decade)."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign(emb, centroids).join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    # pin the assignment (the materialized IVF index) so both join sides
    # scan it instead of re-inlining the broadcast-argmax per side
    assigned = assigned.localCheckpoint(eager=True)
    # numbered repartition on the block key: exempt from AQE coalescing,
    # which otherwise merges this byte-light / CPU-dense fold stage to one
    # task (see _pinned_shuffle_width) — and satisfies the join's hash
    # distribution, so no extra exchange is added
    width = _pinned_shuffle_width(spark)
    a = assigned.repartition(width, "label", "cell").select(
        F.col("id").alias("vec_id"),
        "label",
        "cell",
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
    )
    b = assigned.repartition(width, "label", "cell").select(
        F.col("id").alias("neighbor_id"),
        "label",
        "cell",
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
    )
    pairs = a.join(b, ["label", "cell"]).filter(
        F.col("vec_id") != F.col("neighbor_id")
    )
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            # + 0.0 canonicalizes IEEE negative zero: near-antipodal pairs
            # round to -0.0 in DuckDB but 0.0 in Spark, and the driver hash
            # distinguishes them (caught by the round-10 nulls sweep)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


@query(
    "ext_knn_graph_ivf",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    -- replay the corpus-adaptive cell count: greatest(8, ceil(n / 250))
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    pairs AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
                     ea.embedding AS va, eb.embedding AS vb
              FROM assign a
              JOIN assign b ON b.cell = a.cell AND b.vec_id <> a.vec_id
              JOIN emb ea ON ea.vec_id = a.vec_id
              JOIN emb eb ON eb.vec_id = b.vec_id),
    terms AS (SELECT vec_id, neighbor_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neighbor_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neighbor_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neighbor_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph blocked by IVF CELL assignment — the production form of
    ext_knn_graph. Blocking by a fixed data column (label) keeps block
    cardinality constant, so block SIZE grows with the corpus and the
    within-block Σ|b|² work grows quadratically (measured by the round-9
    sf1 probe: 100× pairs for 10× vectors). Blocking by the coarse
    quantizer fixes that: the cell count SCALES WITH THE CORPUS —
    greatest(8, ceil(N/250)) cells, the same count-derived-formula
    pattern as ext_dedup_embed's adaptive_planes, replayed bit-for-bit
    by the oracle — so |cell| ≈ 250 stays bounded and the graph build
    stays linear. Neighbors are exact WITHIN a cell and recall across
    cell boundaries tunes via nprobe-style multi-assign
    (ivf_assign_multi), exactly as in ext_sim_search_ivf_nprobe.

    Plan: the zero-shuffle broadcast-argmax assignment (ivf_assign) runs
    ONCE and is pinned (localCheckpoint) before the self-equi-join on
    cell — the distributed analog of persisting the IVF index, and the
    same compile-cost discipline as ext_sim_search_pq's pinned code
    table: without the pin the argmax expression tree is inlined FOUR
    times into the join plan (each side × score/pick) and the first call
    pays ~2.5× in Catalyst compile alone (measured 11.4 s vs 4.6 s cold
    at sf0.1). After the pin the join itself is the only corpus shuffle,
    both sides partitioned by cell. Per-vector
    top-3 compiles to a partial WindowGroupLimit; ranking orders by
    UNROUNDED similarity with the neighbor id as total tiebreak —
    deterministic in both engines. Centroid seeding is the id-agnostic
    smallest-8 rule shared with ext_sim_search_ivf.

    NULL CONTRACT (found by the null-payload sweep on this query's first
    run): null embeddings are excluded up front, from the corpus AND
    from centroid seeding — a nulled seed row otherwise becomes a NULL
    centroid, and the two engines order the resulting NULL similarities
    differently (Spark's argmax vs DuckDB's NULLS LAST), silently
    scattering null vectors into different cells.

    SECOND-DECADE CAVEAT (measured r15, BENCH_DETAIL sf10_probe): "the
    graph build stays linear" above is the JOIN — the flat assignment
    is O(N·k) = O(N²/250) once k tracks N, and at 20k→200k vectors this
    query measured 21.5× wall for 10× rows (its nprobe=2 sibling 24.5×,
    with the assignment stage decomposed to 88% of the total in
    second_decade_probe), while the two-level variants — ivf_hier /
    ivf_sharded / prod, which replace exactly this stage — measured
    6.4–7.5× on the same decade. Past ~100k vectors, use those."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign(emb, centroids)  # id, vec, v_nrm, cell
    # pin the assignment (the materialized IVF index) so both join sides
    # scan it instead of re-inlining the broadcast-argmax per side
    assigned = assigned.localCheckpoint(eager=True)
    # numbered repartition on cell: exempt from AQE coalescing, which
    # otherwise merges the byte-light / CPU-dense pair-scoring stage to
    # one task (see _pinned_shuffle_width; measured 5.3 s → 2.7 s sf0.1)
    width = _pinned_shuffle_width(spark)
    left = assigned.repartition(width, "cell").select(
        F.col("id").alias("vec_id"),
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
        "cell",
    )
    right = assigned.repartition(width, "cell").select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
        "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            # + 0.0 canonicalizes IEEE negative zero: near-antipodal pairs
            # round to -0.0 in DuckDB but 0.0 in Spark, and the driver hash
            # distinguishes them (caught by the round-10 nulls sweep)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


@query(
    "ext_knn_graph_ivf_multi",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    probes AS (SELECT vec_id, cent_id AS cell,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cent_id) AS probe
               FROM cos0 QUALIFY probe <= 2),
    pairs AS (SELECT q.vec_id, r.vec_id AS neighbor_id,
                     eq.embedding AS va, er.embedding AS vb
              FROM probes q
              JOIN emb eq ON eq.vec_id = q.vec_id
              JOIN probes r ON r.cell = q.cell AND r.probe = 1
                           AND r.vec_id <> q.vec_id
              JOIN emb er ON er.vec_id = r.vec_id),
    terms AS (SELECT vec_id, neighbor_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neighbor_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neighbor_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neighbor_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_knn_graph_ivf_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph with QUERY-SIDE MULTI-ASSIGN (nprobe=2): each vector
    searches its two nearest coarse-quantizer cells while still RESIDING
    in its argmax cell — the production answer to the cross-cell
    neighbor loss that ext_knn_graph_recall MEASURED for the
    single-assign graph (mean edge recall@3 0.37 at nprobe=1 → 0.53 at
    nprobe=2 on the driver corpus). This is the graph-build analog of
    ext_sim_search_ivf_nprobe's query fan-out.

    Plan: ONE assignment pass serves both join sides —
    ``ivf_assign_multi(emb, cents, 2)`` (zero-shuffle broadcast-argmax
    top-2, map-only) is pinned once (localCheckpoint), the neighbor side
    filters ``probe == 1`` (residence = argmax cell, identical to
    ivf_assign's cell by the shared cs-desc/cent_id-asc total order) and
    the query side keeps both probes. A neighbor's residence cell is
    unique and a vector's two probed cells are distinct, so no candidate
    pair is generated twice — no dedup stage needed. Candidate volume is
    exactly nprobe× the single-assign graph (2×N×|cell| — still linear
    in the corpus; the measured trade recorded by the recall audit), the
    self-equi-join keys on cell, and the per-vector top-3 compiles to a
    partial WindowGroupLimit. Null embeddings excluded corpus- and
    seed-side; signed zero canonicalized in the rounded output — both
    contracts inherited from the sibling graph queries.

    SKEW CAVEAT (measured r14, BENCH_DETAIL clustered_slope_probe):
    the 2×N×|cell| linearity assumes |cell| ≈ N/k, which Zipf-mass
    cluster skew breaks — this UNCAPPED exhibit measured 43.4x wall
    for 10x rows on a corpus whose top cluster holds 19% of all mass
    (max cell 2757 vs avg 250), while ext_knn_graph_prod's residence
    cap held the same corpus to 10.2-12.5x (max cell 794). This query
    is the one-axis nprobe exhibit; skewed corpora should use the prod
    composition.

    SECOND-DECADE CAVEAT (measured r15, BENCH_DETAIL sf10_probe +
    second_decade_probe): the FLAT assignment itself is O(N·k) =
    O(N²/250) once k = ⌈N/250⌉ tracks the corpus — candidate volume in
    the graph join stays linear, but assignment SCORING does not. At
    20k→200k vectors the fold count grows 100× and the assignment wall
    45× (5.9 → 263.8 s, 88% of the total; whole query 24.5× for 10×
    rows), while the two-level siblings — ivf_hier / ivf_sharded /
    prod, built to remove exactly this cost — measured 6.4–7.5× on the
    same decade. Past ~100k vectors the nprobe dial should ride the
    tree assignment (prod), not this flat exhibit."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_multi(emb, centroids, 2).localCheckpoint(eager=True)
    # numbered repartition on cell: exempt from AQE coalescing, which
    # otherwise merges the byte-light / CPU-dense pair-scoring stage to
    # one task (see _pinned_shuffle_width; measured 8.8 s → 3.6 s sf0.1)
    width = _pinned_shuffle_width(spark)
    left = assigned.repartition(width, "cell").select(
        F.col("id").alias("vec_id"),
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
        "cell",
    )
    right = assigned.filter(F.col("probe") == 1).repartition(width, "cell").select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
        "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            # + 0.0 canonicalizes IEEE negative zero: near-antipodal pairs
            # round to -0.0 in DuckDB but 0.0 in Spark, and the driver hash
            # distinguishes them (caught by the round-10 nulls sweep)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


@query(
    "ext_knn_graph_ivf_hier",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    -- level-1 quantizer: first ceil(sqrt(k)) leaf centroids (same
    -- id-agnostic smallest rule), min 2
    coarse AS (SELECT cent_id AS coarse_id, c AS g FROM (
                   SELECT cent_id, c,
                          row_number() OVER (ORDER BY cent_id) AS rn,
                          count(*) OVER () AS k
                   FROM cent)
               WHERE rn <= greatest(2, least(k - 1,
                                             CAST(ceil(sqrt(k)) AS BIGINT)))),
    -- leaf centroid -> its coarse branch (cos desc, coarse_id asc)
    lt AS (SELECT cent.cent_id, coarse.coarse_id,
                  unnest(cent.c)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM cent CROSS JOIN coarse),
    lcos AS (SELECT cent_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM lt GROUP BY cent_id, coarse_id),
    lassign AS (SELECT cent_id, coarse_id FROM lcos
                QUALIFY row_number() OVER (PARTITION BY cent_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    -- vector -> coarse branch
    vt AS (SELECT e.vec_id, coarse.coarse_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM emb e CROSS JOIN coarse),
    vcos AS (SELECT vec_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM vt GROUP BY vec_id, coarse_id),
    vassign AS (SELECT vec_id, coarse_id FROM vcos
                QUALIFY row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    -- vector -> leaf cell, scoring ONLY its branch's leaves
    bt AS (SELECT e.vec_id, cent.cent_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(cent.c)::DOUBLE AS w
           FROM emb e
           JOIN vassign va ON va.vec_id = e.vec_id
           JOIN lassign la ON la.coarse_id = va.coarse_id
           JOIN cent ON cent.cent_id = la.cent_id),
    bcos AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM bt GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM bcos
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    pairs AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
                     ea.embedding AS va, eb.embedding AS vb
              FROM assign a
              JOIN assign b ON b.cell = a.cell AND b.vec_id <> a.vec_id
              JOIN emb ea ON ea.vec_id = a.vec_id
              JOIN emb eb ON eb.vec_id = b.vec_id),
    terms AS (SELECT vec_id, neighbor_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neighbor_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neighbor_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neighbor_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_knn_graph_ivf_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph with a TWO-LEVEL quantizer assignment — the 100×-scale
    tier of the IVF graph family. The corpus-adaptive cell count
    k = ⌈N/250⌉ is what keeps |cell| bounded and the self-join's
    candidate volume linear, but it makes the FLAT assignment's
    per-vector scoring O(k): at 100× the corpus the broadcast-argmax
    scores 100× more centroids per row — O(N·k) = O(N²/250) compute
    even though it never shuffles. The hierarchical assignment
    (operators/similarity.py::ivf_assign_two_level) scores
    ⌈√k⌉ coarse centroids, then only that branch's ~√k leaves:
    O(N·√k) total, the standard two-level IVF design. The leaf
    partition is exactly as granular as the flat form's, so the graph
    build downstream (cell equi-join, per-vector top-3) is unchanged.

    The assignment is approximate ACROSS branches (a vector near a
    branch boundary may land in a different leaf than the flat argmax
    would pick — the usual quantizer-tree trade, tunable the same way
    nprobe tunes search); the oracle replays the two-level argmax
    bit-for-bit, so the query is hash-verified, not just rows-checked.

    Plan: ONE pinned assignment (localCheckpoint, same compile-cost
    discipline as the flat sibling), the cell self-equi-join is the
    only corpus shuffle, per-vector top-3 compiles to a partial
    WindowGroupLimit. Null embeddings excluded corpus- and seed-side;
    signed zero canonicalized in the rounded output — both contracts
    inherited from the graph family."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    # clamp: n_coarse >= n_cells would make every centroid both coarse
    # and leaf — strictly more work than flat ivf_assign for the same
    # result (degenerate case documented on the operator). With the
    # n_cells >= 8 floor the √k rule never hits the clamp; it guards
    # future knob edits.
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_two_level(emb, centroids, n_coarse)
    assigned = assigned.localCheckpoint(eager=True)
    # numbered repartition on cell: exempt from AQE coalescing, which
    # otherwise merges the byte-light / CPU-dense pair-scoring stage to
    # one task (see _pinned_shuffle_width; measured 7.0 s → 4.7 s sf0.1)
    width = _pinned_shuffle_width(spark)
    left = assigned.repartition(width, "cell").select(
        F.col("id").alias("vec_id"),
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
        "cell",
    )
    right = assigned.repartition(width, "cell").select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
        "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            # + 0.0 canonicalizes IEEE negative zero (graph-family contract)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


@query(
    "ext_knn_graph_ivf_sharded",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    -- level-1 quantizer: first ceil(sqrt(k)) leaf centroids (same
    -- id-agnostic smallest rule), min 2 — the sharded assignment is the
    -- SAME two-level argmax as ext_knn_graph_ivf_hier, redistributed
    coarse AS (SELECT cent_id AS coarse_id, c AS g FROM (
                   SELECT cent_id, c,
                          row_number() OVER (ORDER BY cent_id) AS rn,
                          count(*) OVER () AS k
                   FROM cent)
               WHERE rn <= greatest(2, least(k - 1,
                                             CAST(ceil(sqrt(k)) AS BIGINT)))),
    lt AS (SELECT cent.cent_id, coarse.coarse_id,
                  unnest(cent.c)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM cent CROSS JOIN coarse),
    lcos AS (SELECT cent_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM lt GROUP BY cent_id, coarse_id),
    lassign AS (SELECT cent_id, coarse_id FROM lcos
                QUALIFY row_number() OVER (PARTITION BY cent_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    vt AS (SELECT e.vec_id, coarse.coarse_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM emb e CROSS JOIN coarse),
    vcos AS (SELECT vec_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM vt GROUP BY vec_id, coarse_id),
    vassign AS (SELECT vec_id, coarse_id FROM vcos
                QUALIFY row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    bt AS (SELECT e.vec_id, cent.cent_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(cent.c)::DOUBLE AS w
           FROM emb e
           JOIN vassign va ON va.vec_id = e.vec_id
           JOIN lassign la ON la.coarse_id = va.coarse_id
           JOIN cent ON cent.cent_id = la.cent_id),
    bcos AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM bt GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM bcos
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    pairs AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
                     ea.embedding AS va, eb.embedding AS vb
              FROM assign a
              JOIN assign b ON b.cell = a.cell AND b.vec_id <> a.vec_id
              JOIN emb ea ON ea.vec_id = a.vec_id
              JOIN emb eb ON eb.vec_id = b.vec_id),
    terms AS (SELECT vec_id, neighbor_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neighbor_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neighbor_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neighbor_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_knn_graph_ivf_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph with the two-level assignment's leaf codebook SHARDED
    across executors — the genuinely 100 TB-clean member of the graph
    family, closing its last linear-in-N structure (the r10 verdict's
    remaining `weak`). ext_knn_graph_ivf_hier fixed assignment COMPUTE
    (O(N·√k) scoring instead of O(N·k)) but still shipped the whole
    k-entry leaf map as one broadcast row to every task: under the
    corpus-adaptive k = ⌈N/250⌉ that broadcast is O(N) BYTES — at the
    100 TB design point (~10¹¹ vectors) a multi-hundred-GB row no
    executor holds. Here (operators/similarity.py::ivf_assign_sharded)
    nothing linear in N rides a broadcast: only the ⌈√k⌉ coarse array
    is broadcast, vectors are hash-partitioned by their coarse branch,
    and each branch's ~√k leaves arrive through a shuffled equi-join on
    coarse_id (strategy pinned by a `shuffle_hash` hint — without it
    AQE would re-broadcast the locally-tiny leaf table and reintroduce
    the structure; enforced by a plan test). The trade is ONE corpus
    shuffle keyed by branch — bytes proportional to the corpus, the
    same order as the cell self-join that follows, in exchange for an
    O(√k) ceiling on per-task index bytes.

    The assignment itself is the SAME two-level argmax as hier
    (identical tree, identical cells — the oracle is hier's, replayed
    bit-for-bit), so the graph downstream is unchanged: pinned
    assignment (localCheckpoint), cell self-equi-join at the numbered
    shuffle width (AQE-coalescing exemption, see _pinned_shuffle_width),
    per-vector top-3 via WindowGroupLimit, unrounded-similarity
    ordering with neighbor-id tiebreak, null embeddings excluded
    corpus- and seed-side, signed zero canonicalized — every contract
    inherited from the graph family."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    # clamp as in ext_knn_graph_ivf_hier: n_coarse >= n_cells degenerates
    # to strictly-more-work flat assignment (documented on the operator)
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_sharded(emb, centroids, n_coarse)
    assigned = assigned.localCheckpoint(eager=True)
    width = _pinned_shuffle_width(spark)
    left = assigned.repartition(width, "cell").select(
        F.col("id").alias("vec_id"),
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
        "cell",
    )
    right = assigned.repartition(width, "cell").select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
        "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            # + 0.0 canonicalizes IEEE negative zero (graph-family contract)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


@query(
    "ext_hybrid_retrieval_rrf",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id AS id, t.tok
        FROM documents, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY id),
    qtok AS (SELECT id AS query_id, tok FROM tok WHERE id < 3),
    inter AS (SELECT q.query_id, d.id, CAST(count(*) AS BIGINT) AS i
              FROM tok d JOIN qtok q ON q.tok = d.tok AND d.id <> q.query_id
              GROUP BY q.query_id, d.id),
    lex AS (SELECT i.query_id, i.id,
                   i.i / CAST(sq.n + sd.n - i.i AS DOUBLE) AS jac
            FROM inter i
            JOIN sizes sq ON sq.id = i.query_id
            JOIN sizes sd ON sd.id = i.id),
    lex_r AS (SELECT query_id, id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY jac DESC, id) AS r
              FROM lex QUALIFY r <= 10),
    emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM emb WHERE vec_id < 3),
    vterms AS (SELECT q.query_id, e.vec_id AS id, unnest(q.qe)::DOUBLE AS qa,
                      unnest(e.embedding)::DOUBLE AS cb
               FROM q CROSS JOIN emb e WHERE e.vec_id <> q.query_id),
    vcos AS (SELECT query_id, id,
                    sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
             FROM vterms GROUP BY query_id, id),
    vec_r AS (SELECT query_id, id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cs DESC, id) AS r
              FROM vcos QUALIFY r <= 10),
    fused AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
                     coalesce(l.id, v.id) AS doc_id,
                     coalesce(1.0 / (60 + l.r), 0.0)
                         + coalesce(1.0 / (60 + v.r), 0.0) AS score
              FROM lex_r l
              FULL OUTER JOIN vec_r v
                ON v.query_id = l.query_id AND v.id = l.id)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(doc_id AS BIGINT) AS doc_id,
           round(score, 6) AS rrf,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
    FROM fused QUALIFY rnk <= 5
    """,
)
def ext_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL with reciprocal-rank fusion (RRF, Cormack et al.
    2009): for each query document, fuse a LEXICAL ranking (token-set
    Jaccard against the corpus) with a VECTOR ranking (embedding cosine)
    by score = Σ 1/(60 + rank), and keep the fused top-5 — the standard
    recipe when neither arm alone is trusted (lexical misses paraphrase,
    vectors miss rare exact terms), and the retrieval-side counterpart
    of the dedup tier's lexical/embedding split. RRF over raw-score
    fusion because ranks are scale-free: no per-arm score normalization
    to keep bit-identical across engines.

    Scale shape: both arms are query-bounded. The lexical arm is ONE
    distinct-token explode of the corpus equi-joined to the BROADCAST
    query token set (|Q| docs' tokens — bounded), grouped to (query,
    doc) intersections; no corpus×corpus structure exists. The vector
    arm is the shared scored_cosine pass (query side broadcast, one
    corpus scan). Each arm ranks to its top-10 under WindowGroupLimit
    BEFORE fusion, so the full-outer fuse joins two ≤10-row-per-query
    tables — trivially bounded. Arms cover different id domains by
    design (every doc has text, only some have embeddings); RRF's
    coalesce semantics keep a doc ranked by a single arm alive, exactly
    as published. Determinism: Jaccard and 1/(60+r) are exact integer
    divisions in double, fused in fixed written order; every ranking
    tiebreaks on id."""
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
        .localCheckpoint(eager=True)  # feeds sizes, query side, AND the join
    )
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    qtok = tok.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "tok"
    )
    inter = (
        tok.join(F.broadcast(qtok), "tok")
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    lex = (
        inter.join(sizes.select(F.col("id"), F.col("n").alias("n_d")), "id")
        .join(
            F.broadcast(
                sizes.select(F.col("id").alias("query_id"), F.col("n").alias("n_q"))
            ),
            "query_id",
        )
        .select(
            "query_id",
            "id",
            (F.col("i") / (F.col("n_q") + F.col("n_d") - F.col("i")).cast("double")).alias(
                "jac"
            ),
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("jac").desc(), "id")
    lex_r = (
        lex.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= 10)
        .select("query_id", "id", F.col("r").alias("lr"))
    )
    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sc = scored_cosine(emb, queries).filter(F.col("vec_id") != F.col("query_id"))
    wv = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    vec_r = (
        sc.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= 10)
        .select("query_id", F.col("vec_id").alias("id"), F.col("r").alias("vr"))
    )
    fused = lex_r.join(vec_r, ["query_id", "id"], "full_outer").select(
        "query_id",
        F.col("id").alias("doc_id"),
        (
            F.coalesce(1.0 / (60 + F.col("lr")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vr")), F.lit(0.0))
        ).alias("score"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.round("score", 6).alias("rrf"),
            "rnk",
        )
    )


@query(
    "ext_hard_negatives",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    pairs AS (SELECT a.vec_id, b.vec_id AS neg_id,
                     ea.embedding AS va, eb.embedding AS vb
              FROM assign a
              JOIN emb ea ON ea.vec_id = a.vec_id
              JOIN assign b ON b.cell = a.cell AND b.vec_id <> a.vec_id
              JOIN emb eb ON eb.vec_id = b.vec_id AND eb.label <> ea.label),
    terms AS (SELECT vec_id, neg_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neg_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neg_id)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neg_id AS BIGINT) AS neg_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neg_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training: each anchor's top-3
    most-cosine-similar vectors with a DIFFERENT label — the pairs that
    sit closest to the decision boundary and carry the most gradient
    signal (the exact complement of ext_knn_graph's same-label edges;
    together they emit the (anchor, positive, hard-negative) triplets a
    contrastive run consumes).

    Scale shape is the graph family's, unchanged: candidates are blocked
    by the corpus-adaptive IVF cell (greatest(8, ceil(N/250)) — |cell| ≈
    250 bounded, candidate volume linear in N), the label mismatch is a
    cheap residual FILTER on the cell equi-join (labels have tiny
    cardinality, so ~(1 − 1/|labels|) of in-cell pairs survive — the
    filter can't be a join key precisely because it's an inequality),
    per-anchor top-3 compiles to WindowGroupLimit, and the pinned
    assignment + numbered-width repartition discipline carries over.
    Like any blocked ANN, negatives are exact WITHIN the anchor's cell;
    recall across cells tunes by the same multi-assign knob the graph
    family measures. Null embeddings excluded corpus- and seed-side;
    signed zero canonicalized — family contracts inherited.

    SECOND-DECADE CAVEAT (measured r15, BENCH_DETAIL sf10_probe +
    second_decade_probe): the linear claim above is candidate volume —
    the flat assignment stage is O(N·k) = O(N²/250) interpreted folds
    once k tracks N, and at 20k→200k vectors this query measured 17.9×
    wall for 10× rows (the mildest of the flat-assign class: the
    label-mismatch filter trims in-cell pairs, but the assignment
    quadratic still dominates). The assignment is already pinned; the
    quadratic is intrinsic, not re-evaluation. Past ~100k vectors, mine
    negatives on the two-level assignment (the prod/hier/sharded
    coarse→leaf path, 6.4–7.5× on the same decade)."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign(emb, centroids).join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    assigned = assigned.localCheckpoint(eager=True)
    width = _pinned_shuffle_width(spark)
    a = assigned.repartition(width, "cell").select(
        F.col("id").alias("vec_id"),
        F.col("label").alias("label_a"),
        "cell",
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
    )
    b = assigned.repartition(width, "cell").select(
        F.col("id").alias("neg_id"),
        F.col("label").alias("label_b"),
        "cell",
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
    )
    pairs = a.join(b, "cell").filter(
        (F.col("vec_id") != F.col("neg_id"))
        & (F.col("label_a") != F.col("label_b"))
    )
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neg_id").cast("bigint").alias("neg_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neg_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neg_id",
            # + 0.0 canonicalizes IEEE negative zero (graph-family contract)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


#: shared oracle CTE chain: ext_knn_graph_prod's full tree replay —
#: clamped coarse count, 4-branch union, residence cap + swap, and the
#: scored graph pairs (CTE `s`). Reused verbatim by the prod query and
#: its recall audit so the two can never drift.
_PROD_TREE_CTES = """
    emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    coarse AS (SELECT cent_id AS coarse_id, c AS g FROM (
                   SELECT cent_id, c,
                          row_number() OVER (ORDER BY cent_id) AS rn,
                          count(*) OVER () AS k
                   FROM cent)
               WHERE rn <= greatest(2, least(k - 1,
                                             CAST(ceil(sqrt(k)) AS BIGINT)))),
    lt AS (SELECT cent.cent_id, coarse.coarse_id,
                  unnest(cent.c)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM cent CROSS JOIN coarse),
    lcos AS (SELECT cent_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM lt GROUP BY cent_id, coarse_id),
    lassign AS (SELECT cent_id, coarse_id FROM lcos
                QUALIFY row_number() OVER (PARTITION BY cent_id
                                           ORDER BY cs DESC, coarse_id) = 1),
    vt AS (SELECT e.vec_id, coarse.coarse_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(coarse.g)::DOUBLE AS w
           FROM emb e CROSS JOIN coarse),
    vcos AS (SELECT vec_id, coarse_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM vt GROUP BY vec_id, coarse_id),
    -- top-4 coarse branches per vector (honest r13 numbers: on a
    -- clustered corpus full-graph recall@3 is 0.514 at 2 branches vs
    -- 0.617 at 4; on a uniform corpus branch count changes nothing --
    -- recall there is probed-fraction-bound)
    vbranch AS (SELECT vec_id, coarse_id FROM vcos
                QUALIFY row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cs DESC, coarse_id) <= 4),
    -- all leaves of the probed branches, scored
    bt AS (SELECT e.vec_id, cent.cent_id,
                  unnest(e.embedding)::DOUBLE AS v, unnest(cent.c)::DOUBLE AS w
           FROM emb e
           JOIN vbranch vb ON vb.vec_id = e.vec_id
           JOIN lassign la ON la.coarse_id = vb.coarse_id
           JOIN cent ON cent.cent_id = la.cent_id),
    bcos AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM bt GROUP BY vec_id, cent_id),
    -- global top-2 leaf cells across the union (probe 1 = residence)
    probes0 AS (SELECT vec_id, cent_id AS cell, cs,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) AS probe
                FROM bcos QUALIFY probe <= 2),
    -- residence cap = 2 * ceil(N / n_cells) (same N, same n_cells
    -- formula as cent): bounds kept-original-residents per cell
    caps AS (SELECT 2 * CAST(ceil(count(*) /
                                  greatest(8.0, ceil(count(*) / 250.0)))
                             AS BIGINT) AS cap
             FROM emb),
    -- occupancy rank of each cell's original residents (affinity DESC)
    occ AS (SELECT vec_id,
                   row_number() OVER (PARTITION BY cell
                                      ORDER BY cs DESC, vec_id) AS occ
            FROM probes0 WHERE probe = 1),
    npb AS (SELECT vec_id, count(*) AS n_probes FROM probes0
            GROUP BY vec_id),
    -- overflow residents (occ > cap, second probe exists) swap probe
    -- labels: next-best probed leaf becomes residence, argmax stays
    -- probed at rank 2
    probes AS (SELECT p.vec_id,
                      CASE WHEN o.occ > caps.cap AND npb.n_probes >= 2
                           THEN 3 - p.probe ELSE p.probe END AS probe,
                      p.cell
               FROM probes0 p
               JOIN occ o ON o.vec_id = p.vec_id
               JOIN npb ON npb.vec_id = p.vec_id
               CROSS JOIN caps),
    pairs AS (SELECT q.vec_id, r.vec_id AS neighbor_id,
                     eq.embedding AS va, er.embedding AS vb
              FROM probes q
              JOIN emb eq ON eq.vec_id = q.vec_id
              JOIN probes r ON r.cell = q.cell AND r.probe = 1
                           AND r.vec_id <> q.vec_id
              JOIN emb er ON er.vec_id = r.vec_id),
    terms AS (SELECT vec_id, neighbor_id, unnest(va)::DOUBLE AS x,
                     unnest(vb)::DOUBLE AS y
              FROM pairs),
    s AS (SELECT vec_id, neighbor_id,
                 sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cs
          FROM terms GROUP BY vec_id, neighbor_id)
"""


@query(
    "ext_knn_graph_prod",
    oracle=f"""
    WITH {_PROD_TREE_CTES}
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(cs, 4) + 0.0 AS cos_sim,
           CAST(row_number() OVER (
               PARTITION BY vec_id ORDER BY cs DESC, neighbor_id)
               AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 3
    """,
)
def ext_knn_graph_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph family's PRODUCTION COMPOSITION in one query — every
    knob the exhibits measured separately, composed: corpus-adaptive
    cell count (k = ⌈N/250⌉ keeps the build linear), query-side
    multi-probe nprobe=2 (the measured +16pp edge-recall trade at
    exactly 2× candidates), and the SHARDED two-level index transport
    (only the ⌈√k⌉ coarse array is broadcast; each branch's ~√k leaves
    arrive through the shuffle_hash-pinned coarse_id equi-join — no
    O(N)-bytes structure anywhere, the r10 verdict's last `weak`).

    Assignment (operators/similarity.py::ivf_assign_sharded_multi):
    top-4 coarse branches in-row over the broadcast coarse array, the
    probed branches' leaves fetched via the sharded join, GLOBAL top-2
    leaf cells kept from the scored union — so a cross-branch runner-up
    leaf is probed, not lost. HONEST recall numbers (re-measured r13
    with the centroid-seed bias removed — the r12 figures 0.64→0.81
    were measured on seeds that coincide with the leaf centroids and
    tracked the quantizer's self-recall, 4-5× the typical vector's):
    full-graph edge recall@3 on a genuinely clustered 20k corpus
    (within-cluster cos ≈ 0.6, 80 cells) is 0.514 at 2 branches →
    0.617 at 4 — the branch knob acts exactly when coarse structure
    exists — and 0.703 at nprobe=4, vs flat IVF's 0.722 at the same
    nprobe... i.e. the TREE itself costs little (uniform corpus: flat
    0.166 vs tree 0.152); the dominant dial is NPROBE (candidate volume
    scales linearly with it), and the floor is the corpus: on a uniform
    corpus (no cluster structure — the adversarial case) every IVF
    variant is probed-fraction-bound (~0.15 at 2 of 80 cells). Probing
    b branches is b·√k leaf scores per vector — O(N·√k) for constant b,
    the whole point of the tree; a caller needing flat-level recall at
    sublinear k should use ext_knn_graph_ivf_multi, or raise nprobe. Probe 1 is the residence cell, and residence
    occupancy is CAPPED at 2·⌈N/k⌉ original residents per cell (r11
    verdict: the union-argmax measurably skews occupancy — max cell 715
    vs flat multi's 346 at identical avg 250, sf1 — and the self-join's
    pair volume grows with Σ|cell|², which AQE's task-level skew split
    does not bound). Overflow vectors — lowest residence affinity first,
    one windowed rank over the already-scored union — swap probe labels:
    the next-best probed leaf becomes residence, the argmax cell stays
    probed, so the probed-cell set (and search quality) is unchanged.
    The neighbor side filters probe == 1 exactly as
    ext_knn_graph_ivf_multi, so no candidate pair is generated twice.
    Downstream is the family plan
    verbatim: pinned assignment, numbered-width cell self-equi-join,
    WindowGroupLimit top-3, unrounded-similarity ordering with
    neighbor-id tiebreak, null embeddings excluded both sides, signed
    zero canonicalized. The oracle replays the full tree — branches,
    union argmax, probes, graph — bit-for-bit."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n = emb.count()
    n_cells = max(8, math.ceil(n / 250))
    n_coarse = max(2, min(n_cells - 1, math.ceil(math.sqrt(n_cells))))
    # residence cap (r11 verdict #1): each cell keeps at most 2× the
    # average occupancy of its ORIGINAL probe-1 residents; overflow swaps
    # to the next-best probed leaf (see ivf_assign_sharded_multi). Bounds
    # the Σ|cell|² pair volume of the self-join below under skewed data.
    cap = 2 * math.ceil(n / n_cells)
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ivf_assign_sharded_multi(
        emb, centroids, n_coarse, 2, residence_cap=cap, n_branches=4
    )
    assigned = assigned.localCheckpoint(eager=True)
    width = _pinned_shuffle_width(spark)
    left = assigned.repartition(width, "cell").select(
        F.col("id").alias("vec_id"),
        F.col("vec").alias("va"),
        F.col("v_nrm").alias("na"),
        "cell",
    )
    right = assigned.filter(F.col("probe") == 1).repartition(width, "cell").select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("vb"),
        F.col("v_nrm").alias("nb"),
        "cell",
    )
    pairs = left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))
    cs = F.expr(f"{dot_sql('va', 'vb')} / (na * nb)")
    scored = pairs.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        cs.alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            # + 0.0 canonicalizes IEEE negative zero (graph-family contract)
            (F.round("cs", 4) + 0.0).alias("cos_sim"),
            "rnk",
        )
    )


@query(
    "ext_knn_graph_prod_recall",
    oracle=f"""
    WITH {_PROD_TREE_CTES},
    g AS (SELECT vec_id AS g_qid, neighbor_id AS g_nid FROM s
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, neighbor_id) <= 3),
    -- seed sample: the 50 smallest NON-CENTROID ids (id-agnostic). The
    -- first n_cells ids ARE the leaf centroids; seeding on them audits
    -- the quantizer's self-recall (a centroid-coincident query scores
    -- its own leaf at cos=1 and its neighbors quantize with it) — the
    -- r13 probe measured 0.81 on centroid seeds vs 0.15 full-graph on
    -- the same uniform corpus. Skipping the centroid ranks makes the
    -- audited number track the typical vector.
    sd AS (SELECT vec_id FROM (
             SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn,
                    count(*) OVER () AS nn
             FROM emb)
           WHERE rn > greatest(8, CAST(ceil(nn / 250.0) AS BIGINT))
           ORDER BY vec_id LIMIT 50),
    qv AS (SELECT vec_id AS query_id, embedding AS qe FROM emb
           WHERE vec_id IN (SELECT vec_id FROM sd)),
    xp AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS ce
           FROM qv q CROSS JOIN emb e WHERE e.vec_id <> q.query_id),
    xt AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                  unnest(ce)::DOUBLE AS cb
           FROM xp),
    xs AS (SELECT query_id, vec_id,
                  sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
           FROM xt GROUP BY query_id, vec_id),
    ex AS (SELECT query_id, vec_id FROM xs
           QUALIFY row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, vec_id) <= 3)
    SELECT CAST(e.query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(g.g_nid) AS BIGINT) AS n_hit,
           round(count(g.g_nid) / CAST(count(*) AS DOUBLE), 4) AS recall
    FROM ex e LEFT JOIN g ON g.g_qid = e.query_id AND g.g_nid = e.vec_id
    GROUP BY e.query_id
    """,
)
def ext_knn_graph_prod_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge recall@3 of the SHIPPED production graph composition
    (ext_knn_graph_prod) against the exact graph, per seed — the quality
    yardstick the family pattern demands (search has ext_sim_recall,
    the flat graph has ext_knn_graph_recall; until round 12 the
    production tree's recall lived only in a probe script).

    SEED RULE (re-keyed r13): the 50 smallest NON-CENTROID ids — the
    ranks after the first n_cells, which ARE the leaf centroids under
    prod's data-sampled centroid rule. The r12 form seeded on the 50
    smallest ids and therefore measured the quantizer's SELF-recall: a
    centroid-coincident query scores its own leaf at cos=1 and its
    near neighbors quantize with it. Measured bias on the 20k uniform
    probe corpus at 80 cells (r13, scripts/recall_probe.py): centroid
    seeds read 0.81 where the full-graph edge recall is 0.15 — the r12
    figures 0.81/0.76 and the '2→4 branches lifts recall 0.64→0.81'
    narrative were artifacts of that seed set. Honest numbers (full
    graph, every vector a query): uniform 0.15 at nprobe=2 regardless
    of branches (recall is probed-fraction-bound when there is no
    cluster structure; flat IVF reads 0.166 — the tree costs only
    ~0.014); genuinely clustered corpus (within-cluster cos ≈ 0.6)
    0.514 at 2 branches → 0.617 at 4 (the knob acts exactly when
    coarse structure exists), 0.703 at nprobe=4 vs flat's 0.722.
    nprobe — not branch count — is the primary recall/cost dial; it
    scales candidate volume linearly.

    Audit shape (the family discipline): exact top-3 needs a
    seed×corpus pass, so the audit runs on a 50-seed sample — |S|
    bounds the cost at |S|×N scored rows — while the approximate
    side is the registered prod query itself (same function, same
    oracle CTEs via _PROD_TREE_CTES, so the audit can never drift from
    what ships). At driver scale (8 cells, 3 coarse branches ≤ the 4
    probed) the tree degenerates to flat multi-probe and recall is the
    flat family's; the tree-approximation regime is exercised by
    scripts/recall_probe.py at 80 cells (BENCH_DETAIL `recall_uniform`)
    and pinned at test scale by
    tests/test_round13_ops.py::test_prod_tree_regime_edge_recall_pin.

    MINIMUM CORPUS (ADVICE r13 #3): the non-centroid seed rule needs
    N > n_cells non-null embeddings (n_cells floor is 8); below that
    the seed sample is empty and the audit returns ZERO ROWS on both
    engines — treat 0 rows as no-measurement, never as a pass."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    seeds = emb.orderBy("vec_id").offset(n_cells).limit(50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sc = (
        scored_cosine(emb, seeds)
        .filter(F.col("vec_id") != F.col("query_id"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    exact = (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "vec_id")
    )
    g = ext_knn_graph_prod(spark, sf_dir).select(
        F.col("vec_id").alias("g_qid"), F.col("neighbor_id").alias("g_nid")
    )
    hits = exact.join(
        g,
        (F.col("query_id") == F.col("g_qid")) & (F.col("vec_id") == F.col("g_nid")),
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("g_nid").cast("bigint").alias("n_hit"),
            F.round(
                F.count("g_nid") / F.count(F.lit(1)).cast("double"), 4
            ).alias("recall"),
        )
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "n_exact",
            "n_hit",
            "recall",
        )
    )


@query(
    "ext_knn_graph_recall",
    oracle="""
    WITH emb AS (SELECT * FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cent_id, embedding AS c FROM (
                 SELECT vec_id, embedding,
                        row_number() OVER (ORDER BY vec_id) AS rn,
                        count(*) OVER () AS n
                 FROM emb)
             WHERE rn <= greatest(8, CAST(ceil(n / 250.0) AS BIGINT))),
    terms0 AS (SELECT e.vec_id, cent.cent_id, unnest(e.embedding)::DOUBLE AS v,
                      unnest(cent.c)::DOUBLE AS w
               FROM emb e CROSS JOIN cent),
    cos0 AS (SELECT vec_id, cent_id,
                    sum(v * w) / (sqrt(sum(v * v)) * sqrt(sum(w * w))) AS cs
             FROM terms0 GROUP BY vec_id, cent_id),
    assign AS (SELECT vec_id, cent_id AS cell FROM cos0
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cs DESC, cent_id) = 1),
    -- seed sample: the 50 smallest NON-CENTROID ids (re-keyed r13 —
    -- the first n_cells ids ARE the centroids; seeding on them audits
    -- the quantizer's self-recall, measured 4-5x optimistic vs the
    -- full graph). Id-agnostic like the centroid rule: a literal
    -- `vec_id < 50` silently shrinks the audit on sparse id spaces.
    sd AS (SELECT vec_id FROM (
             SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn,
                    count(*) OVER () AS nn
             FROM emb)
           WHERE rn > greatest(8, CAST(ceil(nn / 250.0) AS BIGINT))
           ORDER BY vec_id LIMIT 50),
    probes AS (SELECT vec_id AS query_id, cent_id AS qcell,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, cent_id) AS probe
               FROM cos0 WHERE vec_id IN (SELECT vec_id FROM sd)
               QUALIFY probe <= 2),
    q AS (SELECT vec_id AS query_id, embedding AS qe FROM emb
          WHERE vec_id IN (SELECT vec_id FROM sd)),
    pairs AS (SELECT q.query_id, e.vec_id, q.qe, e.embedding AS ce
              FROM q CROSS JOIN emb e WHERE e.vec_id <> q.query_id),
    terms AS (SELECT query_id, vec_id, unnest(qe)::DOUBLE AS qa,
                     unnest(ce)::DOUBLE AS cb
              FROM pairs),
    s AS (SELECT query_id, vec_id,
                 sum(qa * cb) / (sqrt(sum(qa * qa)) * sqrt(sum(cb * cb))) AS cs
          FROM terms GROUP BY query_id, vec_id),
    ex AS (SELECT query_id, vec_id FROM s
           QUALIFY row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, vec_id) <= 3),
    np AS (SELECT 1 AS nprobe UNION ALL SELECT 2),
    cand AS (SELECT DISTINCT np.nprobe, s.query_id, s.vec_id, s.cs
             FROM np CROSS JOIN s
             JOIN probes p ON p.query_id = s.query_id AND p.probe <= np.nprobe
             JOIN assign a ON a.vec_id = s.vec_id AND a.cell = p.qcell),
    ap AS (SELECT nprobe, query_id, vec_id FROM cand
           QUALIFY row_number() OVER (PARTITION BY nprobe, query_id
                                      ORDER BY cs DESC, vec_id) <= 3)
    SELECT CAST(np.nprobe AS INT) AS nprobe,
           CAST(e.query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.vec_id) AS BIGINT) AS n_hit,
           round(count(a.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall
    FROM ex e CROSS JOIN np
    LEFT JOIN ap a ON a.nprobe = np.nprobe AND a.query_id = e.query_id
                  AND a.vec_id = e.vec_id
    GROUP BY np.nprobe, e.query_id
    """,
)
def ext_knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-edge recall@3 of the cell-blocked kNN graph against the
    EXACT graph, per seed vector and per nprobe level — the missing
    quality yardstick for ext_knn_graph_ivf (the sim-search family has
    ext_sim_recall; this is the graph-build counterpart). nprobe=1
    reports the recall of the SHIPPED single-assign graph (probe-1 cell
    == ivf_assign's argmax cell, same cs-desc/cent_id-asc total order);
    nprobe=2 measures what multi-assigning the seed side
    (operators/similarity.py:ivf_assign_multi) buys — the tunable knob
    that trades candidate volume for cross-cell neighbor recovery,
    exactly as in ext_sim_search_ivf_nprobe.

    Audit shape, 100 TB version of 'measure, don't guess': exact top-3
    needs a seed×corpus scoring pass, so the audit runs on a SEED SAMPLE
    (the 50 smallest NON-CENTROID ids here — id-agnostic, so a sparse or
    shifted id space cannot silently shrink it, and disjoint from the
    data-sampled centroids, whose self-recall reads 4-5× the typical
    vector's; a hash-sample in production) and |S| bounds its
    cost — |S|×N scored rows, never the graph's own N×N. The corpus is
    scored ONCE (shared scored_cosine pass, pinned) and ranked twice:
    unrestricted for the exact edges, probed-cell-restricted for the
    approximate edges — algebraically identical to re-running the graph
    query for the seeds with one corpus fold pass saved. Corpus-side
    assignment is the zero-shuffle broadcast argmax; seed-side
    multi-assign and the 2-row nprobe-level explode stay map-side. Null
    embeddings are excluded corpus- and seed-side (the ext_knn_graph_ivf
    null contract).

    MINIMUM CORPUS (ADVICE r13 #3): the non-centroid seed rule needs
    N > n_cells non-null embeddings (n_cells floor is 8); below that
    the seed sample is empty and the audit returns ZERO ROWS on both
    engines — treat 0 rows as no-measurement, never as a pass."""
    import math

    emb = load(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    n_cells = max(8, math.ceil(emb.count() / 250))
    centroids = emb.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    # seed sample: the 50 smallest NON-CENTROID ids (re-keyed r13). The
    # first n_cells ids are the centroids themselves, and a centroid-
    # coincident seed measures the quantizer's self-recall (its argmax
    # cell scores cos=1 and its neighbors quantize with it) — the r13
    # probe measured 0.64-0.81 on centroid seeds vs 0.15 full-graph on
    # the same uniform corpus. Still id-agnostic (ADVICE r10: a literal
    # `vec_id < 50` silently shrinks the audit on sparse id spaces);
    # the oracle replays the rank-window skip + LIMIT.
    seeds = emb.orderBy("vec_id").offset(n_cells).limit(50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sc = (
        scored_cosine(emb, seeds)
        .filter(F.col("vec_id") != F.col("query_id"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    exact = (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "vec_id")
    )
    asg = ivf_assign(emb, centroids).select(F.col("id").alias("vec_id"), "cell")
    probes = ivf_assign_multi(seeds, centroids, 2, id_col="query_id").select(
        F.col("id").alias("query_id"), "probe", F.col("cell").alias("qcell")
    )
    lvls = F.explode(F.array(F.lit(1), F.lit(2))).alias("nprobe")
    cand = (
        sc.join(F.broadcast(probes), "query_id")
        .join(asg, "vec_id")
        .filter(F.col("cell") == F.col("qcell"))
        .select("query_id", "vec_id", "cos_sim", "probe", lvls)
        .filter(F.col("probe") <= F.col("nprobe"))
        .select("nprobe", "query_id", "vec_id", "cos_sim")
        .distinct()
    )
    w2 = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    ap = (
        cand.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("nprobe").alias("ap_nprobe"),
            F.col("query_id").alias("ap_query_id"),
            F.col("vec_id").alias("ap_vec_id"),
        )
    )
    ex_lvl = exact.select(lvls, "query_id", "vec_id")
    hits = ex_lvl.join(
        ap,
        (F.col("nprobe") == F.col("ap_nprobe"))
        & (F.col("query_id") == F.col("ap_query_id"))
        & (F.col("vec_id") == F.col("ap_vec_id")),
        "left",
    ).select("nprobe", "query_id", "vec_id", "ap_vec_id")
    return (
        hits.groupBy("nprobe", "query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("ap_vec_id").cast("bigint").alias("n_hit"),
            F.round(
                F.count("ap_vec_id") / F.count(F.lit(1)).cast("double"), 4
            ).alias("recall"),
        )
        .select(
            F.col("nprobe").cast("int").alias("nprobe"),
            F.col("query_id").cast("bigint").alias("query_id"),
            "n_exact",
            "n_hit",
            "recall",
        )
    )
