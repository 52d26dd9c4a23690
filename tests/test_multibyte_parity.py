"""Multibyte-text oracle parity: the driver corpus is ASCII, so the
per-round hash check never exercises non-ASCII semantics — but Spark and
DuckDB CAN diverge there (byte vs char length units, ascii() on
non-Latin code points, regex word classes, UTF-8 encodings in hashes).
A full-probe sweep (round 7) found ZERO divergence across all 79
oracle-checked text-family queries on mixed-script text; this test pins
the most unicode-sensitive subset so a regression (e.g. reintroducing the
ext_frame_sample bytes-count/chars-address mismatch) fails loudly.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.data import TABLES, load
from cta_train_tracker_analytics_spark.plans import registry

from conftest import SF_DIR

#: deterministic mixed-script injection, rotated by doc_id: accents, CJK,
#: Greek, Cyrillic, emoji, Devanagari, plus reversed copies so multibyte
#: chars land mid-token and at token boundaries. A trimmed copy is also
#: PREPENDED (ADVICE r7): 7 of the 8 snippets start with a multibyte char
#: after trim, so first-character semantics (first UTF-8 byte vs first
#: code point — the ext_multimodal_cols divergence class) are exercised,
#: not just interior/trailing positions.
SNIPPETS = [
    " café naïve révolution Zürich ",
    " 機械学習の大規模データ処理 ",
    " 数据去重与相似搜索引擎 ",
    " Δοκιμή ελληνικών κειμένων ",
    " тестовые данные на русском ",
    " 🚀📊 emoji heavy tokens 🎯🔥 ",
    " étude française (combining marks) ",
    " मशीन लर्निंग पाठ ",
]

#: unicode-sensitive, fast, oracle-checked representatives (full 79-query
#: sweep runs in the round-7 probe, ~5 min — too slow for the suite).
QUERIES = [
    "ext_text_stats",       # char counts, token splits, punctuation ratios
    "ext_token_count",      # whitespace + BPE-ish regex tokenization
    "ext_chunk_text",       # char-offset chunking
    "ext_frame_sample",     # char-unit frame addressing (the r6 bug class)
    "ext_fingerprint",      # rolling hash over UTF-8
    "ext_dedup_ngram",      # n-gram Jaccard on multibyte shingles
    "ext_multimodal_cols",  # octet_length/ascii on multibyte payloads
    "src_binary",           # UTF-8 blob staging + sha256
    "ext_text_readability", # sentence/word boundary heuristics
    "ext_url_dedup",        # regexp extraction over mixed text
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if pd.isna(v):
        return "NULL"
    return str(v)


def _rows(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(
        tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)
    )


@pytest.fixture(scope="module")
def mb_env(spark, tmp_path_factory):
    mb_dir = str(tmp_path_factory.mktemp("mb") / "sf")
    snip = F.element_at(
        F.array(*[F.lit(s) for s in SNIPPETS]),
        (F.col("doc_id") % len(SNIPPETS) + 1).cast("int"),
    )
    for t in TABLES:
        df = load(spark, SF_DIR, t)
        if t == "documents":
            df = df.withColumn(
                "text",
                F.concat(F.trim(snip), F.lit(" "), F.col("text"), snip, F.reverse(snip)),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        df.write.parquet(f"{mb_dir}/{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{mb_dir}/{t}.parquet/*.parquet')"
        )
    yield mb_dir, con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_multibyte_oracle_parity(spark, mb_env, name):
    mb_dir, con = mb_env
    sdf = registry.all_queries()[name](spark, mb_dir).toPandas()
    odf = con.execute(registry.all_oracles()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    assert _rows(sdf) == _rows(odf), name
