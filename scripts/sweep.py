"""Hardening sweeps: run the registry against adversarially mutated copies
of the test tables, comparing every query to its DuckDB oracle.

This is the committed form of the round-7 /tmp probe scripts (README
"Hardening sweeps" table): each sweep clones the source tables into a
scratch dir, applies one mutation class a 100 TB corpus actually contains
(empty inputs, null payloads, multibyte text, huge ids, negative values,
far-future timestamps, blank documents, non-finite metrics), then replays
Spark-vs-DuckDB parity over it. Findings from the original sweeps became
fixes + pinned regression tests; re-running after any change keeps them
fixed.

Usage:
    python scripts/sweep.py                    # all sweeps, default scopes
    python scripts/sweep.py multibyte blank    # a subset
    python scripts/sweep.py --src /root/testdata/sf0.01 naninf
    python scripts/sweep.py --queries ext_text_stats,ext_token_count multibyte
    python scripts/sweep.py --include-streaming empty

Exit status is nonzero if any sweep records a mismatch or error.

Per-sweep default scopes mirror the original probes: text-mutation sweeps
run the documents/text family, id/value/timestamp sweeps run the full
batch registry, and ``naninf`` runs the statistics tier that was hardened
with ``_finite_values`` — minus ``agg_custom_pandas_udaf`` and
``agg_approx_quantile``, whose documented contract is
sanitize-at-ingestion (their docstrings; they are EXPECTED to diverge on
non-finite input, which is why they are excluded rather than silently
green). Streaming queries are included only where the mutation targets
them (``empty``, where the r7 sentinel bug lived) unless
``--include-streaming`` forces them everywhere.
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import shutil
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SCRATCH = "/tmp/cta_spark_sweeps"


# ---------------------------------------------------------------- mutations
def _mut_empty(t, df):
    return df.limit(0)


def _mut_nulls(t, df):
    if t == "documents":
        return df.withColumn(
            "text", F.when(F.col("doc_id") % 10 == 0, F.lit(None)).otherwise(F.col("text"))
        )
    if t == "embeddings":
        return df.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 10 == 0, F.lit(None)).otherwise(F.col("embedding")),
        )
    if t == "events":
        return df.withColumn(
            "value", F.when(F.col("event_id") % 10 == 0, F.lit(None)).otherwise(F.col("value"))
        )
    return df


#: mixed-script snippets rotated by doc_id; a TRIMMED copy is prepended so
#: 7 of 8 variants START with a multibyte char (first-byte semantics — the
#: ext_multimodal_cols code-point-vs-byte divergence class, ADVICE r7),
#: and snippet + reverse(snippet) are appended so multibyte chars land
#: mid-token and at token boundaries.
_SNIPPETS = [
    " café naïve révolution Zürich ",
    " 機械学習の大規模データ処理 ",
    " 数据去重与相似搜索引擎 ",
    " Δοκιμή ελληνικών κειμένων ",
    " тестовые данные на русском ",
    " 🚀📊 emoji heavy tokens 🎯🔥 ",
    " étude française (combining marks) ",
    " मशीन लर्निंग पाठ ",
]


def _mut_multibyte(t, df):
    if t != "documents":
        return df
    snip = F.element_at(
        F.array(*[F.lit(s) for s in _SNIPPETS]),
        (F.col("doc_id") % len(_SNIPPETS) + 1).cast("int"),
    )
    return df.withColumn(
        "text", F.concat(F.trim(snip), F.lit(" "), F.col("text"), snip, F.reverse(snip))
    ).withColumn("n_chars", F.length("text").cast("bigint"))


_BIGID_SHIFT = 10_000_000_000
_BIGID_COLS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _mut_bigid(t, df):
    for c in _BIGID_COLS.get(t, []):
        df = df.withColumn(c, (F.col(c) + _BIGID_SHIFT).cast("bigint"))
    return df


def _mut_negative(t, df):
    if t == "events":
        return df.withColumn(
            "value",
            F.when(F.col("event_id") % 3 == 0, -F.col("value")).otherwise(F.col("value")),
        )
    if t == "orders":
        return df.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, -F.col("o_totalprice")).otherwise(
                F.col("o_totalprice")
            ),
        )
    return df


def _mut_future_ts(t, df):
    if t == "events":
        return df.withColumn("ts", F.expr("timestampadd(YEAR, 100, ts)"))
    return df


def _mut_blank(t, df):
    if t != "documents":
        return df
    return df.withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.lit(""))
        .when(F.col("doc_id") % 13 == 0, F.lit("   \t  "))
        .when(F.col("doc_id") % 17 == 0, F.lit("\n\n"))
        .otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("bigint"))


def _mut_skew(t, df):
    """Hot-key skew — 100 TB's most common pathology: half of every
    fact's join/group key collapses onto ONE existing key (key 0 /
    'src0', present at every SF), so group-bys, windows, salted joins
    and AQE skew-join paths all see a genuinely hot partition. Oracle
    parity must be unaffected: only the data distribution changes, and
    every ordering in the registry carries a unique tiebreaker."""
    if t == "events":
        return df.withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(0))
            .otherwise(F.col("user_id"))
            .cast("bigint"),
        )
    if t == "orders":
        return df.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 2 == 0, F.lit(0))
            .otherwise(F.col("o_custkey"))
            .cast("bigint"),
        )
    if t == "lineitem":
        return df.withColumn(
            "l_partkey",
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
            .otherwise(F.col("l_partkey"))
            .cast("bigint"),
        )
    if t == "documents":
        return df.withColumn(
            "source",
            F.when(F.col("doc_id") % 2 == 0, F.lit("src0")).otherwise(
                F.col("source")
            ),
        )
    return df


def _mut_naninf(t, df):
    if t == "events":
        return df.withColumn(
            "value",
            F.when(F.col("event_id") % 19 == 0, F.lit(float("nan")))
            .when(F.col("event_id") % 23 == 0, F.lit(float("inf")))
            .otherwise(F.col("value")),
        )
    return df


#: documents/text-family scope selector (multibyte + blank sweeps): the
#: queries whose semantics touch text at all.
def _text_family(names):
    extra = {
        "src_jsonl", "src_binary", "snk_training_shards",
        "job_prep_training_corpus", "job_data_card",
    }
    return [n for n in names if n.startswith("ext_") or n in extra]


#: the statistics tier hardened with _finite_values in round 7; the two
#: excluded quantile ops document sanitize-at-ingestion instead (their
#: driver hashes are frozen — see their docstrings).
_NANINF_SCOPE = [
    "win_rolling_median", "ext_drift_psi", "ext_bootstrap_ci",
    "ext_mad_outliers", "ext_ab_welch", "agg_seasonality_profile",
    "agg_runs_test", "agg_autocorr", "ext_calibration_bins",
    "agg_quantile_bands", "ext_winsorized_mean", "win_anomaly_zscore",
    "ext_ks_test", "agg_regression_ols", "win_cusum", "win_peak_detection",
    # r12: KLL joined the finite-gated tier when its oracle was upgraded
    # from rows-only to the rank-error audit
    "agg_kll_quantiles",
]

SWEEPS = {
    "empty":     (_mut_empty, None, True),
    "nulls":     (_mut_nulls, None, False),
    "multibyte": (_mut_multibyte, _text_family, False),
    "bigid":     (_mut_bigid, None, False),
    "negative":  (_mut_negative, None, False),
    "future_ts": (_mut_future_ts, None, False),
    "blank":     (_mut_blank, _text_family, False),
    "skew":      (_mut_skew, None, False),
    "naninf":    (_mut_naninf, lambda names: [n for n in names if n in _NANINF_SCOPE], False),
}


# ---------------------------------------------------------- canonicalization
def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 9))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        if isinstance(v, pd.Timestamp) and v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        if v.hour == v.minute == v.second == 0 and getattr(v, "microsecond", 0) == 0:
            return v.strftime("%Y-%m-%d")
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    # array-valued cells (Spark array columns / DuckDB list()) before the
    # pd.isna fallback: pd.isna on an array returns an ARRAY, whose
    # truthiness raises and would misreport the query as ERROR instead of
    # comparing it — recurse element-wise instead.
    if isinstance(v, (list, tuple)) or (
        hasattr(v, "dtype") and getattr(v, "ndim", 0) >= 1
    ):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame):
    cols = sorted(df.columns)
    return sorted(
        tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)
    )


# ----------------------------------------------------------------- execution
def run_sweep(spark, name, src, only, include_streaming):
    from cta_train_tracker_analytics_spark.data import load

    mutate, scope, streaming_default = SWEEPS[name]
    sf = f"{SCRATCH}/{name}"
    shutil.rmtree(sf, ignore_errors=True)
    os.makedirs(sf)
    for t in TABLES:
        mutate(t, load(spark, src, t)).write.mode("overwrite").parquet(
            f"{sf}/{t}.parquet"
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )

    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    names = list(queries)
    if scope is not None:
        names = scope(names)
    if only:
        names = [n for n in names if n in only]
    if not (include_streaming or streaming_default):
        names = [n for n in names if not n.startswith("str_")]

    mismatches, errors, rows_only = [], [], 0
    for qname in names:
        try:
            sdf = queries[qname](spark, sf).toPandas()
            if qname not in oracles:
                rows_only += 1
                continue
            odf = con.execute(oracles[qname]).df()
            ok = (
                sorted(sdf.columns) == sorted(odf.columns)
                and len(sdf) == len(odf)
                and canonical_rows(sdf) == canonical_rows(odf)
            )
            if not ok:
                print(f"  {qname}: MISMATCH ({len(sdf)} vs {len(odf)})", flush=True)
                if sorted(sdf.columns) == sorted(odf.columns) and len(sdf) == len(odf):
                    # counts/schema agree → VALUES differ (the common case
                    # for the value-mutation sweeps this script exists
                    # for): show the first differing canonical rows so the
                    # diagnosis doesn't require a manual replay.
                    srows, orows = canonical_rows(sdf), canonical_rows(odf)
                    shown = 0
                    for sr, orow in zip(srows, orows):
                        if sr != orow and shown < 3:
                            print(f"    spark : {sr}", flush=True)
                            print(f"    oracle: {orow}", flush=True)
                            shown += 1
                mismatches.append(qname)
        except Exception:
            print(f"  {qname}: ERROR {traceback.format_exc(limit=3)}", flush=True)
            errors.append(qname)
    con.close()
    print(
        f"[{name}] {len(names)} queries ({rows_only} rows-only): "
        f"{len(mismatches)} mismatches {errors and len(errors) or 0} errors",
        flush=True,
    )
    return mismatches, errors


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sweeps", nargs="*", default=[], help=f"subset of {list(SWEEPS)}")
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--queries", default="", help="comma-separated query-name filter")
    ap.add_argument("--include-streaming", action="store_true")
    args = ap.parse_args()

    chosen = args.sweeps or list(SWEEPS)
    unknown = [s for s in chosen if s not in SWEEPS]
    if unknown:
        ap.error(f"unknown sweeps {unknown}; choose from {list(SWEEPS)}")
    only = {s.strip() for s in args.queries.split(",") if s.strip()} or None

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hardening-sweeps")
        .config("spark.sql.session.timeZone", "America/Chicago")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    failed = {}
    for name in chosen:
        print(f"== sweep: {name} ==", flush=True)
        mismatches, errors = run_sweep(
            spark, name, args.src, only, args.include_streaming
        )
        if mismatches or errors:
            failed[name] = (mismatches, errors)
    print("SWEEP SUMMARY:", "CLEAN" if not failed else failed, flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
