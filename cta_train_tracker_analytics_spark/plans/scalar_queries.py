"""Registered scalar-function queries (SURVEY.md §2.8) — every reference
row-level transform re-expressed as native, codegen-friendly column
expressions, each paired with its DuckDB oracle.

All are map-only plans: zero shuffles (except the few that aggregate),
whole-stage codegen end to end, no Python UDFs — the §2.10 policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load
from ..functions.scalars import (
    cast_flag_bool,
    composite_key,
    haversine_km,
    map_lookup,
    to_jsonl_record,
    zero_pad,
)
from ..schemas import TRAIN_LINES
from .registry import query


@query(
    "f_concat_ws",
    oracle="""
    SELECT o_orderkey,
           concat_ws('#', strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority,
                     o_orderkey) AS composite_key
    FROM orders
    """,
)
def f_concat_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date#line#rn#trDr-style composite key (get_train_status.py:113)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        composite_key(
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.col("o_orderpriority"),
            F.col("o_orderkey"),
        ).alias("composite_key"),
    )


@query(
    "f_date_format",
    oracle="SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M') AS minute_str FROM events",
)
def f_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """%Y-%m-%d-style formatting (get_train_status.py:93). NTZ input →
    timezone-free formatting."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_str"))


@query(
    "f_iso_ts",
    oracle="SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso FROM events",
)
def f_iso_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zoneless ISO-8601 text — the wire timestamp shape
    (mock_train_location_response.py:18-19)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso"))


@query(
    "f_now_tz",
    oracle="""
    SELECT strftime((TIMESTAMP '2025-06-20 17:42:56' AT TIME ZONE 'UTC')
                    AT TIME ZONE 'America/Chicago',
                    '%Y-%m-%dT%H:%M:%S') AS chicago_local
    """,
)
def f_now_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """America/Chicago wall-clock conversion (get_train_status.py:91-92) —
    demonstrated on a fixed instant so the result is deterministic; the
    ingest path applies the same convert_timezone to now()."""
    return spark.range(1).select(
        F.date_format(
            F.convert_timezone(
                F.lit("UTC"),
                F.lit("America/Chicago"),
                F.lit("2025-06-20 17:42:56").cast("timestamp_ntz"),
            ),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("chicago_local")
    )


@query(
    "f_date_sub",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 DAY AS DATE) AS prev_day
    FROM orders
    """,
)
def f_date_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Yesterday' arithmetic (bucket_raw_data.py:84-85)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select("o_orderkey", F.date_sub(F.to_date("o_orderdate"), 1).alias("prev_day"))


@query(
    "f_zero_pad",
    oracle="""
    SELECT event_id,
           lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS mm,
           lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS dd
    FROM events
    """,
)
def f_zero_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:02d} month/day padding for raw-zone paths (bucket_raw_data.py:93)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        zero_pad(F.month("ts")).alias("mm"),
        zero_pad(F.dayofmonth("ts")).alias("dd"),
    )


@query(
    "f_to_json",
    oracle="""
    SELECT doc_id,
           CAST(to_json(struct_pack(doc_id := doc_id, lang := lang)) AS VARCHAR) AS j
    FROM documents
    """,
)
def f_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row → compact JSON text, the JSONL wire record
    (get_train_status.py:46-49)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", to_jsonl_record("doc_id", "lang").alias("j"))


@query(
    "f_from_json",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def f_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON text → typed value with an explicit schema
    (get_train_status.py:97-98; events.props carries {"k": N})."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
    )


@query(
    "f_encode_utf8",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def f_encode_utf8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 byte encoding (get_train_status.py:49) — byte length of the
    encoded record."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes")
    )


@query(
    "f_uuid",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           -- min/max over an EMPTY table are NULL on the Spark side; the
           -- literal 36 must collapse with them (round-11 empty sweep)
           CAST(CASE WHEN count(*) > 0 THEN 36 END AS BIGINT) AS min_len,
           CAST(CASE WHEN count(*) > 0 THEN 36 END AS BIGINT) AS max_len
    FROM region
    """,
)
def f_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random identifiers (bucket_raw_data.py:61) — nondeterministic values,
    so the checkable contract is shape: one 36-char UUID per row."""
    region = load(spark, sf_dir, "region")
    ids = region.select(F.length(F.expr("uuid()")).alias("len"))
    return ids.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("len").cast("bigint").alias("min_len"),
        F.max("len").cast("bigint").alias("max_len"),
    )


@query(
    "f_map_lookup",
    oracle="""
    SELECT abbrev, line FROM (VALUES
        ('Red','Red'),('Blue','Blue'),('Brn','Brown'),('G','Green'),
        ('Org','Orange'),('P','Purple'),('Pink','Pink')) AS t(abbrev, line)
    """,
)
def f_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static 7-entry abbrev→name lookup (write_train_lines.py:25-33) via a
    literal MapType expression."""
    abbrevs = spark.createDataFrame(
        [(a,) for a, _ in TRAIN_LINES], "abbrev string"
    )
    return abbrevs.select(
        "abbrev", map_lookup(dict(TRAIN_LINES), F.col("abbrev")).alias("line")
    )


@query(
    "f_cast_bool",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(CASE WHEN o_orderstatus = 'F' THEN '1' ELSE '0' END AS INTEGER)
                AS BOOLEAN) AS is_f
    FROM orders
    """,
)
def f_cast_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire "0"/"1" flag string → boolean (isApp/isDly analytics casts)."""
    orders = load(spark, sf_dir, "orders")
    flag_str = F.when(F.col("o_orderstatus") == "F", "1").otherwise("0")
    return orders.select("o_orderkey", cast_flag_bool(flag_str).alias("is_f"))


@query(
    "f_ts_parse",
    oracle="""
    SELECT event_id,
           strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS parsed
    FROM events
    """,
)
def f_ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zoneless wire timestamp text → TIMESTAMP_NTZ — round-trip through the
    exact wire format (prdt/arrT shape)."""
    ev = load(spark, sf_dir, "events")
    wire = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    return ev.select(
        "event_id",
        F.to_timestamp_ntz(wire, F.lit("yyyy-MM-dd'T'HH:mm:ss")).alias("parsed"),
    )


@query(
    "f_ts_diff",
    oracle="""
    SELECT event_id,
           date_diff('second', date_trunc('day', ts), ts) AS secs_since_midnight
    FROM events
    """,
)
def f_ts_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp difference in seconds (arrT − prdt shape) — NTZ-to-NTZ so
    the result never shifts with the session timezone."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.timestamp_diff("SECOND", F.date_trunc("day", F.col("ts")).cast("timestamp_ntz"), F.col("ts"))
        .cast("bigint")
        .alias("secs_since_midnight"),
    )


@query(
    "f_math_std",
    oracle="""
    SELECT l_returnflag,
           ((CAST(sum(l_quantity) AS BIGINT) * 20000 + count(*))
               // (2 * count(*))) / CAST(10000.0 AS DOUBLE) AS avg_qty,
           round(stddev_samp(l_quantity), 4) AS std_qty,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(min(l_quantity), 4) AS min_qty,
           round(max(l_quantity), 4) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f_math_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/stddev/percentile/min/max — the horizon & headway statistics
    surface (SURVEY §2.8 f_math_std). percentile() is the exact interpolated
    quantile, matching DuckDB quantile_cont.

    avg_qty rounds in pure BIGINT arithmetic (quantities are integers;
    (s·2·10^4 + n) div (2n), nonnegative so no sign branch) — hardened by
    the round-13 boundary probe ahead of this query's r4→r13 hash
    re-queue: raw round(avg, 4) is the known data-dependent cross-engine
    boundary (Spark rounds the shortest-decimal repr, DuckDB the binary
    value). std/median keep plain round(): irrational-valued statistics
    have measure-zero boundary risk, probed clean on today's data."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.expr(
                "(cast(sum(l_quantity) as bigint) * 20000 + count(*))"
                " div (2 * count(*))"
            )
            / 10000.0
        ).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
    )


@query(
    "f_array_std",
    oracle="""
    SELECT l_orderkey,
           CAST(len(list_sort(list(l_linenumber))) AS BIGINT) AS n_items,
           CAST(list_max(list(l_linenumber)) AS BIGINT) AS max_line,
           list_contains(list(l_linenumber), 1) AS has_first
    FROM lineitem GROUP BY l_orderkey
    """,
)
def f_array_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order ops over collect_list — per-run
    station-array shape (SURVEY §2.8 f_array_std)."""
    li = load(spark, sf_dir, "lineitem")
    arr = F.array_sort(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.size(arr).cast("bigint").alias("n_items"),
        F.array_max(arr).cast("bigint").alias("max_line"),
        F.array_contains(arr, F.lit(1)).alias("has_first"),
    )


@query(
    "f_geo_haversine",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               41.0 + (c_custkey % 1000) / 1000.0 AS lat,
               -88.0 + (c_custkey % 500) / 500.0 AS lon
        FROM customer
    )
    SELECT c_custkey,
           round(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(41.8781 - lat) / 2), 2)
               + cos(radians(lat)) * cos(radians(41.8781))
                 * pow(sin(radians(-87.6298 - lon) / 2), 2))), 4) AS dist_km
    FROM pts
    """,
)
def f_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance from lat/lon (the wire fields the reference
    drops, mock_train_location_response.py:23-24). Coordinates derived from
    integer keys so both engines compute on identical doubles."""
    cust = load(spark, sf_dir, "customer")
    lat = F.lit(41.0) + (F.col("c_custkey") % 1000) / 1000.0
    lon = F.lit(-88.0) + (F.col("c_custkey") % 500) / 500.0
    return cust.select(
        "c_custkey",
        F.round(haversine_km(lat, lon, F.lit(41.8781), F.lit(-87.6298)), 4).alias("dist_km"),
    )


@query(
    "proj_variant_json",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           round(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 / CAST(count(*) AS DOUBLE), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def proj_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over Spark 4's VARIANT type: the JSON
    props payload is parsed ONCE into a binary variant (``parse_json``),
    fields are extracted with typed path access
    (``try_variant_get($.k)``), and the extracted metric aggregates per
    event type — the open-schema pattern for event payloads whose shape
    drifts faster than any StructType (the reference's API responses
    would land exactly like this before schema contract hardening;
    f_from_json is the closed-schema twin).

    Scale shape: parse + extract are map-side scalar expressions over
    the binary variant encoding (no shredding join, no second parse per
    path at this single-path shape), then ONE partial+final aggregate
    keyed on event_type. avg is derived explicitly from the exact
    integer sum and count so both engines divide the same integers.
    try_variant_get (not variant_get) makes malformed payloads NULL
    instead of failing the job — at 100 TB there is always one bad
    record."""
    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(
                F.sum("k") / F.count(F.lit(1)).cast("double"), 4
            ).alias("avg_k"),
        )
    )
