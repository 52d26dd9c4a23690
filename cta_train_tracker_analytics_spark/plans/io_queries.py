"""Registered I/O + projection/filter queries (SURVEY.md §2.1–§2.2).

Sinks are demonstrated as write-then-read round-trips through a scratch dir
(the read-back result is what the oracle checks); fixture-driven operators
(the CTA document dataflow) check against literal VALUES oracles carrying the
reference's golden rows (tests/unit/test_get_train_status.py:342-353).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import load, read_back
from ..operators.flatten import flatten_positions
from ..operators.windows import latest_state
from ..schemas import TRIGGER_SCHEMA, train_lines_df
from ..sources import fixtures
from ..sources.jsonl import read_jsonl, write_jsonl
from .registry import query

_SCRATCH = Path("/tmp/cta_spark_engine_scratch")


def _scratch(name: str, sf_dir: str) -> str:
    """Per-query scratch dir, wiped before use so round-trips are exact."""
    p = _SCRATCH / Path(sf_dir).name / name
    shutil.rmtree(p, ignore_errors=True)
    p.parent.mkdir(parents=True, exist_ok=True)
    return str(p)


def _fixture_flat(spark: SparkSession, docs: list[dict]) -> DataFrame:
    return flatten_positions(
        fixtures.response_df(spark, docs),
        observed_date=F.lit(fixtures.OBSERVED_DATE),
        observed_ts=F.lit(fixtures.OBSERVED_TS),
    )


#: The two golden flatten rows as SQL literals (train 110 = the reference's
#: golden row; train 217 = second fixture train).
_GOLDEN_VALUES = """
    (VALUES
      ('2025-06-25#Purple#110#5', '2025-06-25T10:30:25.000045-05:00',
       '2025-06-20T12:42:56', 'Forest Park', 'Belmont',
       '2025-06-20T12:43:56', '1', '0'),
      ('2025-06-25#Purple#217#1', '2025-06-25T10:30:25.000045-05:00',
       '2025-06-20T12:41:10', 'Linden', 'Noyes',
       '2025-06-20T12:44:30', '0', '1'))
      AS t(train_id, "current_timestamp", prediction_generated_timestamp,
           destination_station, next_station, next_station_arrival_time,
           is_approaching_station, is_train_delayed)
"""


# --------------------------------------------------------------------------
# §2.1 sources
# --------------------------------------------------------------------------


@query("src_rest_api", oracle=f"SELECT * FROM {_GOLDEN_VALUES}")
def src_rest_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST poll → typed rows (get_train_status.py:29-43). Offline, the
    golden fixture document stands in for the HTTP payload; the parse +
    flatten chain is identical to the live path (driver-side fetch →
    createDataFrame → from_json(CTA_RESPONSE_SCHEMA))."""
    return _fixture_flat(spark, [fixtures.HAPPY_DOC])


@query(
    "src_jsonl",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def src_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL read with a declared schema (bucket_raw_data.py:43-53):
    documents round-tripped through newline-delimited JSON files."""
    docs = load(spark, sf_dir, "documents")
    path = _scratch("src_jsonl", sf_dir)
    write_jsonl(docs, path, mode="overwrite")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return read_jsonl(spark, path, schema)


@query(
    "src_csv",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
)
def src_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with a declared schema and header: the interchange
    format the reference's string-typed wire records (get_train_status.py:
    110-122) would take on any non-JSON export path. Schema-on-read (no
    inference pass — inference would double the scan at scale); text is
    excluded because CSV is the wrong carrier for free text, which is
    exactly the judgment call this operator documents."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    path = _scratch("src_csv", sf_dir)
    docs.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(path)


@query(
    "src_binary",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    WHERE doc_id < 200 AND text IS NOT NULL AND octet_length(encode(text)) > 0
    """,
)
def src_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob ingestion via the binaryFile datasource — the real
    entry point for multimodal corpora (images/audio land as one blob per
    object; ext_multimodal_cols consumes exactly this shape). Blobs are
    staged one file per document by an executor-side foreachPartition,
    then read back with ``format("binaryFile")``; the query proves content
    integrity end to end by re-deriving byte length and sha256 FROM THE
    BLOB BYTES and letting the oracle recompute both from the source
    table.

    STAGING CAVEAT: the ``open()`` in the staging step writes to a path
    that executors and driver must SHARE — correct in local mode and on
    clusters with a shared filesystem (NFS, fuse-mounted object store),
    but on share-nothing executors the blobs would land on executor-local
    disks where the read-back can't see them. On such clusters stage via a
    Spark writer to an object-store/DFS path instead (as src_jsonl /
    src_csv do); the binaryFile read side is unchanged — it runs over an
    object-store prefix with partition-parallel listing, and
    pathGlobFilter prunes non-blob files at the file index, before any
    read."""
    path = _scratch("src_binary", sf_dir)
    Path(path).mkdir(parents=True, exist_ok=True)

    def _write_blobs(rows):
        for r in rows:
            with open(f"{path}/{r.doc_id}.bin", "wb") as f:
                f.write(r.text.encode("utf-8"))

    # a document with no payload stages no blob — the ingestion semantic
    # for missing media (open()/encode on None would kill the task), and
    # the same goes for EMPTY payloads: Spark's binaryFile file index
    # silently skips 0-byte files, so staging one would create a row the
    # read-back never returns (found by the blank-text sweep)
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200)
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    docs.select("doc_id", "text").foreachPartition(_write_blobs)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return blobs.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("bigint").alias("doc_id"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


@query("src_listing", oracle="SELECT * FROM nation")
def src_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File enumeration under a prefix (bucket_raw_data.py:29-40) — a path
    glob resolved by Spark's file index instead of a hand-paginated listing."""
    return spark.read.parquet(f"{sf_dir}/n*.parquet")


@query(
    "src_queue",
    oracle="""
    SELECT train_line_abbrev, train_line FROM (VALUES
        ('Red','Red'),('Blue','Blue'),('Brn','Brown'),('G','Green'),
        ('Org','Orange'),('P','Purple'),('Pink','Pink'))
        AS t(train_line_abbrev, train_line)
    """,
)
def src_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger-message consumption (get_train_status.py:96-98): the 7
    fan-out messages parsed from their JSON bodies with TRIGGER_SCHEMA. In
    streaming this is the micro-batch work list; the queue itself dissolves
    into the scheduler."""
    bodies = train_lines_df(spark).select(
        F.to_json(F.struct("train_line_abbrev", "train_line")).alias("body")
    )
    parsed = bodies.select(F.from_json("body", TRIGGER_SCHEMA).alias("m"))
    return parsed.select("m.train_line_abbrev", "m.train_line")


@query(
    "snk_queue",
    oracle="""
    SELECT body FROM (VALUES
        ('{"train_line_abbrev":"Red","train_line":"Red"}'),
        ('{"train_line_abbrev":"Blue","train_line":"Blue"}'),
        ('{"train_line_abbrev":"Brn","train_line":"Brown"}'),
        ('{"train_line_abbrev":"G","train_line":"Green"}'),
        ('{"train_line_abbrev":"Org","train_line":"Orange"}'),
        ('{"train_line_abbrev":"P","train_line":"Purple"}'),
        ('{"train_line_abbrev":"Pink","train_line":"Pink"}')) AS t(body)
    """,
)
def snk_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger-message production (write_train_lines.py:54-66,86-91): one
    JSON body per line of the dimension."""
    return train_lines_df(spark).select(
        F.to_json(F.struct("train_line_abbrev", "train_line")).alias("body")
    )


# --------------------------------------------------------------------------
# §2.1 sinks
# --------------------------------------------------------------------------


@query(
    "snk_jsonl_append",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'signup'
    """,
)
def snk_jsonl_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched JSONL append (get_train_status.py:52-79): two append writes
    into the same raw path, read back complete — commit-based exactly-once
    replaces the reference's partial-batch retry loop."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "value"
    )
    path = _scratch("snk_jsonl_append", sf_dir)
    write_jsonl(ev.filter(F.col("event_id") % 2 == 0), path, mode="append")
    write_jsonl(ev.filter(F.col("event_id") % 2 == 1), path, mode="append")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return read_jsonl(spark, path, schema)


@query(
    "snk_parquet",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
)
def snk_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-file Parquet write (bucket_raw_data.py:56-61): coalesce(1)
    mirrors the reference's one-file batch; read back for verification."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    path = _scratch("snk_parquet", sf_dir)
    part.coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@query(
    "snk_parquet_partitioned",
    oracle="""
    SELECT CAST(ts AS DATE) AS load_date, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY CAST(ts AS DATE)
    """,
)
def snk_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style load_date= partitioned Parquet publish
    (bucket_raw_data.py:107-112): write partitioned, read back with partition
    discovery, count per partition."""
    ev = load(spark, sf_dir, "events").withColumn("load_date", F.to_date("ts"))
    path = _scratch("snk_parquet_partitioned", sf_dir)
    ev.write.mode("overwrite").partitionBy("load_date").parquet(path)
    # schema-on-read (no inference pass; an empty publish reads back clean)
    back = read_back(spark, path, ev.schema)
    return back.groupBy(F.col("load_date").cast("date").alias("load_date")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@query(
    "snk_parquet_sorted",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
    """,
)
def snk_parquet_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-clustered Parquet publish: repartitionByRange + sortWithin
    Partitions on the filter key before writing, with small row groups, so
    every row group's min/max statistics cover a narrow key band. The
    read-back filter then SKIPS almost every row group — at 100 TB this
    write-side clustering is the difference between scanning a table and
    scanning a few megabytes (pinned by tests/test_plans.py: the key
    predicate reaches the scan as PushedFilters, where parquet evaluates
    it against row-group stats). The write costs one range shuffle, paid
    once, amortized over every keyed read."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    path = _scratch("snk_parquet_sorted", sf_dir)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.filter(F.col("l_orderkey").between(1000, 2000))


@query(
    "snk_orc",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def snk_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the second columnar interchange format a lakehouse
    deploy meets (Hive-era tables). Same predicate-pushdown/column-pruning
    machinery as the parquet path (native Spark reader, zlib stripes);
    schema carries through the file footer, so read-back declares nothing."""
    docs = load(spark, sf_dir, "documents")
    path = _scratch("snk_orc", sf_dir)
    docs.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "snk_keyed_store",
    oracle="""
    SELECT user_id, ts, value, event_id FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def snk_keyed_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert store (the disabled DynamoDB table, main.tf:25-43): the
    materialized latest-state view IS the store's point-read surface."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    return latest_state(ev, ["user_id"], "ts", tiebreak="event_id")


@query(
    "job_compact_day",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-05'
    """,
)
def job_compact_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.3 daily compaction job end-to-end (bucket_raw_data.py:76-117):
    one day of raw JSONL → Hive-partitioned parquet via dynamic partition
    overwrite → partition-pruned read-back of that day."""
    import datetime as dt

    from ..jobs.compact import compact_day
    from ..sources.jsonl import date_path

    day = dt.date(2024, 1, 5)
    root = _scratch("job_compact_day", sf_dir)
    raw, curated = f"{root}/raw", f"{root}/processed"
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    day_events = (
        load(spark, sf_dir, "events")
        .filter(F.to_date("ts") == F.lit(day))
        .select("event_id", "user_id", "value")
    )
    write_jsonl(day_events, date_path(raw, day.year, day.month, day.day))
    compact_day(spark, raw, curated, day, schema)
    # schema-on-read: curated = declared columns + the load_date partition
    # (a day with zero raw records compacts to an empty publish and must
    # still read back — the no-op daily run)
    curated_schema = T.StructType(
        schema.fields + [T.StructField("load_date", T.DateType())]
    )
    back = read_back(spark, curated, curated_schema).filter(
        F.col("load_date") == F.lit(day)
    )
    return back.select("event_id", "user_id", "value")


@query(
    "job_retention",
    oracle="""
    SELECT CAST(ts AS DATE) AS load_date, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-13'
    GROUP BY CAST(ts AS DATE)
    """,
)
def job_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.3 retention job end-to-end (the reference's 3-day S3
    lifecycle expiration, main.tf:166-189): publish the events table as
    load_date= Hive partitions, expire everything older than the cutoff
    with the partition-drop maintenance job, read the survivors back with
    partition discovery. Retention is filesystem metadata work — whole
    partition directories drop, no row-level rewrite, which is why the
    curated zone partitions by load_date in the first place."""
    import datetime as dt

    from ..jobs.retention import expire_partitions

    ev = load(spark, sf_dir, "events").withColumn("load_date", F.to_date("ts"))
    root = _scratch("job_retention", sf_dir)
    ev.write.mode("overwrite").partitionBy("load_date").parquet(root)
    # events span 2024-01-01..2024-01-30; keep the trailing 18 days
    expire_partitions(root, keep_days=18, today=dt.date(2024, 1, 31))
    # schema-on-read: retention that expired EVERY partition must read
    # back as an empty typed frame, not die on schema inference
    back = read_back(spark, root, ev.schema)
    return back.groupBy(F.col("load_date").cast("date").alias("load_date")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# --------------------------------------------------------------------------
# §2.2 projections / filters (fixture-driven, golden-row oracles)
# --------------------------------------------------------------------------


@query("proj_flatten", oracle=f"SELECT * FROM {_GOLDEN_VALUES}")
def proj_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flatten projection (get_train_status.py:110-122):
    nested doc → 8-column curated record, golden rows pinned."""
    return _fixture_flat(spark, [fixtures.HAPPY_DOC])


@query(
    "nav_struct",
    oracle="""
    SELECT tmst, errCd, has_route FROM (VALUES
        ('2025-06-20T12:43:12', '0', TRUE),
        ('2025-06-20T12:43:12', '0', FALSE)) AS t(tmst, errCd, has_route)
    """,
)
def nav_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-tolerant nested navigation ctatt→route (get_train_status.py:104)."""
    docs = fixtures.response_df(spark, [fixtures.HAPPY_DOC, fixtures.NO_ROUTE_DOC])
    return docs.select(
        F.col("ctatt.tmst").alias("tmst"),
        F.col("ctatt.errCd").alias("errCd"),
        F.col("ctatt.route").isNotNull().alias("has_route"),
    )


@query(
    "arr_element",
    oracle="""
    SELECT first_route_name, CAST(n_trains AS BIGINT) AS n_trains
    FROM (VALUES ('purple', 2), ('purple', 0)) AS t(first_route_name, n_trains)
    """,
)
def arr_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-element array access route[0] (get_train_status.py:106)."""
    docs = fixtures.response_df(spark, [fixtures.HAPPY_DOC, fixtures.NO_TRAINS_DOC])
    first = F.element_at(F.col("ctatt.route"), 1)
    return docs.select(
        first.getField("@name").alias("first_route_name"),
        F.coalesce(F.size(first.getField("train")), F.lit(0))
        .cast("bigint")
        .alias("n_trains"),
    )


@query(
    "explode_trains",
    oracle="""
    SELECT train_line, rn FROM (VALUES ('Purple','110'), ('Purple','217'))
        AS t(train_line, rn)
    """,
)
def explode_trains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One output row per train array element (get_train_status.py:110)."""
    docs = fixtures.response_df(spark, [fixtures.HAPPY_DOC])
    first = F.element_at(F.col("ctatt.route"), 1)
    return docs.select(
        "train_line", F.explode(first.getField("train")).alias("train")
    ).select("train_line", F.col("train.rn").alias("rn"))


@query(
    "filter_nonempty",
    oracle="SELECT 'Purple' AS train_line, CAST(2 AS BIGINT) AS n",
)
def filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-if-empty semantics (get_train_status.py:107,124-129): the
    no-trains document contributes zero rows via native explode semantics."""
    flat = flatten_positions(
        fixtures.response_df(spark, [fixtures.HAPPY_DOC, fixtures.NO_TRAINS_DOC]),
        observed_date=F.lit(fixtures.OBSERVED_DATE),
        observed_ts=F.lit(fixtures.OBSERVED_TS),
        require_route=False,
    )
    return (
        flat.select(F.split("train_id", "#").getItem(1).alias("train_line"))
        .groupBy("train_line")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@query(
    "filter_required",
    oracle="""
    SELECT train_line_abbrev, train_line FROM (VALUES ('P','Purple'),('Red','Red'))
        AS t(train_line_abbrev, train_line)
    """,
)
def filter_required(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required-param enforcement (get_train_status.py:99-100) — the lenient
    filter form; the raising form (raise_error) is unit-tested in
    tests/test_flatten.py."""
    msgs = spark.createDataFrame(
        [("P", "Purple"), ("Red", "Red"), (None, "Ghost"), ("", "Blank")],
        TRIGGER_SCHEMA,
    )
    cond = (
        F.col("train_line_abbrev").isNotNull()
        & (F.col("train_line_abbrev") != "")
        & F.col("train_line").isNotNull()
        & (F.col("train_line") != "")
    )
    return msgs.filter(cond)


@query(
    "filter_blank_lines",
    oracle="SELECT a FROM (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))) AS t(a)",
)
def filter_blank_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blank-line skip in JSONL parsing (bucket_raw_data.py:49-51)."""
    lines = spark.createDataFrame(
        [('{"a": 1}',), ("",), ("   ",), ('{"a": 2}',)], "value string"
    )
    kept = lines.filter(F.trim("value") != "")
    return kept.select(F.from_json("value", "a BIGINT").getField("a").alias("a"))


@query(
    "proj_drop",
    oracle="""
    SELECT rn, destNm, nextStaNm FROM (VALUES
        ('110','Forest Park','Belmont'), ('217','Linden','Noyes'))
        AS t(rn, destNm, nextStaNm)
    """,
)
def proj_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: lat/lon/heading/destSt/nextStaId/nextStpId/flags are
    dropped (never selected), so Catalyst prunes them from the scan
    (get_train_status.py:110-122 vs the 15-field wire record)."""
    docs = fixtures.response_df(spark, [fixtures.HAPPY_DOC])
    first = F.element_at(F.col("ctatt.route"), 1)
    wide = docs.select(F.explode(first.getField("train")).alias("t")).select("t.*")
    return wide.drop(
        "destSt", "nextStaId", "nextStpId", "flags", "lat", "lon", "heading",
        "prdt", "arrT", "isApp", "isDly", "trDr",
    )


@query(
    "proj_unpivot",
    oracle="""
    UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                    l_discount, l_tax
             FROM lineitem)
    ON l_quantity, l_extendedprice, l_discount, l_tax
    INTO NAME metric VALUE val
    """,
)
def proj_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt) — the inverse of agg_pivot: each measure
    column becomes a (metric, val) row, the layout metric stores and
    feature pipelines consume. Spark's native ``unpivot`` plans an Expand
    node — a map-side row generator, no shuffle, no UDF; at 100 TB the
    cost is exactly the 4× output rows, streamed, never materialized
    wide."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "src_jsonl_corrupt",
    oracle="""
    SELECT CAST(doc_id % 10 = 7 AS BOOLEAN) AS is_corrupt,
           CAST(count(*) AS BIGINT) AS n
    FROM documents WHERE doc_id < 100
    GROUP BY CAST(doc_id % 10 = 7 AS BOOLEAN)
    """,
)
def src_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema enforcement semantics (SURVEY §1.3): the reference is
    fail-fast on required structure (KeyError on missing fields,
    get_train_status.py:113-120,130-133) — the idiomatic Spark upgrade is
    PERMISSIVE mode with a ``_corrupt_record`` column, which quarantines
    malformed rows instead of failing the 100 TB job at hour nine. This
    query stages a JSONL file with every (doc_id % 10 == 7) line corrupted,
    reads it back PERMISSIVE with a declared schema (no inference pass),
    and reports good vs quarantined counts — the corrupt-row audit every
    ingest pipeline publishes alongside its bronze table."""
    path = _scratch("src_jsonl_corrupt", sf_dir)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    lines = docs.select(
        F.when(
            F.col("doc_id") % 10 == 7, F.concat(F.lit("{corrupt line "), F.col("doc_id"))
        )
        .otherwise(F.to_json(F.struct("doc_id", "lang")))
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark refuses plans that prune a raw JSON scan down to ONLY the
        # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
        # documented contract is to materialize the parse first — which is
        # what a real ingest does anyway (bronze write, then audit).
        .localCheckpoint(eager=True)
    )
    return parsed.groupBy(
        F.col("_corrupt_record").isNotNull().alias("is_corrupt")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


@query(
    "src_parquet_evolve",
    oracle="""
    SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source
    FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source
    FROM documents WHERE doc_id >= 100 AND doc_id < 200
    """,
)
def src_parquet_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written with
    DIFFERENT column sets (an added column mid-stream — the normal life of
    a long-lived dataset) unified by ``mergeSchema``; missing columns fill
    with NULL per file. The merge happens at footer level — file schemas
    union at planning time, no data rewrite. At 100 TB the alternative
    (rewriting history to add a column) is the thing this exists to
    avoid; pair with explicit casts when a column's TYPE changes, which
    footer merge intentionally refuses to reconcile."""
    path = _scratch("src_parquet_evolve", sf_dir)
    docs = load(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 100).select("doc_id", "lang").write.parquet(
        f"{path}/batch=1"
    )
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        "doc_id", "source"
    ).write.parquet(f"{path}/batch=2")
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("doc_id", "lang", "source")
    )


@query(
    "src_xml",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
)
def src_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion via Spark 4's built-in xml datasource: metadata
    records staged as rooted XML documents (one file per partition, the
    enterprise-feed interchange shape), read back with an explicit
    schema and ``rowTag`` record extraction. Schema-on-read, no
    inference pass — XML inference costs a full extra scan at 100 TB,
    the same judgment as src_csv. Text is excluded: free text in XML
    needs entity escaping, and the engine's text carrier is JSONL/
    parquet (src_jsonl) — this source exists for the feeds that arrive
    as XML whether we like it or not.

    STAGING CAVEAT (same as src_binary): the executor-side ``open()``
    assumes a filesystem shared between executors and driver — correct
    in local mode / NFS / fuse-mounted object stores; on share-nothing
    clusters stage through an object-store path instead. The READ side
    is the production-shaped half: partition-parallel file listing,
    per-file rowTag extraction, explicit schema."""
    from pyspark import TaskContext

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = _scratch("src_xml", sf_dir)
    Path(path).mkdir(parents=True, exist_ok=True)

    def _write_xml(rows) -> None:
        rows = list(rows)
        if not rows:
            return
        pid = TaskContext.get().partitionId()
        with open(f"{path}/part-{pid:05d}.xml", "w", encoding="utf-8") as f:
            f.write("<docs>")
            for r in rows:
                f.write(
                    f"<doc><doc_id>{r.doc_id}</doc_id><lang>{r.lang}</lang>"
                    f"<source>{r.source}</source>"
                    f"<n_chars>{r.n_chars}</n_chars></doc>"
                )
            f.write("</docs>")

    docs.foreachPartition(_write_xml)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(schema)
        .load(path)
    )
