"""End-to-end streaming ingest (SURVEY §3.2) and the custom Python
DataSource for the REST poll."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.operators.flatten import flatten_positions
from cta_train_tracker_analytics_spark.schemas import CTA_RESPONSE_SCHEMA
from cta_train_tracker_analytics_spark.sources import fixtures
from cta_train_tracker_analytics_spark.sources.rest_api import CTATrainLocationsDataSource
from cta_train_tracker_analytics_spark.streaming.ingest import ingest_stream, read_raw


def _write_poll_file(path, docs_by_line):
    with open(path, "w") as f:
        for line, doc in docs_by_line:
            f.write(json.dumps({"train_line": line, "body": json.dumps(doc)}) + "\n")


def test_ingest_stream_end_to_end(spark, tmp_path):
    """Poll files → parse → flatten → checkpointed JSONL append; re-drain is
    exactly-once; new polls append."""
    poll, out, cp = tmp_path / "poll", tmp_path / "raw", tmp_path / "cp"
    poll.mkdir()
    _write_poll_file(poll / "p1.json", [("Purple", fixtures.HAPPY_DOC), ("Red", fixtures.NO_TRAINS_DOC)])

    kw = dict(
        observed_date=F.lit(fixtures.OBSERVED_DATE),
        observed_ts=F.lit(fixtures.OBSERVED_TS),
    )
    ingest_stream(spark, str(poll), str(out), str(cp), **kw)
    back = read_raw(spark, str(out))
    assert back.count() == 2  # happy doc: 2 trains; no-trains doc: 0
    golden = back.filter(F.col("train_id") == "2025-06-25#Purple#110#5").collect()[0]
    assert golden["next_station"] == "Belmont"
    assert golden["is_approaching_station"] == "1"

    # replay with the same checkpoint: exactly-once, nothing duplicated
    ingest_stream(spark, str(poll), str(out), str(cp), **kw)
    assert read_raw(spark, str(out)).count() == 2

    # a new poll lands → only its rows append
    _write_poll_file(poll / "p2.json", [("Purple", fixtures.HAPPY_DOC)])
    ingest_stream(spark, str(poll), str(out), str(cp), **kw)
    assert read_raw(spark, str(out)).count() == 4


def test_rest_api_datasource(spark):
    """The custom DataSource scans one partition per line and feeds the
    standard parse→flatten chain."""
    spark.dataSource.register(CTATrainLocationsDataSource)
    polls = spark.read.format("cta_train_locations").load()
    assert polls.count() == 7  # one row per train line
    assert polls.rdd.getNumPartitions() == 7  # fan-out as task parallelism

    # per-line payload routing: each partition's payload must carry ITS
    # line's route — a bug that crossed payloads between line partitions
    # would show up here as a mismatched route name (the fixture fetch
    # stamps the requested abbrev into route '@name', like the real API
    # echoes the requested rt)
    from cta_train_tracker_analytics_spark.schemas import TRAIN_LINES

    abbrev_by_line = {line: abbrev.lower() for abbrev, line in TRAIN_LINES}
    routed = polls.select(
        "train_line",
        F.element_at(
            F.from_json("body", CTA_RESPONSE_SCHEMA)["ctatt"]["route"], 1
        )["@name"].alias("route_name"),
    ).collect()
    assert len(routed) == 7
    for row in routed:
        assert row["route_name"] == abbrev_by_line[row["train_line"]]

    parsed = polls.select(
        F.from_json("body", CTA_RESPONSE_SCHEMA).getField("ctatt").alias("ctatt"),
        "train_line",
    )
    flat = flatten_positions(
        parsed,
        observed_date=F.lit(fixtures.OBSERVED_DATE),
        observed_ts=F.lit(fixtures.OBSERVED_TS),
    )
    assert flat.count() == 14  # 7 lines × 2 fixture trains
    assert flat.filter(F.col("train_id") == "2025-06-25#Purple#110#5").count() == 1


def test_stream_reader_replay_equals_prefetch_path():
    """Checkpoint-recovery contract of the REST streaming source: replaying
    an offset range via readBetweenOffsets must yield exactly the rows the
    prefetch path produced for those polls — otherwise a restart silently
    changes history."""
    from cta_train_tracker_analytics_spark.sources.rest_api import (
        CTATrainLocationsStreamReader,
    )

    r = CTATrainLocationsStreamReader()
    prefetched = []
    off = r.initialOffset()
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows and nxt == off:
            break
        prefetched.extend(rows)
        off = nxt
    replayed = list(r.readBetweenOffsets({"poll": 0}, off))
    assert replayed == prefetched
    assert off == {"poll": 3}
    assert len(prefetched) == 21  # 3 polls × 7 lines


def test_stream_reader_iterators_are_copy_and_pickle_safe():
    """The engine copy.copy()s and pickles prefetched iterators
    (datasource_internal cache); generators break both — pin the list
    iterator contract."""
    import copy
    import pickle

    from cta_train_tracker_analytics_spark.sources.rest_api import (
        CTATrainLocationsStreamReader,
    )

    r = CTATrainLocationsStreamReader()
    it, _ = r.read({"poll": 0})
    clone = copy.copy(it)
    assert list(pickle.loads(pickle.dumps(clone))) == list(it)


def test_staged_max_ts_footer_semantics(tmp_path):
    """_staged_max_ts (the outer stream-join's watermark-flush clock) reads
    parquet footer statistics only. Contract pinned here (ADVICE r8):
    (a) the column index is resolved against parquet LEAF paths, so a
    nested struct ahead of the target column cannot misdirect the read;
    (b) a non-empty file without usable min/max stats raises instead of
    silently classifying the source as empty (fail-loud, as load() does);
    (c) genuinely empty files contribute nothing and alone yield None."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from cta_train_tracker_analytics_spark.plans.streaming_queries import (
        _staged_max_ts,
    )

    ts = [dt.datetime(2024, 5, 1, 12, 0, 0), dt.datetime(2024, 5, 2, 8, 30, 0)]
    # nested struct BEFORE ts: arrow field index of "ts" is 1, but its
    # parquet leaf index is 2 (the struct contributes two leaves)
    nested = pa.table(
        {
            "meta": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}],
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    p_nested = tmp_path / "nested.parquet"
    pq.write_table(nested, p_nested)
    assert _staged_max_ts([p_nested], "ts") == ts[1]

    # stats disabled + rows present → loud failure, not "empty source"
    flat = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
    p_nostats = tmp_path / "nostats.parquet"
    pq.write_table(flat, p_nostats, write_statistics=False)
    with pytest.raises(ValueError, match="no usable"):
        _staged_max_ts([p_nostats], "ts")

    # a truly empty file is fine and alone yields None
    p_empty = tmp_path / "empty.parquet"
    pq.write_table(flat.slice(0, 0), p_empty)
    assert _staged_max_ts([p_empty], "ts") is None

    # missing column → loud failure naming the leaves
    with pytest.raises(ValueError, match="not among parquet leaf"):
        _staged_max_ts([p_nested], "nope")

    # (d, ADVICE r9) an ALL-NULL ts column writes stats with
    # has_min_max=False and null_count == rows: that's a legitimate
    # 'no watermark contribution' batch, NOT a stats-less writer —
    # it must be skipped, not raised on
    allnull = pa.table({"ts": pa.array([None, None], type=pa.timestamp("us"))})
    p_allnull = tmp_path / "allnull.parquet"
    pq.write_table(allnull, p_allnull)
    assert _staged_max_ts([p_allnull], "ts") is None
    # and alongside a real batch it simply doesn't move the max
    assert _staged_max_ts([p_allnull, p_nested], "ts") == ts[1]

    # (e, ADVICE r10) an all-null NESTED leaf: the leaf's value count
    # differs from num_rows (2 rows, 3 leaf values here), so all-null
    # accounting must compare null_count to the CHUNK's num_values —
    # rows-based accounting would mis-raise on this legitimate batch
    allnull_nested = pa.table(
        {
            "ts": pa.array(
                [[None, None], [None]], type=pa.list_(pa.timestamp("us"))
            )
        }
    )
    p_allnull_nested = tmp_path / "allnull_nested.parquet"
    pq.write_table(allnull_nested, p_allnull_nested)
    assert _staged_max_ts([p_allnull_nested], "ts.list.element") is None


def test_await_drained_raises_on_overrun_and_stops_the_query(spark):
    """r16: a bounded drain that outlives its budget must FAIL, not read a
    partial sink. The pre-r16 helpers ignored awaitTermination's False
    return; at sf10 the outer-join drain passes the old 120 s budget and
    the memory sink silently held a truncated table while the leaked
    query kept running. A rate stream never terminates — the guard must
    stop it and raise."""
    import pytest

    from cta_train_tracker_analytics_spark.streaming.pipelines import (
        _drain_timeout,
        await_drained,
    )

    q = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream.format("memory").queryName("t_drain_overrun")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        with pytest.raises(RuntimeError, match="still running"):
            await_drained(q, timeout_sec=2)
        assert not q.isActive  # the guard stopped the leaked query
    finally:
        if q.isActive:
            q.stop()

    # budget resolution: explicit arg wins; env var overrides the default
    import os

    assert _drain_timeout(7) == 7
    old = os.environ.get("SPARK_GRAFT_STREAM_DRAIN_SEC")
    try:
        os.environ["SPARK_GRAFT_STREAM_DRAIN_SEC"] = "1234"
        assert _drain_timeout(None) == 1234
        del os.environ["SPARK_GRAFT_STREAM_DRAIN_SEC"]
        assert _drain_timeout(None) == 600
    finally:
        if old is not None:
            os.environ["SPARK_GRAFT_STREAM_DRAIN_SEC"] = old


def test_rocksdb_engagement_check_recognizes_all_commit_modes(tmp_path):
    """Bounded repro of the r16 false-raise (PLANS.md 'Changelog-
    checkpointing follow-up'): under changelogCheckpointing RocksDB
    commits <version>.changelog files — no zips in a short bounded run —
    and the pre-r17 zip-only check raised "zips=0, deltas=0". The check
    must accept BOTH RocksDB commit modes and still reject HDFS-provider
    state files."""
    import pytest

    from cta_train_tracker_analytics_spark.streaming.pipelines import (
        assert_rocksdb_engaged,
    )

    def state(name: str, files: list[str]):
        d = tmp_path / name / "state" / "0" / "0"
        d.mkdir(parents=True)
        for f in files:
            (d / f).touch()
        return tmp_path / name / "state"

    # default mode: zip snapshots per commit
    counts = assert_rocksdb_engaged(state("zip_mode", ["1.zip", "2.zip"]))
    assert counts == {"zips": 2, "changelogs": 0, "deltas": 0}
    # changelog mode: per-commit deltas, zip snapshots deferred (absent)
    counts = assert_rocksdb_engaged(
        state("changelog_mode", ["1.changelog", "2.changelog"])
    )
    assert counts == {"zips": 0, "changelogs": 2, "deltas": 0}
    # mixed: background maintenance uploaded a snapshot mid-run
    counts = assert_rocksdb_engaged(state("mixed", ["1.changelog", "2.zip"]))
    assert counts["zips"] == 1 and counts["changelogs"] == 1
    # HDFS provider fallback: .delta files → must raise
    with pytest.raises(RuntimeError, match="did not engage"):
        assert_rocksdb_engaged(state("hdfs", ["1.delta", "2.snapshot"]))
    # empty state dir → must raise
    with pytest.raises(RuntimeError, match="did not engage"):
        assert_rocksdb_engaged(state("empty", []))
