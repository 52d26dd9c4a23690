#!/usr/bin/env python
"""Phase-level profile of the streaming tier (r19, guide §1: measure first).

Instruments the streaming helpers (parquet_stream / run_to_memory /
run_to_files) with timing wrappers, runs each str_* query once, and prints
a per-query phase breakdown:

- stage_write   : parquet source staging (coalesce(1) write jobs)
- stage_count   : the row-count read used by the adaptive state width
- drain         : streaming query start -> terminated (per run_to_* call)
- batches       : per-micro-batch durationMs from the query's progress
                  events (numInputRows per batch, so no-data batches are
                  visible as 0-row entries)
- other         : everything else in the query function (plan build,
                  scratch rmtree, sink read-back, batch read-back...)

Usage: python scripts/stream_profile.py [query ...]   (default: whole tier)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cta_train_tracker_analytics_spark.session import get_spark  # noqa: E402
from cta_train_tracker_analytics_spark.streaming import pipelines  # noqa: E402
from cta_train_tracker_analytics_spark.plans import (  # noqa: E402
    registry,
    streaming_queries,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Phases:
    def __init__(self):
        self.rows = []

    def add(self, kind: str, sec: float, extra=None):
        self.rows.append({"kind": kind, "sec": round(sec, 3), "extra": extra})


PH = Phases()

_orig_parquet_stream = pipelines.parquet_stream
_orig_run_to_memory = pipelines.run_to_memory
_orig_run_to_files = pipelines.run_to_files
_orig_await = pipelines.await_drained


def parquet_stream(spark, df, source_dir, single_file=True):
    t0 = time.perf_counter()
    writer = df.coalesce(1) if single_file else df
    writer.write.mode("overwrite").parquet(source_dir)
    t1 = time.perf_counter()
    PH.add("stage_write", t1 - t0)
    n = spark.read.parquet(source_dir).count()
    t2 = time.perf_counter()
    PH.add("stage_count", t2 - t1, {"rows": n})
    pipelines.note_stream_volume(n)
    return spark.readStream.schema(df.schema).parquet(source_dir)


def _progress_of(q):
    out = []
    for p in q.recentProgress:
        d = p.get("durationMs", {})
        out.append(
            {
                "batch": p.get("batchId"),
                "rows": p.get("numInputRows"),
                "total_ms": d.get("triggerExecution"),
                "addBatch_ms": d.get("addBatch"),
                "getBatch_ms": d.get("getBatch"),
                "latestOffset_ms": d.get("latestOffset"),
                "walCommit_ms": d.get("walCommit"),
                "commitOffsets_ms": d.get("commitOffsets"),
                "stateOps": [
                    {
                        "commit_ms": so.get("commitTimeMs"),
                        "rows": so.get("numRowsTotal"),
                        "mem": so.get("memoryUsedBytes"),
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
        )
    return out


def run_to_memory(sdf, output_mode, checkpoint_dir, timeout_sec=None):
    import uuid

    name = f"mem_{uuid.uuid4().hex[:12]}"
    t0 = time.perf_counter()
    with pipelines.scoped_state_partitions(sdf.sparkSession):
        ts = time.perf_counter()
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        t_started = time.perf_counter()
        _orig_await(q, timeout_sec)
        t_done = time.perf_counter()
    PH.add(
        "drain_mem",
        t_done - t0,
        {
            "start_call": round(t_started - ts, 3),
            "await": round(t_done - t_started, 3),
            "width": pipelines.stream_state_partitions(),
            "batches": _progress_of(q),
        },
    )
    return sdf.sparkSession.table(name)


def run_to_files(sdf, out_dir, checkpoint_dir, fmt="json", timeout_sec=None):
    t0 = time.perf_counter()
    with pipelines.scoped_state_partitions(sdf.sparkSession):
        ts = time.perf_counter()
        q = (
            sdf.writeStream.format(fmt)
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        t_started = time.perf_counter()
        _orig_await(q, timeout_sec)
        t_done = time.perf_counter()
    PH.add(
        "drain_files",
        t_done - t0,
        {
            "start_call": round(t_started - ts, 3),
            "await": round(t_done - t_started, 3),
            "width": pipelines.stream_state_partitions(),
            "batches": _progress_of(q),
        },
    )


def main():
    spark = get_spark(app_name="stream-profile")
    from cta_train_tracker_analytics_spark.data import TABLES, load

    load(spark, SF_DIR, "events").count()  # warm footer cache / JVM

    # patch every module-level alias the query functions use
    pipelines.parquet_stream = parquet_stream
    pipelines.run_to_memory = run_to_memory
    pipelines.run_to_files = run_to_files
    streaming_queries.parquet_stream = parquet_stream
    streaming_queries.run_to_memory = run_to_memory
    streaming_queries.run_to_files = run_to_files

    queries = registry.all_queries()
    names = sys.argv[1:] or sorted(
        n for n in queries if n.startswith("str_")
    )
    report = {}
    for name in names:
        PH.rows = []
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = queries[name](spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        phased = sum(r["sec"] for r in PH.rows)
        report[name] = {
            "wall": round(wall, 3),
            "other": round(wall - phased, 3),
            "rows_out": n,
            "phases": PH.rows,
        }
        print(f"# {name}: wall={wall:.3f}s other={wall-phased:.3f}s",
              file=sys.stderr)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
