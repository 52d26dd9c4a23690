"""Spark 4 Python DataSource for the CTA Train Locations poll
(``src_rest_api`` — SURVEY.md §2.1, §4 'custom Spark work item 1').

The reference polls one REST endpoint per train line per minute
(``get_train_status.py:29-43``). Expressed as a custom Python data source,
the poll becomes a first-class Spark scan: one input partition per train
line (the reference's 7-way SQS fan-out becomes task parallelism), each
partition fetching its line's payload and yielding (train_line, body) rows
that feed the same parse→flatten chain as every other source.

Offline, the fetcher returns the golden fixture document; a live deployment
replaces ``_fetch`` with the HTTP call (requests + retry/backoff — the
reference's external retry layer maps to task retries + per-call backoff).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from ..schemas import TRAIN_LINES
from . import fixtures

POLL_SCHEMA = T.StructType(
    [
        T.StructField("train_line", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def _fetch(train_line_abbrev: str) -> str:
    """One poll for one line. Fixture-backed here (no network in this
    environment); the live implementation issues the HTTPS request with
    the key from options and backoff on 429/5xx.

    The requested line's abbrev is stamped into the payload's route
    ``@name`` (the real API echoes the requested ``rt`` the same way), so
    per-line partition routing is observable: a bug that crossed payloads
    between line partitions now shows up as a mismatched route name in
    tests instead of being invisible behind identical fixture bodies."""
    doc = json.loads(json.dumps(fixtures.HAPPY_DOC))  # deep copy
    for route in doc["ctatt"].get("route", []):
        route["@name"] = train_line_abbrev.lower()
    return json.dumps(doc)


class _LinePartition(InputPartition):
    def __init__(self, abbrev: str, line: str):
        self.abbrev = abbrev
        self.line = line


class CTATrainLocationsReader(DataSourceReader):
    def partitions(self):
        # one scan partition per train line — the reference's fan-out
        # (write_train_lines.py:86-96) as task parallelism
        return [_LinePartition(a, l) for a, l in TRAIN_LINES]

    def read(self, partition: _LinePartition):
        yield (partition.line, _fetch(partition.abbrev))


class CTATrainLocationsDataSource(DataSource):
    """Usage::

        spark.dataSource.register(CTATrainLocationsDataSource)
        spark.read.format("cta_train_locations").load()
    """

    @classmethod
    def name(cls) -> str:
        return "cta_train_locations"

    def schema(self) -> T.StructType:
        return POLL_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return CTATrainLocationsReader()


# --------------------------------------------------------------------------
# streaming variant: the reference's EventBridge 1-minute poll AS a stream
# --------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

STREAM_POLL_SCHEMA = T.StructType(
    [
        T.StructField("poll_id", T.IntegerType()),
        T.StructField("train_line", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)

#: bounded demo horizon — live deployments poll forever; the fixture source
#: stops advancing its offset after this many polls so availableNow /
#: processAllAvailable drains deterministically.
N_POLLS = 3


class CTATrainLocationsStreamReader(SimpleDataSourceStreamReader):
    """Spark 4 SimpleDataSourceStreamReader: each micro-batch is one poll
    cycle over every train line (the reference's per-minute EventBridge
    tick, get_train_status.py:29-43 — here the trigger interval IS the
    poll cadence). Offsets are the poll counter, so recovery replays
    exact poll ranges via readBetweenOffsets — the checkpointed
    equivalent of the reference's SQS redelivery."""

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _poll_rows(self, poll: int) -> list[tuple]:
        # lists, not generators: the engine pickles prefetched batches for
        # the micro-batch cache and for readBetweenOffsets replay
        return [(poll, line, _fetch(abbrev)) for abbrev, line in TRAIN_LINES]

    def read(self, start: dict):
        # iter(list), not a generator and not a bare list: the engine's
        # prefetch cache calls next() on it, copy.copy()s it for replay,
        # and pickles it — list iterators support all three
        p = start["poll"]
        if p >= N_POLLS:
            return iter([]), start
        return iter(self._poll_rows(p)), {"poll": p + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for p in range(start["poll"], end["poll"]):
            rows.extend(self._poll_rows(p))
        return iter(rows)


class CTATrainLocationsStreamDataSource(DataSource):
    """Usage::

        spark.dataSource.register(CTATrainLocationsStreamDataSource)
        spark.readStream.format("cta_train_locations_stream").load()
    """

    @classmethod
    def name(cls) -> str:
        return "cta_train_locations_stream"

    def schema(self) -> T.StructType:
        return STREAM_POLL_SCHEMA

    def simpleStreamReader(self, schema: T.StructType):
        return CTATrainLocationsStreamReader()
