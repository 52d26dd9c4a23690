"""Unit tests for the ingest flatten chain — ports of the reference's test
pyramid fixtures (SURVEY.md §5; FIXTURES.md): golden end-to-end record,
no-trains 204 path, no-route fail path, missing-trigger-param fail path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from cta_train_tracker_analytics_spark.operators.flatten import (
    flatten_positions,
    require_trigger_params,
)
from cta_train_tracker_analytics_spark.schemas import TRIGGER_SCHEMA
from cta_train_tracker_analytics_spark.sources import fixtures


def _flat(spark, docs, **kw):
    return flatten_positions(
        fixtures.response_df(spark, docs),
        observed_date=F.lit(fixtures.OBSERVED_DATE),
        observed_ts=F.lit(fixtures.OBSERVED_TS),
        **kw,
    )


def test_golden_row(spark):
    """Exact 8-field output row — mirrors the reference's golden assert
    (tests/unit/test_get_train_status.py:342-353)."""
    rows = {r["train_id"]: r.asDict() for r in _flat(spark, [fixtures.HAPPY_DOC]).collect()}
    golden = rows["2025-06-25#Purple#110#5"]
    assert golden == {
        "train_id": "2025-06-25#Purple#110#5",
        "current_timestamp": "2025-06-25T10:30:25.000045-05:00",
        "prediction_generated_timestamp": "2025-06-20T12:42:56",
        "destination_station": "Forest Park",
        "next_station": "Belmont",
        "next_station_arrival_time": "2025-06-20T12:43:56",
        "is_approaching_station": "1",
        "is_train_delayed": "0",
    }
    assert len(rows) == 2


def test_no_trains_yields_zero_rows(spark):
    """Empty train array → 204 no-op: zero output rows
    (mock_train_location_response_no_trains.py)."""
    assert _flat(spark, [fixtures.NO_TRAINS_DOC]).count() == 0


def test_no_route_raises(spark):
    """Missing route → failure, matching the reference's KeyError
    (get_train_status.py:130-133)."""
    with pytest.raises(Exception, match="No route object"):
        _flat(spark, [fixtures.NO_ROUTE_DOC]).collect()


def test_empty_route_array_raises(spark):
    """Empty route LIST also raises — the reference uses a falsy check
    (get_train_status.py:104), so [] fails like None (round-2 fix)."""
    doc = {"ctatt": {"tmst": "t", "errCd": "0", "errNm": "null", "route": []}}
    with pytest.raises(Exception, match="No route object"):
        _flat(spark, [doc]).collect()


def test_lenient_mode_skips_broken_docs(spark):
    """require_route=False: broken docs contribute zero rows instead of
    failing the batch."""
    df = _flat(
        spark,
        [fixtures.HAPPY_DOC, fixtures.NO_ROUTE_DOC, fixtures.NO_TRAINS_DOC],
        require_route=False,
    )
    assert df.count() == 2


def test_missing_trigger_param_raises(spark):
    """Missing train_line_abbrev/train_line → error at evaluation, matching
    the reference's ValueError (get_train_status.py:99-100)."""
    msgs = spark.createDataFrame([(None, "Purple")], TRIGGER_SCHEMA)
    with pytest.raises(Exception, match="Missing required parameter"):
        require_trigger_params(msgs).collect()
