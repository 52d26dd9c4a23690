"""Fixture CTA API documents — the reference's golden test inputs
(FIXTURES.md; tests/helper_files/mock_train_location_response*.py) rebuilt
as data, used by the fixture-backed REST source and the §2.2 projection
queries. The live ``src_rest_api`` poll is a driver-side HTTP fetch feeding
``spark.createDataFrame`` (or a Spark 4 Python DataSource); in this
offline environment the fixture IS the source.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CTA_RESPONSE_SCHEMA

#: Fixed observation instant (the reference pins datetime.now in tests;
#: golden row tests/unit/test_get_train_status.py:342-353).
OBSERVED_DATE = "2025-06-25"
OBSERVED_TS = "2025-06-25T10:30:25.000045-05:00"

#: Golden happy-path document: one route, two trains (first train carries the
#: reference's golden values, FIXTURES.md §1).
HAPPY_DOC = {
    "ctatt": {
        "tmst": "2025-06-20T12:43:12",
        "errCd": "0",
        "errNm": "null",
        "route": [
            {
                "@name": "purple",
                "train": [
                    {
                        "rn": "110", "destSt": "30077", "destNm": "Forest Park",
                        "trDr": "5", "nextStaId": "40060", "nextStpId": "30013",
                        "nextStaNm": "Belmont", "prdt": "2025-06-20T12:42:56",
                        "arrT": "2025-06-20T12:43:56", "isApp": "1", "isDly": "0",
                        "flags": "null", "lat": "41.94644", "lon": "-87.71833",
                        "heading": "142",
                    },
                    {
                        "rn": "217", "destSt": "30203", "destNm": "Linden",
                        "trDr": "1", "nextStaId": "40520", "nextStpId": "30101",
                        "nextStaNm": "Noyes", "prdt": "2025-06-20T12:41:10",
                        "arrT": "2025-06-20T12:44:30", "isApp": "0", "isDly": "1",
                        "flags": "null", "lat": "42.05416", "lon": "-87.68356",
                        "heading": "355",
                    },
                ],
            }
        ],
    }
}

#: Variant: route present, train list empty → zero output rows (204 no-op
#: path, mock_train_location_response_no_trains.py).
NO_TRAINS_DOC = {
    "ctatt": {
        "tmst": "2025-06-20T12:43:12",
        "errCd": "0",
        "errNm": "null",
        "route": [{"@name": "purple", "train": []}],
    }
}

#: Variant: ctatt lacks route entirely → fail path
#: (mock_train_location_response_no_route_object.py).
NO_ROUTE_DOC = {
    "ctatt": {"tmst": "2025-06-20T12:43:12", "errCd": "0", "errNm": "null"}
}


def response_df(spark: SparkSession, docs: list[dict], train_line: str = "Purple") -> DataFrame:
    """Fixture API responses as a typed DataFrame: JSON text → explicit
    CTA_RESPONSE_SCHEMA parse, plus the trigger-message ``train_line``."""
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "body string"
    )
    return raw.select(
        F.from_json("body", CTA_RESPONSE_SCHEMA).getField("ctatt").alias("ctatt"),
        F.lit(train_line).alias("train_line"),
    )
