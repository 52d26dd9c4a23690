"""Explicit schemas — the engine never infers schemas in production paths.

The reference parses dynamically (``bucket_raw_data.py:49-51``,
``get_train_status.py:97-98``) and infers its Parquet schema from data
(``bucket_raw_data.py:58``). We deviate deliberately (SURVEY.md §1.3): declared
``StructType`` on every read; FAILFAST where the reference raises.

Wire shapes come from the reference fixtures
(``tests/helper_files/mock_train_location_response.py:1-31``): every leaf is a
string — booleans as "0"/"1", coordinates as strings, timestamps as zoneless
ISO-8601 America/Chicago local.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: All 15 wire fields of one train position record
#: (mock_train_location_response.py:11-25).
TRAIN_WIRE_FIELDS = [
    "rn",
    "destSt",
    "destNm",
    "trDr",
    "nextStaId",
    "nextStpId",
    "nextStaNm",
    "prdt",
    "arrT",
    "isApp",
    "isDly",
    "flags",
    "lat",
    "lon",
    "heading",
]

TRAIN_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType()) for f in TRAIN_WIRE_FIELDS]
)

#: Nested CTA Train Locations API document: ctatt → route[] → train[]
#: (get_train_status.py:104-106).
CTA_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "ctatt",
            T.StructType(
                [
                    T.StructField("tmst", T.StringType()),
                    T.StructField("errCd", T.StringType()),
                    T.StructField("errNm", T.StringType()),
                    T.StructField(
                        "route",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("@name", T.StringType()),
                                    T.StructField(
                                        "train", T.ArrayType(TRAIN_SCHEMA)
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

#: Fan-out trigger message {train_line_abbrev, train_line}
#: (write_train_lines.py:88-91; consumed get_train_status.py:96-98).
TRIGGER_SCHEMA = T.StructType(
    [
        T.StructField("train_line_abbrev", T.StringType()),
        T.StructField("train_line", T.StringType()),
    ]
)

#: Curated 8-column flat fact record, wire-fidelity string types
#: (built at get_train_status.py:110-122; golden row
#: tests/unit/test_get_train_status.py:342-353).
TRAIN_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("train_id", T.StringType()),
        T.StructField("current_timestamp", T.StringType()),
        T.StructField("prediction_generated_timestamp", T.StringType()),
        T.StructField("destination_station", T.StringType()),
        T.StructField("next_station", T.StringType()),
        T.StructField("next_station_arrival_time", T.StringType()),
        T.StructField("is_approaching_station", T.StringType()),
        T.StructField("is_train_delayed", T.StringType()),
    ]
)

#: The engine's one static dimension: 7 train lines, abbrev → full name
#: (write_train_lines.py:25-33). Always broadcast.
TRAIN_LINES = [
    ("Red", "Red"),
    ("Blue", "Blue"),
    ("Brn", "Brown"),
    ("G", "Green"),
    ("Org", "Orange"),
    ("P", "Purple"),
    ("Pink", "Pink"),
]

TRAIN_LINES_SCHEMA = T.StructType(
    [
        T.StructField("train_line_abbrev", T.StringType(), False),
        T.StructField("train_line", T.StringType(), False),
    ]
)


def train_lines_df(spark):
    """7-row broadcastable line dimension (write_train_lines.py:25-33)."""
    return spark.createDataFrame(TRAIN_LINES, TRAIN_LINES_SCHEMA)
