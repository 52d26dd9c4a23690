"""Scalar functions (SURVEY.md §2.8) — the reference's row-level transforms
re-expressed as native, codegen-friendly column expressions. Zero Python UDFs.

Reference anchors:
- composite key ``f'{date}#{line}#{rn}#{trDr}'``  (get_train_status.py:113)
- ``%Y-%m-%d`` / ISO formatting                   (get_train_status.py:93-94)
- America/Chicago wall clock                      (get_train_status.py:91-92)
- yesterday arithmetic                            (bucket_raw_data.py:84-85)
- ``{:02d}`` zero-padding for raw-zone paths      (bucket_raw_data.py:93)
- dict → JSONL record with UTF-8 encode           (get_train_status.py:46-49)
- JSON body parse                                 (get_train_status.py:97-98)
- 7-entry abbrev→name map lookup                  (write_train_lines.py:25-33)
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..session import CHICAGO_TZ

__all__ = [
    "composite_key",
    "fmt_date",
    "fmt_iso_ts",
    "now_chicago",
    "yesterday",
    "zero_pad",
    "to_jsonl_record",
    "parse_json",
    "map_lookup",
    "cast_flag_bool",
    "parse_wire_ts",
    "ts_diff_seconds",
    "haversine_km",
]


def composite_key(*parts: Column | str, sep: str = "#") -> Column:
    """``date#line#rn#trDr``-style key (get_train_status.py:113).

    NULL parts become empty segments with separators KEPT — bare concat_ws
    drops null parts *and their separators*, silently shifting key arity
    (``d#line`` vs ``d#line##``), which corrupts any downstream equi-join on
    the key. Found by the flatten property fuzzer."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws(sep, *[F.coalesce(c.cast("string"), F.lit("")) for c in cols])


def fmt_date(col: Column) -> Column:
    """``%Y-%m-%d`` (get_train_status.py:93)."""
    return F.date_format(col, "yyyy-MM-dd")


def fmt_iso_ts(col: Column) -> Column:
    """Zoneless ISO-8601 second-resolution text — the wire timestamp shape
    (``"2025-06-20T12:42:56"``, mock_train_location_response.py:18-19)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")


def now_chicago() -> Column:
    """Current wall-clock in America/Chicago (get_train_status.py:91-92) —
    explicit conversion, independent of session timezone."""
    return F.convert_timezone(F.lit("UTC"), F.lit(CHICAGO_TZ), F.now())


def yesterday(col: Column | None = None) -> Column:
    """Previous calendar day (bucket_raw_data.py:84-85)."""
    return F.date_sub(F.to_date(col) if col is not None else F.current_date(), 1)


def zero_pad(col: Column, width: int = 2) -> Column:
    """``{:02d}``-style padding for date-path components
    (bucket_raw_data.py:93)."""
    return F.lpad(col.cast("string"), width, "0")


def to_jsonl_record(*cols: str) -> Column:
    """Row → compact JSON text, the JSONL wire record
    (get_train_status.py:46-49). The trailing newline and UTF-8 encode are
    owned by the JSON file sink; ``encode(..., 'UTF-8')`` reproduces the
    byte view when needed."""
    return F.to_json(F.struct(*cols))


def parse_json(col: Column, schema) -> Column:
    """JSON text → typed struct with an explicit schema
    (get_train_status.py:97-98 / bucket_raw_data.py:51)."""
    return F.from_json(col, schema)


def map_lookup(mapping: Mapping[str, str], key: Column) -> Column:
    """Static map lookup via a literal MapType expression
    (write_train_lines.py:25-33,86). For anything bigger than a few entries
    prefer a broadcast-join against a dimension DataFrame."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend((F.lit(k), F.lit(v)))
    return F.create_map(*pairs)[key]


def cast_flag_bool(col: Column) -> Column:
    """Wire ``"0"/"1"`` flag → boolean (``isApp``/``isDly``,
    mock_train_location_response.py:20-22)."""
    return col.cast("int").cast("boolean")


def parse_wire_ts(col: Column) -> Column:
    """Zoneless wire timestamp text → TIMESTAMP_NTZ (wall-clock fidelity;
    the wire is America/Chicago local without an offset)."""
    return F.to_timestamp_ntz(col, F.lit("yyyy-MM-dd'T'HH:mm:ss"))


def ts_diff_seconds(later: Column, earlier: Column) -> Column:
    """Prediction horizon ``arrT − prdt`` in seconds (SURVEY.md §2.8
    ``f_ts_diff``)."""
    return (
        F.unix_timestamp(later.cast("timestamp"))
        - F.unix_timestamp(earlier.cast("timestamp"))
    ).cast("bigint")


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km from the wire ``lat``/``lon`` fields the
    reference drops (mock_train_location_response.py:23-24) — pure column
    math, fully codegen'd."""
    r = 6371.0
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))
