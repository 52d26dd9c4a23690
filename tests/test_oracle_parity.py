"""Local mirror of the driver's correctness gate: run every registered query
on Spark AND its DuckDB oracle on the same parquet tables, then compare
row count + column names + order-insensitive canonicalized values.

This is deliberately *stricter* than close-enough: values are compared as
canonical strings (floats at full repr precision post-round), because the
driver hashes values — a one-ulp float difference is a failed hash.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest

import __spark_entry__ as entrymod

from conftest import SF_DIR

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


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
        # date-at-midnight and date compare equal
        if v.hour == v.minute == v.second == 0 and getattr(v, "microsecond", 0) == 0:
            return v.strftime("%Y-%m-%d")
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract: query must run and return a stable schema
        assert spark_df is not None
        return
    oracle_df = duck.execute(ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
