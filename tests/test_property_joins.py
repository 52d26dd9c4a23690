"""Property-based tests (hypothesis) for the hand-built join operators —
the two places where we implement semantics Spark SQL lacks natively, so a
reference implementation comparison is the strongest correctness evidence.

asof_join is checked against pandas.merge_asof (backward,
allow_exact_matches) per key; range_join against a brute-force pandas
filter. Small random instances, fixed deadline off (Spark latency)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.operators.joins import asof_join, range_join

KEYS = ["a", "b", "c"]

events = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=25,
)


def _dedup_right(rows):
    """One right row per (k, ts): keep max payload — mirrors the production
    dedup that makes as-of ties well-defined."""
    best = {}
    for k, ts, v in rows:
        if (k, ts) not in best or v > best[(k, ts)]:
            best[(k, ts)] = v
    return [(k, ts, v) for (k, ts), v in best.items()]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=events, right=events)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    right = _dedup_right(right)
    ldf = spark.createDataFrame(
        [Row(k=k, ts=ts, lv=v) for k, ts, v in left], "k string, ts long, lv long"
    )
    rdf = spark.createDataFrame(
        [Row(k=k, ts=ts, rv=v) for k, ts, v in right], "k string, ts long, rv long"
    )
    out = asof_join(ldf, rdf, by=["k"], left_ts="ts", right_ts="ts").toPandas()

    lp = pd.DataFrame(left, columns=["k", "ts", "lv"]).sort_values(["ts", "k", "lv"])
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values(["ts", "k", "rv"])
    if len(lp) and len(rp):
        expected = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
        )
    else:
        expected = lp.assign(rv=pd.NA)

    def canon(df):
        return sorted(
            (r.k, r.ts, r.lv, None if pd.isna(r.rv) else int(r.rv))
            for r in df.itertuples()
        )

    assert canon(out[["k", "ts", "lv", "rv"]]) == canon(expected[["k", "ts", "lv", "rv"]])


intervals_st = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=40),   # lo
        st.integers(min_value=0, max_value=20),   # width
        st.integers(min_value=0, max_value=1000), # interval id-ish payload
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(points=events, intervals=intervals_st)
def test_range_join_matches_bruteforce(spark, points, intervals):
    pdf = spark.createDataFrame(
        [Row(k=k, pts=ts, pv=v) for k, ts, v in points],
        "k string, pts long, pv long",
    )
    idf = spark.createDataFrame(
        [Row(k=k, lo=lo, hi=lo + w, iv=v) for k, lo, w, v in intervals],
        "k string, lo long, hi long, iv long",
    )
    out = range_join(
        pdf, idf, by=["k"], point_ts="pts",
        lo=F.col("lo"), hi=F.col("hi"), bucket_seconds=7,
    ).toPandas()

    expected = sorted(
        (k1, lo, lo + w, iv, ts, pv)
        for (k1, lo, w, iv) in intervals
        for (k2, ts, pv) in points
        if k1 == k2 and lo < ts <= lo + w
    )
    got = sorted(
        (r.k, r.lo, r.hi, r.iv, r.pts, r.pv) for r in out.itertuples()
    )
    assert got == expected
