"""Property-based tests (hypothesis) for sessionization and connected
components — random instances checked against trivially-correct pure-Python
references (sort-and-split; union-find). These are the operators whose
failure modes are off-by-one boundaries and propagation bugs that fixed
fixtures rarely hit."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from cta_train_tracker_analytics_spark.operators.dedup import (
    connected_components,
    connected_components_alternating,
)
from cta_train_tracker_analytics_spark.operators.windows import sessionize

# --------------------------------------------------------------- sessions

EPOCH = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2", "u3"]),
        # offsets in seconds; include exact-gap boundaries around 600s
        st.integers(min_value=0, max_value=5000),
    ),
    min_size=1,
    max_size=40,
)


def _reference_sessions(rows, gap_s):
    """Pure-Python: sort per key by (ts, event_id), split when gap > gap_s."""
    by_key: dict[str, list] = {}
    for eid, (k, off) in enumerate(rows):
        by_key.setdefault(k, []).append((off, eid))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        sess = 0
        prev = None
        for off, eid in evs:
            if prev is None or off - prev > gap_s:
                sess += 1
            out[eid] = (k, sess)
            prev = off
    return out


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_sessionize_matches_reference(spark, rows):
    gap_s = 600
    df = spark.createDataFrame(
        [
            Row(k=k, ts=EPOCH + dt.timedelta(seconds=off), event_id=eid)
            for eid, (k, off) in enumerate(rows)
        ],
        "k string, ts timestamp_ntz, event_id long",
    )
    got = {
        r.event_id: (r.k, r.session_no)
        for r in sessionize(
            df, keys=["k"], ts="ts", gap_seconds=gap_s, tiebreak="event_id"
        ).collect()
    }
    want = _reference_sessions(rows, gap_s)
    assert got == want


def test_sessionize_exact_gap_boundary(spark):
    """A gap of exactly gap_seconds does NOT break the session; one
    microsecond more does."""
    rows = [
        Row(k="u", ts=EPOCH, event_id=0),
        Row(k="u", ts=EPOCH + dt.timedelta(seconds=600), event_id=1),
        Row(
            k="u",
            ts=EPOCH + dt.timedelta(seconds=1200, microseconds=1),
            event_id=2,
        ),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, event_id long")
    got = {
        r.event_id: r.session_no
        for r in sessionize(
            df, keys=["k"], ts="ts", gap_seconds=600, tiebreak="event_id"
        ).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2}


# --------------------------------------------------- connected components

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
    ),
    min_size=1,
    max_size=20,
).filter(lambda es: any(a != b for a, b in es))


def _union_find_labels(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every node with its component MINIMUM
    labels = {}
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    for n in parent:
        labels[n] = roots[find(n)]
    return labels


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_cc_both_variants_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(
        [Row(id=a, root=b) for a, b in edges], "id long, root long"
    )
    want = _union_find_labels(edges)
    got_min = {
        r.id: r.label for r in connected_components(df, max_iter=25).collect()
    }
    got_alt = {
        r.id: r.label
        for r in connected_components_alternating(df, max_iter=20).collect()
    }
    assert got_min == want
    assert got_alt == want
