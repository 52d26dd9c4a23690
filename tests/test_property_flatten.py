"""Property-based test for the flatten chain: random CTA documents (trains
with arbitrary/missing fields, empty train lists, multiple routes) compared
against a direct Python re-implementation of the reference's handler loop
(get_train_status.py:104-122 semantics: route[0] only, one output row per
train, 6 projected fields + 2 derived)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.operators.flatten import flatten_positions
from cta_train_tracker_analytics_spark.sources import fixtures

field_text = st.one_of(st.none(), st.text(alphabet="abcXYZ0189 :-", max_size=12))

train_st = st.fixed_dictionaries(
    {
        "rn": field_text,
        "trDr": field_text,
        "destNm": field_text,
        "nextStaNm": field_text,
        "prdt": field_text,
        "arrT": field_text,
        "isApp": field_text,
        "isDly": field_text,
    }
)

doc_st = st.fixed_dictionaries(
    {
        "ctatt": st.fixed_dictionaries(
            {
                "tmst": st.just("t"),
                "errCd": st.just("0"),
                "errNm": st.just("null"),
                "route": st.lists(
                    st.fixed_dictionaries(
                        {"@name": st.just("purple"),
                         "train": st.lists(train_st, max_size=4)}
                    ),
                    min_size=1,
                    max_size=2,
                ),
            }
        )
    }
)

DATE, TS, LINE = fixtures.OBSERVED_DATE, fixtures.OBSERVED_TS, "Purple"


def reference_flatten(doc: dict) -> list[tuple]:
    """Literal port of the reference loop's semantics for comparison."""
    out = []
    trains = doc["ctatt"]["route"][0].get("train") or []
    for t in trains:
        def s(v):  # concat_ws treats NULL as empty; projection keeps None
            return "" if v is None else v
        train_id = f"{DATE}#{LINE}#{s(t['rn'])}#{s(t['trDr'])}"
        out.append(
            (train_id, TS, t["prdt"], t["destNm"], t["nextStaNm"],
             t["arrT"], t["isApp"], t["isDly"])
        )
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(doc_st, min_size=0, max_size=3))
def test_flatten_matches_reference_loop(spark, docs):
    def keyfn(row):
        return tuple((v is None, v or "") for v in row)

    if docs:
        df = flatten_positions(
            fixtures.response_df(spark, docs, train_line=LINE),
            observed_date=F.lit(DATE),
            observed_ts=F.lit(TS),
        )
        got = sorted((tuple(r) for r in df.collect()), key=keyfn)
    else:
        got = []
    expected = sorted(
        (row for d in docs for row in reference_flatten(d)), key=keyfn
    )
    assert got == expected
