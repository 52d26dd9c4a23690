"""The reference's core ingest dataflow as a declarative Spark plan.

Reference: ``lambdas/get_train_status/get_train_status.py:82-138`` — an
imperative loop that navigates ``ctatt → route[0] → train[]``, flattens each
train into an 8-field record, derives a composite key and an observation
timestamp, and JSONL-encodes it. Here the whole handler body is one
``select``/``explode`` chain Catalyst can prune and push down.

Semantics preserved (SURVEY.md §2.2):
- ``nav_struct``    — null-tolerant ``ctatt.route`` navigation (ref :104)
- ``arr_element``   — first route element (ref :106, ``route[0]``)
- ``explode_trains``— one output row per train (ref :110); an empty/missing
  ``train`` array yields zero rows, matching the reference's 204 no-op path
  (ref :107,124-129)
- ``proj_flatten``  — 6 of 15 wire fields projected + renamed, 2 derived
  columns (ref :110-122); the other 9 wire fields are never read, so
  Catalyst column-prunes them out of the scan (``proj_drop``)
- ``filter_required`` / fail-fast — missing trigger params raise
  (ref :99-100); missing ``route`` raises (ref :130-133), reproduced with
  ``raise_error`` guarded behind a flag so the lenient path stays
  pushdown-friendly.

Derivations (ref :113-114):
- ``train_id = date#line#rn#trDr``
- ``current_timestamp`` = observation wall-clock in America/Chicago, ISO.
  Injectable as a literal for deterministic tests (the reference pins it by
  mocking ``datetime.now``; golden row
  ``tests/unit/test_get_train_status.py:342-353``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import composite_key
from ..session import CHICAGO_TZ

__all__ = ["flatten_positions", "require_trigger_params", "chicago_now"]

#: wire field → curated column (get_train_status.py:115-120)
_RENAMES = {
    "prdt": "prediction_generated_timestamp",
    "destNm": "destination_station",
    "nextStaNm": "next_station",
    "arrT": "next_station_arrival_time",
    "isApp": "is_approaching_station",
    "isDly": "is_train_delayed",
}


def chicago_now() -> tuple[Column, Column]:
    """(date 'yyyy-MM-dd', ISO timestamp) pair in America/Chicago —
    reference ``get_train_status.py:91-94``. Explicit ``convert_timezone``
    so correctness never depends on the session timezone."""
    now_ct = F.convert_timezone(F.lit("UTC"), F.lit(CHICAGO_TZ), F.now())
    return (
        F.date_format(now_ct, "yyyy-MM-dd"),
        F.date_format(now_ct, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
    )


def require_trigger_params(df: DataFrame) -> DataFrame:
    """Fail-fast on missing trigger params — reference raises ValueError when
    ``train_line_abbrev``/``train_line`` are absent (get_train_status.py:99-100).
    ``raise_error`` fires at evaluation time, matching the reference's
    runtime (not plan-time) failure."""
    checks = []
    for c in ("train_line_abbrev", "train_line"):
        checks.append(
            F.when(
                F.col(c).isNull() | (F.col(c) == ""),
                F.raise_error(
                    F.lit(f"Missing required parameter {c} in SQS message")
                ),
            ).otherwise(F.col(c)).alias(c)
        )
    others = [F.col(c) for c in df.columns if c not in ("train_line_abbrev", "train_line")]
    return df.select(*checks, *others)


def flatten_positions(
    responses: DataFrame,
    *,
    observed_date: Column | None = None,
    observed_ts: Column | None = None,
    require_route: bool = True,
) -> DataFrame:
    """Nested CTA API documents → 8-column curated ``train_status`` records.

    ``responses`` must carry ``ctatt`` (CTA_RESPONSE_SCHEMA) and a
    ``train_line`` column (from the trigger message / line dimension).

    One declarative chain: navigate → first route → explode trains →
    project/rename → derive key + observation time. Fully
    whole-stage-codegen'd; zero Python UDFs.
    """
    if observed_date is None or observed_ts is None:
        d, t = chicago_now()
        observed_date = observed_date if observed_date is not None else d
        observed_ts = observed_ts if observed_ts is not None else t

    route = F.col("ctatt.route")
    if require_route:
        # Reference raises KeyError when `route` is absent — a falsy check,
        # so an empty route list also raises (get_train_status.py:104,130-133).
        route = F.when(
            route.isNull() | (F.size(route) == 0),
            F.raise_error(F.lit("No route object found in API response")),
        ).otherwise(route)

    # route[0], ref :106 — try_element_at, not element_at: under ANSI mode
    # element_at(empty_array, 1) throws, but the lenient path
    # (require_route=False) must map an empty route to zero rows (the 204
    # no-op, ref :107,124-129). try_ yields NULL → explode emits nothing.
    first_route = F.try_element_at(route, F.lit(1))

    exploded = (
        responses.withColumn("__route", first_route)
        # explode == zero rows for empty/null arrays: the 204 no-op path
        # (ref :107,124-129) falls out of the operator semantics.
        .withColumn("train", F.explode(F.col("__route.train")))
    )

    return exploded.select(
        composite_key(
            observed_date,
            F.col("train_line"),
            F.col("train.rn"),
            F.col("train.trDr"),
        ).alias("train_id"),
        observed_ts.alias("current_timestamp"),
        F.col("train.prdt").alias(_RENAMES["prdt"]),
        F.col("train.destNm").alias(_RENAMES["destNm"]),
        F.col("train.nextStaNm").alias(_RENAMES["nextStaNm"]),
        F.col("train.arrT").alias(_RENAMES["arrT"]),
        F.col("train.isApp").alias(_RENAMES["isApp"]),
        F.col("train.isDly").alias(_RENAMES["isDly"]),
    )
