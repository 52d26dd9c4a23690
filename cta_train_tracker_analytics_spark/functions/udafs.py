"""Custom aggregates via Arrow-batched grouped-agg pandas UDFs.

This is the engine's documented seam for aggregates the built-in function
set can't express in one pass (robust statistics, sketches with custom
merge logic, model-scoring reducers). The rules that keep it scale-safe:

- grouped-agg pandas UDFs run as a real partial-less hash aggregate: rows
  shuffle once on the group key, each group's column arrives as ONE Arrow
  batch — memory is bounded by the largest single group, so keys must be
  reasonable-cardinality (user_id, not doc text).
- everything inside the UDF is vectorized numpy/pandas — never per-row
  Python.
- outputs must be cross-engine deterministic if the operator is
  oracle-checked: quantile/order-statistic arithmetic is safe (the result
  is an element or a 2-point interpolation, independent of summation
  order); naive float sums/means across the group are NOT (measured: 2 of
  150 groups flip the 4th decimal vs DuckDB's avg at sf0.01).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def interquartile_median(v: pd.Series) -> float:
    """Median of the interquartile band (values within [q1, q3]) — a
    robust center estimate that needs two passes natively (percentiles,
    then a filtered re-aggregate with a self-join) but one vectorized
    pass here. Linear-interpolation quantiles match DuckDB's
    ``quantile_cont`` bit-for-bit on 2-decimal inputs."""
    q1, q3 = v.quantile([0.25, 0.75])
    return float(v[(v >= q1) & (v <= q3)].quantile(0.5))
