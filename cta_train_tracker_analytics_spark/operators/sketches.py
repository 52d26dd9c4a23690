"""Bounded-state summary operators for mapInPandas pipelines.

These run INSIDE an Arrow-batched partition iterator, so their contract is:
constant memory regardless of partition size, vectorized per batch (no
per-row Python), and a guaranteed superset property that downstream exact
passes can rely on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def misra_gries_batches(
    batches: Iterator[pd.DataFrame], col: str, k: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries heavy-hitter summary over all Arrow batches of one
    partition: at most ``k`` counters retained; each batch's exact
    ``value_counts`` is merged with the mergeable-summaries trim (add
    counts, subtract the (k+1)-th largest, drop non-positives — Agarwal
    et al., "Mergeable Summaries", PODS'12). Guarantee: every key with
    partition frequency strictly greater than n_p/(k+1) survives; with
    the conventional threshold n_p/k the survivor set is a strict
    superset of the partition's heavy hitters.

    Yields one single-column DataFrame of surviving keys (int64)."""
    counters = pd.Series(dtype="int64")
    for pdf in batches:
        counters = counters.add(pdf[col].value_counts(), fill_value=0)
        if len(counters) > k:
            offset = counters.nlargest(k + 1).iloc[-1]
            counters = counters[counters > offset] - offset
    yield pd.DataFrame({col: counters.index.astype("int64")})
