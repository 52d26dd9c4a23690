"""Registry wiring operator implementations to the driver contract.

Each entry registers a callable ``(spark, sf_dir) -> DataFrame`` plus,
when the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle
SQL. The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value hash, so implementations must be deterministic:
unique sort tiebreakers everywhere order matters, and float outputs
rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query. ``oracle=None`` marks a genuinely
    non-SQL-expressible operator (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect: modules register their queries on first use.
    # ORDER MATTERS: the driver verifies queries in registry-insertion order
    # and has a per-round budget. Round 3's run truncated after ~50 entries,
    # leaving everything late in the order unverified — so the cheap,
    # previously-unverified modules (scalar/relational/streaming) register
    # FIRST and the expensive I/O round-trips and LLM pipelines register
    # last. Do not alphabetize.
    from . import scalar_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import io_queries  # noqa: F401
    from . import llm  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }


def spec(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
