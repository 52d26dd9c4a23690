"""Query catalog: every SURVEY.md §2 operator as a (Spark query, DuckDB
oracle SQL) pair, keyed by the inventory name. ``__spark_entry__.py``
re-exports this registry to the driver harness."""

from .registry import QuerySpec, all_oracles, all_queries, query  # noqa: F401
