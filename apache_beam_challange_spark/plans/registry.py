"""Named-query registry: the driver-facing catalog of everything the engine
implements (SURVEY.md §2 inventory), each with an optional DuckDB oracle twin.

Importing :mod:`apache_beam_challange_spark.plans.canonical` (and sibling
modules) populates the registry via the :func:`query` decorator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is ANSI SQL DuckDB runs on the same
    parquet tables. Queries without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so the registry is fully populated."""
    for mod in ("canonical", "coverage", "extensions", "media", "stream", "advanced"):
        __import__(f"apache_beam_challange_spark.plans.{mod}")
