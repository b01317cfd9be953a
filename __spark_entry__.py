"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from apache_beam_challange_spark.plans import registry  # noqa: E402


def _load() -> None:
    registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q4 total-distance) on /root/testdata/sf0.001."""
    _load()
    return registry.QUERIES["q4_total_distance"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2 — the
    curated 50-entry driver tier in priority order (the driver's gate
    evaluates at most the first 50 registry entries; near-duplicate
    variants and deliberately-quadratic baselines live in the extended
    tier, still locally oracle-checked — see plans/registry.py)."""
    return registry.driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-expressible query."""
    return registry.driver_oracles()


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver tier + extended tier (local gate / test surface, not part of
    the driver contract)."""
    return registry.all_queries()


def all_oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
