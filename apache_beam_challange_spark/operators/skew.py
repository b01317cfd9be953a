"""Skew-handling operators (SURVEY.md §7 scale posture).

At 100 TB a handful of hot keys (a viral station pair, one dominant user)
can stall a shuffle: one reducer gets the hot key's entire volume. Two
mitigations, both pure plan shapes:

- :func:`salted_group_count` — two-phase aggregation: explode each key into
  ``n_salts`` sub-keys (random-free: salt = a deterministic hash of a
  high-cardinality column, so the same plan is testable), partially
  aggregate on (key, salt), then re-aggregate on key. The hot key's volume
  spreads over ``n_salts`` reducers in phase 1; phase 2 only merges
  ``n_salts`` partial rows per key. Identical result to a plain groupBy —
  which is exactly what the DuckDB oracle checks.

- AQE skew-join splitting is enabled session-wide
  (``spark.sql.adaptive.skewJoin.enabled``, session.py) and handles skewed
  *joins* at runtime without plan changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_col: str,
    n_salts: int = 16,
    alias: str = "n",
) -> DataFrame:
    """Group-by-count that survives hot keys: pre-aggregate on
    (keys..., hash(salt_col) % n_salts), then merge per key."""
    if n_salts < 1:
        raise ValueError(f"salted_group_count needs n_salts >= 1, got {n_salts}")
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(*keys).agg(F.sum("__partial").cast("long").alias(alias))
