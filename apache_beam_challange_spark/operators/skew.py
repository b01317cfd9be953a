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
    if salt_col in keys:
        # salting BY a grouping key gives every row of a hot key the same
        # salt — zero mitigation for the price of two phases (the twin
        # guard salted_join already raises; found by review)
        raise ValueError(
            f"salt_col {salt_col!r} is one of the grouping keys — salting "
            "by a key does not split it; salt by a high-cardinality "
            "non-key column"
        )
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(*keys).agg(F.sum("__partial").cast("long").alias(alias))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join for when the DIM side is too big to broadcast
    and the fact side has hot join keys: the fact side gets a deterministic
    salt (hash of ``salt_col`` mod ``n_salts``), the dim side is replicated
    ``n_salts`` times (one row per salt via a small explode), and the join
    runs on (keys..., salt) — the hot key's rows spread over ``n_salts``
    reducers instead of stalling one.

    Identical rows to ``fact.join(dim, on, how)``; cost is dim × n_salts
    shuffle volume, the standard trade. AQE's runtime skew-join splitting
    (enabled session-wide) is the no-plan-change alternative; this is the
    explicit shape for engines/pipelines that need it deterministic.
    ``how`` supports the fact-preserving joins (``inner``/``left``)."""
    if n_salts < 1:
        raise ValueError(f"salted_join needs n_salts >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_col in on:
        # Salting by a join key sends every row of a hot key to ONE salt:
        # no spreading, dim still replicated n_salts times (pure overhead).
        raise ValueError(
            f"salt_col {salt_col!r} is a join key; use a row-unique column "
            "(e.g. the fact table's primary key) so hot keys spread"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return salted_fact.join(replicated_dim, [*on, "__salt"], how).drop("__salt")
