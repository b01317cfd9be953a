"""Join operators (SURVEY.md §2.3).

The reference hand-rolls both of its joins through single-key
``CoGroupByKey`` — funneling every row through ONE key on ONE worker
(``pipelines/stations.py:68-74``), the repo's biggest scalability flaw. We
replace (not port) that shape with Spark's planner-chosen strategies: a tiny
dimension cross join becomes a *broadcast* nested-loop join (each executor
gets the dim copy; no single-worker funnel), and the composite-key merge
becomes a shuffled/broadcast equi-join. Both scale horizontally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def all_pairs(dim: DataFrame, suffixes: tuple[str, str] = ("_1", "_2")) -> DataFrame:
    """Self cross join producing ALL ordered pairs — self-pairs and both
    orientations kept, faithfully matching the executed Python path of the
    reference (``pipelines/stations.py:68-74`` has no ``!=`` filter, unlike
    its abandoned SQL attempt at ``notebooks/development.ipynb:452-470``).

    ``broadcast(dim)`` on the right side forces BroadcastNestedLoopJoin:
    at 100 TB the dim stays small (stations ~800 rows) so the pair expansion
    is embarrassingly parallel over the left side's partitions.

    Caller contract: ``dim`` must fit in executor memory (it is an O(rows²)
    pair generator either way) — for two LARGE tables use an equi/range
    join or a blocked similarity operator instead, never this.
    """
    a, b = suffixes
    left = dim.select([F.col(c).alias(f"{c}{a}") for c in dim.columns])
    right = dim.select([F.col(c).alias(f"{c}{b}") for c in dim.columns])
    return left.crossJoin(F.broadcast(right))


def full_outer_zero_fill(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    fill: dict[str, float],
    faithful: bool = False,
) -> DataFrame:
    """Full-outer equi-join with zero-fill of absent sides, modeled on the
    reference's tuple-CoGroupByKey + ``CalculateDistanceAllRides`` DoFn
    (``pipelines/total_distance.py:14-29,121-124``). Join keys are coalesced
    across sides; ``fill`` maps value-column -> default.

    Two modes, because the reference DoFn zeroes BOTH outputs whenever
    EITHER side is missing (``total_rides = 0`` even when the ride count
    exists but the distance row doesn't):

    - ``faithful=False`` (engine default): each absent column is filled
      independently, so a real ride count survives a missing distance —
      the more useful semantics, kept as an intentional, documented
      divergence (like Q2's corrected column labels).
    - ``faithful=True``: byte-compatible with the reference — if ANY fill
      column is absent, ALL fill columns become their defaults.
    """
    joined = left.join(right, on=list(on), how="full_outer")
    out = joined
    if faithful:
        any_missing = None
        for col_name in fill:
            miss = F.col(col_name).isNull()
            any_missing = miss if any_missing is None else (any_missing | miss)
        # one projection: sequential withColumn would re-evaluate the
        # missing-check against already-filled columns
        return out.withColumns(
            {
                col_name: F.when(any_missing, F.lit(default)).otherwise(
                    F.col(col_name)
                )
                for col_name, default in fill.items()
            }
        )
    for col_name, default in fill.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
    return out
