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
) -> DataFrame:
    """Full-outer equi-join with zero-fill of absent sides — the semantics of
    the reference's tuple-CoGroupByKey + ``CalculateDistanceAllRides`` DoFn
    (``pipelines/total_distance.py:14-29,121-124``), which emits 0 for any
    missing/non-numeric side. Join keys are coalesced across sides; ``fill``
    maps value-column -> default."""
    joined = left.join(right, on=list(on), how="full_outer")
    out = joined
    for col_name, default in fill.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
    return out
