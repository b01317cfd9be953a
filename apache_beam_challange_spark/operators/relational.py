"""Core relational operators (SURVEY.md §2.2, §2.4, §2.5).

Each is a pure ``DataFrame -> DataFrame`` function that builds a declarative
plan — Catalyst handles pushdown/pruning/combiner-lifting that the reference
performs manually (or not at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Column projection (reference P1: ``beam.Map(lambda x: (x[a], x[b]))``,
    ``pipelines/cycle_rides.py:50``). Catalyst pushes the pruning into the
    parquet scan's ReadSchema."""
    return df.select(*cols)


def drop_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Keep rows whose (selected) fields are all non-NULL — the reference's
    ``remove_none`` predicate (``pipelines/total_distance.py:55-57``, applied
    at ``:98`` and ``:115``). Applied *before* any shuffle so the filter is
    pushed toward the scan."""
    return df.na.drop("any", subset=list(subset) if subset else None)


def group_count(df: DataFrame, keys: Sequence[str], alias: str = "amount_of_rides") -> DataFrame:
    """Group-by-value count (reference A1: ``beam.combiners.Count.PerElement``,
    ``pipelines/cycle_rides.py:51``). Spark plans the same two-phase shape
    Beam's combiner lifting produces: HashAggregate(partial) -> Exchange ->
    HashAggregate(final) — map-side combine shrinks the shuffle."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def top_k(df: DataFrame, k: int, order: Sequence[Column], tiebreak: Sequence[str] = ()) -> DataFrame:
    """Global top-k (reference A3: ``beam.transforms.combiners.Top.Of``,
    ``pipelines/cycle_rides.py:53``). ``orderBy().limit()`` compiles to
    TakeOrderedAndProject: per-partition partial top-k + single merge — no
    total sort, same strategy as Beam's combiner-based Top.

    ``Top.Of`` is nondeterministic among ties; callers pass full-key
    ``tiebreak`` columns so results are stable for oracle hashing
    (SURVEY.md §2.5 note)."""
    if k <= 0:
        raise ValueError(f"top_k needs k >= 1, got {k}")
    return df.orderBy(*order, *[F.col(c) for c in tiebreak]).limit(k)
