"""Distributed as-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics) — an operator Spark's DataFrame API lacks.

For every left row, attach the payload of the right row with the
greatest timestamp <= the left timestamp (direction="backward"; the
mirror for "forward"), matching on equi-keys. The naive formulations
are poison at scale: a per-row correlated subquery, or a range join
that Catalyst executes as a broadcast-nested-loop over the time
predicate. This implementation is the published union-and-carry shape
(one shuffle, ZERO joins):

1. union the two sides, tagged, right rows carrying their payload as a
   struct and left rows carrying null;
2. one hash shuffle on the keys + a per-key sort on
   (ts, side, tiebreak) — at equal timestamps the right row sorts
   before the left row iff the join is inclusive (``allow_exact``);
3. ``last(payload, ignorenulls=True)`` over the running frame: each
   left row reads the most recent right payload in one pass;
4. keep the left rows, expand the struct.

Cost: one Exchange hashpartitioning(keys) + sort, linear in
|left|+|right| — the same price as a co-partitioned merge join, with
no join operator at all. Ties among right rows at the same (keys, ts)
resolve deterministically by the required ``right_tiebreak`` column
(the max wins, because it sorts last inside the carry frame) — the
same dedup contract a DuckDB ``ASOF JOIN`` needs spelled out as a
``ROW_NUMBER`` CTE.

Reference parity: the reference engine has no as-of operator; this is
part of the training-data extension surface (SURVEY.md §2.9 — feature
attachment "state as of event time", the batch twin of the streaming
point-in-time joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str,
    direction: str = "backward",
    allow_exact: bool = True,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ``on`` keys: every left row
    gains ``payload_cols`` (plus ``asof_ts`` = the matched right
    timestamp), null when no right row qualifies.

    direction="backward": match the greatest right ts <= left ts
    (< when ``allow_exact=False``). direction="forward": the smallest
    right ts >= left ts. ``right_tiebreak`` breaks equal-(keys, ts)
    right rows: the row with the greatest tiebreak value wins — ONE rule
    for both directions (NOTE: pandas ``merge_asof`` differs here: its
    tie pick is direction-dependent — last of the sorted ties going
    backward, first going forward; callers porting from pandas should
    dedup the right side per their preferred rule, which DuckDB's
    ASOF JOIN requires anyway).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    pay = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c) for c in payload_cols],
    )
    right_u = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        # inclusive: right sorts BEFORE left at equal ts (payload visible);
        # strict: right sorts AFTER left (payload not yet visible)
        F.lit(0 if allow_exact else 2).alias("__side"),
        # keep the tiebreak's own (orderable) type — casting would
        # silently null out string/timestamp tiebreaks
        F.col(right_tiebreak).alias("__tb"),
        pay.alias("__pay"),
    )
    left_cols = [c for c in left.columns]
    left_u = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(right_u.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    right_u = right_u.select(
        *on,
        "__ts",
        "__side",
        "__tb",
        "__pay",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
        ],
    )
    order: list[Column] = (
        [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = right_u.unionByName(left_u).withColumn(
        "__carry", F.last("__pay", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        F.col("__carry.asof_ts").alias("asof_ts"),
        *[F.col(f"__carry.{c}").alias(c) for c in payload_cols],
    )
    return out
