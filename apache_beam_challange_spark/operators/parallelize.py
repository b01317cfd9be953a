"""Shared guard for per-row Python stages (VERDICT r11 #8).

Any mapInPandas/applyInPandas codec or feature stage inherits the INPUT's
partition count — and the testdata parquet tables are often a single file,
so without intervention the whole Python stage runs on ONE core (the
round-11 find: color JPEG decode 18.5 s -> 9.7 s once spread). The same
failure mode matters MORE at 100 TB: file-count skew (a few giant files,
or a coalesced upstream stage) serializes the slowest stage in the plan.

Every codec attach point calls :func:`spread_for_python_stage` instead of
hand-rolled ``repartition`` so the rule can never be forgotten at a new
attach site. The repartition only happens when the input is actually
under-parallel — an already-wide frame passes through unshuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_python_stage(df: DataFrame) -> DataFrame:
    """Ensure ``df`` has at least ``defaultParallelism`` partitions before
    a per-row Python (Arrow-batched) stage; no-op when already wide.
    Row-content-deterministic callers only — the repartition is a round
    robin that reorders rows, so every downstream aggregate must be
    order-free (all codec queries are: per-doc closed-form payloads)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
