"""Incremental continuous-aggregate maintenance: advance a materialized
hourly rollup by folding ONLY newly-closed hours from the raw table —
the refresh path of ``hypertable_rollup_hourly`` (plans/advanced.py),
which serves closed hours from the materialized layer.

Why incremental matters at 100 TB: a full rebuild re-reads the entire
fact history every refresh; the incremental path reads only rows in
``(watermark, up_to)`` — with the raw table partitioned by
date/hour, partition pruning turns the refresh scan into just the new
chunks. The watermark is the rollup's own MAX(hour): a single-scalar
driver read of a tiny aggregated table, not state kept elsewhere, so
the refresh is self-describing and restart-safe.

Idempotency & crash model (plain parquet, no table format in this
container): a refresh APPENDS one delta of whole hours strictly above
the watermark. Re-running after success appends nothing (the watermark
has advanced past ``up_to``). A crash BEFORE any file commits leaves the
old rollup intact. Parquet append is not atomic across files — on a real
deployment back this with a transactional table format (Delta/Iceberg)
where the same logic becomes one MERGE/append commit; the operator keeps
that seam explicit rather than pretending parquet gives transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """One hour x event_type aggregation row: ``(hour, event_type, n,
    sum_value)``. sum_value goes through fixed-point (1e4) so shard sums
    are exactly mergeable and engine-reproducible."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"))
            / 10000.0
        ).alias("sum_value"),
    )


def refresh_hourly_rollup(
    events: DataFrame, rollup_path: str, up_to: str
) -> int:
    """Advance the rollup at ``rollup_path`` to cover every hour that
    CLOSED strictly before ``up_to`` (an hour-aligned timestamp string).

    Reads the current watermark (MAX(hour) of the rollup — one scalar),
    aggregates raw rows in ``(watermark hour, up_to)`` only, and appends
    the delta. Returns the number of delta rows appended (0 when already
    current — the idempotent no-op)."""
    import os

    spark = events.sparkSession
    cutoff = F.lit(up_to).cast("timestamp_ntz")
    # explicit existence check, NOT try/except around the read: a
    # transient read failure must fail the refresh, never silently reset
    # the watermark to None (which would re-append every hour — double
    # counts)
    if os.path.isdir(rollup_path):
        current = spark.read.parquet(rollup_path)
        wm = current.agg(F.max("hour").alias("wm")).collect()[0]["wm"]
    else:
        wm = None

    fresh = events.filter(F.col("ts") < cutoff)
    if wm is not None:
        # the watermark hour itself is complete (it was only written when
        # it had closed); fold strictly-later hours
        fresh = fresh.filter(
            F.date_trunc("hour", F.col("ts")) > F.lit(wm).cast("timestamp_ntz")
        )
    delta = hourly_rollup(fresh)
    # localCheckpoint: count + append must see one consistent delta, and
    # the append below must not lazily re-list the rollup dir it extends
    delta = delta.localCheckpoint()
    n = delta.count()
    if n:
        delta.write.mode("append").parquet(rollup_path)
    return n
