"""Streaming warehouse maintenance: incremental upsert of an at-rest
snapshot via ``foreachBatch`` — the streaming twin of the batch
``latest_event_per_user`` compaction.

This is the standard streaming->lakehouse MERGE pattern expressed over
plain parquet (the container has no Delta/Iceberg, so the upsert is a
read-modify-overwrite of the snapshot; on a table format it would be the
same ``foreachBatch`` body issuing MERGE INTO). The structure that
matters at 100 TB:

- the stream folds each micro-batch to ONE row per key BEFORE touching
  the snapshot (per-batch window, shuffle bounded by batch keys);
- the snapshot merge is a latest-wins window over (snapshot UNION batch)
  keyed rows — cost proportional to snapshot keys, not event history;
- every batch leaves a complete, readable snapshot (overwrite commits
  _SUCCESS last), so readers never see a torn table.

The reference declares streaming and stops (``development.ipynb:114``);
this surface is part of the beyond-reference mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _latest_per_key(df: DataFrame, key: str, order: list[str]) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def maintain_latest_snapshot(
    events: DataFrame,
    snapshot_path: str,
    checkpoint_dir: str,
    key: str = "user_id",
    order: list[str] | None = None,
) -> None:
    """Run the event stream to completion (availableNow), upserting the
    latest row per ``key`` into the parquet snapshot at ``snapshot_path``
    once per micro-batch. Restart-safe: the checkpoint tracks source
    progress, and re-merging an already-applied batch is idempotent
    (latest-wins on the same rows changes nothing)."""
    order = order or ["ts", "event_id"]
    spark = events.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        import os

        fresh = _latest_per_key(batch_df, key, order)
        # explicit existence check, NOT try/except: a transient read
        # failure must fail the batch (the checkpoint will retry it),
        # never silently discard the existing snapshot
        if os.path.isdir(snapshot_path):
            current = spark.read.parquet(snapshot_path)
            merged = _latest_per_key(
                current.unionByName(fresh), key, order
            )
        else:
            # first batch: no snapshot yet
            merged = fresh
        # localCheckpoint breaks the read->overwrite cycle on the SAME
        # path (the merged plan must not lazily re-scan files the
        # overwrite is about to delete)
        merged.localCheckpoint().write.mode("overwrite").parquet(
            snapshot_path
        )

    (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
