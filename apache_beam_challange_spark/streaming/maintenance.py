"""Streaming warehouse maintenance: incremental upsert of an at-rest
snapshot via ``foreachBatch`` — the streaming twin of the batch
``latest_event_per_user`` compaction.

This is the standard streaming->lakehouse MERGE pattern expressed over
plain parquet (the container has no Delta/Iceberg, so the upsert is a
read-modify-publish of the snapshot; on a table format it would be the
same ``foreachBatch`` body issuing MERGE INTO). The structure that
matters at 100 TB:

- the stream folds each micro-batch to ONE row per key BEFORE touching
  the snapshot (per-batch window, shuffle bounded by batch keys);
- the snapshot merge is a latest-wins window over (snapshot UNION batch)
  keyed rows — cost proportional to snapshot keys, not event history;
- every batch publishes through :mod:`..sources.publish`: a new version
  dir plus an atomic ``_CURRENT`` pointer flip, so a crash mid-write can
  never present a torn snapshot to a reader OR to the retrying batch
  (the retry re-reads the last COMPLETE version — no data-loss window).

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
    latest row per ``key`` into the versioned parquet snapshot published
    under ``snapshot_path`` once per micro-batch (read the live version
    with :func:`~apache_beam_challange_spark.sources.publish.
    read_published`). Restart-safe: the checkpoint tracks source
    progress; a batch retried after a crash re-reads the last COMPLETE
    published version (the atomic pointer never references a torn dir),
    and re-merging an already-applied batch is idempotent (latest-wins
    on the same rows changes nothing)."""
    from apache_beam_challange_spark.sources.publish import (
        publish,
        read_published,
    )

    order = order or ["ts", "event_id"]
    spark = events.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        fresh = _latest_per_key(batch_df, key, order)
        # read_published raises (fails the batch -> checkpoint retries)
        # on a corrupted pointer rather than merging partial state; a
        # transient read failure likewise fails the batch, never silently
        # discarding the existing snapshot
        current = read_published(spark, snapshot_path)
        if current is not None:
            merged = _latest_per_key(
                current.unionByName(fresh), key, order
            )
        else:
            # first batch: nothing published yet
            merged = fresh
        # new version dir + atomic _CURRENT flip; the old version stays
        # on disk for in-flight readers, so no read->overwrite cycle on
        # the same files exists to break
        publish(merged, snapshot_path)

    (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def route_quality_stream(
    events: DataFrame,
    good_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
) -> None:
    """Streaming dead-letter routing — the ingestion-time twin of the
    batch ``quarantine_rule_counts`` accounting, sharing its rule
    definitions (:mod:`..functions.quality`): each micro-batch splits
    into clean rows (appended to ``good_path``) and violating rows
    (appended to ``quarantine_path`` with a ``rules`` tag column naming
    every violated rule), so bad data never reaches the lake silently
    and every quarantined row says why.

    Delivery model (plain parquet): at-least-once. The checkpoint
    retries a batch whose twin appends didn't both commit, so a crash
    between the two writes can duplicate that batch's rows; both sinks
    carry ``event_id``, and the engine's keyed dedup
    (``streaming_dedup_events`` / ``exact_dedup``) restores
    exactly-once downstream. On a transactional table format the two
    appends become one atomic multi-table commit."""
    from apache_beam_challange_spark.functions.quality import violated_rules

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        tagged = violated_rules(batch_df)
        clean = tagged.filter(F.size("__rules") == 0).drop("__rules")
        bad = (
            tagged.filter(F.size("__rules") > 0)
            .withColumn("rules", F.array_join(F.col("__rules"), ","))
            .drop("__rules")
        )
        clean.write.mode("append").parquet(good_path)
        bad.write.mode("append").parquet(quarantine_path)

    (
        events.writeStream.foreachBatch(_route)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def maintain_lsh_index_stream(
    vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    num_tables: int = 16,
    num_planes: int = 4,
    dim: int = 64,
) -> None:
    """Streaming ANN index maintenance: every micro-batch of new vectors
    appends its bucket rows into the at-rest multitable LSH index via
    :func:`~apache_beam_challange_spark.operators.similarity.
    lsh_append_index` — the index stays query-fresh as the corpus is
    ingested, with per-batch cost linear in the batch (the projection
    planes are deterministic, so streamed appends remain bit-identical
    to a from-scratch rebuild over everything ingested). Delivery is
    at-least-once (checkpointed source progress; a retried batch
    re-appends duplicate rows), which the indexed reader's candidate
    dedup makes result-invisible — the same contract as the batch
    append, inherited rather than re-proved."""
    from apache_beam_challange_spark.operators.similarity import (
        lsh_append_index,
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        lsh_append_index(
            batch_df,
            index_path,
            num_tables=num_tables,
            num_planes=num_planes,
            dim=dim,
        )

    (
        vectors.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
