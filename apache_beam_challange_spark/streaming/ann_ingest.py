"""Streaming vector ingestion — the continuous-embedding-pipeline shape
(new documents are embedded upstream and must become searchable without
a rebuild): a Structured Streaming ``foreachBatch`` fold that appends
each micro-batch to the vector STORE and folds it into the at-rest ANN
index via the append==rebuild machinery.

Exactness is inherited, not hoped for: :func:`nsw_append_index` (and the
layered :func:`hnsw_append_index`) equals a from-scratch rebuild row for
row, and the theorem composes INDUCTIVELY across micro-batches — after
any number of folds the served index is identical to one built over the
whole store (pinned by the streaming test, which compares against a
rebuild after a two-batch ingest).

Crash posture: the store append commits FIRST (vectors are the source of
truth), then the index fold (which itself invalidates its _SUCCESS
marker for the duration of its rewrite). Structured Streaming's
checkpoint replays the failed batch, and each write is guarded by ITS
OWN membership record (exactly-once from at-least-once delivery): the
store append anti-joins the STORE, the index fold anti-joins the BUCKET
SIDECAR. The two guards are deliberately separate — a crash BETWEEN the
store append and the fold replays a batch whose rows are already stored
but not yet indexed, and the sidecar guard re-applies exactly the
missing index half (a single store-membership guard would anti-join the
replay away and leave the index permanently stale). A crash MID-fold
leaves the index torn with its _SUCCESS marker gone; the fold checks
``is_materialized`` first and rebuilds clean from the store before
touching a torn artifact, so later batches never fold into half-written
adjacency. :func:`ann_index_freshness_check` remains the cheap
serving-time audit for an index opened between a crash and its next
fold.

Reference parity: the reference repo has no vector or streaming surface;
this extends SURVEY.md §2.9 (streaming x ANN composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def nsw_ingest_stream(
    spark: SparkSession,
    delta_dir: str,
    store_path: str,
    index_path: str,
    checkpoint_dir: str,
    **kw,
):
    """Start (availableNow) a stream folding embedding delta files into
    the store + at-rest NSW index, one file per micro-batch. Returns the
    StreamingQuery; callers ``awaitTermination()`` it."""
    from apache_beam_challange_spark.operators.similarity import (
        nsw_append_index,
        nsw_write_index,
    )
    from apache_beam_challange_spark.sources.catalog import is_materialized

    schema = spark.read.parquet(store_path).schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # freeze the micro-batch: the fold reads the store it appends to
        batch = batch_df.localCheckpoint()
        if batch.isEmpty():
            return
        # STORE guard: membership in the store makes the append
        # idempotent under checkpoint replay (vec_id is the ingest key)
        seen_store = spark.read.parquet(store_path).select("vec_id")
        to_store = batch.join(
            seen_store, "vec_id", "left_anti"
        ).localCheckpoint()
        if not to_store.isEmpty():
            to_store.write.mode("append").parquet(store_path)
        # torn-fold recovery: a crash mid-rewrite left the primary
        # _SUCCESS invalidated — rebuild clean from the store (the source
        # of truth) rather than folding into half-written adjacency
        if not is_materialized(index_path, parts=(index_path + "_buckets",)):
            nsw_write_index(
                spark.read.parquet(store_path), index_path, **kw
            )
            return
        # INDEX guard, separate from the store guard: a crash between the
        # store append and the fold replays a batch whose rows are stored
        # but unindexed; anti-joining the BUCKET SIDECAR re-applies
        # exactly the missing half (and makes a replay-after-success a
        # no-op)
        seen_idx = (
            spark.read.parquet(index_path + "_buckets")
            .select("vec_id")
            .distinct()
        )
        to_index = batch.join(
            seen_idx, "vec_id", "left_anti"
        ).localCheckpoint()
        if to_index.isEmpty():
            return
        all_df = spark.read.parquet(store_path)
        nsw_append_index(to_index, all_df, index_path, **kw)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ann_index_freshness_check(
    spark: SparkSession, store_path: str, index_path: str
) -> DataFrame:
    """Serving-time staleness audit for the crash window between a store
    append and its index fold: one row (store_rows, indexed_rows, fresh)
    — the bucket sidecar carries exactly one row set per indexed vector
    id, so distinct-vec_id cardinality equality certifies the index saw
    every stored vector. Cheap (two column-pruned counts), run before
    trusting a freshly-opened index."""
    store_n = (
        spark.read.parquet(store_path)
        .agg(F.countDistinct("vec_id").alias("store_rows"))
    )
    idx_n = (
        spark.read.parquet(index_path + "_buckets")
        .agg(F.countDistinct("vec_id").alias("indexed_rows"))
    )
    return store_n.crossJoin(idx_n).select(
        "store_rows",
        "indexed_rows",
        (F.col("store_rows") == F.col("indexed_rows")).alias("fresh"),
    )
