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
marker for the duration of its rewrite — a crash mid-fold forces a clean
rebuild). A crash BETWEEN the two leaves a valid-but-stale index; that
window is detectable, not silent: :func:`ann_index_freshness_check`
compares store cardinality against the index's bucket sidecar and is the
cheap serving-time audit. Structured Streaming's checkpoint replays the
failed batch, and both writes are idempotent per batch id in the
replay-after-success case only when the store append is guarded — so the
fold skips batches already recorded in the sidecar (exactly-once fold
from at-least-once delivery).

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
    )

    schema = spark.read.parquet(store_path).schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # freeze the micro-batch: the fold reads the store it appends to
        batch = batch_df.localCheckpoint()
        if batch.isEmpty():
            return
        # exactly-once guard: a checkpoint replay of an already-applied
        # batch must be a no-op — membership in the STORE is the record
        # (vec_id is the ingest key)
        seen = spark.read.parquet(store_path).select("vec_id")
        batch = batch.join(seen, "vec_id", "left_anti").localCheckpoint()
        if batch.isEmpty():
            return
        batch.write.mode("append").parquet(store_path)
        all_df = spark.read.parquet(store_path)
        nsw_append_index(batch, all_df, index_path, **kw)

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
