"""AQE skew-join splitting: a hot join key must be split into multiple
reducer tasks at runtime (OptimizeSkewedJoin), not processed by one task —
session.py enables it; this proves it fires. Thresholds are lowered so the
effect is observable at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_skewed_join_is_split_at_runtime(spark):
    prev = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # left: 200k rows, 95% on key 0 (hot); right: 2k rows over 100 keys
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 2_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k").agg(F.count(F.lit(1)).alias("n"))
        # collect() runs THIS DataFrame's QueryExecution, so afterwards its
        # executedPlan is the finalized adaptive plan (a separate action
        # like .count() would plan and adapt independently)
        [row] = joined.collect()
        assert row["n"] > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE must have rewritten the sort-merge join with skew handling:
        # Spark marks it SortMergeJoin(skew=true) reading "AQEShuffleRead skewed"
        assert "skew=true" in plan and "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
