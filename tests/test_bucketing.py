"""Bucketed co-located join: the 100 TB technique for repeated big-big
joins — both tables pre-hash-bucketed on the join key, so the join reads
matching buckets with NO shuffle exchange at query time (SURVEY.md §7)."""

from __future__ import annotations

import shutil
import uuid

import pytest


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    # saveAsTable writes to the session's static warehouse dir
    # (<cwd>/spark-warehouse, gitignored); tables are dropped on teardown.
    suffix = uuid.uuid4().hex[:8]
    o_name, l_name = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(o_name)
    )
    (
        lineitem.selectExpr("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(l_name)
    )
    yield o_name, l_name
    for t in (o_name, l_name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(o_name).join(
            spark.table(l_name),
            spark.table(o_name).o_orderkey == spark.table(l_name).l_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
