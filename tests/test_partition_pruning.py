"""Partition pruning: hive-partitioned layouts let a date/key filter skip
whole directories at planning time — the dominant I/O saver at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_challange_spark.sources.catalog import load_table
from apache_beam_challange_spark.sources.sinks import write_parquet


def test_partition_filter_prunes_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    write_parquet(ev, path, partition_by=["event_type"])

    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # the predicate must land in PartitionFilters (planning-time dir
    # skipping), not in DataFilters (row-level post-read)
    assert "PartitionFilters: [" in scan and "event_type" in scan.split(
        "PartitionFilters"
    )[1].split("]")[0]

    n_click = back.count()
    n_all = spark.read.parquet(path).count()
    assert 0 < n_click < n_all
