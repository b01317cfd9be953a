"""Runtime bloom-filter join pruning: when one join side is selectively
filtered, Spark injects a bloom filter built from it onto the big side's
scan — rows that cannot match are dropped before the shuffle. The 100 TB
win: the fact-table shuffle shrinks by the dim filter's selectivity.
Thresholds are adjusted so the injection is observable at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_bloom_filter_injected_on_selective_join(spark, sf_dir):
    prev = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    for k, v in BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 450000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
