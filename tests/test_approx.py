"""Approximate aggregates: sketch-based results cannot hash-match an exact
oracle, so they are bounded against exact answers here instead of in the
registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_challange_spark.sources.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.05).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) <= max(3.0, 0.15 * exact)


def test_approx_percentile_brackets_median(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    [lo, mid, hi] = ev.select(
        F.percentile_approx("value", [0.25, 0.5, 0.75], 1000).alias("p")
    ).collect()[0]["p"]
    assert lo <= mid <= hi
    vmin, vmax = ev.select(F.min("value"), F.max("value")).collect()[0]
    assert vmin <= lo and hi <= vmax
