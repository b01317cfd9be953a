"""Sort-on-write clustering: the at-rest layout lever that makes parquet
row-group min/max statistics selective, so filtered scans skip row groups
entirely (the poor man's Z-order — for a single predicate column, a plain
sort dominates). Partition pruning (test_partition_pruning.py) skips
directories; bucketing (test_bucketing.py) co-locates joins; this covers
the third level: intra-file skipping."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _rowgroup_ranges(path: str, col: str):
    import glob

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    return ranges


def test_sorted_write_clusters_rowgroup_stats(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    small = {"parquet.block.size": 16 * 1024}
    unsorted_path = str(tmp_path / "unsorted")
    sorted_path = str(tmp_path / "sorted")
    # identical content, different at-rest order
    ev.orderBy(F.col("event_id")).coalesce(1).write.options(**small).parquet(
        unsorted_path
    )
    ev.orderBy(F.col("user_id"), F.col("event_id")).coalesce(1).write.options(
        **small
    ).parquet(sorted_path)

    un = _rowgroup_ranges(unsorted_path, "user_id")
    so = _rowgroup_ranges(sorted_path, "user_id")
    assert len(so) > 1, "need multiple row groups for the test to mean anything"

    # clustered row groups cover narrow, mostly disjoint user_id ranges;
    # unclustered ones all span nearly the full domain
    def avg_width(rs):
        return sum(mx - mn for mn, mx in rs) / len(rs)

    assert avg_width(so) < avg_width(un) / 3, (so, un)

    # a point query's predicate overlaps few clustered row groups but ALL
    # unclustered ones — this overlap count is exactly what the reader's
    # row-group skipping evaluates against the pushed filter
    lo, hi = min(mn for mn, _ in un), max(mx for _, mx in un)
    target = (lo + hi) // 2
    overlap_sorted = sum(1 for mn, mx in so if mn <= target <= mx)
    overlap_unsorted = sum(1 for mn, mx in un if mn <= target <= mx)
    assert overlap_unsorted == len(un)
    assert overlap_sorted <= max(1, len(so) // 3)

    # and the filter does reach the scan in the plan
    plan = (
        spark.read.parquet(sorted_path)
        .filter(F.col("user_id") == target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"PushedFilters: [IsNotNull(user_id), EqualTo(user_id,{target})]" in plan
