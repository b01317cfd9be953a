"""Small-file compaction (sources/sinks.py:compact_parquet)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from apache_beam_challange_spark.sources.sinks import compact_parquet


def _parquet_files(path):
    return glob.glob(f"{path}/*.parquet")


def test_compaction_reduces_files_preserves_content(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    n = compact_parquet(spark, src, dst, target_file_bytes=8 * 1024 * 1024)
    assert len(_parquet_files(dst)) == n < 64

    before = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    after = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert before == after


def test_compaction_with_sort_clusters_stats(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted_sorted")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(16).write.parquet(src)

    import os

    total = sum(os.path.getsize(f) for f in _parquet_files(src))
    compact_parquet(
        spark, src, dst, target_file_bytes=total // 4 + 1, sort_by=["user_id"]
    )
    files = _parquet_files(dst)
    assert len(files) > 1
    # range partitioning + in-file sort -> per-FILE user_id ranges are
    # mostly disjoint, so file-level stats prune like partitions would
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("user_id")
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    overlaps = sum(
        1 for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]) if b_lo < a_hi
    )
    assert overlaps <= 1, ranges

    after = spark.read.parquet(dst)
    assert after.count() == ev.count()
    assert after.groupBy().agg(F.sum("user_id")).head()[0] == \
        ev.groupBy().agg(F.sum("user_id")).head()[0]
