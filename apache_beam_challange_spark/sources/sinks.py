"""Sinks (SURVEY.md §2.6): the reference's WriteToText variants mapped to
Spark's native writers.

K1 (``pipelines/cycle_rides.py:61-63``): sharded CSV with header.
K2 (``pipelines/sql_cycle_rides.py:47``): plain text shards.
K3 (``pipelines/total_distance.py:130-133``): single output file
    (num_shards=0 + empty shard template) -> ``coalesce(1)``.

Scale note: the single-file sink serializes the final write through one
task *by design* (same as the reference's num_shards=0); the default sinks
write one file per partition in parallel. ``write_parquet`` adds the
partitioned-columnar layout the reference lacks — at 100 TB, partition
columns (e.g. date) are what make downstream scans prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """K1: sharded CSV, one file per partition, written in parallel."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_csv_single(df: DataFrame, path: str, header: bool = True) -> None:
    """K3: exactly one CSV file (coalesce(1) — intentional serial write)."""
    df.coalesce(1).write.mode("overwrite").option(
        "header", str(header).lower()
    ).csv(path)


def write_text(df: DataFrame, path: str, sep: str = ",", null_as: str = "") -> None:
    """K2: stringified lines; columns joined with ``sep``. NULLs serialize
    as ``null_as`` — concat_ws silently *drops* NULL arguments, which would
    shift every later field left and misalign the columns."""
    line = F.concat_ws(
        sep,
        *[F.coalesce(F.col(c).cast("string"), F.lit(null_as)) for c in df.columns],
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Columnar sink with optional hive-style partitioning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> int:
    """Small-file compaction — the standing maintenance job of any long-run
    ingestion path (streaming sinks and partitioned writers accumulate
    thousands of KB-sized files whose open/footer cost dominates scans).
    Rewrites ``src_dir`` into ``ceil(total_bytes / target_file_bytes)``
    files; with ``sort_by``, rows are range-partitioned and sorted within
    files so row-group min/max stats stay selective after the rewrite
    (see tests/test_rowgroup_clustering.py); with ``zorder_by=(a, b)``,
    the sort key is the Morton interleave of the two integer columns
    (functions/layout.py) so min/max stats stay selective on BOTH
    dimensions — what lakehouse engines ship as OPTIMIZE ZORDER, run
    here as part of the standing compaction job. Returns the output
    file count.

    Sizing uses a driver-side *metadata* listing (no data moves through the
    driver); on HDFS/S3 the same numbers come from the FileSystem API or
    the table catalog."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if zorder_by is not None:
        from apache_beam_challange_spark.functions.layout import (
            scale_to_bits,
            zorder_key,
        )

        a, b = zorder_by
        bounds = df.agg(
            F.min(a).alias("__mna"), F.max(a).alias("__mxa"),
            F.min(b).alias("__mnb"), F.max(b).alias("__mxb"),
        )
        keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
            "__zkey",
            zorder_key(
                scale_to_bits(F.col(a), F.col("__mna"), F.col("__mxa")),
                scale_to_bits(F.col(b), F.col("__mnb"), F.col("__mxb")),
            ),
        )
        out = (
            keyed.repartitionByRange(n_files, F.col("__zkey"))
            .sortWithinPartitions("__zkey")
            .drop("__zkey", "__mna", "__mxa", "__mnb", "__mxb")
        )
        out.write.mode("overwrite").parquet(dst_dir)
        return n_files
    if sort_by:
        cols = [F.col(c) for c in sort_by]
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    return n_files
