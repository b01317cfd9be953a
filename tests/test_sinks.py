from __future__ import annotations

import glob
import os

from apache_beam_challange_spark.sources.sinks import (
    write_csv,
    write_csv_single,
    write_parquet,
    write_text,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 2, 10), (3, 4, 20)], ["start", "end", "n"]
    ).repartition(4)


def test_write_csv_with_header(spark, tmp_path):
    """K1: sharded CSV + header (cycle_rides.py:61-63)."""
    path = str(tmp_path / "csv_out")
    write_csv(_df(spark), path, header=True)
    files = glob.glob(f"{path}/*.csv")
    assert files
    content = "".join(open(f).read() for f in files)
    assert "start,end,n" in content and "1,2,10" in content


def test_write_csv_single_file(spark, tmp_path):
    """K3: exactly one data file (total_distance.py:130-133)."""
    path = str(tmp_path / "single_out")
    write_csv_single(_df(spark), path)
    assert len(glob.glob(f"{path}/*.csv")) == 1


def test_write_text_lines(spark, tmp_path):
    """K2: stringified joined lines (sql_cycle_rides.py:47)."""
    path = str(tmp_path / "text_out")
    write_text(_df(spark), path)
    lines = sorted(
        line
        for f in glob.glob(f"{path}/part-*")
        for line in open(f).read().splitlines()
    )
    assert lines == ["1,2,10", "3,4,20"]


def test_write_text_nulls_keep_field_alignment(spark, tmp_path):
    """concat_ws drops NULL args; the sink must coalesce so NULL fields
    serialize as empty strings instead of shifting later columns left."""
    path = str(tmp_path / "text_null_out")
    df = spark.createDataFrame(
        [(1, None, 10), (None, 4, 20)],
        "start bigint, end bigint, n bigint",
    )
    write_text(df, path)
    lines = sorted(
        line
        for f in glob.glob(f"{path}/part-*")
        for line in open(f).read().splitlines()
    )
    assert lines == [",4,20", "1,,10"]


def test_write_parquet_partitioned(spark, tmp_path):
    path = str(tmp_path / "pq_out")
    write_parquet(_df(spark), path, partition_by=["start"])
    assert os.path.isdir(f"{path}/start=1")
    back = spark.read.parquet(path)
    assert back.count() == 2
