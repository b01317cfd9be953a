"""Checkpoint recovery: a restarted stream resumes from committed offsets —
already-processed files are not reprocessed (exactly-once source tracking).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_beam_challange_spark.streaming.windows import events_stream
from tests.test_streaming import _nanos, _write_batch


def _run_once(spark, src: str, ckpt: str, out_dir: str) -> None:
    ev = events_stream(spark, src)
    q = (
        ev.select("event_id", "user_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.slow
def test_restart_skips_committed_files(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _write_batch(spark, str(src / "a.parquet"), [(1, _nanos(9, 0), 1, "view", 1.0, "{}")])
    _run_once(spark, str(src), ckpt, out)
    first = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert first == {1}

    # add a second file; restart with the SAME checkpoint
    _write_batch(spark, str(src / "b.parquet"), [(2, _nanos(9, 5), 1, "view", 1.0, "{}")])
    _run_once(spark, str(src), ckpt, out)
    all_rows = [r["event_id"] for r in spark.read.parquet(out).collect()]
    # file A was not reprocessed: exactly one row per event, both present
    assert sorted(all_rows) == [1, 2]
