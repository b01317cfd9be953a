"""Custom Python DataSource (sources/pysource.py): the Spark-4 connector
extension point, batch + streaming, verified against the closed-form row
generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_challange_spark.sources.pysource import gen_row, register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("events_gen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_matches_reference_rows(spark):
    got = sorted(_read(spark, numRows=500).collect(), key=lambda r: r.event_id)
    assert len(got) == 500
    for r in got:
        i, ts, uid, et, val, props = gen_row(r.event_id)
        assert (r.ts, r.user_id, r.event_type, r.value, r.props) == (
            ts,
            uid,
            et,
            val,
            props,
        )


def test_batch_partition_count_invariance(spark):
    one = sorted(
        _read(spark, numRows=337, numPartitions=1).collect(),
        key=lambda r: r.event_id,
    )
    many = sorted(
        _read(spark, numRows=337, numPartitions=7).collect(),
        key=lambda r: r.event_id,
    )
    assert one == many
    # partition planning actually split the work
    df = _read(spark, numRows=337, numPartitions=7)
    assert df.rdd.getNumPartitions() == 7


def test_registered_queries_run_on_generated_source(spark):
    """The generated source satisfies the events schema contract: an
    engine aggregation built for the events table runs unchanged."""
    df = _read(spark, numRows=1000)
    out = (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    assert {r.event_type for r in out} == {
        "click",
        "signup",
        "error",
        "view",
        "purchase",
    }
    assert sum(r.n for r in out) == 1000
    expect_n = {t: 0 for t in {r.event_type for r in out}}
    for i in range(1000):
        expect_n[gen_row(i)[3]] += 1
    assert {r.event_type: r.n for r in out} == expect_n


def test_stream_reads_same_rows_as_batch(spark, tmp_path):
    register(spark)
    q = (
        spark.readStream.format("events_gen")
        .option("numRows", 450)
        .option("batchRows", 100)
        .load()
        .writeStream.format("memory")
        .queryName("events_gen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    # the simple stream reader does not implement Trigger.AvailableNow
    # (Spark falls back to one batch); drain the bounded backlog instead
    q.processAllAvailable()
    q.stop()
    got = sorted(
        spark.table("events_gen_stream").collect(), key=lambda r: r.event_id
    )
    assert [r.event_id for r in got] == list(range(450))
    assert got[7].event_type == gen_row(7)[3]


def test_stream_offset_replay_is_deterministic(spark):
    from apache_beam_challange_spark.sources.pysource import (
        _EventsGenStreamReader,
    )

    rd = _EventsGenStreamReader({"numRows": "50", "batchRows": "20"})
    it1, off1 = rd.read(rd.initialOffset())
    rows1 = list(it1)
    it2, off2 = rd.read(off1)
    rows2 = list(it2)
    assert off1 == {"index": 20} and off2 == {"index": 40}
    # replay between offsets regenerates the identical rows
    assert list(rd.readBetweenOffsets({"index": 0}, {"index": 20})) == rows1
    assert list(rd.readBetweenOffsets({"index": 20}, {"index": 40})) == rows2
    # exhaustion: empty batch, offset stable
    it3, off3 = rd.read({"index": 50})
    assert list(it3) == [] and off3 == {"index": 50}


# --- custom Python data sink (jsonl_commit) ---------------------------------


def test_jsonl_sink_roundtrip(spark, tmp_path):
    import json

    from apache_beam_challange_spark.sources.pysource import (
        JsonlCommitDataSource,
        read_jsonl_commit,
    )

    spark.dataSource.register(JsonlCommitDataSource)
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(200)], "id long, name string, v double"
    ).repartition(5)
    path = str(tmp_path / "out")
    df.write.format("jsonl_commit").option("path", path).mode("append").save()
    rows = sorted(read_jsonl_commit(path), key=lambda d: d["id"])
    assert len(rows) == 200
    assert rows[7] == {"id": 7, "name": "n7", "v": 10.5}
    # manifest exists and covers every part file it lists
    import os

    with open(os.path.join(path, "_MANIFEST")) as f:
        files = json.load(f)["files"]
    assert len(files) == 5
    assert all(os.path.isfile(os.path.join(path, p)) for p in files)


def test_jsonl_sink_unmanifested_files_are_inert(spark, tmp_path):
    from apache_beam_challange_spark.sources.pysource import (
        JsonlCommitDataSource,
        read_jsonl_commit,
    )

    spark.dataSource.register(JsonlCommitDataSource)
    df = spark.createDataFrame([(1,), (2,)], "id long")
    path = str(tmp_path / "out")
    df.write.format("jsonl_commit").option("path", path).mode("append").save()
    # a stray part file from a dead attempt must not change the read
    with open(f"{path}/part-deadattempt.jsonl", "w") as f:
        f.write('{"id": 999}\n')
    assert sorted(d["id"] for d in read_jsonl_commit(path)) == [1, 2]


def test_jsonl_sink_no_manifest_is_unreadable_not_empty(tmp_path):
    import pytest as _pytest

    from apache_beam_challange_spark.sources.pysource import read_jsonl_commit

    p = tmp_path / "never_committed"
    p.mkdir()
    (p / "part-orphan.jsonl").write_text('{"id": 1}\n')
    with _pytest.raises(FileNotFoundError):
        read_jsonl_commit(str(p))


def test_stream_checkpoint_restart_resumes_without_dupes(spark, tmp_path):
    """Stop the stream mid-backlog and restart with the same checkpoint:
    the offset log must resume exactly where it left off — no gaps, no
    duplicates (the deterministic-replay contract under recovery)."""
    import time

    register(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run(n_batches: int | None):
        q = (
            spark.readStream.format("events_gen")
            .option("numRows", 300)
            .option("batchRows", 60)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start()
        )
        if n_batches is None:
            q.processAllAvailable()
        else:
            while q.lastProgress is None or q.lastProgress["batchId"] < n_batches:
                time.sleep(0.2)
        q.stop()
        q.awaitTermination()

    run(n_batches=2)  # ingest part of the backlog, then die
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < 300
    run(n_batches=None)  # restart from the same checkpoint, drain the rest
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    # file sink + offset log = exactly-once: the union is the full range,
    # no gaps, no duplicates, despite the mid-backlog kill
    assert got == list(range(300))


def test_filter_pushdown_narrows_generated_range(spark):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    from apache_beam_challange_spark.sources.pysource import _EventsGenReader

    rd = _EventsGenReader({"numRows": "1000", "numPartitions": "4"})
    leftover = list(
        rd.pushFilters(
            [GreaterThanOrEqual(("event_id",), 100), LessThan(("event_id",), 160)]
        )
    )
    assert leftover == []  # both bounds accepted by the source
    parts = rd.partitions()
    produced = [i for p in parts for i, *_ in rd.read(p)]
    assert produced == list(range(100, 160))  # pruned rows never generated

    rd2 = _EventsGenReader({"numRows": "1000"})
    assert list(rd2.pushFilters([EqualTo(("event_id",), 7)])) == []
    assert [i for p in rd2.partitions() for i, *_ in rd2.read(p)] == [7]

    # a filter on another column is NOT consumed — returned to Spark
    rd3 = _EventsGenReader({"numRows": "100"})
    leftover3 = list(rd3.pushFilters([EqualTo(("event_type",), "click")]))
    assert len(leftover3) == 1


def test_filter_pushdown_end_to_end_equality(spark):
    register(spark)
    df = (
        spark.read.format("events_gen")
        .option("numRows", 500)
        .load()
    )
    got = sorted(
        r.event_id
        for r in df.filter(
            (F.col("event_id") >= 50) & (F.col("event_id") < 75)
        ).collect()
    )
    assert got == list(range(50, 75))
    # non-pushable predicate still correct (post-scan evaluation)
    types = {
        r.event_type
        for r in df.filter(F.col("event_type") == "click").collect()
    }
    assert types == {"click"}


def test_jsonl_sink_append_merges_manifest(spark, tmp_path):
    from apache_beam_challange_spark.sources.pysource import (
        JsonlCommitDataSource,
        read_jsonl_commit,
    )

    spark.dataSource.register(JsonlCommitDataSource)
    path = str(tmp_path / "out")
    spark.createDataFrame([(1,), (2,)], "id long").write.format(
        "jsonl_commit"
    ).option("path", path).mode("append").save()
    spark.createDataFrame([(3,), (4,)], "id long").write.format(
        "jsonl_commit"
    ).option("path", path).mode("append").save()
    # second append must UNION with the first commit, not orphan it
    assert sorted(d["id"] for d in read_jsonl_commit(path)) == [1, 2, 3, 4]
    # overwrite replaces the manifest: only the new rows remain visible
    spark.createDataFrame([(9,)], "id long").write.format("jsonl_commit").option(
        "path", path
    ).mode("overwrite").save()
    assert [d["id"] for d in read_jsonl_commit(path)] == [9]


def test_jsonl_sink_append_lock_makes_concurrency_loud(spark, tmp_path):
    """The append path is single-writer by contract: with another
    writer's lock present, commit must raise (not silently drop the
    other job's committed files), and a successful append must leave no
    lock behind."""
    import os

    import pytest

    from apache_beam_challange_spark.sources.pysource import (
        JsonlCommitDataSource,
        read_jsonl_commit,
    )

    spark.dataSource.register(JsonlCommitDataSource)
    path = str(tmp_path / "locked")
    df = spark.createDataFrame([(1,)], "id long")
    df.write.format("jsonl_commit").option("path", path).mode("append").save()
    assert not os.path.exists(os.path.join(path, "_MANIFEST.lock"))
    # a concurrent appender holds the lock -> loud error, manifest intact
    lock = os.path.join(path, "_MANIFEST.lock")
    with open(lock, "w"):
        pass
    with pytest.raises(Exception, match="single-writer|concurrent"):
        spark.createDataFrame([(2,)], "id long").write.format(
            "jsonl_commit"
        ).option("path", path).mode("append").save()
    assert [d["id"] for d in read_jsonl_commit(path)] == [1]
    os.remove(lock)
    # lock released -> append works again and merges
    spark.createDataFrame([(2,)], "id long").write.format(
        "jsonl_commit"
    ).option("path", path).mode("append").save()
    assert sorted(d["id"] for d in read_jsonl_commit(path)) == [1, 2]
    # OVERWRITE racing an in-flight append is the same lost-update class:
    # it must also refuse while the lock is held (found by review — the
    # overwrite path used to bypass the lock entirely)
    with open(lock, "w"):
        pass
    with pytest.raises(Exception, match="single-writer|concurrent"):
        spark.createDataFrame([(3,)], "id long").write.format(
            "jsonl_commit"
        ).option("path", path).mode("overwrite").save()
    assert sorted(d["id"] for d in read_jsonl_commit(path)) == [1, 2]
    os.remove(lock)
