"""Streaming semantics tests: micro-batch sequencing, watermark-driven
late-data drops, and keyed-state updates — driven through real
Structured Streaming runs over staged parquet micro-batch files.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from apache_beam_challange_spark.streaming.stateful import running_user_counts
from apache_beam_challange_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    tumbling_counts,
)

ROW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos, matching the physical layout
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _nanos(hour: int, minute: int) -> int:
    t = dt.datetime(2024, 1, 1, hour, minute, tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1_000_000_000)


def _write_batch(spark, path: str, rows: list[tuple]) -> None:
    """Stage one micro-batch as a single plain parquet FILE (the streaming
    file source lists files non-recursively)."""
    import glob
    import shutil
    import tempfile

    staging = tempfile.mkdtemp()
    spark.createDataFrame(rows, ROW_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    (part,) = glob.glob(f"{staging}/part-*.parquet")
    shutil.copy(part, path)
    shutil.rmtree(staging)


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_events_stream_reads_every_parquet_timestamp_unit(
    spark, tmp_path, unit
):
    """Footer sniffing must route each physical timestamp unit correctly:
    TIMESTAMP(NANOS) surfaces as a nano-long under the session's
    ``spark.sql.legacy.parquet.nanosAsLong=true`` and needs the long
    conversion path, while micros/millis read back as native timestamps —
    treating ns as native raised FAILED_READ_FILE (ADVICE r4, medium)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    d = tmp_path / "in"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1, 10, 5)
    t1 = dt.datetime(2024, 1, 1, 11, 20)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([t0, t1], pa.timestamp(unit)),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["view", "click"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    papq.write_table(
        table, str(d / "a.parquet"), coerce_timestamps=None
    )
    out = run_to_memory(
        events_stream(spark, str(d)).groupBy("ts").count(), "complete"
    )
    assert {str(r["ts"]) for r in out.collect()} == {
        "2024-01-01 10:05:00",
        "2024-01-01 11:20:00",
    }


def test_tumbling_counts_match_batch(spark, tmp_path):
    base = tmp_path / "stream_in"
    base.mkdir()
    _write_batch(
        spark,
        str(base / "a.parquet"),
        [
            (1, _nanos(10, 5), 1, "view", 1.0, "{}"),
            (2, _nanos(10, 20), 1, "view", 1.0, "{}"),
            (3, _nanos(11, 1), 2, "click", 1.0, "{}"),
        ],
    )
    out = run_to_memory(tumbling_counts(events_stream(spark, str(base))), "complete")
    got = {(str(r["window_start"]), r["event_type"]): r["n"] for r in out.collect()}
    assert got == {
        ("2024-01-01 10:00:00", "view"): 2,
        ("2024-01-01 11:00:00", "click"): 1,
    }


@pytest.mark.slow
def test_watermark_drops_late_rows(spark, tmp_path):
    """Two sequenced micro-batches (maxFilesPerTrigger=1): batch 2 carries
    an event far older than the watermark established by batch 1 -> the
    late row must NOT appear in appended finalized windows."""
    d = tmp_path / "late_in"
    d.mkdir()
    # batch A: events at 10:05 and 13:00 -> watermark after A = 13:00 - 1h
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 5), 1, "view", 1.0, "{}"),
            (2, _nanos(13, 0), 1, "view", 1.0, "{}"),
        ],
    )
    # batch B: on-time only; processing it finalizes + evicts the 10:00
    # window (watermark 12:00 > window end 11:00)
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [(3, _nanos(13, 30), 1, "view", 1.0, "{}")],
    )
    # batch C: a 10:10 event — now truly late (its window state was already
    # evicted) plus an on-time 14:00 event
    _write_batch(
        spark,
        str(d / "c.parquet"),
        [
            (4, _nanos(10, 10), 1, "view", 1.0, "{}"),
            (5, _nanos(14, 0), 1, "view", 1.0, "{}"),
        ],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    # watermarks require TIMESTAMP (tz-aware); session tz is UTC so the
    # conversion is value-preserving
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    windowed = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("ws"), "n")
    )
    out = run_to_memory(windowed, "append")
    rows = [(str(r["ws"]), r["n"]) for r in out.collect()]
    ten_oclock = [n for ws, n in rows if ws == "2024-01-01 10:00:00"]
    # the 10:00 window finalized once, with ONLY the batch-A event; the
    # late batch-C event at 10:10 was dropped by the watermark (its state
    # was evicted; no duplicate/updated window row may appear)
    assert ten_oclock == [1]


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with event-time interval: a click joins a view of
    the same user only within 30 minutes after the view."""
    d = tmp_path / "ssj_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(10, 10), 1, "click", 1.0, "{}"),   # within 30m -> joins
            (3, _nanos(11, 0), 1, "click", 1.0, "{}"),    # 60m later -> no join
            (4, _nanos(10, 5), 2, "click", 1.0, "{}"),    # other user -> no join
        ],
    )
    ev = events_stream(spark, str(d)).withColumn("ts", F.col("ts").cast("timestamp"))
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("view_id", "click_id")
    out = run_to_memory(joined, "append")
    pairs = {(r["view_id"], r["click_id"]) for r in out.collect()}
    assert pairs == {(1, 2)}


def test_stream_stream_left_outer_emits_expired_unmatched_only(spark, tmp_path):
    """LEFT OUTER stream-stream join eviction semantics: an unmatched
    click whose 30-minute window closed before the final watermark is
    emitted once with nulls; an unmatched click still inside the
    watermark horizon is emitted NOT AT ALL (a match could still
    arrive); matched clicks join normally."""
    from apache_beam_challange_spark.streaming.windows import (
        click_purchase_interval_join,
    )

    d = tmp_path / "ssloj_in"
    d.mkdir()
    # final watermark = min(max click_ts, max purchase_ts) - 1h
    #                 = min(16:00, 18:00) - 1h = 15:00
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 0), 1, "click", 1.0, "{}"),   # matched by 2
            (2, _nanos(10, 10), 1, "purchase", 1.0, "{}"),
            (3, _nanos(11, 0), 2, "click", 1.0, "{}"),   # unmatched, window
            #   ends 11:30 < 15:00 -> expired -> null row
            (4, _nanos(16, 0), 3, "click", 1.0, "{}"),   # unmatched, window
            #   ends 16:30 > 15:00 -> still live -> absent
            (5, _nanos(18, 0), 4, "purchase", 1.0, "{}"),
        ],
    )
    ev = events_stream(spark, str(d))
    out = run_to_memory(
        click_purchase_interval_join(ev, how="leftOuter"), "append"
    )
    got = {(r["click_id"], r["purchase_id"]) for r in out.collect()}
    assert got == {(1, 2), (3, None)}
    null_row = [r for r in out.collect() if r["purchase_id"] is None][0]
    assert null_row["purchase_ts"] is None and null_row["delay_sec"] is None


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch custom sink: per-micro-batch Python callback."""
    d = tmp_path / "feb_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [(1, _nanos(9, 0), 1, "view", 2.5, "{}"),
         (2, _nanos(9, 1), 1, "view", 1.5, "{}")],
    )
    seen: list[tuple[int, int]] = []

    def handle(batch_df, batch_id: int) -> None:
        seen.append((batch_id, batch_df.count()))

    ev = events_stream(spark, str(d))
    q = (
        ev.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen and sum(n for _, n in seen) == 2


@pytest.mark.slow
def test_stateful_running_counts_across_batches(spark, tmp_path):
    d = tmp_path / "state_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [(1, _nanos(10, 0), 7, "view", 1.0, "{}"),
         (2, _nanos(10, 1), 7, "view", 1.0, "{}")],
    )
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [(3, _nanos(10, 2), 7, "view", 1.0, "{}")],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    out = run_to_memory(running_user_counts(ev), "update")
    counts = sorted(r["n_events"] for r in out.collect() if r["user_id"] == 7)
    # one update per micro-batch: 2 after A, 3 after A+B (file order is
    # deterministic by path)
    assert counts == [2, 3]


@pytest.mark.slow
def test_stateful_last_ts_never_regresses_on_late_batch(spark, tmp_path):
    """The (count, last_ts) pair lives in STATE: a second micro-batch
    carrying only LATE events must not pull last-seen backwards."""
    d = tmp_path / "late_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [(1, _nanos(12, 0), 7, "view", 1.0, "{}")],
    )
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [(2, _nanos(10, 30), 7, "view", 1.0, "{}")],  # out-of-order
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    out = run_to_memory(running_user_counts(ev), "update")
    rows = sorted(
        (r["n_events"], r["last_ts"]) for r in out.collect() if r["user_id"] == 7
    )
    assert [n for n, _ in rows] == [1, 2]
    # the second (late) update keeps the 12:00 last-seen, not 10:30
    assert rows[1][1] == rows[0][1]


@pytest.mark.slow
def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """State-bounded streaming dedup: dropDuplicatesWithinWatermark keeps
    a key's dedup state only while it is inside the watermark window, so
    state size is bounded by the lateness budget instead of growing with
    total distinct keys forever — the production-scale form of
    streaming_dedup_events. Duplicates arriving within the window are
    dropped; the same key reappearing after the watermark has moved past
    it is treated as new."""
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    _write_batch(
        spark,
        f"{src}/b0.parquet",
        [
            (1, _nanos(10, 0), 7, "click", 1.0, "{}"),
            (2, _nanos(10, 0), 7, "click", 1.0, "{}"),  # dup within window
            (3, _nanos(10, 5), 8, "view", 1.0, "{}"),
        ],
    )
    _write_batch(
        spark,
        f"{src}/b1.parquet",
        # advances the watermark far past 10:00, evicting key (7, click)
        [(4, _nanos(12, 0), 9, "view", 1.0, "{}")],
    )
    _write_batch(
        spark,
        f"{src}/b2.parquet",
        # same key long after its watermark window: the CONTRACT only
        # guarantees dedup inside the window; beyond it, dropping is
        # best-effort (state may or may not have been evicted yet), so the
        # test asserts nothing about this row beyond not crashing
        [(5, _nanos(12, 1), 7, "click", 1.0, "{}")],
    )
    ev = events_stream(spark, src, max_files_per_trigger=1)
    deduped = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    got = sorted(
        (r["user_id"], r["event_type"]) for r in run_to_memory(deduped, "append").collect()
    )
    # the in-window duplicate (event 2) is gone; every distinct in-window
    # key appears exactly once
    assert got[:3] == [(7, "click"), (8, "view"), (9, "view")]
    assert len(got) <= 4


def test_continuous_trigger_rate_source_bounded_state(spark, tmp_path):
    """Sustained micro-batch operation — NOT availableNow on a bounded
    backlog: a rate source under trigger(processingTime=...) runs for
    several micro-batches while a keyed stateful running counter
    (applyInPandasWithState) folds rows into per-key state. The
    assertions: (a) multiple triggers actually fired with data, (b) per
    key the running count only grows in emission order, and (c) the state
    store holds EXACTLY |keys| rows at steady state — state is bounded by
    key cardinality, not stream length, which is what lets the operator
    run forever."""
    import time

    n_keys = 4
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "200")
        .load()
        .select(
            (F.col("value") % n_keys).alias("user_id"),
            F.col("timestamp").alias("ts"),
        )
    )
    counts = running_user_counts(rate)
    q = (
        counts.writeStream.format("memory")
        .queryName("rate_running_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        data_batches = 0
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] > 0 and p["stateOperators"]:
                data_batches += 1
                if data_batches >= 3:
                    break
            time.sleep(0.5)
        assert data_batches >= 3, "rate stream never produced 3 data batches"
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state_rows == n_keys, q.lastProgress["stateOperators"]
    finally:
        q.stop()
    out = spark.table("rate_running_counts").collect()
    assert {r["user_id"] for r in out} == set(range(n_keys))
    seen: dict[int, int] = {}
    for r in out:
        assert r["n_events"] >= seen.get(r["user_id"], 0)
        seen[r["user_id"]] = r["n_events"]


def test_transform_with_state_running_counts(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas route of the same running
    counter (typed ValueState, RocksDB provider). The TWS Python driver
    worker speaks protobuf to the JVM state server, so this test skips
    where google.protobuf is unusable even via the App Engine shim
    (streaming/tws_env.py — round 11 un-blocked this container); the
    applyInPandasWithState twin above carries the continuous-trigger
    proof unconditionally."""
    from apache_beam_challange_spark.streaming.tws_env import ensure_protobuf

    reason = ensure_protobuf()
    if reason:
        pytest.skip(reason)
    import time

    from apache_beam_challange_spark.streaming.stateful import (
        running_key_counts_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "200")
            .load()
            .select((F.col("value") % 4).alias("key"))
        )
        q = (
            running_key_counts_tws(rate, "key")
            .writeStream.format("memory")
            .queryName("tws_rate_counts")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                p = q.lastProgress
                if p and p["numInputRows"] > 0 and p["stateOperators"]:
                    break
                time.sleep(0.5)
            assert q.lastProgress["stateOperators"][0]["numRowsTotal"] <= 4
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@pytest.mark.slow
def test_slowly_changing_dim_refresh_via_foreach_batch(spark, tmp_path):
    """Stream-static enrichment against a SLOWLY CHANGING dimension: the
    dim parquet is overwritten between micro-batches, and the foreachBatch
    sink re-reads it per batch — so batch N joins the dim AS OF batch N
    (the production pattern for dim refresh without restarting the query;
    a plan-cached static join side may legally serve stale snapshots).
    Batch 1 must see v1 labels, batch 2 (same keys) v2 labels."""
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    dim_path = str(tmp_path / "dim.parquet")

    def write_dim(version: str) -> None:
        spark.createDataFrame(
            [(7, f"seg-{version}"), (8, f"seg-{version}")],
            "user_id long, segment string",
        ).coalesce(1).write.mode("overwrite").parquet(dim_path)

    write_dim("v1")
    # both micro-batches staged up front (availableNow snapshots the file
    # list at start; maxFilesPerTrigger=1 splits them into two batches,
    # processed in deterministic path order)
    _write_batch(
        spark, f"{src}/b0.parquet", [(1, _nanos(10, 0), 7, "view", 1.0, "{}")]
    )
    _write_batch(
        spark, f"{src}/b1.parquet", [(2, _nanos(10, 1), 7, "click", 1.0, "{}")]
    )
    seen: list[tuple[int, int, str]] = []

    def enrich(batch_df, batch_id: int) -> None:
        dim = batch_df.sparkSession.read.parquet(dim_path)
        rows = (
            batch_df.join(dim, "user_id", "left")
            .select("user_id", "segment")
            .collect()
        )
        seen.extend((batch_id, r["user_id"], r["segment"]) for r in rows)
        if batch_id == 0:
            # the dim changes AFTER batch 0 is enriched, BEFORE batch 1
            write_dim("v2")

    ev = events_stream(spark, src, max_files_per_trigger=1)
    q = ev.writeStream.foreachBatch(enrich).trigger(availableNow=True).start()
    q.awaitTermination()
    assert (0, 7, "seg-v1") in seen
    assert (1, 7, "seg-v2") in seen


@pytest.mark.slow
def test_foreachbatch_latest_snapshot_upsert(spark, tmp_path):
    """Streaming snapshot maintenance: micro-batches upsert latest-per-user
    rows into an at-rest parquet snapshot via foreachBatch; after draining
    the backlog the snapshot equals the batch latest-per-key answer over
    ALL events, including keys whose latest row arrived in an early batch."""
    from apache_beam_challange_spark.sources.publish import read_published
    from apache_beam_challange_spark.streaming.maintenance import (
        maintain_latest_snapshot,
    )

    d = tmp_path / "in"
    d.mkdir()
    # batch A: users 1, 2; batch B: user 1 newer, user 3; batch C: user 2
    # OLDER than its batch-A row (must NOT overwrite — latest-wins)
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(10, 30), 2, "click", 2.0, "{}"),
        ],
    )
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [
            (3, _nanos(11, 0), 1, "buy", 3.0, "{}"),
            (4, _nanos(9, 0), 3, "view", 4.0, "{}"),
        ],
    )
    _write_batch(
        spark,
        str(d / "c.parquet"),
        [(5, _nanos(10, 15), 2, "view", 5.0, "{}")],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    snap = str(tmp_path / "snapshot")
    maintain_latest_snapshot(
        ev, snap, str(tmp_path / "ckpt"), key="user_id"
    )
    got = {
        r["user_id"]: (str(r["ts"]), r["event_type"], r["value"])
        for r in read_published(spark, snap).collect()
    }
    assert got == {
        1: ("2024-01-01 11:00:00", "buy", 3.0),
        2: ("2024-01-01 10:30:00", "click", 2.0),
        3: ("2024-01-01 09:00:00", "view", 4.0),
    }
    # idempotent restart: re-running with the same checkpoint sees no new
    # files and leaves the snapshot unchanged
    ev2 = events_stream(spark, str(d), max_files_per_trigger=1)
    maintain_latest_snapshot(
        ev2, snap, str(tmp_path / "ckpt"), key="user_id"
    )
    again = {
        r["user_id"]: (str(r["ts"]), r["event_type"], r["value"])
        for r in read_published(spark, snap).collect()
    }
    assert again == got


@pytest.mark.slow
def test_latest_snapshot_crash_leaves_old_version_readable(spark, tmp_path):
    """Crash injection for the streaming upsert: a batch that dies between
    writing its new snapshot version and flipping the pointer leaves the
    previous snapshot live; the checkpoint retry re-merges from that
    COMPLETE version, so no key is lost (the ADVICE torn-dir data-loss
    window is structurally closed)."""
    from apache_beam_challange_spark.sources import publish as pub
    from apache_beam_challange_spark.streaming.maintenance import (
        maintain_latest_snapshot,
    )

    d = tmp_path / "in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(10, 30), 2, "click", 2.0, "{}"),
        ],
    )
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    maintain_latest_snapshot(
        events_stream(spark, str(d), max_files_per_trigger=1),
        snap,
        ckpt,
        key="user_id",
    )
    before = {
        r["user_id"]: str(r["ts"])
        for r in pub.read_published(spark, snap).collect()
    }
    assert set(before) == {1, 2}

    # second input file; its merge batch crashes before the pointer flip
    _write_batch(
        spark, str(d / "b.parquet"), [(3, _nanos(11, 0), 3, "buy", 3.0, "{}")]
    )
    real_flip = pub._pointer_flip

    def _boom(src, dst):
        raise OSError("injected crash before pointer flip")

    pub._pointer_flip = _boom
    try:
        import pytest as _pytest

        with _pytest.raises(Exception):
            maintain_latest_snapshot(
                events_stream(spark, str(d), max_files_per_trigger=1),
                snap,
                ckpt,
                key="user_id",
            )
    finally:
        pub._pointer_flip = real_flip

    # reader still sees the complete pre-crash snapshot
    assert {
        r["user_id"]: str(r["ts"])
        for r in pub.read_published(spark, snap).collect()
    } == before

    # checkpoint retry recovers: user 3 lands, users 1 and 2 survive
    maintain_latest_snapshot(
        events_stream(spark, str(d), max_files_per_trigger=1),
        snap,
        ckpt,
        key="user_id",
    )
    final = {
        r["user_id"]: str(r["ts"])
        for r in pub.read_published(spark, snap).collect()
    }
    assert set(final) == {1, 2, 3}
    assert final[1] == before[1] and final[2] == before[2]


@pytest.mark.slow
def test_route_quality_stream_splits_and_tags(spark, tmp_path):
    """Streaming dead-letter routing: micro-batches split into clean and
    quarantined rows using the SAME rule definitions as the batch
    accounting query; quarantined rows carry the names of every violated
    rule, the union of both sinks is exactly the input, and a checkpoint
    restart appends nothing."""
    from apache_beam_challange_spark.streaming.maintenance import (
        route_quality_stream,
    )

    d = tmp_path / "in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 10.0, "{}"),        # clean
            (2, _nanos(10, 1), 2, "error", 10.0, "{}"),       # error_type
            (3, _nanos(10, 2), 3, "view", 500.0, '{"k": 90}'),  # value+props
        ],
    )
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [
            (4, _nanos(11, 0), 4, "click", 20.0, '{"k": 5}'),  # clean
            (5, _nanos(11, 1), 5, "error", 450.0, "{}"),       # error+value
            (6, _nanos(11, 2), 6, "view", 5.0, "not json"),    # malformed
        ],
    )
    good, bad = str(tmp_path / "good"), str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    route_quality_stream(
        events_stream(spark, str(d), max_files_per_trigger=1), good, bad, ckpt
    )
    good_ids = {r["event_id"] for r in spark.read.parquet(good).collect()}
    bad_rows = {
        r["event_id"]: r["rules"] for r in spark.read.parquet(bad).collect()
    }
    assert good_ids == {1, 4}
    assert bad_rows == {
        2: "error_type",
        3: "value_above_400,props_k_above_80",
        5: "value_above_400,error_type",
        6: "props_malformed",  # fail-closed: garbage props quarantines
    }
    # restart: checkpoint sees no new files, sinks unchanged
    route_quality_stream(
        events_stream(spark, str(d), max_files_per_trigger=1), good, bad, ckpt
    )
    assert {r["event_id"] for r in spark.read.parquet(good).collect()} == good_ids
    assert {
        r["event_id"] for r in spark.read.parquet(bad).collect()
    } == set(bad_rows)


@pytest.mark.slow
def test_maintain_lsh_index_stream_matches_batch_rebuild(spark, tmp_path):
    """Streaming index maintenance: ingesting embeddings as micro-batches
    must leave the at-rest LSH index identical (contents AND served
    answers) to a batch rebuild over the same vectors, and a checkpoint
    restart must change nothing."""
    from pyspark.sql.types import ArrayType, FloatType, IntegerType

    from apache_beam_challange_spark.operators.similarity import (
        ann_lsh_multitable_topk_indexed,
        lsh_write_index,
    )
    from apache_beam_challange_spark.sources.catalog import load_table
    from apache_beam_challange_spark.streaming.maintenance import (
        maintain_lsh_index_stream,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    d = tmp_path / "vec_in"
    d.mkdir()
    # two micro-batch files splitting the corpus
    for name, pred in (("a", F.col("vec_id") < 250), ("b", F.col("vec_id") >= 250)):
        import glob as _glob
        import shutil

        staging = str(tmp_path / f"stage_{name}")
        emb.filter(pred).coalesce(1).write.parquet(staging)
        (part,) = _glob.glob(f"{staging}/part-*.parquet")
        shutil.copy(part, str(d / f"{name}.parquet"))

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    inc = str(tmp_path / "lsh_stream")
    ckpt = str(tmp_path / "ckpt")
    maintain_lsh_index_stream(stream, inc, ckpt)

    full = str(tmp_path / "lsh_full")
    lsh_write_index(emb, full)
    canon = lambda p: sorted(
        tuple(r) for r in spark.read.parquet(p).collect()
    )
    assert canon(inc) == canon(full)

    def serve(p):
        return [
            tuple(r)
            for r in ann_lsh_multitable_topk_indexed(
                emb, spark.read.parquet(p), query_vec_id=0, k=10
            ).collect()
        ]

    assert serve(inc) == serve(full)

    # restart: no new files -> nothing appended
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    maintain_lsh_index_stream(stream2, inc, ckpt)
    assert canon(inc) == canon(full)


@pytest.mark.slow
def test_interval_join_operator_joins_across_batches(spark, tmp_path):
    """The click->purchase attribution join must match across micro-batch
    boundaries (click buffered in join state until its purchase arrives),
    and a click whose attribution window has fully passed the watermark
    must be EVICTED from join state — the state-bounding contract the
    operator's docstring claims. (Input-side late-row filtering in
    stream-stream joins is best-effort in Spark; eviction is the hard
    guarantee, so that is what this asserts: by batch 3 the end-of-batch-2
    eviction pass has dropped the 10:00 click — watermark 12:00 is past
    10:30 — and its in-window purchase can no longer join.)"""
    from apache_beam_challange_spark.streaming.windows import (
        click_purchase_interval_join,
    )

    d = tmp_path / "cpj_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "b1.parquet"),
        [
            (1, _nanos(11, 50), 1, "click", 1.0, "{}"),  # joins in batch 2
            (2, _nanos(10, 0), 2, "click", 1.0, "{}"),   # evicted by batch 3
            # watermark advancers on BOTH sides: the global watermark is
            # the MIN across the two watermark operators, so a side that
            # never sees a row would pin it at epoch 0 and nothing would
            # ever evict (users 8/9 join nothing)
            (3, _nanos(13, 0), 8, "click", 1.0, "{}"),
            (6, _nanos(13, 0), 9, "purchase", 1.0, "{}"),
        ],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    joined = click_purchase_interval_join(ev)
    # stage later batches BEFORE starting: availableNow lists all files
    # and maxFilesPerTrigger=1 sequences them into separate micro-batches
    # in staging (mtime) order
    _write_batch(
        spark,
        str(d / "b2.parquet"),
        [(4, _nanos(12, 5), 1, "purchase", 1.0, "{}")],  # in window, on time
    )
    _write_batch(
        spark,
        str(d / "b3.parquet"),
        # in-window for click 2, but that click's state was evicted at the
        # end of batch 2 (watermark 12:00 > 10:00 + 30m) -> no join
        [(5, _nanos(10, 10), 2, "purchase", 1.0, "{}")],
    )
    out = run_to_memory(joined, "append")
    rows = {(r["click_id"], r["purchase_id"], r["delay_sec"]) for r in out.collect()}
    assert rows == {(1, 4, 15 * 60)}


@pytest.mark.slow
def test_user_session_stats_across_batches_match_batch_groupby(spark, tmp_path):
    """The multi-stat keyed-state operator must fold micro-batches into
    the same per-user stats a batch GROUP BY computes — count, distinct
    types, first/last seen, fixed-point value sum."""
    from apache_beam_challange_spark.streaming.stateful import user_session_stats

    d = tmp_path / "uss_in"
    d.mkdir()
    b1 = [
        (1, _nanos(10, 0), 1, "view", 1.25, "{}"),
        (2, _nanos(10, 5), 1, "click", 2.5, "{}"),
        (3, _nanos(10, 2), 2, "view", -0.75, "{}"),
    ]
    b2 = [
        (4, _nanos(9, 55), 1, "view", 0.1, "{}"),   # earlier first_ts, dup type
        (5, _nanos(10, 30), 2, "purchase", 3.3, "{}"),
    ]
    _write_batch(spark, str(d / "b1.parquet"), b1)
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    sdf = user_session_stats(ev)
    _write_batch(spark, str(d / "b2.parquet"), b2)
    out = run_to_memory(sdf, "update")
    # update mode emits one row per touched key per batch: the FINAL
    # update per user is the lifetime answer
    final = {}
    for r in out.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    batch = {
        r["user_id"]: r
        for r in (
            events_stream(spark, str(d))
            .groupBy("user_id")
            .applyInPandasWithState(
                # reuse the operator in ONE batch as the reference fold
                __import__(
                    "apache_beam_challange_spark.streaming.stateful",
                    fromlist=["_session_stats_updates"],
                )._session_stats_updates,
                outputStructType=(
                    "user_id bigint, n_events bigint, n_types int, "
                    "first_ts timestamp_ntz, last_ts timestamp_ntz, "
                    "value_micros bigint"
                ),
                stateStructType=(
                    "n bigint, types string, ft bigint, lt bigint, vm bigint"
                ),
                outputMode="update",
                timeoutConf=__import__(
                    "pyspark.sql.streaming.state", fromlist=["GroupStateTimeout"]
                ).GroupStateTimeout.NoTimeout,
            )
            .transform(lambda df: run_to_memory(df, "update"))
            .collect()
        )
    }
    assert set(final) == {1, 2}
    for uid in final:
        for f in ("n_events", "n_types", "first_ts", "last_ts", "value_micros"):
            assert final[uid][f] == batch[uid][f], (uid, f)
    # spot-check the exact fixed-point fold for user 1
    import math

    expect_vm = sum(int(math.floor(v * 1e6)) for v in (1.25, 2.5, 0.1))
    assert final[1]["value_micros"] == expect_vm
    assert final[1]["n_events"] == 3 and final[1]["n_types"] == 2


@pytest.mark.slow
def test_user_session_stats_tws_twin(spark, tmp_path):
    """The transformWithStateInPandas twin of user_session_stats (typed
    ValueState/ListState). Protobuf-gated like the running-counts TWS
    test; where it runs it must equal the batch GROUP BY."""
    from apache_beam_challange_spark.streaming.tws_env import ensure_protobuf

    reason = ensure_protobuf()
    if reason:
        pytest.skip(reason)
    from apache_beam_challange_spark.streaming.stateful import (
        user_session_stats_tws,
    )

    d = tmp_path / "tws_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "b1.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 1.25, "{}"),
            (2, _nanos(10, 5), 1, "click", 2.5, "{}"),
        ],
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = events_stream(spark, str(d))
        out = run_to_memory(user_session_stats_tws(ev), "update")
        (r,) = out.collect()
        assert (r["user_id"], r["n_events"], r["n_types"]) == (1, 2, 2)
        assert r["value_micros"] == 1250000 + 2500000
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@pytest.mark.slow
def test_dedup_within_watermark_reemits_after_state_expiry(spark, tmp_path):
    """dropDuplicatesWithinWatermark's bounded-state contract: a
    duplicate inside the horizon is suppressed; once the watermark
    passes the key's expiry its state is dropped, so a LATER duplicate
    is re-emitted (plain dropDuplicates would suppress it forever —
    with unbounded state)."""
    from pyspark.sql import functions as F

    d = tmp_path / "ddww_in"
    d.mkdir()
    # batch a: first occurrence of the key
    _write_batch(spark, str(d / "a.parquet"), [(1, _nanos(10, 0), 1, "view", 1.0, "{}")])
    # batch b: duplicate within the 1h horizon (suppressed) + a row far
    # ahead that advances the watermark past the key's expiry
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [
            (2, _nanos(10, 10), 1, "view", 1.0, "{}"),
            (3, _nanos(20, 0), 9, "click", 1.0, "{}"),
        ],
    )
    # batch c: same key again. Still SUPPRESSED: state eviction runs at
    # the END of a batch with the watermark derived from the PREVIOUS
    # batch's max event time, so (1, view)'s expired state (expiry 11:00
    # < wm 19:00) is only removed when batch c commits — its row dedups
    # against the stale entry first. This is the documented
    # at-least-the-horizon guarantee: within-delay duplicates are ALWAYS
    # suppressed; expired keys are dropped eventually, not instantly.
    _write_batch(spark, str(d / "c.parquet"), [(4, _nanos(21, 0), 1, "view", 1.0, "{}")])
    # batch d: after c's commit evicted the key, the next duplicate IS
    # re-emitted — bounded state means history is forgotten past the
    # horizon (plain dropDuplicates would suppress it forever).
    _write_batch(spark, str(d / "d.parquet"), [(5, _nanos(21, 30), 1, "view", 1.0, "{}")])
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    ded = (
        ev.select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
        )
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out = run_to_memory(ded, "append")
    rows = sorted((r.user_id, r.event_type) for r in out.collect())
    assert rows == [(1, "view"), (1, "view"), (9, "click")]


@pytest.mark.slow
def test_gap_sessions_timer_flushes_only_after_watermark(spark, tmp_path):
    """EventTimeTimeout semantics: a session closed BY DATA (later event
    past the gap) emits immediately; the final open session emits only
    when a later batch's watermark passes its gap horizon — the
    timer-driven flush. A session whose horizon the watermark never
    passes stays in state, unemitted."""
    from apache_beam_challange_spark.streaming.stateful import gap_sessions

    d = tmp_path / "gap_in"
    d.mkdir()
    # batch a: user 1 has two sessions' worth of data (gap > 30 min
    # between 10:00-10:10 and 11:00) -> first session emitted from data
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(10, 10), 1, "view", 1.0, "{}"),
            (3, _nanos(11, 0), 1, "view", 1.0, "{}"),
        ],
    )
    # batch b: another user far ahead -> watermark 19:00 passes user 1's
    # open-session horizon (11:30) -> timer fires, session flushed; user
    # 9's own session (19:50..) stays open forever (watermark never
    # reaches 20:20+)
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [(4, _nanos(19, 50), 9, "view", 1.0, "{}")],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    out = run_to_memory(gap_sessions(ev), "append")
    rows = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in out.collect()
    )
    assert rows == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (1, "2024-01-01 11:00:00", "2024-01-01 11:00:00", 1),
    ]


@pytest.mark.slow
def test_gap_sessions_late_data_never_regresses_boundaries(spark, tmp_path):
    """Late-data contract: a late event adjacent to the open session
    merges WITHOUT regressing session_end (the naive merge emitted
    session_end < session_start and pulled the timer early — found by
    review); a late event beyond the open session's gap horizon
    sessionizes alone."""
    from apache_beam_challange_spark.streaming.stateful import gap_sessions

    d = tmp_path / "gap_late_in"
    d.mkdir()
    # batch a: open session 12:00-12:05
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(12, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(12, 5), 1, "view", 1.0, "{}"),
        ],
    )
    # batch b: late 11:50 (within one gap before start -> merges, start
    # moves back, END DOES NOT REGRESS), late 9:00 (beyond horizon ->
    # singleton), plus a far-future row advancing the watermark so every
    # session flushes
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [
            (3, _nanos(11, 50), 1, "view", 1.0, "{}"),
            (4, _nanos(9, 0), 1, "view", 1.0, "{}"),
            (5, _nanos(23, 0), 9, "click", 1.0, "{}"),
        ],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    out = run_to_memory(gap_sessions(ev), "append")
    rows = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in out.collect()
        if r.user_id == 1
    )
    assert rows == [
        (1, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1),
        (1, "2024-01-01 11:50:00", "2024-01-01 12:05:00", 3),
    ]
    for _, start, end, _ in rows:
        assert start <= end


@pytest.mark.slow
def test_gap_sessions_same_batch_late_events_fold_together(spark, tmp_path):
    """Late-data contract, third direction (review): two beyond-horizon
    late events in the SAME batch that are within one gap of each other
    form ONE session — the same answer the batch-twin oracle's global
    gaps-and-islands gives — while a late event more than one gap from
    them still sessionizes alone."""
    from apache_beam_challange_spark.streaming.stateful import gap_sessions

    d = tmp_path / "gap_multi_late_in"
    d.mkdir()
    # batch a: open session 12:00-12:05 (horizon = 11:30)
    _write_batch(
        spark,
        str(d / "a.parquet"),
        [
            (1, _nanos(12, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(12, 5), 1, "view", 1.0, "{}"),
        ],
    )
    # batch b: three beyond-horizon late events — 9:00 and 9:20 are
    # within one 30-min gap of each other (one session), 8:00 is not
    # (singleton) — plus a far-future watermark advancer
    _write_batch(
        spark,
        str(d / "b.parquet"),
        [
            (3, _nanos(9, 0), 1, "view", 1.0, "{}"),
            (4, _nanos(9, 20), 1, "view", 1.0, "{}"),
            (5, _nanos(8, 0), 1, "view", 1.0, "{}"),
            (6, _nanos(23, 0), 9, "click", 1.0, "{}"),
        ],
    )
    ev = events_stream(spark, str(d), max_files_per_trigger=1)
    out = run_to_memory(gap_sessions(ev), "append")
    rows = sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in out.collect()
        if r.user_id == 1
    )
    assert rows == [
        (1, "2024-01-01 08:00:00", "2024-01-01 08:00:00", 1),
        (1, "2024-01-01 09:00:00", "2024-01-01 09:20:00", 2),
        (1, "2024-01-01 12:00:00", "2024-01-01 12:05:00", 2),
    ]


@pytest.mark.slow
def test_full_outer_interval_join_partitions_rows(spark, sf_dir):
    """Full outer = inner pairs + null-padded clicks + null-padded
    purchases, mutually exclusive; the left-outer result is exactly the
    full-outer rows carrying a click."""
    import __spark_entry__ as em

    QS = em.all_queries()
    full = QS["stream_stream_full_outer_join"](spark, sf_dir).collect()
    left = QS["stream_stream_left_outer_join"](spark, sf_dir).collect()
    inner = QS["stream_stream_interval_join"](spark, sf_dir).collect()
    matched = [r for r in full if r.click_id is not None and r.purchase_id is not None]
    null_p = [r for r in full if r.purchase_id is None]
    null_c = [r for r in full if r.click_id is None]
    assert len(matched) + len(null_p) + len(null_c) == len(full)
    assert len(matched) == len(inner)
    # left outer == full outer minus the purchase-only rows
    assert len(left) == len(matched) + len(null_p)
    # every row still carries the side-agnostic user key
    assert all(r.user_id is not None for r in full)


@pytest.mark.slow
def test_tws_gap_reported_loudly():
    """tools/check_tws.py (VERDICT r6 #8) must either run the real TWS
    equality check (exit 0/1) or report the environment gap LOUDLY
    (exit 3 with the exact missing piece) — the unverified-in-container
    status of the transformWithStateInPandas twins shows up in every
    round's record, not only in a docstring."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/check_tws.py"],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=600,
    )
    assert r.returncode in (0, 3), r.stdout + r.stderr
    if r.returncode == 3:
        assert "TWS ENVIRONMENT GAP" in r.stdout
        assert "protobuf" in r.stdout


def test_left_semi_interval_join_is_distinct_matched_clicks(spark, sf_dir):
    """Semi = the DISTINCT click side of the inner join (one row per
    converting click, no per-purchase duplication), and every semi row
    is unique."""
    import __spark_entry__ as em

    QS = em.all_queries()
    semi = QS["stream_stream_left_semi_join"](spark, sf_dir).collect()
    inner = QS["stream_stream_interval_join"](spark, sf_dir).collect()
    semi_keys = [(r.user_id, r.click_id) for r in semi]
    inner_clicks = {(r.user_id, r.click_id) for r in inner}
    assert set(semi_keys) == inner_clicks
    assert len(semi_keys) == len(set(semi_keys))


@pytest.mark.slow
def test_streaming_cdc_merge_batch_split_invariance(spark, sf_dir):
    """Round-8 streaming CDC apply: the ts-guarded MERGE fold must
    converge to the SAME snapshot no matter how the changelog splits
    into micro-batches (2 files vs 7 files, each file one batch) — the
    order-independence that makes foreachBatch-MERGE safe under
    repartitioned/late-arriving feeds. Both must also equal the batch
    route's answer."""
    import __spark_entry__ as em
    from apache_beam_challange_spark.plans.stream import _stream_cdc_merge

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    two = canon(_stream_cdc_merge(spark, sf_dir, n_files=2))
    seven = canon(_stream_cdc_merge(spark, sf_dir, n_files=7))
    assert two == seven
    batch = canon(em.all_queries()["cdc_snapshot_with_deletes"](spark, sf_dir))
    assert two == batch


@pytest.mark.slow
def test_state_ttl_eviction_tws(spark, tmp_path):
    """State-TTL eviction PROOF (VERDICT r10 #7) on the TWS timer route:
    a user idle past the 2 h event-time TTL gets its state evicted — the
    eviction emits a tombstone (evicted=true, final count), and a LATER
    event from the same user restarts the count from zero (the
    behavioral proof the state store row is really gone, not just
    shadowed). A user active within the TTL keeps accumulating and never
    tombstones (its timer is re-armed forward on every batch).

    Trace (watermark delay 10 min, TTL 2 h): b1 arms user 1's timer at
    12:05; b2's max event 13:30 pushes the watermark to 13:20; b3
    processes with that watermark, so the 12:05 timer FIRES (guard:
    last_seen 10:05 + 2 h <= expiry) -> clear + tombstone; b4's user-1
    event finds no state and counts from 1."""
    from apache_beam_challange_spark.streaming.stateful import (
        user_counts_with_ttl_tws,
    )
    from apache_beam_challange_spark.streaming.tws_env import ensure_protobuf

    reason = ensure_protobuf()
    if reason:
        pytest.skip(reason)

    d = tmp_path / "ttl_in"
    d.mkdir()
    _write_batch(
        spark,
        str(d / "b1.parquet"),
        [
            (1, _nanos(10, 0), 1, "view", 1.0, "{}"),
            (2, _nanos(10, 5), 1, "click", 1.0, "{}"),
            (3, _nanos(10, 5), 2, "view", 1.0, "{}"),
        ],
    )
    _write_batch(
        spark, str(d / "b2.parquet"), [(4, _nanos(13, 30), 2, "view", 1.0, "{}")]
    )
    _write_batch(
        spark, str(d / "b3.parquet"), [(5, _nanos(13, 40), 3, "view", 1.0, "{}")]
    )
    _write_batch(
        spark, str(d / "b4.parquet"), [(6, _nanos(14, 0), 1, "view", 1.0, "{}")]
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = events_stream(spark, str(d), max_files_per_trigger=1)
        out = run_to_memory(user_counts_with_ttl_tws(ev), "update").collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    rows = {(r["user_id"], r["n_events"], r["evicted"]) for r in out}
    evicted = {t for t in rows if t[2]}
    # exactly one eviction: user 1 tombstoned with its final pre-TTL count
    assert evicted == {(1, 2, True)}, rows
    # the restart-from-zero row is the proof the state was really cleared
    assert (1, 1, False) in rows, rows
    assert (1, 2, False) in rows, rows  # the pre-eviction running count
    # user 2 stayed active inside the TTL: accumulates, never tombstones
    assert (2, 2, False) in rows, rows
    assert not any(u == 2 and e for u, _, e in rows), rows
    # user 3 (the watermark-advancing bystander) counts once, no eviction
    assert (3, 1, False) in rows, rows
