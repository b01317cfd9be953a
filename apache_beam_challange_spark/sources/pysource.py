"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the engine's "bring your own connector" surface, mirroring the
reference's only exotic source (`ReadFromBigQuery`) with the modern
Spark-native extension point instead of a vendored client.

``events_gen`` is a deterministic synthetic events generator:

- **Batch**: the row range splits into ``numPartitions`` input
  partitions, each generated independently executor-side from a
  closed-form function of the row index — no driver materialization, no
  shuffle, content invariant to the partition count (asserted in
  tests). This is the connector shape any external system (REST
  cursor, message log, proprietary store) plugs into: partition
  planning on the driver, row production on executors.
- **Streaming**: a ``SimpleDataSourceStreamReader`` exposing the row
  index as the offset — each micro-batch reads the next
  ``batchRows`` rows, the engine checkpoints the offset, and replay
  between offsets regenerates identical rows (deterministic source =
  exactly-once semantics for free).

Rows match the ``events`` table schema, so every registered events
query can run unchanged against the generated source — swap
``load_table`` for ``spark.read.format("events_gen")`` and the same
plans execute (asserted in tests against `ohlc_bars`).
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENTS_GEN_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)

_TYPES = ("click", "signup", "error", "view", "purchase")
_BASE = dt.datetime(2024, 1, 1)


def gen_row(i: int) -> tuple:
    """Closed-form row ``i`` — pure function, so any partitioning /
    replay / engine produces identical content."""
    return (
        i,
        _BASE + dt.timedelta(seconds=7 * i),
        (i * 2654435761) % 97,
        _TYPES[i % 5],
        ((i * 31) % 1000) / 10.0,
        json.dumps({"k": i % 100}),
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class _EventsGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield gen_row(i)


class _EventsGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numRows", 1000))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        lo = start["index"]
        hi = min(lo + self.batch_rows, self.n_rows)
        return (iter([gen_row(i) for i in range(lo, hi)]), {"index": hi})

    def readBetweenOffsets(self, start, end):
        # deterministic replay: regenerating the range IS the recovery
        return iter([gen_row(i) for i in range(start["index"], end["index"])])


class EventsGenDataSource(DataSource):
    """``spark.read.format("events_gen")`` / ``spark.readStream.format(
    "events_gen")`` after ``spark.dataSource.register``."""

    @classmethod
    def name(cls):
        return "events_gen"

    def schema(self):
        return EVENTS_GEN_SCHEMA

    def reader(self, schema):
        return _EventsGenReader(self.options)

    def simpleStreamReader(self, schema):
        return _EventsGenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventsGenDataSource)
