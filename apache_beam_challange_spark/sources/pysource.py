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
    """Supports FILTER PUSHDOWN on ``event_id``: range predicates narrow
    the generated index range BEFORE partition planning, so a filtered
    scan never produces (or even plans) the pruned rows — the connector
    half of predicate pushdown, the same contract a parquet scan's
    ``PushedFilters`` delivers. Unsupported filters are returned to Spark
    for post-scan evaluation (correctness never depends on pushdown)."""

    def __init__(self, options):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))
        self.lo_bound = 0
        self.hi_bound = self.n_rows

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            val = getattr(f, "value", None)
            if col == "event_id" and isinstance(val, int):
                if isinstance(f, EqualTo):
                    self.lo_bound = max(self.lo_bound, f.value)
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo_bound = max(self.lo_bound, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo_bound = max(self.lo_bound, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi_bound = min(self.hi_bound, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                    continue
            yield f  # not pushable — Spark evaluates it post-scan

    def partitions(self):
        lo0, hi0 = self.lo_bound, max(self.hi_bound, self.lo_bound)
        span = hi0 - lo0
        if span == 0:
            return [_RangePartition(0, 0)]
        step = max(1, -(-span // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, hi0))
            for lo in range(lo0, hi0, step)
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
    # required for pushFilters to reach the reader (off by default)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EventsGenDataSource)


# --- custom Python data sink: JSONL with manifest commit --------------------

import os
import uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    """Task side of the commit protocol: each task writes ONE uniquely
    named part file (uuid — a retried/speculative task never collides
    with its twin) and reports it in its commit message. Files are
    invisible to readers until the DRIVER's commit() publishes the
    manifest, so a failed/partial job leaves garbage bytes but never a
    readable half-result — the same write-then-publish discipline as
    sources/publish.py, expressed through Spark's own two-phase
    commit hooks."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        self.overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommitMessage(name, n)

    def commit(self, messages):
        # manifest lists exactly the committed task outputs; readers
        # trust ONLY manifested files, so stray part files from aborted
        # attempts are inert. APPEND mode merges the prior manifest (an
        # append that replaced it would silently orphan every earlier
        # committed row — found by review); OVERWRITE replaces it.
        manifest = sorted(m.filename for m in messages if m is not None)
        mpath = os.path.join(self.path, "_MANIFEST")
        # BOTH commit paths hold the same O_EXCL lock through their flip:
        # append is a read-modify-write (two concurrent appends could each
        # read the old file and the second flip would silently drop the
        # first job's committed rows — ADVICE r5), and an overwrite racing
        # an in-flight append is the same lost-update class (a mere
        # exists() check would be check-then-act and still racy — found by
        # review). The single-writer contract is a LOUD error instead; a
        # crashed holder leaves the lock behind by design — the operator
        # inspects and removes it, same as any half-finished ingest.
        lock = os.path.join(self.path, "_MANIFEST.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent write to {self.path}: {lock} exists — the "
                "jsonl_commit sink is single-writer per directory; if no "
                "other job is running, remove the stale lock"
            ) from None
        try:
            os.close(fd)
            if not self.overwrite and os.path.isfile(mpath):
                with open(mpath) as f:
                    manifest = sorted(
                        set(json.load(f)["files"]) | set(manifest)
                    )
            self._flip_manifest(mpath, manifest)
        finally:
            os.remove(lock)

    def _flip_manifest(self, mpath: str, manifest: list[str]) -> None:
        tmp = os.path.join(self.path, f"_MANIFEST.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"files": manifest}))
        os.replace(tmp, mpath)  # atomic flip

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlCommitDataSource(DataSource):
    """``df.write.format("jsonl_commit").option("path", ...).save()`` —
    a custom Python data SINK with a manifest-based two-phase commit."""

    @classmethod
    def name(cls):
        return "jsonl_commit"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options, overwrite)


def read_jsonl_commit(path: str) -> list[dict]:
    """Reader half of the contract: parse ONLY manifested part files
    (a directory without a _MANIFEST is unreadable-by-definition, not
    empty — mirroring sources/publish.py's refusal to treat an
    unversioned layout as an empty table)."""
    mpath = os.path.join(path, "_MANIFEST")
    if not os.path.isfile(mpath):
        raise FileNotFoundError(f"no _MANIFEST under {path}: nothing committed")
    with open(mpath) as f:
        files = json.load(f)["files"]
    rows: list[dict] = []
    for name in files:
        with open(os.path.join(path, name)) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    return rows
