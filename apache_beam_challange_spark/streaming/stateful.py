"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8 / §2.9) — the Spark analog of Beam's state/timer DoFns
(which the reference never uses; its DoFns are stateless, P7).

Example operator: per-user running event counter with last-seen timestamp.
State is a single (count, last_ts) pair per key, stored in Spark's state
store (RocksDB-backed on a real cluster) — partitioned by key, scales
horizontally with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_ts timestamp_ntz"
#: (count, last-seen ts as epoch MICROS) — last_ts must live in state, not
#: be recomputed per batch, or an out-of-order micro-batch would emit a
#: REGRESSED last-seen value (found by review; the docstring's
#: "(count, last_ts) pair" contract is now actually what is stored).
STATE_SCHEMA = "n bigint, t bigint"


def _count_updates(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into per-user running counts."""
    import warnings

    # pandas emits a concat FutureWarning from inside pyspark's serializer
    # for state batches; it is upstream noise, not ours.
    warnings.filterwarnings("ignore", category=FutureWarning)
    n_new = 0
    batch_last = None
    for pdf in batches:
        n_new += len(pdf)
        batch_max = pdf["ts"].max()
        if batch_last is None or batch_max > batch_last:
            batch_last = batch_max
    prev_n, prev_t = state.get if state.exists else (0, None)
    total = prev_n + n_new
    # merge, don't replace: a late batch must never regress last-seen
    batch_micros = (
        None if batch_last is None else int(pd.Timestamp(batch_last).value // 1000)
    )
    last_micros = max(
        (t for t in (prev_t, batch_micros) if t is not None), default=None
    )
    state.update((total, last_micros))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [total],
            "last_ts": [
                None if last_micros is None else pd.Timestamp(last_micros * 1000)
            ],
        }
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Streaming per-user running counts with explicit keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_updates,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_key_counts_tws(keyed: DataFrame, key_col: str = "key") -> DataFrame:
    """Per-key running counts on the Spark 4 ``transformWithStateInPandas``
    API — the successor to ``applyInPandasWithState`` with composable typed
    state (ValueState/ListState/MapState + timers). State here is ONE
    ValueState long per key, so the state store holds exactly |keys| rows
    at steady state regardless of how long the stream runs — the property
    the continuous-trigger test asserts from query progress metrics.

    Requires the RocksDB state store provider (the only provider
    transformWithState supports); callers set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly. ALSO
    requires a working ``google.protobuf`` (the TWS driver worker speaks
    protobuf to the JVM state server) — absent in this container, so the
    operator is exercised by a protobuf-gated test and the
    continuous-trigger proof runs on :func:`running_user_counts`
    (applyInPandasWithState needs no protobuf)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n_new = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            total = prev + n_new
            self._count.update((total,))
            yield pd.DataFrame({"key": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    return keyed.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningCount(),
        outputStructType="key bigint, n_events bigint",
        outputMode="update",
        timeMode="none",
    )
