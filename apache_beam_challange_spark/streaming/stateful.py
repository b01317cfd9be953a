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
STATE_SCHEMA = "n bigint"


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
    last_ts = None
    for pdf in batches:
        n_new += len(pdf)
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    (prev,) = state.get if state.exists else (0,)
    total = prev + n_new
    state.update((total,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [total], "last_ts": [last_ts]}
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
