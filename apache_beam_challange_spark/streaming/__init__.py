from apache_beam_challange_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "run_to_memory",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
]
