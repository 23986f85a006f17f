from graphdbetl_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_stats,
    streaming_tumbling_counts,
    streaming_dedup,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "streaming_tumbling_counts",
    "streaming_dedup",
]
