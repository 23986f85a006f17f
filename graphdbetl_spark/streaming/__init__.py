from graphdbetl_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_stats,
    streaming_tumbling_counts,
    streaming_dedup,
)
from graphdbetl_spark.streaming.stateful import stateful_running_totals
from graphdbetl_spark.streaming.ingest import start_node_ingest, upsert_batch

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "streaming_tumbling_counts",
    "streaming_dedup",
    "stateful_running_totals",
    "start_node_ingest",
    "upsert_batch",
]
