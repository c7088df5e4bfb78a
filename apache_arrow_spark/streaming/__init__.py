"""Structured Streaming surface (SURVEY §2.9)."""

from apache_arrow_spark.streaming.sources import (
    read_ipc_stream,
    replay_table_stream,
)
from apache_arrow_spark.streaming.ops import (
    run_foreachbatch_parquet_sink,
    run_to_memory_sink,
    session_windows,
    streaming_dedup,
    time_bounded_join,
    tumbling_window_counts,
)

__all__ = [
    "read_ipc_stream",
    "replay_table_stream",
    "tumbling_window_counts",
    "session_windows",
    "streaming_dedup",
    "time_bounded_join",
    "run_foreachbatch_parquet_sink",
    "run_to_memory_sink",
]
