"""Structured Streaming surface (SURVEY §2.9)."""

from apache_arrow_spark.streaming.sources import (
    read_ipc_stream,
    replay_table_stream,
)
from apache_arrow_spark.streaming.ops import (
    run_to_memory_sink,
    session_windows,
    tumbling_window_counts,
)

__all__ = [
    "read_ipc_stream",
    "replay_table_stream",
    "tumbling_window_counts",
    "session_windows",
    "run_to_memory_sink",
]
