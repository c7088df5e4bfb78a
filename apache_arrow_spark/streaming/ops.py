"""Streaming operators: tumbling/session windows, memory-sink runner.

The reference has no watermarks/windows/state (SURVEY §2.9) — these are the
Spark-native capabilities its stream consumers would hand-roll.  Windowed
aggregations use event time + watermark so late data is bounded-state at any
scale; the memory-sink runner exists for tests and the correctness harness
(availableNow trigger = process-everything-then-stop).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from apache_arrow_spark.compute.cast import CastOptions, timestamp_from_long


def with_event_time(df: DataFrame, ts_col: str = "ts", unit: str = "ns") -> DataFrame:
    """Attach ``event_time`` (timestamp) from an int64 epoch column —
    the ns->us engine cast on the streaming path."""
    ts = timestamp_from_long(F.col(ts_col), unit, CastOptions(allow_time_truncate=True))
    return df.withColumn("event_time", ts.cast("timestamp"))


def tumbling_window_counts(
    df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Windowed count/avg per key with a watermark bound on state."""
    keys = keys or ["event_type"]
    return (
        df.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "avg_value")
    )


def session_windows(
    df: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) per key — built-in ``session_window``;
    the canonical custom-stateful example, no state store code needed."""
    return (
        df.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("s"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    checkpoint_location: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame with Trigger.AvailableNow into an
    in-memory table; returns the materialized result as a batch DataFrame.

    ``checkpoint_location``: pass a durable (shared-storage) path to keep
    exactly-once/recovery guarantees.  When omitted, an EPHEMERAL scratch
    checkpoint is used (/dev/shm when available — the per-micro-batch
    offset/commit log writes otherwise hit fsync-paced disk, which
    dominates short availableNow runs) and deleted after termination:
    right for tests/benchmarks, wrong for a production sink.
    """
    name = f"aas_sink_{uuid.uuid4().hex[:8]}"
    ephemeral = checkpoint_location is None
    if ephemeral:
        shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
        ckpt = tempfile.mkdtemp(prefix="aas_ckpt_", dir=shm)
    else:
        ckpt = checkpoint_location
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if ephemeral:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
