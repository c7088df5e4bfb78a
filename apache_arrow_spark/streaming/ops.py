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
    the ns->us engine cast on the streaming path.  Schema-adaptive: if the
    source already carries a timestamp(_ntz) column (parquet timestamp[us]
    testdata), it is cast directly instead of long-epoch converted."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dt = df.schema[ts_col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return df.withColumn("event_time", F.col(ts_col).cast("timestamp"))
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


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    time_col: str = "event_time",
) -> DataFrame:
    """Ingestion-time exactly-once-per-key dedup: emit the first arrival of
    each key, drop re-deliveries seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps ONE state entry per key and
    expires it at the watermark — bounded state at any scale, the property
    a plain ``dropDuplicates`` on an unbounded stream lacks.  Downstream
    consumers should read only ``keys`` and columns functionally dependent
    on them: which physical duplicate wins is arrival-order-dependent.
    """
    return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    upper: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "event_time",
) -> DataFrame:
    """Stream-stream inner join: match right rows to left rows with the
    same ``key`` where ``right.time ∈ [left.time, left.time + upper]`` —
    the funnel/attribution join (click -> purchase within N minutes).

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, so Spark derives a state-cleanup horizon for each
    side — state stays proportional to ``upper`` + watermark, not to the
    stream's history.  Output columns are prefixed ``l_``/``r_``.
    """
    l = left.withWatermark(time_col, watermark)
    r = right.withWatermark(time_col, watermark)
    lp = l.select([F.col(c).alias(f"l_{c}") for c in l.columns])
    rp = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{time_col}") >= F.col(f"l_{time_col}"))
        & (F.col(f"r_{time_col}") <= F.col(f"l_{time_col}") + F.expr(f"INTERVAL {upper}"))
    )
    return lp.join(rp, cond)


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


def run_foreachbatch_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_location: str,
    mode: str = "append",
) -> None:
    """Execute a streaming DataFrame with Trigger.AvailableNow through a
    foreachBatch parquet sink — the production pattern for sinks Spark has
    no native streaming writer for (JDBC, MERGE targets, multi-table
    fan-out).

    Idempotence contract: each micro-batch writes to a ``batch=<id>``
    subdirectory with OVERWRITE semantics, so a batch replayed after a
    failure (same epoch id from the checkpoint's commit log) rewrites the
    same directory instead of duplicating rows — foreachBatch is
    at-least-once by itself; keying the write by batchId is what restores
    exactly-once output.  The checkpoint must be durable storage for that
    guarantee to survive a driver restart (unlike the ephemeral memory-
    sink scratch, it is REQUIRED here, not optional).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
