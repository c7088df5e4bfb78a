"""Batch sessionization: gap-based session assignment over an event log.

The streaming side of this engine already has native session windows
(streaming/ops.py, F.session_window); this is the BATCH twin — the operator
every clickstream / telemetry pipeline runs over historical data, and one
the reference has no analog for (capability superset, like joins).

Algorithm: within each entity's timeline, a new session starts whenever the
gap to the previous event exceeds ``gap``; the session id is the running
count of session starts.  Both window passes (lag + running sum) share one
window spec, so Spark plans a SINGLE shuffle on the entity key and a single
per-partition sort — at 100 TB the operator moves each event exactly once.
The follow-up per-session aggregate groups by (entity, session); its keys
contain the shuffle key, so it reuses the existing partitioning without a
second exchange.

Skewed entities (one user with millions of events) serialize inside one
task — the standard mitigation is pre-splitting the timeline by coarse time
range before sessionizing, at the cost of possibly splitting a session at
the range boundary; this module keeps exact semantics and documents the
trade instead of silently approximating.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: Column | int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Append a ``session_seq`` column (1-based per entity).

    ``ts_col`` may be any orderable numeric/timestamp column; ``gap`` must
    be comparable with ``ts - lag(ts)`` differences (e.g. nanoseconds for a
    bigint-nanos timeline).  ``tiebreak_cols`` break equal-timestamp
    ordering deterministically (pass the event's unique id).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(prev.isNull() | (F.col(ts_col) - prev > gap), 1).otherwise(0)
    running = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(running))


def session_summary(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: Column | int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """(entity, session_seq, n_events, start, end) per session.

    The aggregate runs on the sessionize output without re-shuffling: its
    grouping keys contain the window's partition key.
    """
    s = sessionize(df, entity_col, ts_col, gap, tiebreak_cols)
    return s.groupBy(entity_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start"),
        F.max(ts_col).alias("end"),
    )
