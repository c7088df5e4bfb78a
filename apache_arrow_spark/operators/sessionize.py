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


def stitch_sessions(
    old_sessions: DataFrame,
    new_events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: int,
    boundary: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """INCREMENTAL sessionization: combine yesterday's session summaries
    with today's raw events and produce exactly what a full recompute
    over the whole timeline would — without re-reading yesterday's raw
    events.

    ``old_sessions`` is :func:`session_summary` output for the period
    before ``boundary``; ``new_events`` are the raw events at/after it.
    A session is OPEN at the boundary when ``boundary - end <= gap`` —
    only those can extend; each entity has at most one (its last).  The
    stitch joins open tails to each entity's FIRST new session and merges
    when the cross-boundary gap holds; everything else passes through.
    Correctness does not depend on the boundary position: at most one
    session per entity crosses it.

    Returns (entity, start, end, n_events) — session numbering is
    deliberately absent (it is not incrementally stable; spans are).

    Scale shape: the daily increment costs sessionize(delta) — one
    shuffle of the DELTA, never the history — plus two entity-keyed
    joins against the (sessions-sized) summary table.  This is the
    batch-incremental twin of the streaming session window's state
    store."""
    old = old_sessions.select(
        F.col(entity_col).alias("__e"),
        F.col("start").alias("__s"),
        F.col("end").alias("__end"),
        F.col("n_events").alias("__n"),
    )
    b = F.lit(int(boundary)).cast("long")
    g = F.lit(int(gap)).cast("long")
    closed_old = old.filter(b - F.col("__end") > g)
    tails = old.filter(b - F.col("__end") <= g)

    s_new = session_summary(new_events, entity_col, ts_col, gap, tiebreak_cols)
    first_new = s_new.filter(F.col("session_seq") == 1).select(
        F.col(entity_col).alias("__e"),
        F.col("start").alias("__ns"),
        F.col("end").alias("__ne"),
        F.col("n_events").alias("__nn"),
    )
    rest_new = s_new.filter(F.col("session_seq") > 1).select(
        F.col(entity_col).alias("__e"),
        F.col("start").alias("__s"),
        F.col("end").alias("__end"),
        F.col("n_events").alias("__n"),
    )
    j = tails.join(first_new, "__e", "full_outer")
    merged = F.col("__ns").isNotNull() & F.col("__end").isNotNull() & (
        F.col("__ns") - F.col("__end") <= g
    )
    # one row per (tail, first-new) pair: merged span, or the two pieces
    # kept separate (either piece may be absent under the full outer join)
    stitched = j.select(
        "__e",
        F.when(merged, F.col("__s")).otherwise(F.coalesce("__s", "__ns")).alias("a_s"),
        F.when(merged, F.col("__ne")).otherwise(F.coalesce("__end", "__ne")).alias("a_e"),
        F.when(merged, F.col("__n") + F.col("__nn"))
        .otherwise(F.coalesce("__n", "__nn"))
        .alias("a_n"),
        F.when(merged | F.col("__ns").isNull() | F.col("__end").isNull(), None)
        .otherwise(F.col("__ns"))
        .alias("b_s"),
        F.when(merged | F.col("__ns").isNull() | F.col("__end").isNull(), None)
        .otherwise(F.col("__ne"))
        .alias("b_e"),
        F.when(merged | F.col("__ns").isNull() | F.col("__end").isNull(), None)
        .otherwise(F.col("__nn"))
        .alias("b_n"),
    )
    part_a = stitched.select(
        "__e", F.col("a_s").alias("__s"), F.col("a_e").alias("__end"), F.col("a_n").alias("__n")
    )
    part_b = stitched.filter(F.col("b_s").isNotNull()).select(
        "__e", F.col("b_s").alias("__s"), F.col("b_e").alias("__end"), F.col("b_n").alias("__n")
    )
    out = closed_old.unionByName(part_a).unionByName(part_b).unionByName(rest_new)
    return out.select(
        F.col("__e").alias(entity_col),
        F.col("__s").alias("start"),
        F.col("__end").alias("end"),
        F.col("__n").cast("bigint").alias("n_events"),
    )


def debounce(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    min_gap: int,
) -> DataFrame:
    """Keep an entity's event only if it is at least ``min_gap`` after the
    last KEPT event — true debounce/throttle semantics.

    This is NOT expressible with lag(): whether an event is kept depends
    on which earlier events were kept (a dropped event must not reset
    the window), a sequential recurrence.  It runs as a PARTITION-level
    Arrow-batched walk (``repartition(entity) + sortWithinPartitions +
    mapInPandas``) — the custom-stateful-batch escape hatch the brief
    reserves for operators the built-ins genuinely can't express.  The
    partition-level shape replaces the earlier per-group applyInPandas:
    with many small entities the per-group pandas/Arrow call overhead
    dominated (measured 2.9 s for 100k rows / 1.5k groups at sf0.1; this
    shape is ~4x cheaper), while big batches amortize it and entities
    still parallelize across partitions.  Inside a batch the walk jumps
    with ``searchsorted`` from each kept event directly past its
    debounce window, so Python-level iterations ≈ kept events (not all
    events); carry state (last entity, last kept ts) crosses Arrow batch
    boundaries within a partition, which mapInPandas's order guarantee
    makes sound.  NULL entity keys are DROPPED up front: inside the walk
    a numeric null becomes NaN (NaN != NaN → every null row its own
    segment → all kept) while an object/string None groups — a
    dtype-dependent split no caller should inherit.  Coalesce nulls to a
    sentinel key before calling if null-key events must be debounced as
    one stream.  The declarative twin (a recursive CTE stepping from
    each kept event to the next candidate) is the oracle in q282.

    Returns the kept (entity, ts) rows."""
    gap = int(min_gap)
    narrowed = df.filter(F.col(entity_col).isNotNull()).select(entity_col, ts_col)
    # Derive the output schema from the input columns so non-int64 entity
    # keys (string ids, int32, ...) pass through unchanged instead of
    # failing or miscasting under a hardcoded "long, long" contract.
    from pyspark.sql.types import StructType

    out_schema = StructType(
        [narrowed.schema[entity_col], narrowed.schema[ts_col]]
    )

    def walk_partition(batches):
        import numpy as np

        last_e = object()  # sentinel unequal to any real key
        last_kept = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = pdf[entity_col].to_numpy()
            t = pdf[ts_col].to_numpy()
            keep = np.zeros(len(t), dtype=bool)
            starts = np.flatnonzero(np.r_[True, e[1:] != e[:-1]])
            ends = np.r_[starts[1:], len(e)]
            for s, en in zip(starts, ends):
                ent = e[s]
                seg = t[s:en]
                lk = last_kept if ent == last_e else None
                i = (
                    s
                    if lk is None
                    else s + int(np.searchsorted(seg, lk + gap, side="right"))
                )
                while i < en:
                    keep[i] = True
                    lk = t[i]
                    i = s + int(np.searchsorted(seg, lk + gap, side="right"))
                last_e, last_kept = ent, lk
            if keep.any():
                yield pdf.iloc[keep]

    return (
        narrowed.repartition(F.col(entity_col))
        .sortWithinPartitions(entity_col, ts_col)
        .mapInPandas(walk_partition, out_schema)
    )
