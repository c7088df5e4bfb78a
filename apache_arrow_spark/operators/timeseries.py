"""Time-series regularization: resample to a fixed grid + forward fill.

The gap-filling operator every metrics/telemetry pipeline needs: bucket an
irregular event stream to a fixed interval, materialize the EMPTY buckets
(a spine join), and carry the last observed value across gaps.  The
reference has no analog (capability superset, like the as-of join — and
this composes with it: resample-then-asof is the standard feature-join
prep).

Scale shape:
- the bucket aggregate is one map-side-combinable shuffle on
  (series, bucket);
- the spine is generated per series from its (min, max) bucket — a
  sequence/explode over the tiny per-series bounds table, never a
  cross-join against a global calendar;
- the forward fill is one window pass per series ordered by bucket —
  the same single-shuffle discipline as sessionize (and it reuses the
  bucket aggregate's hash partitioning on the series key).

A series whose bucket count explodes (years of 1-second grid) serializes
its window in one task; mitigation is chunking the spine by coarse range
and carrying the last value across chunk boundaries with a second tiny
window over the chunk tails.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_ffill(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    interval: int,
    agg=None,
) -> DataFrame:
    """(series, bucket_start, value, observed) on a fixed ``interval`` grid.

    ``ts_col`` is numeric (e.g. epoch nanos); ``interval`` the bucket width
    in the same unit.  ``agg``: aggregation for observed buckets (default
    ``F.avg``); gaps between a series' first and last bucket are emitted
    with the last observed value carried forward (``observed = false``).
    """
    agg = agg or F.avg
    bucket = (F.col(ts_col) / F.lit(interval)).cast("long")
    observed = (
        df.select(F.col(series_col).alias("series"), bucket.alias("b"), F.col(value_col))
        .groupBy("series", "b")
        .agg(agg(F.col(value_col)).alias("v"))
    )
    spine = (
        observed.groupBy("series")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select("series", F.explode(F.sequence("lo", "hi")).alias("b"))
    )
    joined = spine.join(observed, on=["series", "b"], how="left")
    w = (
        Window.partitionBy("series")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "series",
        (F.col("b") * F.lit(interval)).alias("bucket_start"),
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNotNull().alias("observed"),
    )
