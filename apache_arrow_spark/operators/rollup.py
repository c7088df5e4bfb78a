"""Hypertable-style hierarchical time rollup (continuous aggregates).

The reference has no time-series operators at all (SURVEY §2.5/§2.9); this
is a Spark-first rendering of the pattern a 100 TB event pipeline actually
runs: raw events are aggregated ONCE into fine-grained partial aggregates
(the "hypertable chunk" materialization), and every coarser granularity is
computed by re-aggregating the partials — never by rescanning raw data.

Scale math: 100 TB of raw events collapse to hours x keys of partials
(~10^6-10^8 rows); daily/weekly/monthly rollups then cost seconds.  The
partial schema keeps only MERGEABLE state (count, decimal sum, min, max) —
avg and friends are derived at read time, so partials compose associatively
across any re-bucketing, the same algebra Spark's own partial aggregation
uses map-side.

In production the partials DataFrame is written ``partitionBy(bucket
date)`` so coarser rollups prune to the requested range; incremental
refresh = re-aggregating only the chunks whose raw data changed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from apache_arrow_spark.compute.decimalops import to_decimal


def continuous_aggregate(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """One pass over raw events -> mergeable partials per (time bucket, keys).

    ``bucket`` is a calendar unit understood by ``date_trunc`` ('hour',
    'day', 'week', ...).  Output columns: bucket_start (timestamp), *keys,
    n (count), s (decimal sum of value), mn, mx.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start")
    return df.groupBy(b, *keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(to_decimal(F.col(value_col))).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def rollup_partials(
    partials: DataFrame,
    bucket: str,
    keys: list[str],
) -> DataFrame:
    """Re-aggregate fine partials to a coarser calendar ``bucket`` by merging
    mergeable state — count adds, sums add, min/max fold.  Raw data is never
    touched."""
    b = F.date_trunc(bucket, F.col("bucket_start")).alias("bucket_start")
    return partials.groupBy(b, *keys).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize(rolled: DataFrame, ndigits: int = 6) -> DataFrame:
    """Derive read-time metrics from mergeable state: exact double sum and
    avg (single division of the exact decimal sum — engine-stable)."""
    s_dbl: Column = F.col("s").cast("decimal(38,6)").cast("double")
    return rolled.select(
        "*",
        s_dbl.alias("sum_value"),
        F.round(s_dbl / F.col("n"), ndigits).alias("avg_value"),
    ).drop("s")
