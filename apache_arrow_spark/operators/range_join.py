"""Range / interval joins — operators the reference lacks entirely (its only
join-adjacent machinery is the commented-out Match/IsIn TODO,
cpp/src/arrow/compute/kernels/hash.h:89-101), expressed Spark-first.

Two shapes, two physical strategies:

- ``time_tolerance_pairs``: |ts_a - ts_b| <= tol self-pairing per key.  A
  naive theta-join is a per-key cross product (O(n^2) candidates).  We
  bucketize time by the tolerance: the LEFT row lands in bucket
  floor(ts/tol); the RIGHT row is registered in buckets {b-1, b, b+1}.  Any
  pair within tolerance shares the left row's bucket with one of the right
  row's three, and because the left side has exactly ONE bucket per row,
  each qualifying pair meets exactly once — no dedup pass needed.  The
  shuffle is an equi-join on (key, bucket): candidates are bounded by local
  time density (3x the rows per tolerance window), never n^2, and AQE can
  split a hot (key, bucket).

- ``band_join``: point-in-interval against a SMALL static band table
  (price bands, score buckets, SLA tiers).  The band table is broadcast and
  the range predicate evaluates map-side (BroadcastNestedLoopJoin) — zero
  shuffle of the fact side, which is the only thing that matters at 100 TB.
  Cost is rows x bands, so this is the right plan for up to a few thousand
  bands; beyond that, bucketize the value the same way as above.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def time_tolerance_pairs(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    key_col: str,
    tolerance_us: int,
) -> DataFrame:
    """All pairs (id_a < id_b) sharing ``key_col`` with timestamps within
    ``tolerance_us`` microseconds.  ``ts_col`` must be a bigint in
    microseconds.  Returns (key, id_a, id_b, gap_us).
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("i"),
        F.col(ts_col).alias("t"),
    )
    bkt = F.floor(F.col("t") / F.lit(tolerance_us))
    left = base.select("k", "i", "t", bkt.alias("b"))
    right = base.select(
        "k",
        F.col("i").alias("i_r"),
        F.col("t").alias("t_r"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("b"),
    )
    gap = F.abs(F.col("t") - F.col("t_r"))
    return (
        left.join(right, on=["k", "b"])
        .filter((F.col("i") < F.col("i_r")) & (gap <= tolerance_us))
        .select(
            F.col("k").alias(key_col),
            F.col("i").alias("id_a"),
            F.col("i_r").alias("id_b"),
            gap.alias("gap_us"),
        )
    )


def band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Attach the band row whose [lo, hi) interval contains ``value_col``.
    ``bands`` is broadcast; the range predicate runs map-side, so the fact
    table never shuffles."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(broadcast(bands), on=cond, how="inner")
