"""Time-series smoothing operators over keyed event streams.

The windowed-EWMA form (finite horizon, available-terms normalization —
pandas ``ewm(adjust=True)`` restricted to the last K observations) is
chosen deliberately over the infinite recursive form: the recursive
y_t = a*x_t + (1-a)*y_{t-1} is order-SEQUENTIAL (a per-key scan), while
the finite form is a fixed linear combination of the last K lags — pure
window expressions, whole-stage codegen, one shuffle on the key, and
engine-reproducible because the K-term sum has a fixed evaluation order.
K=16 at a=0.5 truncates weights below 2^-15 — beneath double noise for
any realistic signal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def ewma(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols: list[str],
    alpha: float = 0.5,
    horizon: int = 16,
) -> DataFrame:
    """Append ``__ewma``: exponentially-weighted moving average of
    ``value_col`` per ``key_col`` over the last ``horizon`` rows in
    ``order_cols`` order (ties must be broken by the caller's order
    columns for determinism).  Weights follow the pandas ``ewm``
    convention — lag j carries ``(1-alpha)^j`` (alpha is the CURRENT
    observation's weight; larger alpha = faster tracking) — normalized
    over the terms actually present (sequence starts use fewer terms)."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    num = None
    den = None
    for j in range(horizon):
        lagged = F.lag(F.col(value_col), j).over(w)
        weight = float((1.0 - alpha) ** j)
        term = F.coalesce(lagged * F.lit(weight), F.lit(0.0))
        present = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = present if den is None else den + present
    return df.withColumn("__ewma", num / den)


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_cols: list[str],
    lookback: int = 20,
    min_obs: int = 12,
) -> DataFrame:
    """Append ``__z``: each observation's z-score against the TRAILING
    window of the previous ``lookback`` rows per key (current row
    excluded — the anomaly question is "does this point deviate from its
    own past?").  Rows with fewer than ``min_obs`` history rows or a
    degenerate variance get NULL.

    Engine-reproducible by construction: the window moments are sums of
    DECIMAL(18,4) — exact, order-independent, immune to the float
    summation-order trap documented on :func:`ewma` — and the final
    mean/variance/z arithmetic is one fixed double expression tree, so
    any SQL engine replaying the same formula lands on the same bits.
    Scale: one shuffle on the key, pure window expressions, codegen."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("decimal(18,4)")
    s = F.sum(v).over(w).cast("double")
    ss = F.sum(v * v).over(w).cast("double")
    n = F.count(v).over(w).cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1.0))
    z = (F.col(value_col).cast("double") - mean) / F.sqrt(var)
    return df.withColumn(
        "__z",
        F.when((n >= F.lit(float(min_obs))) & (var > F.lit(1e-9)), z),
    )


def ohlc_bars(
    df,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_col,
    group_col: str | None = None,
):
    """OHLC downsampling (candlestick bars): per (group, bucket) the
    opening value (earliest by (ts, tiebreak) — the tiebreaker makes the
    pick total-ordered and engine-reproducible), closing value (latest),
    high, low, and volume.  The market-data primitive, and the general
    first/last-aware downsampler for any metric stream.

    ``bucket_col`` is a Column expression (e.g. an hour bucket derived
    from the timestamp).  Returns (group?, bucket, open, high, low,
    close, volume).

    Scale shape: ONE combinable aggregate — open/close are min/max of a
    (ts, tiebreak, value) struct (lexicographic min carries the earliest
    row's value along, no window, no sort), high/low/volume are plain
    min/max/count.  A window-function formulation would shuffle and sort
    every group; this shuffles one struct per input row and aggregates
    map-side."""
    import pyspark.sql.functions as F

    keys = ([group_col] if group_col else []) + ["bucket"]
    base = df.select(
        *([F.col(group_col)] if group_col else []),
        bucket_col.alias("bucket"),
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(tiebreak_col).alias("tb"),
            F.col(value_col).alias("v"),
        ).alias("__s"),
        F.col(value_col).alias("__v"),
    )
    return (
        base.groupBy(*keys)
        .agg(
            F.min("__s").getField("v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max("__s").getField("v").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
        )
    )
