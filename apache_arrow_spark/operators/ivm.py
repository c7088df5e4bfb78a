"""Incremental view maintenance (IVM) for join aggregates — the delta
rule: for V = agg(A join B), arriving deltas update the view as

    dV = agg(dA join B_old)  +  agg(A_old join dB)  +  agg(dA join dB)

(all three terms needed: the cross term would otherwise be double- or
zero-counted).  q223 maintains a MIN the same incremental way; this
module is the general join-aggregate case — the pattern that turns a
100 TB nightly full recompute into a delta-sized refresh.

Scale shape: the delta sides are small by definition — Spark broadcasts
them into each term, so the base tables are scanned but never shuffled;
the aggregate is combinable; merging dV into the stored view touches
#groups rows.  Nothing recomputes the old join.

No reference analog (the reference era has no incremental operators);
the delta rule is the classic Blakeley et al. view-maintenance algebra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def delta_join_sum(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    key: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """The delta of V = SUM(value) GROUP BY group over (A join B on key)
    for insert-deltas dA, dB.  ``group_col`` lives on the A side,
    ``value_col`` on the B side.  Returns (group_col, delta_sum).

    The three delta terms union BEFORE one combinable aggregate, and the
    (small) delta sides are broadcast so neither base table shuffles."""
    ga, v = F.col(group_col), F.col(value_col)
    terms = [
        F.broadcast(a_delta).join(b_old, key).select(ga, v),
        a_old.join(F.broadcast(b_delta), key).select(ga, v),
        F.broadcast(a_delta).join(F.broadcast(b_delta), key).select(ga, v),
    ]
    u = terms[0].unionByName(terms[1]).unionByName(terms[2])
    return u.groupBy(group_col).agg(F.sum(v).alias("delta_sum"))


def apply_view_delta(
    view: DataFrame, delta: DataFrame, group_col: str, sum_col: str
) -> DataFrame:
    """Merge (group, delta_sum) into a stored (group, sum) view: full
    outer join on the group, coalescing absent sides to 0 — new groups
    appear, untouched groups pass through.  #groups rows touched."""
    d = delta.withColumnRenamed("delta_sum", "__d")
    return (
        view.join(d, group_col, "full_outer")
        .select(
            group_col,
            (
                F.coalesce(F.col(sum_col), F.lit(0))
                + F.coalesce(F.col("__d"), F.lit(0))
            ).alias(sum_col),
        )
    )
