"""Expectation-style data validation (Great-Expectations-shaped rules
engine): declarative per-row predicates evaluated corpus-wide in ONE pass.

Every ingestion pipeline gates loads on rule reports ("totalprice
positive", "status in domain", "date in range").  The engine form: each
rule is a boolean Column; all rules evaluate inside one aggregate as
conditional counts — no per-rule job, no second scan, shuffle carries one
row per (mapper, rule-set).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate) — one row per rule.

    ``rules`` maps rule name -> predicate Column that is TRUE when the row
    PASSES.  Null predicate results count as violations (a rule that
    cannot evaluate did not pass).  Single aggregate; the per-rule rows
    are exploded from a struct array on the one result row (the
    profiling.profile pattern).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        # coalesce: F.sum over ZERO rows is NULL — an empty load must report
        # 0 violations, not NULL (a gate comparing n_violations == 0 would
        # otherwise mis-evaluate on an empty input).
        aggs.append(
            F.coalesce(
                F.sum(F.when(pred.isNull() | ~pred, 1).otherwise(0)), F.lit(0)
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{name}").alias("n_violations"),
            )
            for name in rules
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .withColumn(
            "violation_rate",
            F.round(F.col("n_violations") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
        )
    )


def robust_outlier_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier report via median/MAD (the
    median-absolute-deviation rule — resistant to the very outliers it
    flags, unlike mean/stddev z-scores): (group, n, median, mad,
    n_outliers) where an outlier is ``|x - median| > k * MAD``.

    Two grouped aggregates (exact interpolated percentile is a full-group
    aggregate, so this is two shuffles on the group key) + one broadcast
    join of the tiny stats table back onto the rows.  At 100 TB exact
    per-group medians want the GK sketch (functions/sketches.py) instead;
    this is the exact form the sketch approximates."""
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("median"),
        F.count(F.lit(1)).alias("n"),
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col, "median", "n").agg(
        F.expr(f"percentile(abs({value_col} - median), 0.5)").alias("mad")
    )
    flagged = df.join(F.broadcast(mad), group_col).groupBy(
        group_col, "n", "median", "mad"
    ).agg(
        F.sum(
            F.when(
                F.abs(F.col(value_col) - F.col("median")) > F.lit(k) * F.col("mad"), 1
            ).otherwise(0)
        ).alias("n_outliers")
    )
    return flagged.select(group_col, "n", "median", "mad", "n_outliers")


def write_audit_publish(
    df: DataFrame,
    clean_predicate: Column,
    publish_dir: str,
    quarantine_dir: str,
    staging_dir: str,
) -> dict[str, int]:
    """Write-Audit-Publish (the Iceberg/WAP pattern): land the batch in a
    STAGING location, audit the rows as actually written (re-read from
    disk — auditing the in-memory frame would miss writer bugs), then
    publish clean rows and quarantine violations as separate overwrite
    targets.  Consumers only ever see a published set that passed its
    audit; failed rows are preserved for triage, never silently dropped.

    Returns {'published': n, 'quarantined': n} (driver-budget scalars).
    Scale: three sequential distributed writes and one audit scan — no
    driver data path; atomicity at 100 TB comes from publishing into a
    fresh directory and swapping pointers (here: overwrite semantics)."""
    df.write.mode("overwrite").parquet(staging_dir)
    spark = df.sparkSession
    staged = spark.read.parquet(staging_dir)
    clean = staged.filter(clean_predicate)
    dirty = staged.filter(~clean_predicate | clean_predicate.isNull())
    clean.write.mode("overwrite").parquet(publish_dir)
    dirty.write.mode("overwrite").parquet(quarantine_dir)
    return {
        "published": spark.read.parquet(publish_dir).count(),
        "quarantined": spark.read.parquet(quarantine_dir).count(),
    }
