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


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    k_thresholds: tuple[int, ...] = (2, 5, 10),
    sensitive_col: str | None = None,
) -> DataFrame:
    """Privacy release audit: k-anonymity (and optional l-diversity) over
    a set of quasi-identifier columns — the check run before a dataset
    leaves the pipeline: a record is k-anonymous when at least k records
    share its full QI tuple, and a QI group is l-diverse when it spans at
    least l distinct sensitive values.

    Returns one row per threshold: (k_threshold, n_violating_groups,
    n_violating_records, min_group_size, min_l_diversity) — the two
    ``min_`` columns repeat the global floor on every row (min group size
    = the k the release actually achieves).  ``min_l_diversity`` is NULL
    when no ``sensitive_col`` is given.

    Scale shape: ONE combinable aggregate to QI-group granularity (the
    only corpus-sized shuffle — group count is bounded by QI cardinality,
    not rows), then a literal-array explode and a tiny rollup over groups.
    No joins against the data, nothing collected."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("__l"))
    groups = df.groupBy(*qi_cols).agg(*aggs)
    if sensitive_col is None:
        groups = groups.withColumn("__l", F.lit(None).cast("bigint"))
    ks = F.explode(
        F.array(*[F.lit(int(k)) for k in k_thresholds])
    ).alias("k_threshold")
    per_k = groups.select(ks, "__n", "__l")
    return (
        per_k.groupBy("k_threshold")
        .agg(
            F.sum(F.when(F.col("__n") < F.col("k_threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_groups"),
            F.sum(
                F.when(F.col("__n") < F.col("k_threshold"), F.col("__n")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_violating_records"),
            F.min("__n").cast("bigint").alias("min_group_size"),
            F.min("__l").cast("bigint").alias("min_l_diversity"),
        )
        .orderBy("k_threshold")
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    is_ref: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current slice
    of the same column — the standard model/feature drift monitor
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken).  Values are
    binned uniformly on [lo, hi] (outliers clamp into the edge bins, so
    the binning is total and literal-deterministic); both distributions
    get add-one smoothing so empty bins stay finite.

    Per-bin PSI contributions are floor-quantized to int64 at 1e9
    ((p - q) * ln(p/q) is computed once per BIN from exact integer
    counts — the q100 discipline), so the total is an exact integer sum.
    Returns one row per bin: (bin, n_ref, n_cur, psi_q, psi) plus the
    rolled-up total as bin = -1; ``psi = psi_q / 1e9``.

    Scale shape: one combinable count aggregate to n_bins cells, then
    literal arithmetic on the tiny bin table.  One corpus-sized shuffle
    of (bin, side) pairs, nothing else."""
    step = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(step)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    counts = (
        df.select(bin_col.alias("bin"), is_ref.alias("__ref"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("__ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("__ref"), 0).otherwise(1)).alias("n_cur"),
        )
    )
    totals = counts.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + 1.0) / (F.col("__tr") + F.lit(float(n_bins)))
    q = (F.col("n_cur") + 1.0) / (F.col("__tc") + F.lit(float(n_bins)))
    psi_q = F.floor((p - q) * F.log(p / q) * F.lit(1e9)).cast("bigint")
    bins = counts.crossJoin(F.broadcast(totals)).select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        psi_q.alias("psi_q"),
    )
    total = bins.agg(
        F.sum("n_ref").cast("bigint").alias("n_ref"),
        F.sum("n_cur").cast("bigint").alias("n_cur"),
        F.sum("psi_q").cast("bigint").alias("psi_q"),
    ).select(F.lit(-1).cast("int").alias("bin"), "n_ref", "n_cur", "psi_q")
    return bins.unionByName(total).select(
        "bin",
        "n_ref",
        "n_cur",
        "psi_q",
        (F.col("psi_q").cast("double") / F.lit(1e9)).alias("psi"),
    )
