"""Column profiling (ANALYZE-style statistics collection).

One pass over the table produces per-column row/null/distinct counts — the
stats every ingestion pipeline collects for monitoring, and the input CBO
table statistics are built from.  The reference's analog surface is
schema/metadata inspection only; counting is a capability superset.

Scale shape: a single aggregate computes all metrics; the per-column
results are assembled into an array of structs on the one result row and
exploded — no per-column job, no driver loop over columns.  Exact
``countDistinct`` over C columns plans an Expand (C+1 passes over the
scanned batch, still one shuffle); ``approx=True`` swaps in HLL-based
``approx_count_distinct`` — single pass, mergeable, the 100 TB default.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """(column, n_rows, n_null, n_distinct) — one row per profiled column.

    ``n_distinct`` counts non-null distinct values (exact by default;
    ``approx=True`` for the HLL estimate at scale).
    """
    from apache_arrow_spark.session import spread_compute

    cols = columns or df.columns
    # spread: the all-columns distinct/null metrics evaluate in the
    # aggregate's map side, single-task on a single-split source
    df = spread_compute(df.select(*cols) if columns else df)
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def table_checksum(
    df: DataFrame,
    columns: list[str],
    group_by: str | None = None,
) -> DataFrame:
    """Order-insensitive table content checksum — the migration/replication
    validator: run on source and destination (any engine) and compare one
    tiny result instead of the tables.

    Per group (or one global row with group ``'*'``): row count, a 60-bit
    xor fold and an exact decimal(38,0) multiset sum of a per-row md5-
    based hash.  xor catches value flips but cancels on even duplicate
    multiplicities; the multiset sum catches duplicate-count drift — the
    pair is the standard two-sided consistency probe.  Every ingredient
    (concat_ws, md5, bigint fold, decimal sum) is ANSI-replayable, so an
    oracle engine lands on the identical digest bit-for-bit.

    Callers must pass engine-neutral (string/integer) column expressions;
    floats should be quantized first — float-to-string rendering is NOT
    cross-engine stable.

    NULLs are folded as the sentinel ``chr(30) || 'NULL'`` (concat_ws
    alone would silently SKIP null arguments, making rows that differ
    only in WHICH column is null collide).  Caveat: values that contain
    the ``chr(31)`` separator or the sentinel itself can still collide
    across column boundaries — sanitize such columns first.

    Scale: one map-side-combinable aggregate over the scan — the 100 TB
    validation costs one pass, shuffles only #groups rows, and never
    collects data.
    """
    from apache_arrow_spark.functions.dedup import md5_hash60

    h = md5_hash60(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x1eNULL"))
                for c in columns
            ],
        )
    )
    key = F.col(group_by) if group_by else F.lit("*")
    return (
        df.select(key.cast("string").alias("group_key"), h.alias("__h"))
        .groupBy("group_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.bit_xor("__h"), F.lit(0)).alias("xor_fold"),
            F.sum(F.col("__h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("multiset_sum"),
        )
    )


def snapshot_partition_diff(
    v1: DataFrame,
    v2: DataFrame,
    columns: list[str],
    partition_col: str,
) -> DataFrame:
    """Which PARTITIONS changed between two snapshot versions — the
    incremental-reprocessing primitive: at 100 TB you re-run downstream
    work only for partitions whose content digest moved, not the whole
    table.

    Runs :func:`table_checksum` per partition on both versions (one
    combinable aggregate pass each, #partitions output rows) and
    full-outer-joins the digests: status = 'added' (only in v2),
    'removed' (only in v1), 'changed' (digest differs), 'unchanged'.
    Returns (group_key, status, n_rows_v1, n_rows_v2) — driver-budget
    rows regardless of table size."""
    a = table_checksum(v1, columns, group_by=partition_col).alias("a")
    b = table_checksum(v2, columns, group_by=partition_col).alias("b")
    j = a.join(b, F.col("a.group_key") == F.col("b.group_key"), "full_outer")
    status = (
        F.when(F.col("a.group_key").isNull(), F.lit("added"))
        .when(F.col("b.group_key").isNull(), F.lit("removed"))
        .when(
            (F.col("a.xor_fold") == F.col("b.xor_fold"))
            & (F.col("a.multiset_sum") == F.col("b.multiset_sum"))
            & (F.col("a.n_rows") == F.col("b.n_rows")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.coalesce(F.col("a.group_key"), F.col("b.group_key")).alias("group_key"),
        status.alias("status"),
        F.coalesce(F.col("a.n_rows"), F.lit(0)).cast("bigint").alias("n_rows_v1"),
        F.coalesce(F.col("b.n_rows"), F.lit(0)).cast("bigint").alias("n_rows_v2"),
    )
