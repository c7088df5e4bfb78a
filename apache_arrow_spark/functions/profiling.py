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
    cols = columns or df.columns
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
