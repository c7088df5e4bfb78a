"""Changelog merge / upsert compaction (keep-latest-per-key).

The MERGE-INTO pattern every warehouse ingestion pipeline needs: apply a
batch of updates (and optional deletes) to a base snapshot, keeping the
newest version of each key.  The reference has no analog (capability
superset, like joins); table formats (Delta/Iceberg) implement the same
semantics inside their commit protocol — this is the engine-level recipe.

Scale shape: one shuffle on the key columns (the row_number window); rows
move once, full width.  For repeated periodic compaction the base should be
stored bucketed by the keys so only the (small) update batch shuffles —
the same bucketed-join contract proven in tests/test_bucketing.py.  Skewed
hot keys degenerate a partition; mitigation is the salted two-phase
pattern in functions/skew.py (salt the row_number, then a second
row_number over the per-salt winners).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Latest row per key across base ∪ updates.

    ``order_cols``: version ordering, newest wins (compared descending,
    left-to-right).  Ties across the two inputs resolve toward ``updates``
    (the standard MERGE semantics: an update at the same version replaces
    the base row).  ``delete_predicate``: rows of the WINNING version
    matching it are dropped (tombstones) — evaluated after versioning, so
    a later re-insert revives the key.
    """
    tagged = base.withColumn("__prio", F.lit(0)).unionByName(
        updates.withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols], F.col("__prio").desc()
    )
    latest = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__prio")
    )
    if delete_predicate is not None:
        latest = latest.filter(~delete_predicate)
    return latest
