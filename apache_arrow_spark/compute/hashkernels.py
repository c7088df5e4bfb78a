"""Hash kernels: Unique / DictionaryEncode / ValueCounts (SURVEY.md §2.4).

The reference implements these as a chunked hash table with load-factor
doubling (cpp/src/arrow/compute/kernels/hash.cc:118,302,492).  Spark's
HashAggregateExec is the same algorithm distributed, so:

- ``unique``            -> distinct()                    (hash.h:36-62)
- ``value_counts``      -> groupBy().count()             (hash.h:99 TODO in
                           the reference; implemented here)
- ``dictionary_encode`` -> deterministic first-appearance indices
                           (hash.h:72).  The reference assigns indices in
                           order of first appearance during a sequential
                           scan.  Distributed recipe: min(row ordinal) per
                           value -> rank by that ordinal -> broadcast-join
                           indices back.  The dictionary is ~#distinct rows
                           (small), so the join back is a broadcast — the
                           big side never shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

POS = "__pos"


def unique(df: DataFrame, column: str) -> DataFrame:
    """Distinct values (reference Unique kernel, hash.h:36)."""
    return df.select(F.col(column).alias("value")).distinct()


def value_counts(df: DataFrame, column: str) -> DataFrame:
    """value -> occurrence count (hash.h:99-101, TODO upstream)."""
    return df.groupBy(F.col(column).alias("value")).agg(
        F.count(F.lit(1)).alias("count")
    )


def _ordinal(df: DataFrame) -> DataFrame:
    """Ensure a deterministic row ordinal column ``__pos``.

    Prefers the parquet ``_metadata.row_index`` (attach it at read time via
    ``load_table_with_pos``).  Raises otherwise: monotonically_increasing_id
    depends on partition layout and would break oracle determinism.
    """
    if POS in df.columns:
        return df
    raise ValueError(
        "dictionary_encode needs a deterministic row ordinal; read the table "
        "with load_table_with_pos() or add a __pos column"
    )


def dictionary(df: DataFrame, column: str) -> DataFrame:
    """The dictionary itself: (value, index) with first-appearance index
    order, like DictionaryBuilder/DictionaryEncode (builder.h:856, hash.h:72).

    The window is over the *distinct* values only (cardinality-sized), so the
    single-partition rank is fine at any data scale.
    """
    with_pos = _ordinal(df)
    firsts = with_pos.groupBy(F.col(column).alias("value")).agg(
        F.min(POS).alias("__first")
    )
    w = Window.orderBy("__first")
    return firsts.select(
        "value", (F.row_number().over(w) - F.lit(1)).cast("int").alias("index")
    )


def dictionary_encode(df: DataFrame, column: str) -> DataFrame:
    """Rows -> (index into dictionary) codes; returns df with ``<col>_index``.
    Broadcast-joins the small dictionary back to the big table — no shuffle
    of the fact side."""
    dict_df = dictionary(df, column)
    return (
        _ordinal(df)
        .join(
            F.broadcast(dict_df.withColumnRenamed("value", column)),
            on=column,
            how="left",
        )
        .withColumnRenamed("index", f"{column}_index")
    )
