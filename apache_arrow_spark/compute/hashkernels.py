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


def is_in(
    df: DataFrame, column: str, members, broadcast_members: bool = True
) -> DataFrame:
    """IsIn kernel: per-row boolean ``<col>_isin`` — membership of the
    column value in ``members`` (reference hash.h:94-96, a TODO upstream
    like value_counts; implemented here).

    ``members`` is either a Python sequence (lowered to the codegen
    ``Column.isin`` literal set — stays inside WholeStageCodegen, no
    shuffle, pushes down) or a one-column DataFrame (lowered to a LEFT
    join against the distinct member set).  ``broadcast_members=True``
    (default) pins a broadcast — the fact side never shuffles — and is a
    SIZE CONTRACT: the caller asserts the member set is dictionary-sized
    (bounded, not O(corpus)).  Pass ``False`` when the member set scales
    with the data (e.g. a keyset filtered from another fact table): no
    hint is planted, so AQE broadcasts while it is actually small and
    degrades to a shuffle join instead of an OOM at cluster scale.  NULL
    values follow Arrow set semantics: a NULL value is not a member
    (false), matching the SQL semi-join recipe rather than SQL IN's
    three-valued NULL.
    """
    if isinstance(members, DataFrame):
        if len(members.columns) != 1:
            raise ValueError(
                f"is_in member set must be a one-column DataFrame, got "
                f"{members.columns}"
            )
        hit = "__isin_hit"
        mset = (
            members.select(F.col(members.columns[0]).alias(column))
            .dropna()
            .distinct()
            .withColumn(hit, F.lit(True))
        )
        if broadcast_members:
            mset = F.broadcast(mset)
        return (
            df.join(mset, on=column, how="left")
            .withColumn(f"{column}_isin", F.coalesce(F.col(hit), F.lit(False)))
            .drop(hit)
        )
    vals = [v for v in members if v is not None]
    hit = F.col(column).isin(*vals) if vals else F.lit(False)
    return df.withColumn(
        f"{column}_isin", F.coalesce(hit, F.lit(False))
    )


def match(df: DataFrame, column: str, members) -> DataFrame:
    """Match kernel: per-row index of the value in ``members`` (NULL when
    absent) — reference hash.h:89-92, the other TODO-upstream hash
    kernel.  Like ``dictionary_encode`` against a PRIOR dictionary: the
    member set's first-appearance order defines the indices.

    ``members`` is a Python sequence (index = position of first
    occurrence) or a one-column DataFrame carrying a ``__pos`` ordinal
    (index = rank of first appearance, as in :func:`dictionary`).  The
    lookup is a broadcast join — member sets are dictionary-sized by
    contract, the fact side never shuffles."""
    if isinstance(members, DataFrame):
        mcol = next(c for c in members.columns if c != POS)
        # NULL members are skipped (as in the literal path): a NULL can
        # never equi-join a fact row, so letting it consume a
        # first-appearance slot would shift every later member's index
        # relative to the sequence form of the same member set
        firsts = (
            _ordinal(members)
            .filter(F.col(mcol).isNotNull())
            .groupBy(F.col(mcol).alias(column))
            .agg(F.min(POS).alias("__first"))
        )
        w = Window.orderBy("__first")
        lookup = firsts.select(
            column, (F.row_number().over(w) - F.lit(1)).cast("int").alias(f"{column}_match")
        )
    else:
        seen: dict = {}
        for v in members:
            if v is not None and v not in seen:
                seen[v] = len(seen)
        spark = df.sparkSession
        field = df.schema[column]
        from pyspark.sql.types import IntegerType, StructField, StructType

        lookup = spark.createDataFrame(
            [(k, i) for k, i in seen.items()],
            StructType(
                [
                    StructField(column, field.dataType),
                    StructField(f"{column}_match", IntegerType()),
                ]
            ),
        )
    return df.join(F.broadcast(lookup), on=column, how="left")


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
