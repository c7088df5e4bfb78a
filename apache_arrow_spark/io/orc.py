"""ORC read (SURVEY §2.1; cpp/src/arrow/adapters/orc/adapter.h:56-84,
python/pyarrow/orc.py:62-133).

The reference is read-only for ORC; we wrap Spark's native reader (column
selection == the adapter's ``include_indices``).  A writer is exposed too
(capability superset, clearly marked)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession, source: str, columns: Sequence[str] | None = None
) -> DataFrame:
    df = spark.read.orc(source)
    if columns:
        df = df.select(*columns)
    return df


def write_orc(df: DataFrame, dest: str, mode: str = "overwrite") -> None:
    """Superset: the reference cannot write ORC (adapter.h is read-only)."""
    df.write.mode(mode).orc(dest)
