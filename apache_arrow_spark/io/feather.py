"""Feather read/write (SURVEY §2.1; python/pyarrow/feather.py:88,114,
cpp/src/arrow/ipc/feather.h:53,101).

Feather v1 is the reference's pre-IPC single-file columnar frame format;
v2 *is* the Arrow IPC file format.  We write v2 (modern pyarrow default),
read either.  Single-file by definition -> driver-side endpoints for
interop; the scale path for columnar files is parquet or the IPC shard
directory (io.ipc).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_feather(df: DataFrame, dest: str, compression: str | None = None) -> None:
    """feather.write_feather parity (feather.py:88)."""
    import pyarrow.feather as feather

    feather.write_feather(df.toArrow(), dest, compression=compression)


def read_feather(
    spark: SparkSession, source: str, columns: Sequence[str] | None = None
) -> DataFrame:
    """feather.read_feather parity (feather.py:114) with column selection."""
    import pyarrow.feather as feather

    table = feather.read_table(source, columns=list(columns) if columns else None)
    return spark.createDataFrame(table)
