"""Parquet source/sink parity (SURVEY §2.1; python/pyarrow/parquet.py).

- ``read_table(spark, source, columns)``   <- parquet.py:865 read_table
  (column projection reaches the scan as ReadSchema pruning)
- ``write_table(df, where, ...)``          <- parquet.py:936 write_table
- ``write_to_dataset(df, root, partition_cols)`` <- parquet.py:982
  (hive-style key=val tree == ``partitionBy``)
- ``read_dataset(spark, root, columns)``   <- parquet.py:666 ParquetDataset
  (partition discovery + key columns attached are Spark built-ins; the
  reference's manifest walk parquet.py:566 is what the FileIndex does)

Row-group size / compression options map to Spark writer options.  The
reference's ``flavor='spark'`` name sanitization (parquet.py:197-249) is a
no-op here — we ARE Spark.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    source: str,
    columns: Sequence[str] | None = None,
    filters=None,
) -> DataFrame:
    """Read parquet with optional column projection and predicate.

    ``columns`` prunes at scan (ReadSchema); ``filters`` (a Column) pushes
    down (PushedFilters) — both visible in ``.explain("formatted")``.
    """
    df = spark.read.parquet(source)
    if filters is not None:
        df = df.filter(filters)
    if columns:
        df = df.select(*columns)
    return df


def write_table(
    df: DataFrame,
    where: str,
    row_group_size: int | None = None,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as parquet (one file per partition — the
    distributed form of write_table; at 100 TB a single file is a bug,
    not a feature)."""
    writer = df.write.mode(mode).option("compression", compression)
    if row_group_size is not None:
        writer = writer.option("parquet.block.size", str(row_group_size))
    writer.parquet(where)


def write_to_dataset(
    df: DataFrame,
    root_path: str,
    partition_cols: Sequence[str],
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned tree (parquet.py:982): key=val directories,
    partition columns removed from the leaf files."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(root_path)
    )


def read_dataset(
    spark: SparkSession,
    root_path: str,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Discover and read a partitioned dataset; partition keys come back as
    columns (parquet.py:393-662 ParquetDataset/ParquetPartitions)."""
    df = spark.read.option("basePath", root_path).parquet(root_path)
    if columns:
        df = df.select(*columns)
    return df


def write_clustered(
    df: DataFrame,
    where: str,
    cluster_cols: Sequence[str],
    num_files: int | None = None,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Sort-clustered parquet layout: range-partition on ``cluster_cols``
    then sort within each file, so every row group's min/max statistics
    are tight and a filtered scan skips whole files AND whole row groups.

    At 100 TB this is the storage-side half of predicate pushdown: the
    pushed filter only helps if the layout makes statistics selective —
    unsorted data has every row group spanning the full value range.
    ``repartitionByRange`` gives globally disjoint file ranges (file-level
    skipping); ``sortWithinPartitions`` tightens row-group stats inside
    each file.
    """
    cols = [F.col(c) for c in cluster_cols]
    part = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    (
        part.sortWithinPartitions(*cols)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(where)
    )


def row_group_metadata(path: str) -> list[dict]:
    """Row-group manifest of a single parquet file: index, row count,
    byte size, and per-column min/max statistics — the footer walk behind
    ``ParquetFile.scan_contents`` / ``metadata.row_group(i)`` (reference
    python/pyarrow/parquet.py:89,144).  Footer-only (no data pages read);
    at 100 TB this is the split-planning step a scan does per file."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    out: list[dict] = []
    for i in range(f.metadata.num_row_groups):
        rg = f.metadata.row_group(i)
        stats: dict[str, tuple] = {}
        for c in range(rg.num_columns):
            col = rg.column(c)
            st = col.statistics
            if st is not None and st.has_min_max:
                stats[col.path_in_schema] = (st.min, st.max)
        out.append(
            {
                "index": i,
                "num_rows": rg.num_rows,
                "total_byte_size": rg.total_byte_size,
                "stats": stats,
            }
        )
    return out


def prune_row_groups(path: str, column: str, lo=None, hi=None) -> list[int]:
    """Row-group ids whose ``column`` min/max statistics can intersect
    the closed interval [lo, hi] (either bound may be None).  Groups
    without statistics are KEPT — pruning may only skip what the footer
    proves empty.  This is predicate pushdown at row-group granularity:
    the same skip Spark's parquet reader applies internally, exposed so
    a row-group-granular read plans its task list from the footer."""
    kept = []
    for g in row_group_metadata(path):
        st = g["stats"].get(column)
        if st is None:
            kept.append(g["index"])
            continue
        gmin, gmax = st
        if (hi is not None and gmin > hi) or (lo is not None and gmax < lo):
            continue
        kept.append(g["index"])
    return kept


def read_row_groups(
    spark: SparkSession,
    path: str,
    groups: Sequence[int],
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Distributed row-group-granular read of one parquet file
    (``ParquetFile.read_row_group``, reference python/pyarrow/parquet.py:89):
    the row-group ids become a tiny task-list DataFrame and each task
    reads its groups via ``mapInArrow`` — the row group IS the split
    unit, exactly how a columnar scan parallelizes, so this holds at any
    file size without a driver-side read.  Column projection reads only
    the selected column chunks (footer offsets, no full-row decode).

    Note: the file's arrow types must map 1:1 onto Spark's parquet
    schema (int/float/string/date — the common case); exotic types
    (ns timestamps) follow the session's parquet reader rules."""
    full = spark.read.parquet(path)
    out_schema = full.select(*columns).schema if columns else full.schema
    cols = list(columns) if columns else None
    ids = [(int(g),) for g in groups]
    gdf = spark.createDataFrame(ids, "rg int")
    if ids:
        gdf = gdf.repartition(len(ids), "rg")

    def read_groups(batches):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
        want = [fld.name for fld in f.schema_arrow] if cols is None else cols
        for batch in batches:
            for g in batch.column(0).to_pylist():
                tbl = f.read_row_group(g, columns=cols).select(want)
                yield from tbl.to_batches()

    return gdf.mapInArrow(read_groups, out_schema)


def compact_dataset(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_cols: list[str] | None = None,
    compression: str = "snappy",
) -> int:
    """Small-file compaction — the maintenance pass every incremental
    pipeline needs: streaming/micro-batch sinks and per-batch ingests
    accumulate thousands of KB-scale files whose open/footer costs
    eventually dominate scans.  Re-reads the dataset, sizes the output
    file count from the measured input bytes (never a hardcoded
    partition count), optionally re-clusters (the write_clustered layout)
    so compaction also restores pruning locality, and writes one
    generation of right-sized files.  Returns the output file count.

    At 100 TB this runs per-partition-directory (compact only the
    partitions a batch touched), and file sizing via the input's actual
    bytes keeps output files near ``target_file_bytes`` regardless of
    schema width or compression ratio.
    """
    import math
    import os

    df = spark.read.parquet(in_path)
    total = 0
    for root, _dirs, files in os.walk(in_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    if cluster_cols:
        write_clustered(df, out_path, cluster_cols, num_files=n_files,
                        compression=compression)
    else:
        (
            df.coalesce(n_files)
            .write.mode("errorifexists")
            .option("compression", compression)
            .parquet(out_path)
        )
    return sum(
        1
        for root, _dirs, files in os.walk(out_path)
        for f in files
        if f.endswith(".parquet")
    )
