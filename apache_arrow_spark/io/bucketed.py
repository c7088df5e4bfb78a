"""Bucketed (hash-clustered) table layout — the shuffle-free co-located
join primitive.

Capability superset (SURVEY §2.1/§2.3): the reference has no join engine,
so it also has no co-located storage layout; this is the Spark-native
answer to "the same two 100 TB fact tables are joined on the same key
every day".  Writing both sides bucketed by the join key with the SAME
bucket count records the hash-clustering in the catalog; every later
sort-merge join between them then reads bucket i against bucket i
directly — ZERO Exchange on either side, at any scale.  On a
1000-executor cluster this converts the daily fact⋈fact join from the
largest shuffle in the pipeline into a pure scan-side merge.

Mechanics: ``bucketBy`` is only honored through the catalog
(``saveAsTable``), so tables are registered in the session catalog with
an explicit ``path`` (external) — data lands where the caller says, the
in-memory catalog carries the bucketing metadata, nothing persists
outside the session.  Buckets also prune: an equality probe on the
bucket key scans 1/N of the files (``SelectedBucketsCount`` in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed parquet table named ``table``.

    ``num_buckets`` must match across tables that will be joined —
    mismatched counts fall back to a shuffle on the smaller side.  Buckets
    are additionally sorted by the key so single-file buckets merge
    without a local sort.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *keys)
        .mode("overwrite")
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back THROUGH the catalog (a plain
    ``spark.read.parquet(path)`` would lose the bucketing metadata and
    re-shuffle on join)."""
    return spark.table(table)
