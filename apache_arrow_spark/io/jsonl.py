"""JSON-lines source/sink — the de-facto interchange format for training
data exports (one JSON object per line, sharded).

Not the reference's JSON *integration* format (that is a schema+columnar
test harness, io/json_integration.py); this is the row-oriented JSONL that
tokenizer/training jobs consume.  Spark's native json source/sink does the
heavy lifting: distributed sharded write (one file per partition, exactly
the parquet part-file model), schema-on-read with explicit schema so
ingest skips the inference pass (one full extra scan at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from apache_arrow_spark.session import apply_runtime_confs


def write_jsonl(df: DataFrame, path: str, num_shards: int | None = None) -> None:
    """Write ``df`` as JSONL shards under ``path``.  ``num_shards``
    repartitions first (round-robin) when the caller wants a specific
    shard count/size for downstream consumers."""
    if num_shards:
        df = df.repartition(num_shards)
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSONL shards with an explicit schema (DDL string or
    StructType) — no inference scan.  Pass ``schema=None`` only for
    ad-hoc exploration; production ingest always declares."""
    apply_runtime_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
