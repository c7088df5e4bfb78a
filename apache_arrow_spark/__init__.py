"""apache_arrow_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Arrow 0.9 reference (ueshin/apache-arrow).

The reference is a columnar format + kernels + IPC + file bridges + a small
JS DataFrame query layer.  This engine re-expresses that surface Spark-first:
``Table`` wraps a ``pyspark.sql.DataFrame``; predicates, casts, hash kernels,
IPC sources/sinks and the pandas bridge are thin, scale-aware layers over
Catalyst — plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) the reference era
predates.

Design stance (SURVEY.md §7): declare plans with the DataFrame API and let
Catalyst/Tungsten/AQE pick physical strategy; Python only in Arrow-batched
Pandas UDFs; no ``collect()`` in any data path.
"""

from apache_arrow_spark.session import get_spark, load_table, TABLE_NAMES
from apache_arrow_spark.predicates import col, lit, custom
from apache_arrow_spark.table import Table, concat_tables

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "load_table",
    "TABLE_NAMES",
    "col",
    "lit",
    "custom",
    "Table",
    "concat_tables",
]
