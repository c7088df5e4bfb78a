"""Relational operators Spark lacks natively, composed from DataFrame ops."""

from apache_arrow_spark.operators.asof import asof_join

__all__ = ["asof_join"]
