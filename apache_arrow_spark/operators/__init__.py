"""Relational operators Spark lacks natively, composed from DataFrame ops."""

from apache_arrow_spark.operators.asof import asof_join
from apache_arrow_spark.operators.sessionize import session_summary, sessionize
from apache_arrow_spark.operators.timeseries import resample_ffill
from apache_arrow_spark.operators.upsert import merge_upsert

__all__ = ["asof_join", "merge_upsert", "resample_ffill", "session_summary", "sessionize"]
