"""Compute kernels: cast matrix, hash kernels, decimal ops (SURVEY.md §2.4-2.7)."""

from apache_arrow_spark.compute.cast import cast, CastOptions
from apache_arrow_spark.compute.hashkernels import unique, dictionary_encode, value_counts

__all__ = ["cast", "CastOptions", "unique", "dictionary_encode", "value_counts"]
