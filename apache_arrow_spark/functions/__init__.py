"""Training-data-pipeline operators: text analysis, dedup, similarity,
multimodal plumbing."""

from apache_arrow_spark.functions import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
