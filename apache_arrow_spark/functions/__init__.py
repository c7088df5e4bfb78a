"""Training-data-pipeline operators: text analysis, dedup (+clustering),
similarity/ANN, corpus filters, assembly, sketches, skew tools,
multimodal plumbing."""

from apache_arrow_spark.functions import (
    dedup,
    filters,
    multimodal,
    pipeline,
    similarity,
    sketches,
    skew,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "filters",
    "pipeline",
    "sketches",
    "skew",
]
