"""Training-data-pipeline operators: text analysis, dedup (+clustering),
similarity/ANN, corpus filters, assembly, sketches, skew tools,
importance weighting (DSIR), BM25 retrieval, multimodal plumbing."""

from apache_arrow_spark.functions import (
    bloom,
    dedup,
    filters,
    importance,
    lm,
    multimodal,
    pipeline,
    profiling,
    retrieval,
    similarity,
    sketches,
    skew,
    text,
    zorder,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "filters",
    "pipeline",
    "importance",
    "profiling",
    "retrieval",
    "sketches",
    "skew",
    "zorder",
    "bloom",
    "lm",
]
