"""Z-order (Morton) multi-dimensional clustering for statistics-based data
skipping.

q93/`io/parquet.write_sort_clustered` proves 1-D clustering: sort by one
column, parquet row-group min/max stats prune range scans.  A 1-D sort
cannot serve two independent range predicates at once — sorting by
custkey scatters orderdate across every file.  Interleaving the bits of
both (the Morton curve) keeps file-level min/max ranges tight on BOTH
dimensions simultaneously, so a 2-D range query prunes files on either
predicate.  This is the layout strategy Delta's OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite implement inside their table services —
here it is the engine-level recipe over plain parquet.

Scale shape: computing the z-value is a pure codegen'd expression;
`repartitionByRange(z)` samples the z distribution (one extra pass over
the keys only) and range-partitions, so files tile the curve evenly even
under skew.  The write moves each row once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def normalize_to_bits(col: Column, lo: Column | int, hi: Column | int, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2**bits) by linear min/max scaling.

    Integer arithmetic throughout (exact, engine-portable): values at
    ``hi`` land on the top bucket; out-of-range inputs clamp.  Callers
    supply bounds from domain knowledge or a stats pass — at 100 TB the
    bounds fetch is a 2-value driver read, same contract as the k-means
    centroid fetch in similarity.ivf_topk.
    """
    span = F.lit(hi).cast("long") - F.lit(lo).cast("long")
    scaled = F.floor(
        ((col.cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1)) / F.greatest(span, F.lit(1))
    ).cast("long")
    return F.greatest(F.least(scaled, F.lit((1 << bits) - 1)), F.lit(0))


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (each already in [0, 2**bits)) into one
    long: bit b of column i lands at position b*len(cols)+i.  Pure bitwise
    expression — whole-stage codegen, no UDF."""
    d = len(cols)
    assert d * bits <= 63, "z-value must fit a signed long"
    out = None
    for b in range(bits):
        for i, c in enumerate(cols):
            term = F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * d + i)
            out = term if out is None else out.bitwiseOR(term)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet tiled along the z-curve: range-partition by
    the z-value (distribution-sampled → even file sizes), sort within each
    file, drop the helper column.  Readers then prune files via parquet
    min/max stats on every z-ordered dimension."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_zordered(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read — pruning happens via pushed filters + row-group
    stats; no special reader needed (that is the point of the layout)."""
    return spark.read.parquet(path)
