"""Spatial grid-cell operators: bounded radius join without a cross
product.

The classic spatial-join problem — "all pairs of points within radius R" —
is quadratic if written as a theta-join.  The Spark-first shape is the
uniform grid: bucket every point into a square cell of side R, join each
point against the 3x3 neighborhood of its cell (one EQUI-join on the cell
key after a 9-way literal explode on one side), then apply the exact
distance predicate.  Every qualifying pair is guaranteed to live in
adjacent cells (cell side == R), each candidate pair is produced exactly
once (both endpoint cells are fixed, so one (cell_a, neighbor_offset)
combination matches), and the join is an ordinary shuffled/broadcast hash
join Catalyst can reason about — never a CartesianProduct.

Scale notes:
- candidate volume is sum over cells of |cell| * |3x3 neighborhood| —
  governed by point DENSITY, not corpus size; for skewed hotspots
  (one cell with millions of points) subdivide: shrink the cell side to
  R/k and widen the neighborhood to (2k+1)^2, trading fan-out for
  smaller per-cell quadratics, or salt the hot cells (functions.skew).
- all arithmetic is int64 on micro-degree coordinates: the distance
  predicate ``dx*dx + dy*dy <= R*R`` is exact and engine-portable (no
  floating point, no trig; for true great-circle semantics refine the
  survivors — a tiny set — with haversine downstream).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grid_radius_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered point pairs with squared euclidean distance
    <= radius^2, via the grid-cell equi-join described in the module
    docstring.  Coordinates must be non-negative int64 (micro-degrees);
    returns (id_a, id_b, dist2) with id_a < id_b and dist2 exact.
    """
    r = int(radius)
    pts = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumn(
        "cx", F.expr(f"x div {r}")
    ).withColumn(
        "cy", F.expr(f"y div {r}")
    )
    # probe side: each point registered under all 9 neighbor cells, so the
    # equi-join on the cell key covers every adjacent-cell pair.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        pts.withColumn("o", F.explode(offsets))
        .select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            (F.col("cx") + F.col("o.ox")).alias("jx"),
            (F.col("cy") + F.col("o.oy")).alias("jy"),
        )
    )
    build = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    return (
        build.join(probe, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", dx * dx + dy * dy)
        .filter(F.col("dist2") <= F.lit(r * r))
        .select("id_a", "id_b", "dist2")
    )
