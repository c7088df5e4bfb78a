"""Grid-cell radius join: bucketed candidate generation must equal the
brute-force quadratic answer, including pairs that straddle cell borders."""

import pyspark.sql.functions as F

from apache_arrow_spark.functions.geo import grid_radius_join


def _brute(rows, r):
    out = set()
    for i, (ia, xa, ya) in enumerate(rows):
        for ib, xb, yb in rows[i + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                a, b = sorted((ia, ib))
                out.add((a, b, d2))
    return out


def test_grid_radius_join_matches_brute_force(spark):
    # points chosen to exercise: same cell, adjacent cell, diagonal cell,
    # just-inside vs just-outside the radius, far-apart singleton
    rows = [
        (1, 100, 100),
        (2, 105, 104),     # same cell as 1, inside
        (3, 1099, 100),    # adjacent cell, dist 999 inside
        (4, 2101, 100),    # two cells over from 1 — outside for r=1000
        (5, 999, 999),     # diagonal neighbor of 1: dist2 = 2*899^2 > r^2
        (6, 1000, 1000),   # cell corner point
        (7, 50000, 50000), # isolated
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        (r["id_a"], r["id_b"], r["dist2"])
        for r in grid_radius_join(df, "id", "x", "y", 1000).collect()
    }
    assert got == _brute(rows, 1000)
    assert any(a == 1 and b == 3 for a, b, _ in got)  # cross-cell pair found


def test_grid_radius_join_no_duplicate_pairs(spark):
    rows = [(i, 10 * i, 7 * i) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = grid_radius_join(df, "id", "x", "y", 500).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert len(pairs) == len(set(pairs)) and len(pairs) > 0
    assert {(a, b, d) for a, b, d in ((r["id_a"], r["id_b"], r["dist2"]) for r in out)} == _brute(rows, 500)
