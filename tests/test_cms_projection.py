"""Count-min sketch guarantees and random-projection geometry."""

import math

import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.functions.sketches import (
    count_min_cells,
    count_min_estimate,
    count_min_merge,
)
from apache_arrow_spark.functions.similarity import hyperplanes, random_projection


@pytest.fixture(scope="module")
def stream(spark):
    # skewed stream: token t0 x 512, t1 x 256, ... tail of singletons
    rows = []
    for i in range(10):
        rows += [(f"t{i}",)] * (512 >> i)
    rows += [(f"rare{i}",) for i in range(200)]
    return spark.createDataFrame(rows, ["k"])


def test_never_underestimates(spark, stream):
    cells = count_min_cells(stream, "k", width=256, depth=4)
    exact = stream.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    est = count_min_estimate(cells, exact.select("k"), "k", width=256, depth=4)
    j = exact.join(est, on="k").collect()
    assert len(j) == 210
    assert all(r["est"] >= r["c"] for r in j)


def test_error_bounded_by_eps_n(spark, stream):
    w, d = 256, 4
    n = stream.count()
    cells = count_min_cells(stream, "k", width=w, depth=d)
    exact = stream.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    est = count_min_estimate(cells, exact.select("k"), "k", width=w, depth=d)
    eps = math.e / w
    # the eps*N bound holds per-key with prob 1-e^-d; over 210 keys allow
    # the deterministic seeded layout to stay within 2x the bound
    for r in exact.join(est, on="k").collect():
        assert r["est"] - r["c"] <= 2 * eps * n + 1


def test_merge_equals_combined_build(spark, stream):
    # build over two disjoint halves, merge, compare against one build
    import pyspark.sql.functions as FF

    with_id = stream.withColumn("__i", FF.monotonically_increasing_id())
    a = with_id.filter(FF.col("__i") % 2 == 0).select("k")
    b = with_id.filter(FF.col("__i") % 2 == 1).select("k")
    merged = count_min_merge(
        count_min_cells(a, "k", width=128, depth=3).unionByName(
            count_min_cells(b, "k", width=128, depth=3)
        )
    )
    direct = count_min_cells(stream, "k", width=128, depth=3)
    got = {(r["d"], r["pos"]): r["cnt"] for r in merged.collect()}
    want = {(r["d"], r["pos"]): r["cnt"] for r in direct.collect()}
    assert got == want


def test_absent_key_estimate_is_small(spark, stream):
    cells = count_min_cells(stream, "k", width=1024, depth=4)
    absent = spark.createDataFrame([(f"absent{i}",) for i in range(20)], ["k"])
    ests = count_min_estimate(cells, absent, "k", width=1024, depth=4).collect()
    n = stream.count()
    assert all(r["est"] <= math.e / 1024 * n * 2 + 1 for r in ests)


def test_projection_preserves_scaling_and_linearity(spark):
    # proj(2v) == 2*proj(v) up to rounding; deterministic across calls
    v = [float((i * 37 % 19) - 9) / 3.0 for i in range(64)]
    df = spark.createDataFrame(
        [(1, v), (2, [2 * x for x in v])], ["vec_id", "embedding"]
    )
    out = {
        r["id"]: r["proj"]
        for r in random_projection(df, dim=64, out_dim=8).collect()
    }
    assert len(out[1]) == 8
    for a, b in zip(out[1], out[2]):
        assert abs(2 * a - b) < 1e-4


def test_projection_approximates_distances(spark, sf_dir):
    # JL: relative pairwise-distance distortion is bounded for most pairs.
    import numpy as np

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in e.collect()
    }
    proj = {
        r["id"]: np.array(r["proj"], dtype=float)
        for r in random_projection(e, dim=64, out_dim=16).collect()
    }
    # Gaussian projections need a 1/sqrt(out_dim) scale for unbiased norms
    scale = 1.0 / math.sqrt(16)
    ratios = []
    ids = sorted(orig)[:20]
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(proj[a] - proj[b]) * scale
        if d0 > 0:
            ratios.append(d1 / d0)
    assert ratios and 0.4 < sum(ratios) / len(ratios) < 1.6


def test_hyperplanes_deterministic():
    assert hyperplanes(8, 3, seed=1) == hyperplanes(8, 3, seed=1)
    assert hyperplanes(8, 3, seed=1) != hyperplanes(8, 3, seed=2)
