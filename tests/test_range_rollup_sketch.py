"""Tests for the scale-pattern operators: bucketed range join, hypertable
rollup, mergeable HLL sketches (operators/range_join.py, operators/rollup.py,
functions/sketches.py)."""

import pyspark.sql.functions as F

from apache_arrow_spark.session import load_table


def _events_us(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", F.expr("ts div 1000").alias("ts_us"))


def test_time_tolerance_pairs_matches_naive(spark, sf_dir):
    from apache_arrow_spark.operators.range_join import time_tolerance_pairs

    ev = _events_us(spark, sf_dir)
    tol = 30 * 60 * 1_000_000  # 30 min
    got = time_tolerance_pairs(ev, "ts_us", "event_id", "user_id", tol)

    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_a"), F.col("ts_us").alias("ta")
    )
    b = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_b"), F.col("ts_us").alias("tb")
    )
    naive = (
        a.join(b, on="user_id")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ta") - F.col("tb")) <= tol)
        )
        .select("user_id", "id_a", "id_b")
    )
    got_set = {(r.user_id, r.id_a, r.id_b) for r in got.collect()}
    naive_set = {(r.user_id, r.id_a, r.id_b) for r in naive.collect()}
    assert got_set == naive_set
    assert len(got_set) > 0


def test_time_tolerance_pairs_no_duplicate_pairs(spark, sf_dir):
    from apache_arrow_spark.operators.range_join import time_tolerance_pairs

    ev = _events_us(spark, sf_dir)
    got = time_tolerance_pairs(ev, "ts_us", "event_id", "user_id", 30 * 60 * 1_000_000)
    n = got.count()
    assert got.select("id_a", "id_b").distinct().count() == n


def test_band_join_assigns_every_row_once(spark, sf_dir):
    from apache_arrow_spark.operators.range_join import band_join

    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 950.0), ("high", 950.0, 10_000.0)],
        "band string, lo double, hi double",
    )
    joined = band_join(part, bands, "p_retailprice")
    assert joined.count() == part.count()  # bands cover the domain, disjoint
    # fact side must not shuffle: broadcast strategy in the plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_rollup_partials_lossless_vs_direct(spark, sf_dir):
    from apache_arrow_spark.compute.cast import CastOptions, timestamp_from_long
    from apache_arrow_spark.operators.rollup import (
        continuous_aggregate,
        finalize,
        rollup_partials,
    )

    ev = load_table(spark, sf_dir, "events")
    ts = timestamp_from_long(F.col("ts"), "ns", CastOptions(allow_time_truncate=True))
    raw = ev.select(ts.alias("ts"), "event_type", "value")

    hourly = continuous_aggregate(raw, "ts", "hour", ["event_type"], "value")
    via_partials = finalize(rollup_partials(hourly, "day", ["event_type"]))
    direct = finalize(continuous_aggregate(raw, "ts", "day", ["event_type"], "value"))

    key = lambda r: (str(r.bucket_start), r.event_type)
    got = {key(r): (r.n, r.mn, r.mx, r.sum_value, r.avg_value) for r in via_partials.collect()}
    want = {key(r): (r.n, r.mn, r.mx, r.sum_value, r.avg_value) for r in direct.collect()}
    assert got == want
    assert len(got) > 0


def test_rollup_week_from_hour(spark, sf_dir):
    from apache_arrow_spark.compute.cast import CastOptions, timestamp_from_long
    from apache_arrow_spark.operators.rollup import (
        continuous_aggregate,
        finalize,
        rollup_partials,
    )

    ev = load_table(spark, sf_dir, "events")
    ts = timestamp_from_long(F.col("ts"), "ns", CastOptions(allow_time_truncate=True))
    raw = ev.select(ts.alias("ts"), "event_type", "value")
    hourly = continuous_aggregate(raw, "ts", "hour", ["event_type"], "value")
    weekly = finalize(rollup_partials(hourly, "week", ["event_type"]))
    direct = finalize(continuous_aggregate(raw, "ts", "week", ["event_type"], "value"))
    assert sorted(map(str, weekly.collect())) == sorted(map(str, direct.collect()))


def test_hll_merge_matches_exact_at_small_cardinality(spark, sf_dir):
    from apache_arrow_spark.functions.sketches import (
        distinct_sketches,
        distinct_within_tolerance,
        merge_distinct,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", (F.col("event_id") % 7).alias("shard")
    )
    # sketch per (event_type, shard), merge to event_type
    est = merge_distinct(
        distinct_sketches(ev, "user_id", ["event_type", "shard"]), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact")
    )
    m = {r.event_type: r.approx_distinct for r in est.collect()}
    for r in exact.collect():
        # HLL is in exact mode at these cardinalities
        assert m[r.event_type] == r.exact

    checked = distinct_within_tolerance(
        ev, "user_id", ["event_type", "shard"], ["event_type"]
    )
    assert all(r.within_tol for r in checked.collect())


def test_quantile_sketch_within_tolerance(spark, sf_dir):
    """Sketch estimates sit inside the declared tolerance of exact
    percentiles for every group, and exact values match a local numpy
    computation."""
    import numpy as np
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.sketches import quantiles_within_tolerance
    from apache_arrow_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    out = quantiles_within_tolerance(
        ev, "value", ["event_type"], [0.5, 0.95]
    ).collect()
    assert out and all(r["within_tol"] for r in out)
    vals = ev.select("event_type", "value").toPandas()
    for r in out:
        grp = vals[vals.event_type == r["event_type"]]["value"].to_numpy()
        assert abs(r["p50"] - round(float(np.quantile(grp, 0.5)), 6)) < 1e-6
        assert abs(r["p95"] - round(float(np.quantile(grp, 0.95)), 6)) < 1e-6


def test_intersection_estimate_exact_below_sketch_capacity(spark):
    from apache_arrow_spark.functions.sketches import intersection_estimate

    rows = (
        [(u, "a") for u in range(100)]
        + [(u, "b") for u in range(50, 130)]
        + [(u, "c") for u in range(1000)]  # noise tag, filtered out
    )
    df = spark.createDataFrame(rows, "user_id long, tag string")
    out = intersection_estimate(df, "user_id", "tag", "a", "b").collect()[0]
    assert out["exact_intersection"] == 50
    assert out["within_tol"]


def test_intersection_estimate_empty_and_small_overlap(spark):
    from apache_arrow_spark.functions.sketches import intersection_estimate

    # neither tag present: defined zeros, not NULL poisoning
    df = spark.createDataFrame([(1, "z")], "user_id long, tag string")
    out = intersection_estimate(df, "user_id", "tag", "a", "b").collect()[0]
    assert out["exact_intersection"] == 0 and out["within_tol"] is True
    # small overlap of two large sets: tolerance is union-relative
    rows = [(u, "a") for u in range(5000)] + [(u, "b") for u in range(4990, 9990)]
    big = spark.createDataFrame(rows, "user_id long, tag string")
    out = intersection_estimate(big, "user_id", "tag", "a", "b").collect()[0]
    assert out["exact_intersection"] == 10 and out["within_tol"] is True


def test_heavy_hitters_exact_matches_full_aggregate(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.sketches import heavy_hitters_exact

    # skewed key distribution: key i appears (50 - i) times for i < 40
    rows = [(i,) for i in range(40) for _ in range(50 - i)]
    df = spark.createDataFrame(rows, "user_id long")
    got = heavy_hitters_exact(df, "user_id", k=10, mg_capacity=32, n_shards=8)
    want = [(i + 1, i, 50 - i) for i in range(10)]
    assert [(r["rnk"], r["user_id"], r["n"]) for r in got.collect()] == want


def test_heavy_hitters_fail_loud_when_capacity_too_small(spark):
    import pytest as _pytest

    from apache_arrow_spark.functions.sketches import heavy_hitters_exact

    # near-uniform keys: nothing clears the shard bound at capacity 2
    df = spark.createDataFrame([(i % 300,) for i in range(900)], "user_id long")
    with _pytest.raises(ValueError, match="MG capacity too small"):
        heavy_hitters_exact(df, "user_id", k=5, mg_capacity=2, n_shards=2)


def test_heavy_hitters_exact_string_keys(spark):
    # the candidate schema must carry the caller's key type — bigint was
    # hardcoded, breaking string keys at runtime (ADVICE r3)
    from apache_arrow_spark.functions.sketches import heavy_hitters_exact

    rows = [(f"key{i}",) for i in range(20) for _ in range(40 - i)]
    df = spark.createDataFrame(rows, "term string")
    got = heavy_hitters_exact(df, "term", k=5, mg_capacity=32, n_shards=4)
    want = [(i + 1, f"key{i}", 40 - i) for i in range(5)]
    assert [(r["rnk"], r["term"], r["n"]) for r in got.collect()] == want
