"""resample_ffill + profile + weighted_sample unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from apache_arrow_spark.functions.pipeline import weighted_sample
from apache_arrow_spark.functions.profiling import profile
from apache_arrow_spark.operators.timeseries import resample_ffill


def test_resample_fills_gaps_and_carries_value(spark):
    # series 'a': buckets 0 and 3 observed -> 1,2 filled with bucket-0 value
    rows = [("a", 5, 10.0), ("a", 35, 30.0), ("b", 12, 7.0)]
    df = spark.createDataFrame(rows, "s string, t bigint, v double")
    out = {
        (r.series, r.bucket_start): (r.value, r.observed)
        for r in resample_ffill(df, "s", "t", "v", 10).collect()
    }
    assert out[("a", 0)] == (10.0, True)
    assert out[("a", 10)] == (10.0, False)
    assert out[("a", 20)] == (10.0, False)
    assert out[("a", 30)] == (30.0, True)
    assert out[("b", 10)] == (7.0, True)
    assert len(out) == 5  # no spine beyond each series' own bounds


def test_resample_custom_agg(spark):
    rows = [("a", 1, 1.0), ("a", 2, 5.0)]
    df = spark.createDataFrame(rows, "s string, t bigint, v double")
    out = resample_ffill(df, "s", "t", "v", 10, agg=F.max).collect()
    assert out[0].value == 5.0


def test_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a bigint, b string"
    )
    out = {r.column: r for r in profile(df).collect()}
    assert out["a"].n_rows == 3 and out["a"].n_null == 0 and out["a"].n_distinct == 2
    assert out["b"].n_null == 1 and out["b"].n_distinct == 2


def test_profile_approx_close(spark):
    df = spark.createDataFrame([(i % 100,) for i in range(1000)], "a bigint")
    exact = profile(df).first()
    approx = profile(df, approx=True).first()
    assert exact.n_distinct == 100
    assert abs(approx.n_distinct - 100) <= 10


def test_weighted_sample_properties(spark):
    rows = [(i, 1 + (i % 10) * 1000) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    s1 = [r.k for r in weighted_sample(df, "w", 50, "k", salt="s").collect()]
    s2 = [r.k for r in weighted_sample(df, "w", 50, "k", salt="s").collect()]
    assert s1 == s2 and len(s1) == 50 == len(set(s1))  # deterministic, w/o replacement
    # heavy weights dominate: weight-1 rows (i%10==0) should be rare
    light = sum(1 for k in s1 if k % 10 == 0)
    assert light <= 5


def test_weighted_sample_plan_is_takeordered(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(100)], "k bigint, w bigint")
    plan = (
        weighted_sample(df, "w", 5, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_ewma_matches_reference_weights(spark):
    from apache_arrow_spark.functions.timeseries import ewma

    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])] + [
        (2, 0, 100.0)
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    out = {
        (r["user_id"], r["seq"]): r["__ewma"]
        for r in ewma(df, "value", "user_id", ["seq"], alpha=0.5, horizon=16).collect()
    }

    def ref(xs):
        num = sum(x * 0.5**j for j, x in enumerate(reversed(xs)))
        den = sum(0.5**j for j in range(len(xs)))
        return num / den

    assert abs(out[(1, 0)] - 10.0) < 1e-12
    assert abs(out[(1, 1)] - ref([10, 20])) < 1e-12
    assert abs(out[(1, 3)] - ref([10, 20, 30, 40])) < 1e-12
    assert out[(2, 0)] == 100.0  # singleton key: ewma == the value


def test_rolling_zscore_trailing_window_excludes_current(spark):
    from apache_arrow_spark.functions.timeseries import rolling_zscore

    # key 1: twelve 10.0s then a spike; key 2: too little history -> NULL
    rows = [(1, i, 10.0 + (0.1 if i % 2 else -0.1)) for i in range(12)]
    rows.append((1, 12, 25.0))
    rows += [(2, 0, 1.0), (2, 1, 2.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = rolling_zscore(df, "v", "k", ["t"], lookback=20, min_obs=12)
    got = {(r["k"], r["t"]): r["__z"] for r in out.collect()}
    # the spike is scored against the flat history: huge positive z
    assert got[(1, 12)] is not None and got[(1, 12)] > 50
    # rows without min_obs history are unscored
    assert got[(2, 1)] is None and got[(1, 5)] is None


def test_rolling_zscore_constant_history_is_null_not_inf(spark):
    from apache_arrow_spark.functions.timeseries import rolling_zscore

    rows = [(1, i, 5.0) for i in range(15)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = rolling_zscore(df, "v", "k", ["t"], lookback=20, min_obs=12)
    assert all(r["__z"] is None for r in out.collect())


def test_snapshot_partition_diff_statuses(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.profiling import snapshot_partition_diff

    v1 = spark.createDataFrame(
        [("p1", 1, "a"), ("p1", 2, "b"), ("p2", 3, "c"), ("p3", 4, "d")],
        "pk string, id long, v string",
    )
    v2 = spark.createDataFrame(
        [("p1", 1, "a"), ("p1", 2, "b"), ("p2", 3, "CHANGED"), ("p4", 5, "e")],
        "pk string, id long, v string",
    )
    rows = {
        r["group_key"]: r
        for r in snapshot_partition_diff(v1, v2, ["id", "v"], "pk").collect()
    }
    assert rows["p1"]["status"] == "unchanged"
    assert rows["p2"]["status"] == "changed"
    assert rows["p3"]["status"] == "removed" and rows["p3"]["n_rows_v2"] == 0
    assert rows["p4"]["status"] == "added" and rows["p4"]["n_rows_v1"] == 0


def test_snapshot_partition_diff_duplicate_multiplicity(spark):
    # xor cancels on even duplicates; the multiset sum must still flag it
    from apache_arrow_spark.functions.profiling import snapshot_partition_diff

    v1 = spark.createDataFrame([("p", 1, "a")], "pk string, id long, v string")
    v2 = spark.createDataFrame(
        [("p", 1, "a"), ("p", 1, "a"), ("p", 1, "a")],
        "pk string, id long, v string",
    )
    rows = snapshot_partition_diff(v1, v2, ["id", "v"], "pk").collect()
    assert rows[0]["status"] == "changed"


def test_ohlc_bars_open_close_tiebreak(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.timeseries import ohlc_bars

    rows = [
        # (ts, id, v) — equal ts at open: id breaks the tie
        ("a", 10, 1, 100), ("a", 10, 2, 200), ("a", 20, 3, 50), ("a", 30, 4, 150),
        ("b", 5, 5, 7),
    ]
    df = spark.createDataFrame(rows, "g string, ts long, id long, v long")
    out = {r["g"]: r for r in ohlc_bars(
        df, "ts", "v", "id", F.lit(0), group_col="g").collect()}
    a = out["a"]
    assert (a["open"], a["high"], a["low"], a["close"], a["volume"]) == (100, 200, 50, 150, 4)
    b = out["b"]
    assert (b["open"], b["close"], b["volume"]) == (7, 7, 1)


def test_delta_join_sum_matches_full_recompute(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.operators.ivm import apply_view_delta, delta_join_sum

    a_old = spark.createDataFrame([(1, "x"), (2, "y")], "k long, g string")
    a_d = spark.createDataFrame([(3, "z")], "k long, g string")  # new group via delta
    b_old = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b_d = spark.createDataFrame([(1, 5), (3, 7)], "k long, v long")
    v_old = a_old.join(b_old, "k").groupBy("g").agg(F.sum("v").alias("s"))
    delta = delta_join_sum(a_old, a_d, b_old, b_d, "k", "g", "v")
    incr = {r["g"]: r["s"] for r in apply_view_delta(v_old, delta, "g", "s").collect()}
    a_full = a_old.unionByName(a_d)
    b_full = b_old.unionByName(b_d)
    full = {r["g"]: r["s"] for r in
            a_full.join(b_full, "k").groupBy("g").agg(F.sum("v").alias("s")).collect()}
    assert incr == full  # includes x (+5) and the delta-only group z (7)


def test_bfs_khop_distances(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.graph import bfs_khop

    # path 1-2-3-4-5 plus a triangle 1-10-11-1: BFS(1, 3 hops)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 10), (10, 11), (11, 1)],
        "a long, b long",
    )
    got = {r["node"]: r["dist"] for r in bfs_khop(edges, [1], 3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 10: 1, 11: 1}
