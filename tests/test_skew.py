"""Salted two-stage aggregation: results identical to plain groupBy."""

import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.functions.skew import salted_agg


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["n"], r["qty"], r["mx"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("count", "*"), "qty": ("sum", "l_quantity"), "mx": ("max", "l_extendedprice")},
        ).collect()
    }
    exp = {
        r["l_returnflag"]: (r["n"], r["qty"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert got == exp


def test_salted_agg_two_shuffles(spark, sf_dir):
    from apache_arrow_spark.plans.inspect import shuffle_count

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = salted_agg(li, ["l_returnflag"], {"n": ("count", "*")}, n_salts=8)
    assert shuffle_count(out) == 2  # (key, salt) stage + key stage


def test_non_decomposable_rejected(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"a": ("avg", "l_quantity")})


def test_skew_report_orders_and_shares(spark):
    from apache_arrow_spark.functions.skew import skew_report

    rows = [(1,)] * 10 + [(2,)] * 5 + [(3,)] * 1
    df = spark.createDataFrame(rows, "k long")
    out = skew_report(df, "k", k=2).collect()
    assert [r["key"] for r in out] == [1, 2]
    assert out[0]["fanout"] == 100 and out[1]["fanout"] == 25
    total = 100 + 25 + 1
    assert out[0]["share_micro"] == 100 * 1_000_000 // total


def test_salted_join_matches_plain_join(spark):
    from apache_arrow_spark.functions.skew import salted_join

    fact = spark.createDataFrame(
        [(i % 5, i) for i in range(200)] + [(99, -1)], ["k", "v"]
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (2, "c2")], ["dk", "tag"]
    )
    plain = fact.join(dim, fact.k == dim.dk).select("k", "v", "tag")
    salted = salted_join(fact, dim, "k", "dk", n_salts=4).select("k", "v", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    plain_l = fact.join(dim, fact.k == dim.dk, "left").select("k", "v", "tag")
    salted_l = salted_join(fact, dim, "k", "dk", n_salts=4, how="left").select(
        "k", "v", "tag"
    )
    assert sorted(map(tuple, salted_l.collect(), ), key=str) == sorted(
        map(tuple, plain_l.collect()), key=str
    )


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    from apache_arrow_spark.functions.skew import salted_join

    df = spark.range(1).selectExpr("id AS k")
    with pytest.raises(ValueError):
        salted_join(df, df.selectExpr("k AS dk"), "k", "dk", how="full")
