"""As-of join semantics vs hand-computed expectations."""

import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.operators import asof_join


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 7, "x1")],
        "k bigint, t bigint, ev string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (1, 20, 300.0), (3, 1, 999.0)],
        "k bigint, rt bigint, price double",
    )
    return left, right


def test_backward_inclusive_match(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    got = {(r["k"], r["t"]): r["price"] for r in out.collect()}
    # t=10 -> rt=8; t=20 -> rt=20 (inclusive); t=5 -> no match; k=2 -> none
    assert got == {(1, 10): 100.0, (1, 20): 300.0}


def test_left_keeps_unmatched(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", how="left")
    got = {(r["k"], r["t"]): r["price"] for r in out.collect()}
    assert got[(1, 5)] is None and got[(2, 7)] is None
    assert got[(1, 10)] == 100.0
    assert len(got) == 4


def test_tolerance(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", tolerance=F.lit(1)
    )
    got = {(r["k"], r["t"]): r["price"] for r in out.collect()}
    # t=10 matched rt=8, staleness 2 > 1 -> dropped; t=20/rt=20 staleness 0
    assert got == {(1, 20): 300.0}


def test_null_attribute_in_matched_row_is_kept(spark):
    # The matched right row carries a legitimate NULL in one attribute; it
    # must NOT be backfilled from an older right row (merge_asof semantics:
    # the match is a whole row, not per-column).
    left = spark.createDataFrame([(1, 30, "e")], "k bigint, t bigint, ev string")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "full"), (1, 20, None, "sparse")],
        "k bigint, rt bigint, price double, tag string",
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["tag"] == "sparse"
    assert rows[0]["price"] is None  # not 100.0 from the older row


def test_column_collision_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left.withColumnRenamed("ev", "price"), right, "k", "t", "rt")


def test_asof_join_no_duplicate_time_column(spark):
    from apache_arrow_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "a")], "k long, t long, lv string")
    right = spark.createDataFrame([(1, 5, "r")], "k long, rt long, rv string")
    out = asof_join(left, right, "k", "t", "rt")
    # regression: left_time must appear exactly once (was duplicated)
    assert out.columns.count("t") == 1
    r = out.select("t", "rv").first()
    assert r["t"] == 10 and r["rv"] == "r"


def test_asof_forward_and_nearest(spark):
    from apache_arrow_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 35)], "k long, id long, t long"
    )
    right = spark.createDataFrame(
        [(1, 14), (1, 30)], "k long, rt long"
    )
    fwd = {r["id"]: r["rt"] for r in asof_join_forward(left, right, "k", "t", "rt", how="left").collect()}
    assert fwd == {1: 14, 2: 30, 3: None}
    near = {r["id"]: r["rt"] for r in asof_join_nearest(left, right, "k", "t", "rt", "id").collect()}
    # t=10 -> 14 (forward only 4 away); t=20 -> 14 (6 back vs 10 fwd);
    # t=35 -> 30 (backward only)
    assert near == {1: 14, 2: 14, 3: 30}


def test_asof_nearest_tie_prefers_backward(spark):
    from apache_arrow_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame([(1, 1, 20)], "k long, id long, t long")
    right = spark.createDataFrame([(1, 15), (1, 25)], "k long, rt long")
    r = asof_join_nearest(left, right, "k", "t", "rt", "id").first()
    assert r["rt"] == 15


def test_asof_left_time_colliding_with_right_column_raises(spark):
    # both sides naming their time column 'ts' must fail loud, not emit
    # two 'ts' output columns (ADVICE r3: guard regressed in the
    # duplicate-column fix)
    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, lv string")
    right = spark.createDataFrame([(1, 5, "r")], "k long, ts long, rv string")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, "k", left_time="ts", right_time="ts")
