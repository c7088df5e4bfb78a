"""Predicate DSL parity with js/src/predicate.ts (eq/lteq/gteq/and/or/custom)."""

import pyspark.sql.functions as F

from apache_arrow_spark.predicates import col, custom, lit
from apache_arrow_spark.table import Table


def _t(spark):
    rows = [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"), (4, 40.0, "c"), (5, 50.0, "a")]
    return Table(spark.createDataFrame(rows, "id int, x double, tag string"))


def test_eq_col_lit(spark):
    assert _t(spark).filter(col("tag").eq("a")).count() == 3


def test_eq_col_col(spark):
    t = Table(spark.createDataFrame([(1, 1), (1, 2)], "a int, b int"))
    assert t.filter(col("a").eq(col("b"))).count() == 1


def test_lteq_gteq(spark):
    t = _t(spark)
    assert t.filter(col("x").lteq(20.0)).count() == 2
    assert t.filter(col("x").gteq(lit(30.0))).count() == 3


def test_and_or_flatten(spark):
    t = _t(spark)
    p = col("x").gteq(20.0).and_(col("tag").eq("a"))
    assert t.filter(p).count() == 2
    q = col("x").lteq(10.0).or_(col("x").gteq(50.0))
    assert t.filter(q).count() == 2
    flat = p.and_(col("id").gteq(1)).ands()
    assert len(flat) == 3


def test_operator_sugar(spark):
    t = _t(spark)
    assert t.filter(col("x").gteq(20.0) & col("tag").eq("a")).count() == 2
    assert t.filter(~col("tag").eq("a")).count() == 2


def test_custom_predicate(spark):
    t = _t(spark)
    p = custom(lambda b: b["x"] % 20 == 0, columns=["x"])
    assert t.filter(p).count() == 2


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Predicates must reach the parquet scan (PushedFilters)."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(F.col("l_quantity") >= 30)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,30.0)]" in plan


def test_isin_predicate(spark):
    from apache_arrow_spark.predicates import isin

    t = _t(spark)
    assert t.filter(isin(col("tag"), ["a", "c"])).count() == 4
    assert t.filter(isin(col("tag"), [])).count() == 0
    # null member contributes nothing; null value is never a member
    t2 = Table(spark.createDataFrame([("a",), (None,)], "tag string"))
    assert t2.filter(isin(col("tag"), ["a", None])).count() == 1


def test_isin_pushdown_reaches_scan(spark, sf_dir):
    from apache_arrow_spark.predicates import isin
    from apache_arrow_spark.table import Table

    t = Table(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    df = t.filter(isin(col("o_orderpriority"), ["1-URGENT", "2-HIGH"])).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In(o_orderpriority" in plan  # In filter pushed to the scan


def test_isin_negation_keeps_null_rows(spark):
    """Not(IsIn) must KEEP a NULL row: NULL is not a member, so NOT-member
    is definitively true (Arrow set semantics).  The raw SQL In expression
    would yield NULL here and ~NULL = NULL would drop the row — the
    In(..) AND IsNotNull(..) lowering pins the definite-boolean contract."""
    from apache_arrow_spark.predicates import Not, isin

    t = Table(spark.createDataFrame([("a",), ("b",), (None,)], "tag string"))
    kept = t.filter(Not(isin(col("tag"), ["a"]))).df
    assert sorted(r["tag"] for r in kept.collect() if r["tag"] is not None) == ["b"]
    assert kept.count() == 2  # 'b' AND the NULL row
