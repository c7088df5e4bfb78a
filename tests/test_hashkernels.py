"""Hash kernels (SURVEY §2.4): unique / value_counts / dictionary_encode
first-appearance determinism (hash.cc / builder.h:856)."""

import pyspark.sql.functions as F

from apache_arrow_spark.compute.hashkernels import (
    dictionary,
    dictionary_encode,
    unique,
    value_counts,
)


def _df(spark):
    # first-appearance order: b (pos0), a (pos1), c (pos4)
    rows = [(0, "b"), (1, "a"), (2, "b"), (3, "a"), (4, "c"), (5, "b")]
    return spark.createDataFrame(rows, "__pos bigint, v string")


def test_unique(spark):
    got = {r["value"] for r in unique(_df(spark), "v").collect()}
    assert got == {"a", "b", "c"}


def test_value_counts(spark):
    got = {r["value"]: r["count"] for r in value_counts(_df(spark), "v").collect()}
    assert got == {"b": 3, "a": 2, "c": 1}


def test_dictionary_first_appearance_order(spark):
    d = {r["value"]: r["index"] for r in dictionary(_df(spark), "v").collect()}
    assert d == {"b": 0, "a": 1, "c": 2}


def test_dictionary_encode_codes(spark):
    enc = dictionary_encode(_df(spark), "v").orderBy("__pos")
    codes = [r["v_index"] for r in enc.collect()]
    assert codes == [0, 1, 0, 1, 2, 0]


def test_dictionary_encode_requires_ordinal(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        dictionary(df, "v")


def test_dictionary_matches_parquet_row_order(spark, sf_dir):
    """End-to-end: encode over a real file using _metadata.row_index."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "_metadata.row_index")
        .withColumnRenamed("row_index", "__pos")
    )
    d = dictionary(df, "l_returnflag").collect()
    assert len(d) == 3
    assert sorted(r["index"] for r in d) == [0, 1, 2]
    first_flag = df.orderBy("__pos").first()["l_returnflag"]
    by_index = {r["index"]: r["value"] for r in d}
    assert by_index[0] == first_flag


def test_is_in_literal_members(spark):
    from apache_arrow_spark.compute.hashkernels import is_in

    df = spark.createDataFrame(
        [(0, "b"), (1, "a"), (2, None), (3, "z")], "__pos bigint, v string"
    )
    got = {r["__pos"]: r["v_isin"] for r in is_in(df, "v", ["a", "b", None]).collect()}
    # NULL is never a member (Arrow set semantics): null value -> False
    assert got == {0: True, 1: True, 2: False, 3: False}


def test_is_in_dataframe_members_broadcast(spark):
    from apache_arrow_spark.compute.hashkernels import is_in

    df = spark.createDataFrame(
        [(0, "b"), (1, "a"), (2, None), (3, "z")], "__pos bigint, v string"
    )
    members = spark.createDataFrame([("a",), ("b",), ("a",), (None,)], "m string")
    out = is_in(df, "v", members)
    got = {r["__pos"]: r["v_isin"] for r in out.collect()}
    assert got == {0: True, 1: True, 2: False, 3: False}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fact side never shuffles


def test_match_literal_first_appearance(spark):
    from apache_arrow_spark.compute.hashkernels import match

    df = spark.createDataFrame(
        [(0, "b"), (1, "a"), (2, None), (3, "z")], "__pos bigint, v string"
    )
    # first-appearance index order of the member list: b=0, a=1 (dup ignored)
    got = {
        r["__pos"]: r["v_match"]
        for r in match(df, "v", ["b", "a", "b", None]).collect()
    }
    assert got == {0: 0, 1: 1, 2: None, 3: None}


def test_match_dataframe_members(spark):
    from apache_arrow_spark.compute.hashkernels import match

    df = spark.createDataFrame([(0, "a"), (1, "c")], "__pos bigint, v string")
    members = spark.createDataFrame(
        [(0, "c"), (1, "a"), (2, "c")], "__pos bigint, m string"
    )
    got = {r["__pos"]: r["v_match"] for r in match(df, "v", members).collect()}
    assert got == {0: 1, 1: 0}


def test_match_dataframe_null_member_consumes_no_slot(spark):
    """A NULL member in the DataFrame form must not consume a
    first-appearance index slot (it can never equi-join a fact row):
    the index mapping must equal the literal form of the same set."""
    from apache_arrow_spark.compute.hashkernels import match

    df = spark.createDataFrame([(0, "a"), (1, "c")], "__pos bigint, v string")
    members = spark.createDataFrame(
        [(0, None), (1, "c"), (2, "a")], "__pos bigint, m string"
    )
    got = {r["__pos"]: r["v_match"] for r in match(df, "v", members).collect()}
    lit = {
        r["__pos"]: r["v_match"] for r in match(df, "v", [None, "c", "a"]).collect()
    }
    assert got == lit == {0: 1, 1: 0}

def test_is_in_dataframe_members_no_broadcast_contract(spark):
    """broadcast_members=False (the O(SF) member-set escape): same
    answer, no forced broadcast hint in the optimized plan — AQE may
    still choose one at runtime, but nothing PINS it at cluster scale."""
    from apache_arrow_spark.compute.hashkernels import is_in

    df = spark.createDataFrame(
        [(0, "b"), (1, "a"), (2, None), (3, "z")], "__pos bigint, v string"
    )
    members = spark.createDataFrame([("a",), ("b",), (None,)], "m string")
    out = is_in(df, "v", members, broadcast_members=False)
    got = {r["__pos"]: r["v_isin"] for r in out.collect()}
    assert got == {0: True, 1: True, 2: False, 3: False}
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in logical.lower()
