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
