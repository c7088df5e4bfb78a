"""Edge cases a driver run can hit: empty inputs, all-null columns, k > n,
schema mismatches."""

import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.compute.hashkernels import dictionary, unique, value_counts
from apache_arrow_spark.functions.dedup import exact_dedup, minhash_near_duplicates, simhash
from apache_arrow_spark.functions.similarity import cosine_topk
from apache_arrow_spark.functions.text import lang_id, quality_score, token_count
from apache_arrow_spark.table import Table, concat_tables


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_empty_table_through_kernels(spark):
    e = _empty_docs(spark)
    assert unique(e, "text").count() == 0
    assert value_counts(e, "text").count() == 0
    assert exact_dedup(e).count() == 0
    assert simhash(e).count() == 0
    assert minhash_near_duplicates(e).count() == 0


def test_empty_text_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "ok text here")],
        "doc_id bigint, text string",
    )
    out = df.select(
        token_count(F.col("text")).alias("tc"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert [r["tc"] for r in out[:2]] == [0, 0]
    assert out[2]["tc"] is None and out[2]["lang"] is None
    assert out[3]["tc"] == 3


def test_all_null_column_dictionary(spark):
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, "x")], "__pos bigint, v string"
    )
    d = {r["value"]: r["index"] for r in dictionary(df, "v").collect()}
    # null is a dictionary entry with first-appearance order, like the
    # reference's null handling in DictionaryBuilder
    assert d["x"] == 1 and None in d and d[None] == 0


def test_topk_k_exceeds_n(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5])], "vec_id bigint, embedding array<float>"
    )
    got = cosine_topk(df, [1.0, 0.0], k=10).collect()
    assert len(got) == 2
    assert got[0]["vec_id"] == 0


def test_concat_schema_mismatch_raises(spark):
    a = Table(spark.createDataFrame([(1,)], "x int"))
    b = Table(spark.createDataFrame([(1,)], "y int"))
    with pytest.raises(Exception):
        concat_tables([a, b]).count()


def test_slice_beyond_rowcount(spark):
    t = Table(spark.createDataFrame([(i,) for i in range(5)], "id int"))
    assert t.slice(offset=10, length=5, order_by=["id"]).count() == 0


def test_minhash_short_docs_no_crash(spark):
    # docs shorter than the shingle width produce no signature, no pairs
    df = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "abcdefghij")], "doc_id bigint, text string"
    )
    assert minhash_near_duplicates(df, jaccard_threshold=0.1).count() == 0


def test_decimal_mod_decomposition_matches_native(spark):
    """q16's integer-space rewrite of ``x % 10`` (floor(x)%10 + frac) must
    equal native decimal modulo for every sign combination."""
    vals = [3.5, 13.5, 10.0, 0.0, 0.5, -3.5, -13.5, -10.0, -0.5, 99999.9999, -99999.9999]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    dec = F.col("x").cast("decimal(18,4)")
    a = F.abs(dec)
    fl = F.floor(a).cast("bigint")
    frac = a - fl.cast("decimal(18,4)")
    neg = dec < 0
    smi = F.when(neg, -(fl % 10)).otherwise(fl % 10)
    smf = F.when(neg, -frac).otherwise(frac)
    out = df.select(
        (dec % F.lit(10)).cast("decimal(38,6)").alias("native"),
        (smi.cast("decimal(38,4)") + smf).cast("decimal(38,6)").alias("decomposed"),
    ).collect()
    for r in out:
        assert r["native"] == r["decomposed"], r


def test_q16_sum_minus_null_alignment(spark, tmp_path):
    """sum(a-b) decomposition must match direct sum(a-b) when a and b are
    null on DIFFERENT rows (SQL sum skips a row when either operand is
    null) — the null-free TPC-H fixtures cannot catch this."""
    from apache_arrow_spark.queries import QUERIES

    rows = [
        ("A", 100.0, 0.1),
        ("A", None, 0.2),     # price null, disc present
        ("A", 50.0, None),    # price present, disc null
        ("A", -7.5, 0.05),
        ("B", None, None),
        ("B", 20.0, 0.3),
    ]
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double, l_discount double")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["l_returnflag"]: r["sum_minus"]
        for r in QUERIES["q16_decimal_ops"](spark, str(tmp_path)).collect()
    }
    # direct per-row decimal subtraction, nulls skipped (the declared oracle)
    direct = {
        r["l_returnflag"]: r["d"]
        for r in df.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                - F.col("l_discount").cast("decimal(18,4)")
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("d")
        )
        .collect()
    }
    assert got == direct


def test_new_operators_on_empty_inputs(spark):
    """Round-2 operators degrade to empty/identity on empty inputs instead
    of crashing: components on no pairs, assignments with no pairs (all
    singleton-canonical), chunking/quantization/knn on empty frames."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.dedup import (
        cluster_assignments,
        connected_components,
        exact_dedup_incremental,
    )
    from apache_arrow_spark.functions.pipeline import chunk_documents
    from apache_arrow_spark.functions.similarity import knn_join_exact, quantize_int8

    empty_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty_pairs).count() == 0

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id bigint, text string"
    )
    out = cluster_assignments(docs, empty_pairs).collect()
    assert all(r["is_canonical"] and r["cluster_id"] == r["doc_id"] for r in out)

    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert chunk_documents(empty_docs).count() == 0
    assert exact_dedup_incremental(empty_docs, docs).count() == 0
    assert sorted(
        r["doc_id"] for r in exact_dedup_incremental(docs, empty_docs).collect()
    ) == [1, 2]

    empty_vecs = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert quantize_int8(empty_vecs).count() == 0
    some_vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<float>"
    )
    assert knn_join_exact(empty_vecs, some_vecs).count() == 0
    assert knn_join_exact(some_vecs, empty_vecs).count() == 0


def test_spread_wave_functions_on_empty_inputs(spark):
    """The r5 spread_compute wave must not break empty-input degradation:
    every touched function degrades to an empty result (pagerank's n==0
    early-exit included) instead of erroring on the empty exchange."""
    from apache_arrow_spark.functions.dedup import shingle_containment_pairs
    from apache_arrow_spark.functions.graph import pagerank
    from apache_arrow_spark.functions.text import bpe_train_merges, log_templates

    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert shingle_containment_pairs(empty_docs, k=9).count() == 0
    assert bpe_train_merges(empty_docs) == []
    empty_lines = spark.createDataFrame([], "line string")
    assert log_templates(empty_lines, "line").count() == 0
    empty_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert pagerank(empty_pairs).count() == 0
