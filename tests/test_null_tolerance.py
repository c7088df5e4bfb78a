"""Null/empty-input tolerance across the operator stack.

Real corpora carry null and empty fields; every operator must either
process or cleanly drop such rows — never throw.  (Semantics: explode of a
null/empty array drops the row, so null-text documents vanish from
token-derived results; nullable aggregates skip nulls.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def dirty_docs(spark):
    rows = [
        (1, "normal document text here", "en", "src0", 25),
        (2, None, "en", "src0", 0),
        (3, "", "de", "src1", 0),
        (4, "   ", None, "src1", 3),
        (5, "x", "en", None, 1),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_exact_dedup_tolerates_nulls(spark, dirty_docs):
    from apache_arrow_spark.functions.dedup import exact_dedup

    out = exact_dedup(dirty_docs, "text", "doc_id")
    assert out.count() >= 1  # no throw; null/empty fingerprints group together


def test_minhash_drops_short_and_null(spark, dirty_docs):
    from apache_arrow_spark.functions.dedup import minhash_signatures

    sig = minhash_signatures(dirty_docs)
    ids = {r.id for r in sig.select("id").collect()}
    assert 2 not in ids and 3 not in ids  # null/empty -> no signature row
    assert 1 in ids


def test_text_metrics_tolerate_nulls(spark, dirty_docs):
    from apache_arrow_spark.functions.text import token_count, winnow_fingerprints, gram_hashes, normalize_text

    out = dirty_docs.select(
        token_count(F.col("text")).alias("tc"),
        winnow_fingerprints(gram_hashes(normalize_text(F.col("text")), 5), 4).alias("fp"),
    ).collect()
    assert len(out) == 5  # pure expressions keep all rows (nulls propagate)


def test_quota_and_budget_tolerate_null_groups(spark, dirty_docs):
    from apache_arrow_spark.functions.pipeline import quota_sample, token_budget_cap

    q = quota_sample(dirty_docs, "source", 2, "doc_id")
    assert q.count() >= 3  # null source forms its own group, no throw
    b = token_budget_cap(
        dirty_docs.withColumn("ntok", F.coalesce(F.col("n_chars"), F.lit(0))),
        "source",
        "ntok",
        10,
        "doc_id",
    )
    assert b.count() >= 1


def test_sessionize_tolerates_null_entity(spark):
    from apache_arrow_spark.operators.sessionize import session_summary

    rows = [(1, 0, 1), (None, 5, 2), (None, 10, 3)]
    df = spark.createDataFrame(rows, "u bigint, t bigint, eid bigint")
    out = session_summary(df, "u", "t", 50, ["eid"])
    assert out.count() == 2  # null entity sessions together, no throw


def test_profile_counts_nulls_correctly(spark, dirty_docs):
    from apache_arrow_spark.functions.profiling import profile

    out = {r.column: r for r in profile(dirty_docs, ["text", "lang", "source"]).collect()}
    assert out["text"].n_null == 1
    assert out["lang"].n_null == 1
    assert out["source"].n_null == 1


def test_weighted_sample_null_weight_rows_drop(spark):
    from apache_arrow_spark.functions.pipeline import weighted_sample

    rows = [(1, 10), (2, None), (3, 20)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    got = [r.k for r in weighted_sample(df, "w", 3, "k").collect()]
    # null/non-positive weights are dropped by contract (a null sort key
    # would order FIRST ascending and poison the sample)
    assert set(got) == {1, 3}


def test_robust_outlier_stats_flags_planted_outliers(spark):
    from apache_arrow_spark.functions.validation import robust_outlier_stats

    rows = [("g", float(v)) for v in range(1, 100)] + [("g", 1e9), ("g", -1e9)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = robust_outlier_stats(df, "x", "grp", k=3.0).collect()[0]
    assert out["n"] == 101
    assert out["n_outliers"] == 2  # the two planted extremes, nothing else
    assert out["median"] == 50.0


def test_salted_join_null_keys_match_plain_join(spark):
    from apache_arrow_spark.functions.skew import salted_join

    fact = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
    )
    dim = spark.createDataFrame([(1, "x"), (None, "y")], "dk long, tag string")
    plain = fact.join(dim, fact.k == dim.dk, "left").select("v", "tag")
    salted = salted_join(fact, dim, "k", "dk", n_salts=4, how="left").select(
        "v", "tag"
    )
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_dedup_keep_best_no_pairs_keeps_everything(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.dedup import dedup_keep_best

    docs = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n_chars long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    kept = dedup_keep_best(
        docs, pairs, order_by=[F.col("n_chars").desc(), F.col("doc_id")]
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]


def test_rolling_zscore_empty_input(spark):
    from apache_arrow_spark.functions.timeseries import rolling_zscore

    df = spark.createDataFrame([], "k long, t long, v double")
    assert rolling_zscore(df, "v", "k", ["t"]).count() == 0


def test_table_checksum_empty_and_null_groups(spark):
    from apache_arrow_spark.functions.profiling import table_checksum

    empty = spark.createDataFrame([], "a string, g string")
    assert table_checksum(empty, ["a"], group_by="g").count() == 0
    withnull = spark.createDataFrame(
        [("x", None), ("y", "s")], "a string, g string"
    )
    rows = {r["group_key"]: r for r in table_checksum(withnull, ["a"], group_by="g").collect()}
    # null group key renders as a real group (cast to string -> NULL row kept)
    assert len(rows) == 2 and all(r["n_rows"] == 1 for r in rows.values())


def test_rrf_fuse_empty_leg(spark):
    from apache_arrow_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 1)], "doc_id long, rnk int")
    empty = spark.createDataFrame([], "doc_id long, rnk int")
    rows = rrf_fuse([lex, empty], k=5).collect()
    assert len(rows) == 1 and rows[0]["n_legs"] == 1


def test_bigram_nll_degenerate_docs(spark):
    from apache_arrow_spark.functions.lm import bigram_nll

    docs = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, None), (4, "two words")],
        "doc_id long, text string",
    )
    rows = bigram_nll(docs).collect()
    # only doc 4 has bigram support
    assert [r["doc_id"] for r in rows] == [4]


def test_more_like_this_missing_query_doc(spark):
    from apache_arrow_spark.functions.retrieval import more_like_this

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    # query id 99 has no cells: empty result, no error
    assert more_like_this(docs, query_id=99, k=5).count() == 0


def test_frame_sample_empty_video(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.multimodal import encode_mvid, frame_sample

    blob = encode_mvid([])
    df = spark.createDataFrame([(1, blob)], "doc_id long, payload binary")
    assert frame_sample(df, every_n=2).count() == 0


def test_snapshot_partition_diff_empty_sides(spark):
    from apache_arrow_spark.functions.profiling import snapshot_partition_diff

    v = spark.createDataFrame([("p", 1)], "pk string, id long")
    empty = spark.createDataFrame([], "pk string, id long")
    gone = snapshot_partition_diff(v, empty, ["id"], "pk").collect()
    assert gone[0]["status"] == "removed"
    new = snapshot_partition_diff(empty, v, ["id"], "pk").collect()
    assert new[0]["status"] == "added"


def test_kmeans_train_exact_fewer_points_than_k(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.similarity import kmeans_train_exact

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    rows = kmeans_train_exact(df, k=4, rounds=1).collect()
    assert len(rows) == 2  # every point assigned; extra seeds just unused


def test_hashed_linear_score_all_null_text(spark):
    from apache_arrow_spark.functions.importance import (
        demo_linear_weights,
        hashed_linear_score,
    )

    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    rows = hashed_linear_score(docs, demo_linear_weights(spark, 8), n_buckets=8).collect()
    assert rows[0]["n_tokens"] == 0 and rows[0]["keep"] is False


def test_table_checksum_null_position_sensitive(spark):
    # concat_ws alone SKIPS null args: ('a', NULL, 'b') and ('a', 'b',
    # NULL) would collide without the null sentinel (ADVICE r3)
    from apache_arrow_spark.functions.profiling import table_checksum

    d1 = spark.createDataFrame([("a", None, "b")], "x string, y string, z string")
    d2 = spark.createDataFrame([("a", "b", None)], "x string, y string, z string")
    r1 = table_checksum(d1, ["x", "y", "z"]).first()
    r2 = table_checksum(d2, ["x", "y", "z"]).first()
    assert r1["xor_fold"] != r2["xor_fold"]


def test_store_hash_null_position_sensitive(tmp_path, spark):
    # xxhash64 leaves its seed chain unchanged on NULL args — the store
    # digest must still distinguish WHICH column is null (ADVICE r3)
    from apache_arrow_spark.store import ObjectStore

    store = ObjectStore(spark)
    d1 = spark.createDataFrame([("a", None, "b")], "x string, y string, z string")
    d2 = spark.createDataFrame([("a", "b", None)], "x string, y string, z string")
    store.put("h1", d1)
    store.put("h2", d2)
    assert store.hash("h1") != store.hash("h2")
