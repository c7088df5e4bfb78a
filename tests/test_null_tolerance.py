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
