"""Tests for functions.filters — corpus filtering (repetition, boilerplate,
decontamination, PII) against brute-force Python recomputations."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.functions.filters import (
    decontaminate,
    line_stats,
    paragraph_dedup_flags,
    pii_counts,
    redact_pii,
    token_chunks,
    top_ngram_char_fraction,
    word_ngrams,
)


def test_line_stats_counts_duplicates(spark):
    text = "alpha beta\ngamma\nalpha beta\n\n  \ndelta"
    df = spark.createDataFrame([(text,)], "t string")
    stats = line_stats(F.col("t"))
    row = df.select(*[c.alias(k) for k, c in stats.items()]).collect()[0]
    # 4 non-empty lines, one duplicated ("alpha beta" x2)
    assert row["n_lines"] == 4
    assert row["dup_line_fraction"] == 0.25
    # duplicated chars = 10 of (10+5+10+5)=30
    assert row["dup_line_char_fraction"] == round(10 / 30, 6)


def test_line_stats_no_dups_is_zero(spark):
    df = spark.createDataFrame([("a\nb\nc",)], "t string")
    stats = line_stats(F.col("t"))
    row = df.select(*[c.alias(k) for k, c in stats.items()]).collect()[0]
    assert row["dup_line_fraction"] == 0.0
    assert row["dup_line_char_fraction"] == 0.0


def test_token_chunks_shapes(spark):
    df = spark.createDataFrame(
        [("a b c d e f g h i j k l",), ("x",), ("",)], "t string"
    )
    rows = df.select(token_chunks(F.col("t"), 5).alias("c")).collect()
    assert rows[0]["c"] == ["a b c d e", "f g h i j", "k l"]
    assert rows[1]["c"] == ["x"]
    assert rows[2]["c"] == []


def test_word_ngrams(spark):
    df = spark.createDataFrame([("the cat sat down",), ("one",)], "t string")
    rows = df.select(word_ngrams(F.col("t"), 2).alias("g")).collect()
    assert rows[0]["g"] == ["the cat", "cat sat", "sat down"]
    assert rows[1]["g"] == []


def test_top_ngram_char_fraction_bruteforce(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["buy now buy now buy now", "all words here differ fully"],
        }
    )
    out = (
        top_ngram_char_fraction(spark.createDataFrame(pdf), n=2)
        .orderBy("doc_id")
        .collect()
    )
    # doc 1: "buy now" occurs 3x (non-overlapping count of the 2-gram
    # stream: [buy now, now buy, buy now, now buy, buy now] -> 3)
    assert out[0]["top_gram_count"] == 3
    assert out[0]["ngram_char_fraction"] == round(3 * 7 / 23, 6)
    assert out[1]["top_gram_count"] == 1


def test_paragraph_dedup_flags(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["shared line\nunique one", "shared line\nother text", "alone here"],
        }
    )
    out = {
        r["doc_id"]: (r["n_paragraphs"], r["n_shared_paragraphs"])
        for r in paragraph_dedup_flags(spark.createDataFrame(pdf)).collect()
    }
    assert out == {1: (2, 1), 2: (2, 1), 3: (1, 0)}


def test_paragraph_dedup_counts_repeats_once_per_doc(spark):
    # a line repeated WITHIN one doc only is not "shared"
    pdf = pd.DataFrame({"doc_id": [1], "text": ["dup\ndup\nx"]})
    out = paragraph_dedup_flags(spark.createDataFrame(pdf)).collect()[0]
    assert (out["n_paragraphs"], out["n_shared_paragraphs"]) == (2, 0)


def test_decontaminate_flag_and_drop(spark):
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "one two three four five six",  # contains bench 5-gram
                    "totally clean document text here now",
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"text": ["zzz one two three four five zzz"]})
    )
    flagged = decontaminate(corpus, bench, n=5).collect()
    assert [r["doc_id"] for r in flagged] == [1]
    kept = decontaminate(corpus, bench, n=5, mode="drop").select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [2]
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, mode="nope")


def test_redact_pii_and_counts(spark):
    text = (
        "mail me at jane.doe+x@corp.example.org or call +1 (555) 010-1234, "
        "server at 192.168.0.1 ok"
    )
    df = spark.createDataFrame([(text,)], "t string")
    counts = pii_counts(F.col("t"))
    row = df.select(
        redact_pii(F.col("t")).alias("r"),
        counts["email"].alias("e"),
        counts["ipv4"].alias("i"),
        counts["phone"].alias("p"),
    ).collect()[0]
    assert "<EMAIL>" in row["r"] and "<IP>" in row["r"] and "<PHONE>" in row["r"]
    assert "jane.doe" not in row["r"] and "192.168" not in row["r"]
    assert (row["e"], row["i"], row["p"]) == (1, 1, 1)


def test_luhn_valid_known_numbers(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.filters import luhn_valid

    cases = [
        ("4532015112830366", True),   # canonical Visa test number
        ("4532015112830367", False),  # off-by-one check digit
        ("79927398713", True),        # the classic Luhn example
        ("79927398710", False),
        ("0000000000000000", True),
    ]
    df = spark.createDataFrame(cases, "s string, want boolean")
    rows = df.select("s", "want", luhn_valid(F.col("s")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], r["s"]
