"""Unigram-LM quality scoring: brute-force parity, ordering sanity,
empty-document handling."""

import math
from collections import Counter

import pyspark.sql.functions as F

from apache_arrow_spark.functions.lm import unigram_nll


def _brute_force(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    """doc_id -> (n_tokens, nll_q) by direct computation."""
    toks = {i: t.strip().split() if t.strip() else [] for i, t in texts.items()}
    corpus = Counter()
    for ts in toks.values():
        corpus.update(ts)
    n = sum(corpus.values())
    v = len(corpus)
    lpq = {
        term: math.floor(math.log((c + 1.0) / (n + v)) * 10_000_000.0)
        for term, c in corpus.items()
    }
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        out[i] = (len(ts), -sum(lpq[t] for t in ts))
    return out


def test_matches_brute_force(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the the the the repeated token stream",
        3: "zx9 qq7 unseen gibberish tokens here",
        4: "the quick brown fox again",
        5: "   ",  # empty after trim: dropped
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_q"], r["nll"])
        for r in unigram_nll(df).collect()
    }
    want = _brute_force(texts)
    assert set(got) == set(want)
    for i, (n_tok, nll_q) in want.items():
        assert got[i][0] == n_tok
        assert got[i][1] == nll_q
        assert abs(got[i][2] - nll_q / (1e7 * n_tok)) < 1e-12


def test_gibberish_scores_higher_than_common(spark):
    rows = [(i, "common words common words common") for i in range(20)]
    rows.append((99, "zzz yyy xxx www vvv"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = {r["doc_id"]: r["nll"] for r in unigram_nll(df).collect()}
    assert res[99] > res[0]


def test_runs_on_testdata(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = unigram_nll(d, "text", "doc_id")
    rows = out.collect()
    nonempty = d.filter(F.length(F.btrim("text")) > 0).count()
    assert len(rows) == nonempty
    assert all(r["nll"] > 0 for r in rows)


def test_naive_bayes_confusion_partitions_test_set(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.lm import naive_bayes_confusion
    from apache_arrow_spark.functions.pipeline import HASH_MOD, hash_bucket

    docs = spark.createDataFrame(
        [(i, "aa bb cc" if i % 2 else "xx yy zz", "L" + str(i % 2)) for i in range(40)],
        "doc_id long, text string, lang string",
    )
    cm = naive_bayes_confusion(docs, "text", "lang", "doc_id", split_salt="t", train_frac=0.5)
    rows = cm.collect()
    # every held-out doc appears exactly once in the matrix
    n_test = docs.filter(
        hash_bucket(F.col("doc_id"), "t") >= int(0.5 * HASH_MOD)
    ).count()
    assert sum(r["n"] for r in rows) == n_test
    # perfectly separable vocab: diagonal only
    assert all(r["actual"] == r["predicted"] for r in rows)
