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


def test_bigram_nll_matches_brute_force(spark):
    import math

    from apache_arrow_spark.functions.lm import bigram_nll

    docs = [(1, "a b a b c"), (2, "b c b"), (3, "a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bigram_nll(df, lambda_milli=700).collect()}
    assert 3 not in rows  # single-token doc has no bigram support

    # brute force
    pairs = {}
    per_doc = {}
    for i, t in docs:
        ws = t.split()
        per_doc[i] = list(zip(ws, ws[1:]))
        for p in per_doc[i]:
            pairs[p] = pairs.get(p, 0) + 1
    c1, c2 = {}, {}
    for (w1, w2), c in pairs.items():
        c1[w1] = c1.get(w1, 0) + c
        c2[w2] = c2.get(w2, 0) + c
    n = sum(pairs.values())
    v = len({w2 for _, w2 in pairs})
    lam, lam2 = 0.7, 1.0 - 0.7
    lpq = {
        (w1, w2): math.floor(
            math.log(
                lam * (c + 1.0) / (c1[w1] + v) + lam2 * (c2[w2] + 1.0) / (n + v)
            )
            * 1e7
        )
        for (w1, w2), c in pairs.items()
    }
    for i in (1, 2):
        expect_q = -sum(lpq[p] for p in per_doc[i])
        assert rows[i]["nll_q"] == expect_q, i
        assert rows[i]["n_bigrams"] == len(per_doc[i])


def test_token_entropy_degenerate_and_uniform(spark):
    import math

    from apache_arrow_spark.functions.lm import token_entropy

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[1]["entropy_q"] == 0  # single repeated token: zero entropy
    # uniform over 4 tokens: ln 4 nats (within quantization)
    assert abs(out[2]["entropy"] - math.log(4)) < 1e-5
    assert out[2]["n_tokens"] == 4


def test_naive_bayes_confusion_empty_train_raises(spark):
    """train_frac=0 leaves the rollup with zero rows; the failure must be
    an explicit ValueError, not a bare StopIteration (r10 ADVICE)."""
    import pytest

    from apache_arrow_spark.functions.lm import naive_bayes_confusion

    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e f", "y")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="training split is empty"):
        naive_bayes_confusion(df, train_frac=0.0)
