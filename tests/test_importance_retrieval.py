"""DSIR importance weighting + BM25 retrieval: brute-force verification."""

import math

import pyspark.sql.functions as F

from apache_arrow_spark.functions.importance import (
    importance_weights,
    unigrams_and_bigrams,
)
from apache_arrow_spark.functions.retrieval import bm25_topk

DOCS = [
    (0, "spark joins data fast", "target"),
    (1, "spark joins spark joins", "target"),
    (2, "cats purr softly", "web"),
    (3, "dogs bark loudly at cats", "web"),
    (4, "spark data pipelines scale", "web"),
    (5, "x", "web"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], "text string")
    rows = df.select(unigrams_and_bigrams(F.col("text")).alias("g")).collect()
    assert rows[0]["g"] == ["a", "b", "c", "a b", "b c"]
    assert rows[1]["g"] == ["solo"]
    assert rows[2]["g"] == []


def _brute_weights(num_buckets=16):
    """Replicate importance_weights with pure Python (md5-prefix hash)."""
    import hashlib

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % num_buckets

    stream = []  # (doc_id, is_target, bucket)
    for doc_id, text, source in DOCS:
        toks = text.split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            stream.append((doc_id, source == "target", h(g)))
    cr, ct = {}, {}
    for _d, is_t, b in stream:
        cr[b] = cr.get(b, 0) + 1
        if is_t:
            ct[b] = ct.get(b, 0) + 1
    nr = len(stream)
    nt = sum(1 for _d, is_t, _b in stream if is_t)
    ratio = {
        b: math.floor(
            math.log(
                ((ct.get(b, 0) + 1.0) * (nr + num_buckets))
                / ((cr[b] + 1.0) * (nt + num_buckets))
            )
            * 1e7
        )
        for b in cr
    }
    out = {}
    for doc_id, _is_t, b in stream:
        n, w = out.get(doc_id, (0, 0))
        out[doc_id] = (n + 1, w + ratio[b])
    return {d: (n, w / 1e7) for d, (n, w) in out.items()}


def test_importance_weights_match_brute_force(spark):
    got = {
        r["doc_id"]: (r["n_ngrams"], r["weight"])
        for r in importance_weights(
            _df(spark), target=F.col("source") == "target", num_buckets=16
        ).collect()
    }
    want = _brute_weights(16)
    assert set(got) == set(want)
    for doc_id, (n, w) in want.items():
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - w) < 1e-6, (doc_id, got[doc_id], w)


def test_importance_weights_direction(spark):
    """Target-slice docs score above off-topic docs."""
    res = {
        r["doc_id"]: r["weight"]
        for r in importance_weights(
            _df(spark), target=F.col("source") == "target"
        ).collect()
    }
    # doc 4 shares 'spark'/'data' with the target slice; docs 2/3 share nothing
    assert res[0] > res[3] and res[1] > res[2]


def _brute_bm25(terms, k1=1.2, b=0.75):
    lens = {d: len(t.split()) for d, t, _s in DOCS}
    n_docs = len(DOCS)
    avgdl = sum(lens.values()) / n_docs
    tf = {}
    for d, t, _s in DOCS:
        for w in t.split():
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    dfreq = {}
    for (_d, w), _c in tf.items():
        dfreq[w] = dfreq.get(w, 0) + 1
    scores = {}
    for (d, w), c in tf.items():
        idf = math.log(1.0 + (n_docs - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
        sat = (c * (k1 + 1.0)) / (c + k1 * (1.0 - b + b * lens[d] / avgdl))
        scores[d] = scores.get(d, 0) + math.floor(idf * sat * 1e6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, d, s / 1e6) for i, (d, s) in enumerate(ranked)]


def test_bm25_matches_brute_force(spark):
    got = [
        (r["rnk"], r["doc_id"], r["score"])
        for r in bm25_topk(_df(spark), ["spark", "cats"], k=10)
        .orderBy("rnk")
        .collect()
    ]
    want = _brute_bm25({"spark", "cats"})
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_r1, _d1, s1), (_r2, _d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-6


def test_bm25_no_match_terms(spark):
    assert bm25_topk(_df(spark), ["zzz"], k=5).count() == 0


def test_bm25_repeated_term_saturates(spark):
    """Doc 1 has tf=2 for 'spark' -> scores above tf=1 docs, but less than
    2x (saturation)."""
    res = {r["doc_id"]: r["score"] for r in bm25_topk(_df(spark), ["spark"], k=10).collect()}
    assert res[1] > res[0] and res[1] < 2 * res[4]


def test_importance_weights_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert importance_weights(empty, target=F.col("source") == "t").count() == 0
    assert bm25_topk(empty, ["a"], k=3).count() == 0


def test_phrase_match_positions(spark):
    from apache_arrow_spark.functions.retrieval import phrase_match

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta alpha beta gamma"),
            (3, "gamma gamma gamma"),
            (4, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["n_matches"] for r in phrase_match(df, ["alpha", "beta"]).collect()}
    assert got == {1: 2, 2: 1, 4: 1}
    # three-term chain
    got3 = {r["id"]: r["n_matches"] for r in phrase_match(df, ["alpha", "beta", "gamma"]).collect()}
    assert got3 == {1: 1, 2: 1}


def test_rrf_fuse_exact_contributions(spark):
    from apache_arrow_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rnk int"
    )
    den = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rnk int"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([lex, den], k=10, rrf_k=60).collect()}
    # doc 20: rank 2 lexical + rank 1 dense
    assert rows[20]["rrf_micro"] == 1_000_000_000 // 62 + 1_000_000_000 // 61
    assert rows[20]["n_legs"] == 2
    # single-leg items contribute once
    assert rows[10]["rrf_micro"] == 1_000_000_000 // 61 and rows[10]["n_legs"] == 1
    assert rows[40]["rrf_micro"] == 1_000_000_000 // 62
    # fused order: 20 first (two legs), then 10 (rank1 single), 40, 30
    order = [r["doc_id"] for r in sorted(rows.values(), key=lambda r: r["rnk"])]
    assert order == [20, 10, 40, 30]


def test_hashed_linear_score_brute_force(spark):
    import hashlib

    from apache_arrow_spark.functions.importance import (
        demo_linear_weights,
        hashed_linear_score,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id long, text string",
    )
    w = demo_linear_weights(spark, 64)
    rows = {
        r["doc_id"]: r
        for r in hashed_linear_score(docs, w, n_buckets=64).collect()
    }

    def bucket(term):
        return int(hashlib.md5(("qlin" + term).encode()).hexdigest()[:15], 16) % 64

    def weight(b):
        return (b * 2654435761) % 2000001 - 1000000

    s1 = 2 * weight(bucket("alpha")) + weight(bucket("beta"))
    assert rows[1]["n_tokens"] == 3 and rows[1]["score_micro"] == s1
    assert rows[1]["keep"] == (s1 > 0)
    # empty doc appears with zero score, dropped
    assert rows[2]["n_tokens"] == 0 and rows[2]["score_micro"] == 0
    assert rows[2]["keep"] is False
