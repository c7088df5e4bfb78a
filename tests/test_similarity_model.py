"""Brute-force model check for the exact set-similarity joins.

The PPJoin-style prefix/probe bounds in ``ngram_jaccard_pairs`` and
``shingle_containment_pairs`` claim EXACTNESS: blocking may admit a
candidate flood but must never drop a true above-threshold pair.  The
fixed sf fixtures exercise only the pair population they happen to
contain, so this test sweeps a constructed corpus whose pair scores walk
THROUGH the threshold (progressively corrupted copies of a base doc) and
compares the full Spark output — pairs AND scores — against an
all-pairs pure-python model of the same normalize/gram/threshold
semantics.  An off-by-one in the prefix length, probe length, or
required-hit bound shows up here as a dropped boundary pair.
"""

import random
import re

from apache_arrow_spark.functions.dedup import (
    ngram_jaccard_pairs,
    shingle_containment_pairs,
)

_WORDS = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}x" for i in range(200)]


def _corpus() -> list[tuple[int, str]]:
    rng = random.Random(41)
    base_words = [_WORDS[i] for i in range(60)]
    docs = [(0, " ".join(base_words))]
    # progressively corrupted copies: replacing 3*i tail words walks the
    # pair scores from ~1.0 down through both thresholds
    for i in range(1, 13):
        words = list(base_words)
        for j in range(3 * i):
            words[-(j + 1)] = _WORDS[100 + (13 * i + j) % 100]
        docs.append((i, " ".join(words)))
    # unrelated fillers + whitespace/short edge cases
    for i in range(13, 19):
        docs.append((i, " ".join(rng.choice(_WORDS[60:100]) for _ in range(40))))
    docs.append((19, "hi"))  # normalized length < k=5: no shingle cells
    docs.append((20, "   "))  # whitespace-only: no tokens, no cells
    # WHITESPACE variants of the base doc: normalization must collapse
    # them onto doc 0's gram sets exactly (score 1.0 pairs)
    docs.append((21, "  " + "  ".join(w.upper() for w in base_words) + "\t"))
    return docs


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower()).strip()


def _char_shingles(t: str, k: int = 5) -> set:
    t = _norm(t)
    return {t[i : i + k] for i in range(len(t) - k + 1)} if len(t) >= k else set()


def _word_bigrams(t: str) -> set:
    w = _norm(t).split(" ") if _norm(t) else []
    return {f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)}


def test_jaccard_pairs_match_all_pairs_model(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, jaccard_threshold=0.4).collect()
    }
    grams = {i: _word_bigrams(t) for i, t in docs}
    expected = {}
    for ia, _ in docs:
        for ib, _ in docs:
            if ia >= ib or not grams[ia] or not grams[ib]:
                continue
            inter = len(grams[ia] & grams[ib])
            jac = inter / len(grams[ia] | grams[ib])
            if round(jac, 6) >= 0.4:
                expected[(ia, ib)] = jac
    assert set(got) == set(expected), (
        f"missing={sorted(set(expected) - set(got))} "
        f"extra={sorted(set(got) - set(expected))}"
    )
    for pair, jac in expected.items():
        assert abs(got[pair] - jac) < 2e-6, (pair, got[pair], jac)
    # the sweep actually crossed the threshold (boundary was exercised)
    assert any(j < 0.55 for j in expected.values()) and len(expected) >= 6


def test_containment_pairs_match_all_pairs_model(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in shingle_containment_pairs(df, containment_threshold=0.8).collect()
    }
    sh = {i: _char_shingles(t) for i, t in docs}
    expected = {}
    for ia, _ in docs:
        for ib, _ in docs:
            if ia == ib or not sh[ia] or not sh[ib]:
                continue
            if len(sh[ia]) > len(sh[ib]):
                continue
            cont = len(sh[ia] & sh[ib]) / len(sh[ia])
            if round(cont, 6) >= 0.8:
                expected[(ia, ib)] = cont
    assert set(got) == set(expected), (
        f"missing={sorted(set(expected) - set(got))} "
        f"extra={sorted(set(got) - set(expected))}"
    )
    for pair, cont in expected.items():
        assert abs(got[pair] - cont) < 2e-6, (pair, got[pair], cont)
    assert any(c < 0.95 for c in expected.values()) and len(expected) >= 6


def test_simhash_pairs_equal_bruteforce_hamming(spark):
    """simhash_near_duplicates documents that the pigeonhole block join is
    EXACT — output equals a brute-force all-pairs Hamming scan.  Verify
    literally: collect the Spark-computed 64-bit keys for the sweep
    corpus, brute-force every pair in python, and compare at two bars the
    corpus makes interesting (measured key distribution: one pair at
    exactly h=3 — the default bar — then pairs at h=8 vs h=9, an
    at-the-bar/just-above split for the 16-block configuration)."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.dedup import simhash, simhash_near_duplicates

    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    keys = {
        r.id: r.simhash
        for r in simhash(df).select(F.col("doc_id").alias("id"), "simhash").collect()
    }
    ids = sorted(keys)
    dist = {
        (a, b): bin((keys[a] ^ keys[b]) & ((1 << 64) - 1)).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    for max_h, blocks in ((3, 4), (8, 16)):
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_near_duplicates(
                df, max_hamming=max_h, blocks=blocks
            ).collect()
        }
        expected = {p: h for p, h in dist.items() if h <= max_h}
        assert got == expected, (
            f"max_hamming={max_h}: missing={set(expected) - set(got)} "
            f"extra={set(got) - set(expected)}"
        )
        assert expected, "corpus produced no pair under the bar — dead test"
    # the boundary was genuinely exercised: a pair AT each bar and a
    # near-miss just outside the second
    assert 3 in dist.values() and 8 in dist.values() and 9 in dist.values()
