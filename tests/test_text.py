"""Text-analysis operators: token/quality/lang/fingerprint/shingles."""

import pyspark.sql.functions as F

from apache_arrow_spark.functions import text as X


def _col(spark, value, expr):
    df = spark.createDataFrame([(value,)], "text string")
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_token_count(spark):
    assert _col(spark, "a b  c", X.token_count(F.col("text"))) == 3
    assert _col(spark, "   ", X.token_count(F.col("text"))) == 0
    assert _col(spark, "", X.token_count(F.col("text"))) == 0


def test_punct_ratio(spark):
    assert _col(spark, "a,b.c", X.punct_count(F.col("text"))) == 2
    assert _col(spark, "abcd", X.punct_ratio(F.col("text"))) == 0.0


def test_stopword_ratio(spark):
    v = _col(spark, "the cat and the dog", X.stopword_ratio(F.col("text")))
    assert abs(v - 3 / 5) < 1e-9


def test_mean_word_length(spark):
    assert _col(spark, "ab abcd", X.mean_word_length(F.col("text"))) == 3.0


def test_lang_id(spark):
    assert _col(spark, "the cat and the dog is here", X.lang_id(F.col("text"))) == "en"
    assert _col(spark, "der hund und die katze", X.lang_id(F.col("text"))) == "de"
    assert _col(spark, "le chat et la maison", X.lang_id(F.col("text"))) == "fr"
    assert _col(spark, "el perro y los gatos", X.lang_id(F.col("text"))) == "es"
    assert _col(spark, "你好 世界", X.lang_id(F.col("text"))) == "zh"
    assert _col(spark, "zzz qqq", X.lang_id(F.col("text"))) == "und"


def test_fingerprint_normalization(spark):
    a = _col(spark, "  Hello   World ", X.fingerprint(F.col("text")))
    b = _col(spark, "hello world", X.fingerprint(F.col("text")))
    assert a == b and len(a) == 32


def test_shingles(spark):
    got = _col(spark, "abcdef", X.shingles(F.col("text"), 3))
    assert got == ["abc", "bcd", "cde", "def"]
    assert _col(spark, "ab", X.shingles(F.col("text"), 3)) == []
    # distinct
    got = _col(spark, "aaaa", X.shingles(F.col("text"), 2))
    assert got == ["aa"]


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(X.quality_score(F.col("text")).alias("q")).agg(
        F.min("q"), F.max("q")
    ).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_winnow_shared_substring_shares_fingerprint(spark):
    """Winnowing guarantee: docs sharing a substring of length >= w+k-1
    share at least one fingerprint."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.text import gram_hashes, normalize_text, winnow_fingerprints

    shared = "the identical plagiarized passage appears verbatim here"
    rows = [
        (1, "intro text AAA " + shared + " tail one"),
        (2, "unrelated lead BBB " + shared + " other ending"),
        (3, "completely different content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    hs = df.select("doc_id", gram_hashes(normalize_text(F.col("text")), 5).alias("hs"))
    out = {r.doc_id: set(r.fps) for r in hs.select(
        "doc_id", winnow_fingerprints(F.col("hs"), 4).alias("fps")).collect()}
    assert out[1] & out[2]  # shared passage -> shared fingerprint
    assert not (out[1] & out[3]) or len(out[1] & out[3]) < len(out[1] & out[2])


def test_winnow_short_doc_single_fingerprint(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.text import gram_hashes, normalize_text, winnow_fingerprints

    df = spark.createDataFrame([(1, "abcdef")], "doc_id bigint, text string")  # 2 grams < w
    hs = df.select(gram_hashes(normalize_text(F.col("text")), 5).alias("hs"))
    fps = hs.select(winnow_fingerprints(F.col("hs"), 4).alias("f")).first().f
    assert len(fps) == 1


def test_bpe_apply_merges_matches_reference_bpe(spark):
    """The replace-chain must implement REAL BPE: apply each merge over
    the symbol sequence left-to-right, non-overlapping, in merge order."""
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.text import BPE_DEMO_MERGES, bpe_token_count

    def ref_bpe_count(text):
        import re

        t = re.sub(r"\s+", " ", text.lower()).strip()
        t = re.sub(r"[^a-z0-9 ]", "", t)
        tokens = 0
        for word in t.split():
            syms = list(word)
            for x, y in BPE_DEMO_MERGES:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            tokens += len(syms)
        return tokens

    docs = [
        (1, "the thermometer shattered then"),
        (2, "inner winter thinking rethinking"),
        (3, "a an at en er on or re th the"),
        (4, "aaa ananan ththth thethethe"),
        (5, "Mixed CASE with   odd   spacing"),
        (6, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    for i, text in docs:
        assert got[i] == ref_bpe_count(text), (i, text, got[i], ref_bpe_count(text))


def test_bpe_train_merges_matches_reference_trainer(spark):
    from collections import Counter

    from apache_arrow_spark.functions.text import bpe_train_merges

    docs = [
        (1, "the thin thing then"),
        (2, "another anthem ant an"),
        (3, "er er er era errr"),
    ]

    def ref_train(texts, n):
        import re

        words = []
        for t in texts:
            t = re.sub(r"\s+", " ", t.lower()).strip()
            t = re.sub(r"[^a-z0-9 ]", "", t)
            words += [list(w) for w in t.split()]
        merges = []
        for _ in range(n):
            cnt = Counter()
            for w in words:
                for a, b in zip(w, w[1:]):
                    cnt[(a, b)] += 1
            if not cnt:
                break
            (x, y), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((x, y, c))
            new_words = []
            for w in words:
                out, i = [], 0
                while i < len(w):
                    if i + 1 < len(w) and w[i] == x and w[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(w[i])
                        i += 1
                new_words.append(out)
            words = new_words
        return merges

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bpe_train_merges(df, "text", n_merges=4)
    assert got == ref_train([t for _, t in docs], 4)


def test_zipf_profile_counts_and_slope_sign(spark):
    from apache_arrow_spark.functions.text import zipf_profile

    # zipf-ish: 'a' x8, 'b' x4, 'c' x2, 'd' x1 -> slope strongly negative
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(text, "s1")], "text string, source string")
    r = zipf_profile(df).collect()[0]
    assert r["n_types"] == 4 and r["n_tokens"] == 15 and r["n_hapax"] == 1
    assert r["ttr_micro"] == int(4 / 15 * 1e6)
    assert r["slope_micro"] < -900_000  # ~ -1 slope for halving counts


def test_k_anonymity_audit_thresholds(spark):
    from apache_arrow_spark.functions.validation import k_anonymity_audit

    rows = [("g1", "s1")] * 3 + [("g2", "s2")] * 1 + [("g3", "s1"), ("g3", "s2")]
    df = spark.createDataFrame(rows, "qi string, sens string")
    out = {r["k_threshold"]: r for r in
           k_anonymity_audit(df, ["qi"], (2, 5), sensitive_col="sens").collect()}
    # k=2: only the singleton g2 violates; k=5: all three groups do
    assert out[2]["n_violating_groups"] == 1
    assert out[2]["n_violating_records"] == 1
    assert out[5]["n_violating_groups"] == 3
    assert out[5]["n_violating_records"] == 6
    assert out[2]["min_group_size"] == 1
    assert out[2]["min_l_diversity"] == 1  # g1 has a single sensitive value


def test_psi_drift_identical_and_shifted(spark):
    import pyspark.sql.functions as F

    from apache_arrow_spark.functions.validation import psi_drift

    # identical halves -> tiny PSI; shifted current -> large PSI
    same = spark.createDataFrame(
        [(float(v), s) for v in range(10) for _ in range(20) for s in (True, False)],
        "v double, ref boolean",
    )
    tot = psi_drift(same, "v", F.col("ref"), 0.0, 10.0, n_bins=5).filter("bin = -1").first()
    assert abs(tot["psi"]) < 0.01
    shifted = spark.createDataFrame(
        [(1.0, True)] * 50 + [(9.0, False)] * 50, "v double, ref boolean"
    )
    tot2 = psi_drift(shifted, "v", F.col("ref"), 0.0, 10.0, n_bins=5).filter("bin = -1").first()
    assert tot2["psi"] > 0.25
    # outliers clamp into edge bins rather than vanishing
    clamped = spark.createDataFrame(
        [(-5.0, True), (99.0, False)], "v double, ref boolean"
    )
    bins = {r["bin"] for r in psi_drift(clamped, "v", F.col("ref"), 0.0, 10.0, n_bins=5).collect()}
    assert bins == {0, 4, -1}


def test_log_templates_threshold_and_exemplar(spark):
    from apache_arrow_spark.functions.text import log_templates

    rows = [("GET /a 200",), ("GET /b 200",), ("GET /c 500",), ("PUT /a 200",)]
    df = spark.createDataFrame(rows, "line string")
    # threshold 1: any varying position wildcards; shapes keyed by first token
    t1 = {r["template"]: r for r in log_templates(df, "line", 1).collect()}
    assert t1["GET <*> <*>"]["n_lines"] == 3
    assert t1["GET <*> <*>"]["n_var_positions"] == 2
    assert t1["PUT /a 200"]["n_var_positions"] == 0
    # threshold 2: the status position (2 distinct) keeps its exemplar
    t2 = {r["template"]: r for r in log_templates(df, "line", 2).collect()}
    assert t2["GET <*> 200"]["n_lines"] == 3
