"""Corpus-language-model quality scoring (CCNet-style perplexity proxy).

CCNet (Wenzek et al., arXiv:1911.00359) ranks web documents by the
perplexity of a language model trained on a clean corpus; documents whose
token distribution is unlike the reference read as high-perplexity noise.
The full KenLM n-gram model needs external tooling, but the add-one-
smoothed UNIGRAM model it degenerates to is exactly expressible as
DataFrame algebra — and is the standard first-cut quality signal: a
document's mean negative log-probability under the corpus's own unigram
distribution.  Gibberish, boilerplate-free random strings, and
wrong-language text all surface with high NLL; fluent in-distribution
text scores low.

Scale shape (100 TB posture):
- the token stream is exploded ONCE and immediately collapsed to
  per-(doc, term) counts — the only corpus-sized shuffle;
- the unigram table (term -> count) is a second-level aggregate of that
  same cell table (term-keyed shuffle of distinct terms, not tokens);
- scoring joins cells to the unigram table on term.  Heavy-tailed vocab
  means the join's term side is small relative to the stream (Zipf:
  vocab grows ~sublinearly); Spark broadcast-joins it when under the
  threshold, else it is an ordinary shuffle join — never a collect;
- per-term log-probabilities are fixed-point quantized (``floor(ln p *
  1e7)`` as int64) BEFORE the per-doc sum, so the aggregate is
  integer-exact, order-independent, and bit-reproducible across engines
  (the importance.py discipline).

No reference analog; the smoothing/NLL recipe is the public textbook
add-one unigram model.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from apache_arrow_spark.functions.text import tokens

__all__ = ["unigram_nll"]

_Q = 10_000_000  # fixed-point scale for quantized log-probs


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    add-one-smoothed unigram distribution.

    Returns (id_col, n_tokens, nll_q, nll) where ``nll_q`` is the
    integer-exact quantized total NLL (sum over token occurrences of
    ``-floor(ln((c_term + 1)/(N + V)) * 1e7)``) and ``nll = nll_q / (1e7
    * n_tokens)`` — the mean NLL in nats.  Empty documents are dropped
    (no tokens, no model support).  Lower = more in-distribution.
    """
    cells = (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__term")
        )
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # Persist the cell table: it feeds both the unigram model and the
    # scoring join, and re-running the explode is the one corpus-sized cost.
    cells = cells.persist()

    unigrams = cells.groupBy("__term").agg(F.sum("__tf").alias("__c"))
    totals = unigrams.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    # ln((c + 1) / (N + V)) assembled from exactly-representable integer
    # counts, quantized per TERM (not per occurrence) so both engines floor
    # the identical double once and the doc sum is pure int64 arithmetic.
    logp_q = F.floor(
        F.log((F.col("__c") + F.lit(1.0)) / (F.col("__n") + F.col("__v")))
        * F.lit(float(_Q))
    ).cast("bigint")
    model = unigrams.crossJoin(F.broadcast(totals)).select(
        "__term", logp_q.alias("__lpq")
    )

    scored = (
        cells.join(model, on="__term")
        .groupBy(id_col)
        .agg(
            F.sum("__tf").alias("n_tokens"),
            (-F.sum(F.col("__tf") * F.col("__lpq"))).alias("nll_q"),
        )
    )
    out = scored.select(
        id_col,
        "n_tokens",
        "nll_q",
        (
            F.col("nll_q").cast("double")
            / (F.lit(float(_Q)) * F.col("n_tokens").cast("double"))
        ).alias("nll"),
    )
    # dedup.py convention: materialize the per-doc result (4 narrow
    # columns — far smaller than the cell table), release the cell cache;
    # callers holding the result long-term may .unpersist() it
    out = out.persist()
    out.count()
    cells.unpersist()
    return out


def naive_bayes_confusion(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    split_salt: str = "nb",
    train_frac: float = 0.7,
) -> DataFrame:
    """Train a multinomial Naive Bayes classifier in-engine and evaluate
    it on a held-out split: the count-based, integer-exact version of the
    fasttext-style domain/language filters production pipelines train on
    their own corpora.

    Split is the deterministic hash rule (hash(id) < train_frac) — the
    same rows every run, every engine.  The model is two count tables:
    per-label doc priors and per-(term, label) token counts with add-one
    smoothing over the train vocabulary; both log-probabilities are
    floor-quantized to int64 once per MODEL CELL (the q100 discipline),
    so per-document scores are exact integer sums — argmax (ties to the
    lexicographically first label) is engine-reproducible.

    Returns the held-out confusion matrix (actual, predicted, n).

    Scale shape: the corpus tokenizes once into per-(doc, term) counts;
    the model is (vocab x labels) cells — broadcast-sized — joined onto
    the test cells; scoring is one combinable sum per (doc, label) and a
    per-doc top-1 window.  Swapping in a trained fasttext weight table
    (q204's hashed_linear_score) changes the model join, not the shape."""
    from apache_arrow_spark.functions.pipeline import HASH_MOD, hash_bucket
    from apache_arrow_spark.functions.text import tokens

    thr = int(train_frac * HASH_MOD)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.col(text_col).alias("t"),
        (hash_bucket(F.col(id_col), split_salt) < thr).alias("is_train"),
    )
    cells = (
        base.select("id", "label", "is_train", F.explode(tokens(F.col("t"))).alias("term"))
        .groupBy("id", "label", "is_train", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    ).persist()

    train = cells.filter(F.col("is_train"))
    # vocab size + per-label stats in ONE job: rollup(label) emits the
    # per-label rows and the grand-total row (global distinct-term count)
    # from a single aggregation — the separate distinct().count() was a
    # whole extra job over the same cached cells.  grouping() separates a
    # genuine NULL label from the rollup total row.
    stats_rows = (
        train.rollup("label")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.countDistinct("id").alias("n_docs"),
            F.countDistinct("term").alias("n_terms"),
            F.grouping("label").alias("__g"),
        )
        .collect()
    )
    # rollup over an EMPTY train split emits zero rows (no grand-total
    # row): default the vocab to 0 and fail with an explicit message
    # instead of a bare StopIteration (r10 ADVICE)
    vocab_n = next((int(r["n_terms"]) for r in stats_rows if r["__g"] == 1), 0)
    label_stats = [r for r in stats_rows if r["__g"] == 0]
    if not label_stats:
        cells.unpersist()
        raise ValueError(
            "naive_bayes_confusion: the training split is empty "
            f"(train_frac={train_frac}) — no model can be fit"
        )
    n_total_docs = sum(r["n_docs"] for r in label_stats)
    q = 10_000_000.0
    import math

    lab_rows = [
        (
            r["label"],
            int(math.floor(math.log(r["n_docs"] / n_total_docs) * q)),
            int(math.floor(math.log(1.0 / (r["n_tok"] + vocab_n)) * q)),
            int(r["n_tok"]),
        )
        for r in label_stats
    ]
    labels_df = df.sparkSession.createDataFrame(
        lab_rows, "label string, prior_q bigint, default_q bigint, n_tok bigint"
    )

    model = (
        train.groupBy("term", "label")
        .agg(F.sum("tf").alias("c"))
        .join(F.broadcast(labels_df.select("label", "n_tok")), "label")
        .select(
            "term",
            "label",
            F.floor(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("n_tok") + F.lit(float(vocab_n))))
                * F.lit(q)
            )
            .cast("bigint")
            .alias("lpq"),
        )
    )

    test = cells.filter(~F.col("is_train")).select(
        "id", F.col("label").alias("actual"), "term", "tf"
    )
    # r11 (guide §2.3 — shuffle fewer bytes): the label set is KNOWN on
    # the driver (the stats collect above), so for the practical label
    # cardinality the model pivots to one row per TERM with a score
    # column per label, and the per-document scoring becomes ONE
    # broadcast join + ONE map-side-combinable aggregate of |labels|
    # integer sums keyed on the document — the old shape crossJoined
    # every test cell with every label (|labels| x the cell shuffle) and
    # needed a second per-(id,label) shuffle before the argmax.  Scores
    # are the identical int64 sums (tf * coalesce(lpq_label,
    # default_label), plus prior), and the argmax keeps the exact
    # min(struct(-score, label)) tie rule via least() over the label
    # structs.  An unboundedly wide label set would make the pivoted row
    # silly-wide, so the fan-out shape is kept as the fallback.
    wide_ok = 1 < len(lab_rows) <= 64 and all(r[0] is not None for r in lab_rows)
    if wide_ok:
        lab_sorted = sorted(lab_rows, key=lambda r: r[0])
        model_wide = model.groupBy("term").agg(
            *[
                F.max(F.when(F.col("label") == lab, F.col("lpq"))).alias(f"__lp_{i}")
                for i, (lab, _, _, _) in enumerate(lab_sorted)
            ]
        )
        sums = (
            test.join(F.broadcast(model_wide), "term", "left")
            .groupBy("id", "actual")
            .agg(
                *[
                    F.sum(
                        F.col("tf")
                        * F.coalesce(F.col(f"__lp_{i}"), F.lit(int(dq)))
                    ).alias(f"__s_{i}")
                    for i, (_, _, dq, _) in enumerate(lab_sorted)
                ]
            )
        )
        pred = sums.select(
            "id",
            "actual",
            F.least(
                *[
                    F.struct(
                        (-(F.lit(int(pq)) + F.col(f"__s_{i}"))).alias("ns"),
                        F.lit(lab).alias("label"),
                    )
                    for i, (lab, pq, _, _) in enumerate(lab_sorted)
                ]
            )["label"].alias("predicted"),
        )
    else:
        scored = (
            test.crossJoin(
                F.broadcast(labels_df.select("label", "prior_q", "default_q"))
            )
            .join(F.broadcast(model), ["term", "label"], "left")
            .groupBy("id", "actual", "label", "prior_q")
            .agg(
                F.sum(
                    F.col("tf") * F.coalesce(F.col("lpq"), F.col("default_q"))
                ).alias("s")
            )
            .select(
                "id",
                "actual",
                "label",
                (F.col("prior_q") + F.col("s")).alias("score"),
            )
        )
        # argmax without a sort-window: min(struct(-score, label)) picks
        # the max score with ties to the lexicographically FIRST label,
        # and is a partial-aggregatable (map-side combinable) expression
        pred = (
            scored.groupBy("id", "actual")
            .agg(F.min(F.struct((-F.col("score")).alias("ns"), "label")).alias("__top"))
            .select("id", "actual", F.col("__top.label").alias("predicted"))
        )
    out = pred.groupBy("actual", "predicted").agg(F.count(F.lit(1)).alias("n"))
    # dedup.py convention: materialize the tiny (labels x labels) result,
    # then release the corpus-sized cell cache
    out = out.persist()
    out.count()
    cells.unpersist()
    return out


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lambda_milli: int = 700,
) -> DataFrame:
    """Per-document mean NLL under an INTERPOLATED bigram/unigram model
    trained on the corpus itself — the next model class up from
    :func:`unigram_nll` (CCNet-style perplexity filters typically use
    higher-order n-grams): P(w2|w1) = lambda * (c12 + 1)/(c1 + V) +
    (1 - lambda) * (c2 + 1)/(N + V), with lambda = lambda_milli/1000.

    Exactness: the interpolated probability is computed per (w1, w2)
    MODEL CELL from exact integer counts and floor-quantized ONCE
    (q100's per-cell discipline) — per-document totals are then pure
    int64 sums.  Documents shorter than 2 tokens are dropped (no bigram
    support).  Returns (id_col, n_bigrams, nll_q, nll).

    Scale shape: one explode into adjacent pairs (slice/zip, no UDF),
    collapsed immediately to per-(doc, w1, w2) counts — the only
    corpus-sized shuffle; the model cell table (distinct bigrams) joins
    broadcast-style onto the scoring cells."""
    from apache_arrow_spark.session import spread_compute

    # spread before tokenize + pair explode: narrow up to the first
    # aggregate's map side, so a single-split source would serialize it
    toks = spread_compute(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("a")
    ).filter(F.size("a") >= 2)
    pairs = toks.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(a, 1, size(a) - 1)").alias("w1"),
                F.expr("slice(a, 2, size(a) - 1)").alias("w2"),
            )
        ).alias("p"),
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    cells = pairs.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    cells = cells.persist()

    big = cells.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    uni_next = cells.groupBy("w2").agg(F.sum("tf").alias("c2"))
    uni_prev = cells.groupBy("w1").agg(F.sum("tf").alias("c1"))
    totals = big.agg(
        F.sum("c12").alias("n"), F.count_distinct(F.col("w2")).alias("v")
    )
    lam = lambda_milli / 1000.0
    p = (
        F.lit(lam)
        * (F.col("c12") + F.lit(1.0))
        / (F.col("c1") + F.col("v"))
        + F.lit(1.0 - lam) * (F.col("c2") + F.lit(1.0)) / (F.col("n") + F.col("v"))
    )
    model = (
        big.join(uni_prev, "w1")
        .join(uni_next, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.floor(F.log(p) * F.lit(float(_Q))).cast("bigint").alias("lpq"),
        )
    )
    scored = (
        cells.join(model, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            (-F.sum(F.col("tf") * F.col("lpq"))).alias("nll_q"),
        )
    )
    out = scored.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "nll_q",
        (
            F.col("nll_q").cast("double")
            / (F.lit(float(_Q)) * F.col("n_bigrams").cast("double"))
        ).alias("nll"),
    )
    # dedup.py convention: materialize the per-doc result, release the
    # bigram cell cache; callers may .unpersist() the result when done
    out = out.persist()
    out.count()
    cells.unpersist()
    return out


def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the doc's OWN token distribution
    (nats) — the lexical-diversity quality signal: near-zero entropy means
    a document repeating a handful of tokens (keyword stuffing, boiler-
    plate), the complement of the cross-corpus q100 perplexity score.

    Integer-exact like :func:`unigram_nll`: ln(tf/n) is floor-quantized
    to int64 once per (doc, term) CELL, so the per-doc sum is pure int64
    arithmetic and cross-engine reproducible.  Returns (id_col, n_tokens,
    entropy_q, entropy) where ``entropy = entropy_q / (1e7 * n_tokens)``;
    empty documents are dropped (no distribution).

    Scale shape: one explode -> per-(doc, term) combinable count -> one
    per-doc combinable sum.  Two shuffles on (doc, term) and (doc), no
    model table, no joins against the corpus."""
    from apache_arrow_spark.functions.text import tokens

    cells = (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__term")
        )
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    totals = cells.groupBy(id_col).agg(F.sum("__tf").alias("__n"))
    lpq = F.floor(
        F.log(F.col("__tf").cast("double") / F.col("__n").cast("double"))
        * F.lit(float(_Q))
    ).cast("bigint")
    scored = (
        cells.join(totals, on=id_col)
        .groupBy(id_col)
        .agg(
            F.max("__n").alias("n_tokens"),
            (-F.sum(F.col("__tf") * lpq)).alias("entropy_q"),
        )
    )
    return scored.select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "entropy_q",
        (
            F.col("entropy_q").cast("double")
            / (F.lit(float(_Q)) * F.col("n_tokens").cast("double"))
        ).alias("entropy"),
    )
