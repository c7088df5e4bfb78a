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
    return scored.select(
        id_col,
        "n_tokens",
        "nll_q",
        (
            F.col("nll_q").cast("double")
            / (F.lit(float(_Q)) * F.col("n_tokens").cast("double"))
        ).alias("nll"),
    )
