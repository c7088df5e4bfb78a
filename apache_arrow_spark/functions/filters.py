"""Corpus filtering for large-scale training data: repetition statistics
(Gopher-style), paragraph-level duplicate flags, PII redaction, and
benchmark decontamination.

These are the document-level CLEANING rules a pretraining pipeline applies
between raw ingest and dedup (functions.dedup) / assembly
(functions.pipeline): drop machine-generated repetition, strip contact
details, and remove any document that shares a long n-gram with an
evaluation benchmark (the standard contamination guard, per GPT-3 /
Gopher / PaLM appendix methodology — public papers, arXiv:2005.14165 §C,
arXiv:2112.11446 §A.2).

Scale design:
- Per-document line/character statistics are pure column expressions over
  ``split(text, '\\n')`` — whole-stage-codegen'd, zero shuffle, scan speed.
- ``top_ngram_char_fraction`` needs a per-document mode (most frequent
  n-gram), which no per-row expression gives: explode n-grams ->
  (doc, gram) count (map-side combinable) -> per-doc max -> join char
  totals.  Two shuffles, both keyed by doc_id; gram strings never leave
  the (doc, gram) aggregate — the max carries ONE row per doc.
- ``decontaminate`` hashes every document n-gram (explode + xxhash64 —
  64-bit digests shuffle, never gram strings) and LEFT SEMI-joins the
  benchmark's hashed n-gram set; benchmark sets are small (thousands of
  eval questions), so Spark broadcasts them and contamination check costs
  one scan of the corpus with zero shuffle.
- ``redact_pii`` is a chain of ``regexp_replace`` — codegen'd, and the
  same POSIX-compatible patterns run verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from apache_arrow_spark.functions.text import tokens

# POSIX-class regexes: valid in both Spark (Java regex) and DuckDB (RE2).
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with typed
    placeholder tags.  Order matters (emails before phones, so digits inside
    an address are not half-eaten); the chain is one codegen'd expression."""
    out = text
    for _name, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document count of each PII pattern (pre-redaction audit)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")
        for name, pat, _rep in PII_PATTERNS
    }


def _lines(text: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.btrim(l)),
        lambda l: F.length(l) > 0,
    )


def line_stats(text: Column, ndigits: int = 6) -> dict[str, Column]:
    """Gopher-style repetition statistics computable per row:

    - ``n_lines``: non-empty line count
    - ``dup_line_fraction``: fraction of lines that are duplicates of an
      earlier line (0 when every line is unique)
    - ``dup_line_char_fraction``: fraction of line characters belonging to
      duplicated lines

    Pure expressions over the line array: no explode, no shuffle.
    """
    return line_stats_from_lines(_lines(text), ndigits)


def line_stats_from_lines(lines: Column, ndigits: int = 6) -> dict[str, Column]:
    """:func:`line_stats` over a pre-built array of lines/paragraphs —
    for callers whose unit of repetition isn't literal ``\\n`` lines
    (sentence chunks, fixed-token windows)."""
    uniq = F.array_distinct(lines)
    n = F.size(lines)
    n_uniq = F.size(uniq)
    total_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    uniq_chars = F.aggregate(
        uniq, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    return {
        "n_lines": n.cast("bigint"),
        "dup_line_fraction": F.round(
            (n - n_uniq) / F.greatest(n, F.lit(1)), ndigits
        ),
        "dup_line_char_fraction": F.round(
            (total_chars - uniq_chars) / F.greatest(total_chars, F.lit(1)), ndigits
        ),
    }


def token_chunks(text: Column, chunk: int = 10) -> Column:
    """Fixed-size token windows ("pseudo-paragraphs") — the repetition unit
    for corpora without newline structure: chunk i = tokens[i*chunk ..
    i*chunk+chunk).  Empty/whitespace text -> empty array."""
    toks = tokens(text)
    n = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(F.slice(toks, i * chunk + 1, chunk), " "),
        )
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when < n tokens).

    Column-level form (composable inside any expression).  DataFrame-level
    operators below use :func:`explode_word_ngrams` instead: the ML
    ``NGram`` transformer is JVM-compiled and measures ~3x faster than
    this interpreted higher-order ``transform`` at corpus scale.
    """
    toks = tokens(text)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def explode_word_ngrams(
    df: DataFrame, n: int, text_col: str, out_col: str = "g", keep: tuple = ()
) -> DataFrame:
    """(keep..., out_col) rows — one per word n-gram of ``text_col``.

    Same output as exploding :func:`word_ngrams` (space-joined grams,
    nothing when < n tokens), but via ``pyspark.ml.feature.NGram`` whose
    compiled sliding window beats the interpreted lambda ~3x.
    """
    from pyspark.ml.feature import NGram

    from apache_arrow_spark.session import spread_compute

    # spread before the tokenize+window: a single-split source would
    # otherwise run the whole gram stream (and the first aggregate's map
    # side) in one task; identity when the source is already well-split
    df = spread_compute(df)
    tk = df.select(*keep, tokens(F.col(text_col)).alias("__tk"))
    ng = NGram(n=n, inputCol="__tk", outputCol="__ng").transform(tk)
    return ng.select(*keep, F.explode("__ng").alias(out_col))


def top_ngram_char_fraction(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 6,
) -> DataFrame:
    """(id, top_gram_count, ngram_char_fraction): the fraction of document
    characters covered by occurrences of its single most frequent word
    n-gram — the Gopher repetition signal that catches "buy now buy now
    buy now" spam that line stats miss.

    Distributed shape: explode n-grams -> count per (doc, gram) (map-side
    combinable) -> per-doc argmax via ``max_by`` -> join back to per-doc
    char totals.  Shuffles are keyed by doc_id; the argmax row carries one
    gram per doc.  Ties break on the gram string (deterministic, and the
    same rule the SQL oracle applies).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
    )
    grams = explode_word_ngrams(base, n, "t", out_col="g", keep=("id",))
    per_gram = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    # deterministic argmax: max over the (count, gram) struct — count ties
    # break toward the lexicographically LARGEST gram, the exact rule the
    # SQL oracle replays (ORDER BY c DESC, g DESC LIMIT 1 per doc)
    top = per_gram.groupBy("id").agg(F.max(F.struct("c", "g")).alias("m"))
    chars = base.select(
        "id", F.length(F.col("t")).cast("bigint").alias("chars")
    )
    return (
        top.join(chars, "id")
        .select(
            F.col("id").alias(id_col),
            F.col("m.c").cast("bigint").alias("top_gram_count"),
            F.round(
                (F.col("m.c") * F.length(F.col("m.g")))
                / F.greatest(F.col("chars"), F.lit(1)),
                ndigits,
            ).alias("ngram_char_fraction"),
        )
    )


def paragraph_dedup_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    paragraphs_of=None,
) -> DataFrame:
    """(id, n_paragraphs, n_shared_paragraphs): for every document, how many
    of its non-empty lines also appear in at least one OTHER document —
    corpus-level boilerplate detection (headers, cookie banners, license
    blocks) at paragraph granularity.

    Explode lines -> xxhash64 digest (64-bit digests shuffle, never line
    text) -> digest -> distinct-doc count -> flag digests seen in >1 doc ->
    join back per doc.  Both aggregates are map-side combinable.
    """
    from apache_arrow_spark.session import spread_compute

    paragraphs_of = paragraphs_of or _lines
    # spread: chunk/line explode + digest + both aggregates' map sides
    # are narrow, single-task on a single-split source
    base = spread_compute(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    )
    lines = base.select(
        "id", F.explode(paragraphs_of(F.col("t"))).alias("line")
    ).select("id", F.xxhash64("line").alias("h"))
    per_doc_line = lines.distinct()  # count each line once per doc
    shared = (
        per_doc_line.groupBy("h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") > 1)
        .select("h")
    )
    flags = (
        per_doc_line.join(shared, "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared_paragraphs"))
    )
    totals = per_doc_line.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_paragraphs")
    )
    return (
        totals.join(flags, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_paragraphs").cast("bigint").alias("n_paragraphs"),
            F.coalesce(F.col("n_shared_paragraphs"), F.lit(0))
            .cast("bigint")
            .alias("n_shared_paragraphs"),
        )
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: find (``mode='flag'``) or drop
    (``mode='drop'``) every document sharing at least one word ``n``-gram
    with the benchmark set — the published GPT-3/Gopher guard (13-grams)
    against evaluation contamination.

    The corpus side explodes n-gram DIGESTS (xxhash64 — 8 bytes/gram, the
    gram text never shuffles); the benchmark side builds the same digest
    set.  Benchmark sets are tiny next to a 100 TB corpus, so the join is
    a broadcast LEFT SEMI: one corpus scan, no shuffle.  ``mode='drop'``
    is the same join as LEFT ANTI.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"decontaminate: unknown mode {mode!r}")
    btc = benchmark_text_col or text_col
    # NO spread_compute here — tried in r10 and MEASURED SLOWER warm
    # (min-of-5 noop at sf0.1: 0.86 s fused vs 1.13 s spread): the n-gram
    # explode + hash is not the warm bottleneck, and the two raw-doc
    # exchanges cost more than the single-split scan fusion they relieve.
    # The ~0.5 s single-task stage in a cold profile is the raw
    # single-row-group scan itself (the q33/q211 accepted class).
    bench_grams = (
        explode_word_ngrams(benchmark, n, btc, out_col="g")
        .select(F.xxhash64("g").alias("h"))
        .distinct()
    )
    doc_grams = explode_word_ngrams(
        df.select(F.col(id_col).alias("__did"), F.col(text_col)),
        n,
        text_col,
        out_col="g",
        keep=("__did",),
    ).select("__did", F.xxhash64("g").alias("h"))
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), "h", "left_semi")
        .select(F.col("__did").alias(id_col))
        .distinct()
    )
    if mode == "flag":
        return contaminated
    return df.join(contaminated, id_col, "left_anti")


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum validity of a digit string — the arithmetic that
    separates real card-shaped PII from random digit runs (a regex alone
    has ~10x the false-positive rate; production PII scanners always
    checksum-validate).  Pure codegen HOF arithmetic: from the RIGHT,
    odd positions count as-is, even positions double with a -9 fold;
    valid iff the total is divisible by 10."""
    idx = F.sequence(F.lit(1), F.length(digits))

    def term(i):
        d = F.substring(digits, F.length(digits) - i + 1, F.lit(1)).cast("int")
        doubled = d * 2
        return F.when(i % 2 == 1, d).otherwise(
            F.when(doubled > 9, doubled - 9).otherwise(doubled)
        )

    total = F.aggregate(idx, F.lit(0), lambda acc, i: acc + term(i))
    return (total % 10 == 0) & (F.length(digits) > 0)
