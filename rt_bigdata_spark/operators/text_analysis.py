"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting.

Beyond-reference operators (build plan SURVEY.md §7.2 step 9) for the
100 TB document-processing story. Everything is built-in column
expressions — fully vectorized JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rt_bigdata_spark.functions.text_fns import tokenize
from rt_bigdata_spark.operators.scale import ensure_parallelism

# Tiny per-language stopword lists for the n-gram/stopword-vote language
# heuristic. Order matters: ties break toward the earlier language.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "de", "y"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("的", "是", "在", "了", "和"),
}


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def stopword_hits(text: Column, stopwords: Sequence[str]) -> Column:
    toks = tokenize(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, avg token length, stopword
    ratio, punctuation ratio — the standard cheap quality filters a
    pretraining pipeline applies before expensive steps.

    Tokenization happens ONCE per row (materialized alias; tokenize is
    non-cheap so CollapseProject keeps it) — inlining it per feature
    would re-split the text once per output column.
    """
    text = F.col(text_col)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    total_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[\p{P}]", ""))
    sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (
        ensure_parallelism(df).withColumn("__toks", tokenize(text))
        .withColumns(
            {
                "n_tokens": n_tok.cast("long"),
                "avg_token_len": (total_len.cast("double") / n_tok).alias("avg_token_len"),
                "stopword_ratio": (sw_hits.cast("double") / n_tok),
                "punct_ratio": (n_punct.cast("double") / F.length(text)),
            }
        )
        .drop("__toks")
    )


def language_id(df: DataFrame, text_col: str = "text", stopwords: Mapping[str, Sequence[str]] | None = None) -> DataFrame:
    """Stopword-vote language ID: count hits per language list, take the
    argmax (first language wins ties, 'und' if zero hits everywhere).

    At scale this is one tokenize + one array pass per language list —
    all JVM-side array ops, no shuffle.
    """
    stopwords = stopwords or LANG_STOPWORDS
    toks = F.col("__toks")

    def hits(words: Sequence[str]) -> Column:
        sw = F.array(*[F.lit(s) for s in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    hit_cols = {f"_hits_{lang}": hits(words) for lang, words in stopwords.items()}
    out = ensure_parallelism(df).withColumn("__toks", tokenize(F.col(text_col))).withColumns(hit_cols).drop("__toks")
    best: Column = F.lit("und")
    best_hits: Column = F.lit(0)
    for lang in stopwords:  # earlier language wins ties → strict >
        hits = F.col(f"_hits_{lang}")
        is_better = hits > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return out.withColumn("lang_pred", best).drop(*hit_cols.keys())


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 over the token-normalized text
    (whitespace/punct-insensitive), the cheap exact-dup key."""
    normalized = F.concat_ws(" ", tokenize(F.col(text_col)))
    return df.withColumn(out_col, F.md5(normalized))


# GPT-2-style pretokenizer shape (contraction suffixes, space-prefixed
# letter runs / digit runs / punctuation runs) restricted to a subset
# that Java regex, RE2 (DuckDB), and Python re interpret identically —
# the whitespace class is spelled out because `\s` is ASCII-only in
# Java/RE2 but Unicode in Python (NEL/\x85 etc. would diverge). The
# point is a BPE-grade token COUNT for data budgeting, not a specific
# vocabulary.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\x0b\f\r']+"

_ROLLING_PRIME = 2147483647  # 2^31 - 1; keeps acc*131 + c < 2^63
_ROLLING_BASE = 131


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pretokens (long). One vectorized regex pass —
    ``regexp_extract_all`` runs JVM-side; no Python, no shuffle."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def rolling_hash(text: Column) -> Column:
    """Rabin-Karp polynomial rolling hash over the text's codepoints
    (long, < 2^31): h = fold(h·131 + codepoint mod 2³¹−1).

    Pure arithmetic — unlike md5-based fingerprints it supports O(1)
    incremental update when a document is extended, and it is
    reproducible in any engine (the DuckDB oracle computes the identical
    fold), which md5_number-style helpers are not (byte-order differs).
    """
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _ROLLING_BASE + c) % _ROLLING_PRIME,
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token accounting for training-data budgeting: whitespace
    token count, BPE-ish pretoken count, and the rolling-hash
    fingerprint — all map-side column expressions."""
    text = F.col(text_col)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.size(tokenize(text)).cast("long").alias("ws_tokens"),
        bpe_token_count(text).alias("bpe_tokens"),
        rolling_hash(text).alias("rolling_fp"),
    )
