"""Text scalar functions + tokenizer UDTF surface (SURVEY.md §2.8 F1-F3, F9, F11; §2.9 U1-U2).

All hot-path functions are built-in column expressions (JVM-side,
codegen-friendly); nothing here is a row-at-a-time Python UDF.

- F1/F2/F3 emoji / special-char stripping
  (rt-flink …/common/CommonTool.scala:18-56) → ``regexp_replace``.
- U1 ``ik_analyze`` tokenizer UDTF (…/app/udf/KeywordUDTF.scala:17-29,
  …/utils/KeywordUtil.scala:15-48): behavior-equivalent segmentation as
  ``split`` + ``explode`` (the IK dictionary is third-party; semantics
  tests need stable segmentation, not the exact dictionary).
- U2 ``keywordProductC2R`` unpivot (…/app/udf/KeywordProductC2RUDTF.scala:12-34)
  → ``stack`` + ``filter(ct > 0)``.
- F9 multi-label keyword classification (…/common/BusinessRulesTool.scala:15-68)
  → nested ``when`` over ``contains`` predicates.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

# F2 removeEmoji (CommonTool.scala:40-47): keep letters/marks/numbers/
# punctuation/separators/format chars; drop the rest (emoji etc.).
_EMOJI_CLASS = r"[^\p{L}\p{M}\p{N}\p{P}\p{Z}\p{Cf}\s]"

# F1 getSubsidy (CommonTool.scala:18-37): keep CJK + full-width + ASCII.
_NON_CJK_ASCII = r"[^一-龥＀-￯\x00-\x7F]"


def remove_emoji(col: Column) -> Column:
    return F.regexp_replace(col, _EMOJI_CLASS, "")


def keep_cjk_ascii(col: Column) -> Column:
    return F.regexp_replace(col, _NON_CJK_ASCII, "")


def strip_surrogates(col: Column) -> Column:
    # F3 specialStr (CommonTool.scala:50-56)
    return F.regexp_replace(col, r"[\uD800-\uDFFF]", "")


def tokenize(col: Column) -> Column:
    """U1: text → array of lowercase word tokens.

    ``split`` on non-word runs; empty tokens filtered. Pure column
    expression — stays in whole-stage codegen, no Python involved.
    Use with ``explode`` for the lateral-join (J5) shape:
    ``df.select(explode(tokenize(col("text"))).alias("keyword"))``.
    """
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != F.lit(""))


def unpivot_counts(pairs: Sequence[tuple[str, str]], ct_name: str = "ct", source_name: str = "source") -> Column:
    """U2: (count_col, SOURCE_LABEL) pairs → rows ``struct(ct, source)``.

    Returns a ``stack`` expression producing one row per pair; caller
    filters ``ct > 0`` (zero counts are skipped by the reference UDTF,
    KeywordProductC2RUDTF.scala:23-31).
    """
    args: list[str] = []
    for col_name, label in pairs:
        args.append(f"`{col_name}`")
        args.append(f"'{label}'")
    return F.expr(f"stack({len(pairs)}, {', '.join(args)}) as ({ct_name}, {source_name})")


def classify_keywords(col: Column, rules: Sequence[tuple[str, Sequence[str]]], default: str = "other") -> Column:
    """F9: first-match multi-keyword classification.

    ``rules`` is [(label, [substr, ...]), ...]; a row gets ``label`` if
    the text contains any of its substrings (reference's complaint-type
    rules, BusinessRulesTool.scala:15-68).
    """
    expr: Column | None = None
    for label, needles in reversed(list(rules)):
        cond = None
        for n in needles:
            c = col.contains(F.lit(n))
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(label)).otherwise(F.lit(default) if expr is None else expr)
    return expr if expr is not None else F.lit(default)


def tokenize_mixed(col: Column) -> Column:
    """U1 for MIXED latin/CJK text — the engine's stand-in for the
    reference's IK Chinese segmenter (KeywordUtil.scala:18-41 runs
    IKSegmenter in smart mode over product titles like
    "Apple iPhoneXSMax … 深空灰色 移动联通电信4G手机 双卡双待").

    Dictionary-less but deterministic and SQL-expressible on both
    engines: latin/digit runs tokenize as words (lowercased, same as
    ``tokenize``); CJK runs emit OVERLAPPING BIGRAMS plus a lone
    unigram for single-char runs — the Lucene CJKAnalyzer convention,
    the standard dictionary-free approximation of Chinese word
    segmentation (most Chinese words are 2 chars; bigrams make
    "手机" findable inside "电信4G手机" the way a dictionary segmenter
    would). IK's exact dictionary output is NOT reproduced — per
    SURVEY §7.3 the contract is behavior-equivalence (keyword
    counting/grouping semantics), not lexeme-identity.

    Pure column expressions: one regexp pass extracts the runs, one
    transform expands CJK runs to bigrams, one flatten+filter — fully
    JVM-side, and mirrored 1:1 in ANSI SQL by the cross-engine test's
    DuckDB twin (tests/test_functions.py).
    """
    runs = F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+|[一-龥]+"), F.lit(0))
    bigrams = F.transform(
        runs,
        lambda r: F.when(
            r.rlike("^[一-龥].*") & (F.length(r) >= 2),
            F.transform(F.sequence(F.lit(1), F.length(r) - 1), lambda i: r.substr(i, F.lit(2))),
        ).otherwise(F.array(r)),
    )
    return F.filter(F.flatten(bigrams), lambda t: t != F.lit(""))
