"""Property-based tests (hypothesis): engine column expressions must
agree with straightforward Python reference implementations on
arbitrary inputs — including unicode, empties, and whitespace runs the
fixture corpus doesn't cover.

Each example batch runs as ONE Spark job (rows = examples), keeping
runtime sane; max_examples stays small because every example is a JVM
round-trip.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from rt_bigdata_spark.operators.text_analysis import (
    _ROLLING_BASE,
    _ROLLING_PRIME,
    BPE_ISH_PATTERN,
    bpe_token_count,
    rolling_hash,
)

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00", max_codepoint=0xFFFF),
        max_size=80,
    ),
    min_size=1,
    max_size=30,
)


def py_rolling(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * _ROLLING_BASE + ord(ch)) % _ROLLING_PRIME
    return h


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_rolling_hash_matches_python_fold(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "t"])
    got = {r.id: r.rh for r in df.select("id", rolling_hash(F.col("t")).alias("rh")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_rolling(t), repr(t)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_bpe_token_count_matches_python_regex(spark, texts):
    pat = re.compile(BPE_ISH_PATTERN)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "t"])
    got = {r.id: r.n for r in df.select("id", bpe_token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(pat.findall(t.lower())), repr(t)
