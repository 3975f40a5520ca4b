"""Fast literal-vector construction (r15 optimization round).

``lit_double_array`` / ``lit_double_matrix`` / ``lit_long_array`` build
model literals (LSH planes, IVF centroids, PQ codebooks, CMS rows) in
ONE parser call instead of one py4j round-trip per element — measured
82× faster to construct, and the reason the ANN arm DataFrames went
from ~3 s (warm) of pure driver-side build time to milliseconds. These
tests pin the only thing that could go wrong: the repr→SQL-parser
round trip must reproduce the IDENTICAL IEEE doubles that ``F.lit``
would inline, bit for bit, including the adversarial corners.
"""

from __future__ import annotations

import math
import struct

import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.operators.similarity import (
    lit_double_array,
    lit_double_matrix,
    lit_long_array,
)

ADVERSARIAL = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    1e-300,
    -1e-300,
    2.0**-1074,  # smallest subnormal
    1.7976931348623157e308,  # max double
    0.1,  # classic non-representable decimal
    1 / 3,
    123456789.123456789,
    -2.2250738585072014e-308,  # smallest normal, negated
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_lit_double_array_bit_identical_to_per_element_lits(spark):
    import random

    rng = random.Random(42)
    vals = ADVERSARIAL + [rng.uniform(-1e6, 1e6) for _ in range(64)]
    df = spark.range(1)
    fast = df.select(lit_double_array(vals).alias("x")).collect()[0].x
    slow = df.select(F.array(*[F.lit(float(v)) for v in vals]).alias("x")).collect()[0].x
    assert len(fast) == len(slow) == len(vals)
    for f, s in zip(fast, slow):
        assert _bits(f) == _bits(s)
    # -0.0 keeps its sign bit through the parser (list.index can't
    # find it: 0.0 == -0.0 — locate by bit pattern instead)
    i = next(j for j, v in enumerate(vals) if _bits(float(v)) == _bits(-0.0))
    assert _bits(fast[i]) == _bits(-0.0)


def test_lit_double_matrix_bit_identical(spark):
    rows = [ADVERSARIAL[:4], [0.5, -0.25, 2.0**-1000, 3.141592653589793]]
    df = spark.range(1)
    fast = df.select(lit_double_matrix(rows).alias("x")).collect()[0].x
    slow = df.select(
        F.array(*[F.array(*[F.lit(float(v)) for v in r]) for r in rows]).alias("x")
    ).collect()[0].x
    assert [[_bits(v) for v in r] for r in fast] == [[_bits(v) for v in r] for r in slow]


def test_lit_long_array_values_and_type(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 255]
    df = spark.range(1)
    out = df.select(lit_long_array(vals).alias("x"))
    assert out.schema["x"].dataType.simpleString() == "array<bigint>"
    assert out.collect()[0].x == vals


def test_empty_arrays_keep_declared_types(spark):
    df = spark.range(1)
    assert (
        df.select(lit_double_array([]).alias("x")).schema["x"].dataType.simpleString()
        == "array<double>"
    )
    assert (
        df.select(lit_long_array([]).alias("x")).schema["x"].dataType.simpleString()
        == "array<bigint>"
    )
    assert (
        df.select(lit_double_matrix([]).alias("x")).schema["x"].dataType.simpleString()
        == "array<array<double>>"
    )


def test_non_finite_rejected():
    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError):
            lit_double_array([1.0, bad])
