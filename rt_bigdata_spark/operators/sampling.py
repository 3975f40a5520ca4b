"""Deterministic sampling / dataset splitting for training pipelines.

A train/valid/test split at 100 TB must be (a) reproducible across
runs and engines — no ``rand()``, no JVM-hash-seed dependence — and
(b) leakage-proof: byte-identical content must land in the same split
even BEFORE dedup has run, or near-dup copies of a training document
contaminate the eval set. Both follow from keying the split on a
stable content hash: the first ``hex_chars`` of md5 interpreted as a
number in [0, 16^hex_chars), compared against cumulative-ratio
boundaries. md5 prefixes are engine-portable (any SQL engine computes
the identical hex string) and the comparison stays a lexicographic
string compare — hex digits are ASCII-ordered — so the whole operator
is one map-side expression: no shuffle, no sampling pass, no state.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def split_boundaries(splits: Sequence[tuple[str, float]], hex_chars: int = 4) -> list[tuple[str, str]]:
    """(name, upper-hex-boundary) for all but the last split; the last
    takes the remainder. Boundaries are lowercase hex of the cumulative
    ratio scaled to 16^hex_chars — inline the SAME literals in any
    oracle SQL."""
    total = sum(w for _, w in splits)
    bounds: list[tuple[str, str]] = []
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        bounds.append((name, format(int(acc / total * 16**hex_chars), f"0{hex_chars}x")))
    return bounds


def rate_boundary(rate: float, hex_chars: int = 4) -> str | None:
    """Upper hex boundary for a keep-rate in [0, 1); None means keep
    everything (a rate ≥ 1 has no 4-hex-char boundary — '10000' would
    compare LOWER than 'ffff' lexicographically, so it must not be
    emitted as a string bound)."""
    if rate >= 1.0:
        return None
    return format(max(int(rate * 16**hex_chars), 0), f"0{hex_chars}x")


def weighted_sample(
    df: DataFrame,
    key_col: str | Column,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    hex_chars: int = 4,
) -> DataFrame:
    """Per-group deterministic downsampling (data mixing): keep a row
    iff the md5-prefix of its key falls under the group's rate
    boundary. The mixing step of a training-data pipeline — e.g. keep
    all of a high-quality source, 10%% of a noisy crawl — as one
    map-side filter: reproducible (content-keyed, no rand()), stable
    under re-runs and engine changes, zero shuffle, and composable
    with hash_split (different hash positions would be needed for
    independence; same position keeps subsets nested, which is what
    you want when raising a source's rate later).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    prefix = F.substring(F.md5(key), 1, hex_chars)

    def keep_cond(rate: float) -> Column:
        b = rate_boundary(rate, hex_chars)
        return F.lit(True) if b is None else (prefix < F.lit(b))

    chain: Column | None = None
    for g, r in rates.items():
        cond = keep_cond(r)
        chain = F.when(F.col(group_col) == g, cond) if chain is None else chain.when(F.col(group_col) == g, cond)
    keep = keep_cond(default_rate) if chain is None else chain.otherwise(keep_cond(default_rate))
    return df.filter(keep)


def hash_split(
    df: DataFrame,
    key_col: str | Column,
    splits: Sequence[tuple[str, float]],
    out_col: str = "split",
    hex_chars: int = 4,
) -> DataFrame:
    """Assign each row a split label by md5-prefix range of ``key_col``.

    ``splits`` is ordered (name, weight); weights are normalized.
    Resolution is 1/16^hex_chars (4 hex chars ≈ 0.0015%% granularity).
    Key on the content column for leakage-proof splits; key on a stable
    id for stratified-by-row splits.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    prefix = F.substring(F.md5(key), 1, hex_chars)
    bounds = split_boundaries(splits, hex_chars)
    out = F.when(prefix < F.lit(bounds[0][1]), F.lit(bounds[0][0]))
    for name, b in bounds[1:]:
        out = out.when(prefix < F.lit(b), F.lit(name))
    out = out.otherwise(F.lit(splits[-1][0]))
    return df.withColumn(out_col, out)
