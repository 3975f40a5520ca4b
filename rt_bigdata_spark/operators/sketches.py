"""Deterministic Count-Min Sketch over token streams.

Beyond-reference operator: the bounded-state frequency estimator for
heavy-hitter detection at 100 TB — a d×w counter grid (here 4×256 =
1024 longs TOTAL, corpus-size-independent) replaces the O(vocabulary)
exact count aggregate when the vocabulary itself is too large to hold,
the same state-vs-accuracy trade the HLL/GK swaps
(`province_stats_approx`, `corpus_profile_approx`) make for distinct
counts and percentiles. CMS guarantees est ≥ true and
est ≤ true + εN with probability 1−δ (ε = e/w, δ = e^−d).

Unlike library sketches, the hash family is md5-derived
(``md5(row ':' token)`` → 32-bit int mod w) so the ENTIRE estimator is
a deterministic function of the data — a DuckDB oracle rebuilds the
identical grid and minimums, making this (like the MinHash/SimHash/LSH
family) an approximate ESTIMATOR but an exactly-verifiable FUNCTION.

Scale shape: one token explode → one (row, col) hash-agg whose group
count is d×w regardless of corpus size (map-side combine collapses
every task to ≤1024 partial rows — the sketch IS the partial
aggregate, which is why CMS merges across executors for free). The
collected grid is a bounded model read (d×w longs), inlined as literal
arrays for the estimate pass — the same broadcast-model pattern as the
IVF centroids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rt_bigdata_spark.functions.text_fns import tokenize
from rt_bigdata_spark.operators.scale import ensure_parallelism


def _cms_hash(tok: Column, row: int, width: int) -> Column:
    """md5-derived column hash for sketch row ``row``: deterministic,
    engine-portable (DuckDB mirror: ``_duck_md5_32('<row>:' || tok)``)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), tok)), 1, 8), 16, 10).cast("long")
        % width
    )


def _token_stream(df: DataFrame, text_col: str) -> DataFrame:
    return ensure_parallelism(df).select(
        F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("tok")
    )


def cms_build(
    df: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> list[list[int]]:
    """Build the d×w counter grid: ONE aggregate with ≤ d×w groups,
    collected as the bounded sketch model (d×w longs)."""
    toks = _token_stream(df, text_col)
    cells = (
        toks.select(
            *[_cms_hash(F.col("tok"), r, width).alias(f"c{r}") for r in range(depth)]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(r).alias("r"), F.col(f"c{r}").alias("col"))
                        for r in range(depth)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    grid = [[0] * width for _ in range(depth)]
    for row in cells:
        grid[int(row["r"])][int(row["col"])] = int(row["n"])
    return grid


def cms_heavy_hitters(
    df: DataFrame,
    threshold_frac: float = 0.01,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
    with_truth: bool = True,
) -> DataFrame:
    """``(token, est_count[, true_count])`` for every distinct token
    whose CMS estimate (min over the d row lookups) reaches
    ``threshold_frac`` of the total token count — the classic
    heavy-hitter query, scale-invariant by construction (an absolute
    threshold would silently mean something different at every SF).
    The total is a 1-row broadcast like the BM25 stats row.

    ``with_truth`` adds the exact count next to the estimate — the
    verification mode the oracle checks (est ≥ true visible per row);
    at a vocabulary too large to aggregate exactly, run with
    ``with_truth=False`` over any bounded candidate set (the sketch
    grid itself never grows).
    """
    grid = cms_build(df, depth, width, text_col)
    toks = _token_stream(df, text_col)
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    cand = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    est = F.least(
        *[
            F.element_at(
                F.array(*[F.lit(v) for v in grid[r]]),
                (_cms_hash(F.col("tok"), r, width) + 1).cast("int"),
            )
            for r in range(depth)
        ]
    ).cast("long")
    out = (
        cand.withColumn("est_count", est)
        .crossJoin(F.broadcast(total))
        .filter(F.col("est_count") >= F.lit(float(threshold_frac)) * F.col("n_total"))
    )
    cols = [F.col("tok").alias("token"), "est_count"] + (["true_count"] if with_truth else [])
    return out.select(*cols)
