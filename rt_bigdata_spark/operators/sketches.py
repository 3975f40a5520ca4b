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
from rt_bigdata_spark.operators.similarity import lit_long_array


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


def cms_cells(
    df: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """The sketch as a DATAFRAME of ``(r, col, n)`` cells (≤ d×w rows)
    — the distributed/persistable form. Sketches are mergeable state:
    two cell frames over disjoint data combine into the union's sketch
    by a (r, col) sum — the property the streaming maintenance sink
    (streaming/sinks.cms_maintenance_sink) and any map-side partial
    aggregation rely on."""
    toks = _token_stream(df, text_col)
    return (
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
    )


def merge_cms_cells(states: list[DataFrame]) -> DataFrame:
    """Fold sketch cell frames over disjoint slices into the union's
    sketch: cell-wise sum — O(d×w) work per merge, never a data
    re-read."""
    unioned = states[0]
    for st in states[1:]:
        unioned = unioned.unionByName(st)
    return unioned.groupBy("r", "col").agg(F.sum("n").alias("n"))


def grid_from_cells(cells_rows: list, depth: int, width: int) -> list[list[int]]:
    """Materialize collected (r, col, n) rows as the d×w model grid."""
    grid = [[0] * width for _ in range(depth)]
    for row in cells_rows:
        grid[int(row["r"])][int(row["col"])] = int(row["n"])
    return grid


def cms_build(
    df: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> list[list[int]]:
    """Build the d×w counter grid: ONE aggregate with ≤ d×w groups,
    collected as the bounded sketch model (d×w longs)."""
    return grid_from_cells(cms_cells(df, depth, width, text_col).collect(), depth, width)


def _cms_estimate(grid: list[list[int]], width: int) -> Column:
    """min over the d row lookups for the ``tok`` column, against the
    collected grid inlined as literal arrays. Works for depth=1
    (``F.least`` requires ≥2 args, so the single lookup is returned
    directly)."""
    lookups = [
        F.element_at(
            lit_long_array(row),
            (_cms_hash(F.col("tok"), r, len(row)) + 1).cast("int"),
        )
        for r, row in enumerate(grid)
    ]
    est = lookups[0] if len(lookups) == 1 else F.least(*lookups)
    return est.cast("long")


def cms_heavy_hitters(
    df: DataFrame,
    threshold_frac: float = 0.01,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Heavy-hitter tokens: every candidate whose CMS estimate (min
    over the d row lookups) reaches ``threshold_frac`` of the total
    token count — scale-invariant by construction (an absolute
    threshold would silently mean something different at every SF).
    The total comes from the already-collected grid (every sketch row
    sums to the stream length), so no extra scan or broadcast is
    needed; the threshold is one inlined double.

    Two modes. ``candidates=None`` (verification mode, what the
    registered query runs): candidates = the exact vocabulary
    aggregate, output ``(token, est_count, true_count)`` so est ≥ true
    is visible per row and the oracle can hash-match. Pass a bounded
    one-column ``candidates`` DataFrame (production mode, for
    vocabularies too large to aggregate exactly): output
    ``(token, est_count)`` — the estimate side is then a pure map-side
    lookup against the grid, zero additional shuffle.
    """
    grid = cms_build(df, depth, width, text_col)
    threshold = float(threshold_frac) * sum(grid[0])
    est = _cms_estimate(grid, width)
    if candidates is not None:
        cand = candidates.select(F.col(candidates.columns[0]).alias("tok")).distinct()
        return (
            cand.withColumn("est_count", est)
            .filter(F.col("est_count") >= F.lit(threshold))
            .select(F.col("tok").alias("token"), "est_count")
        )
    toks = _token_stream(df, text_col)
    cand = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        cand.withColumn("est_count", est)
        .filter(F.col("est_count") >= F.lit(threshold))
        .select(F.col("tok").alias("token"), "est_count", "true_count")
    )
