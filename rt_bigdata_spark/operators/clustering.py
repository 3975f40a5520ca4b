"""Semantic clustering over embedding columns + SemDeDup pruning.

Beyond-reference training-data operators: spherical k-means (Lloyd)
over an ``array<float>`` embedding column, and the SemDeDup pruning
rule of Abbas et al. 2023 ("SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") — cluster the corpus, then
drop documents that are near-duplicates of another document INSIDE the
same cluster. The cluster step is what makes semantic dedup tractable
at 100 TB: the quadratic cosine comparison runs cluster-local (cluster
population is bounded by construction — k grows with the corpus), never
corpus-wide.

Determinism contract (what lets DuckDB replay this exactly, the same
discipline as the IVF/LSH oracles in plans/textops.py):

- centroid seeding is the first ``k`` vectors by id, L2-normalized —
  no sampling, no ``rand()`` (``similarity._ivf_centroids``);
- each Lloyd update computes per-(cell, dim) component means over
  components quantized to an exact integer grid:
  ``floor(x * 2^20)`` as a long. Scaling a binary float by a power of
  two is EXACT in IEEE arithmetic and ``floor`` has no rounding-mode
  ambiguity, so the quantized values are bit-identical in any engine;
  the long SUM is exact and therefore order/partitioning-independent —
  a plain double sum would make the centroids (and every downstream
  assignment) depend on Spark's partition layout, and a decimal cast
  would hang the result on engine-specific double→decimal rounding.
  The mean is ``(CAST(sum AS DOUBLE) / 2^20) / n`` — two
  deterministic double divisions. The 2^-20 quantization error is
  epsilon-level for clustering and identical on both sides;
- normalization and dot products run in IEEE double with a fixed
  left-to-right fold order (``F.aggregate`` on the Spark side,
  ``list_inner_product`` / sequential python sum on the other) — the
  same equivalence every green ANN oracle already relies on;
- assignment ties break to the LOWEST cell id (``array_position`` takes
  the first maximum), mirrored as ``ORDER BY sim DESC, cell ASC``.

Scale shape: assignment is one map-side pass per iteration (centroids
broadcast as literals — a k×dim "model", the MLlib pattern); the
update is one hash-aggregate shuffle on (cell, dim) — max k×dim groups,
skew-impossible keys; the k×dim partial sums collected per iteration
are the bounded "model collect" (512 doubles at k=8, dim=64), not a
data collect. Iteration count is a fixed hyperparameter, so lineage
stays shallow — no checkpointing needed (contrast connected
components, where rounds grow with graph diameter).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rt_bigdata_spark.operators.scale import ensure_parallelism
from rt_bigdata_spark.operators.similarity import (
    _assign_cells,
    _ivf_centroids,
    cosine,
)


QUANT = 1048576.0  # 2^20 — exact power-of-two component quantization


def _component_means(assigned: DataFrame) -> list[tuple[int, int, float, int]]:
    """Exact per-(cell, dim) component means of the assigned vectors:
    (cell, dim, mean, n) rows collected to the driver (≤ k×dim rows —
    the bounded model collect). Components quantize to
    ``floor(x · 2^20)`` longs so the sum is an exact integer; the mean
    is ``(float(sum) / 2^20) / n`` — the same two double divisions the
    oracle writes as ``(CAST(SUM(q) AS DOUBLE) / 1048576.0) / n``."""
    sums = (
        assigned.select(F.col("cell"), F.posexplode("cvec").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            F.sum(F.floor(F.col("x").cast("double") * F.lit(QUANT)).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    return [
        (int(r["cell"]), int(r["pos"]), float(r["s"]) / QUANT / r["n"], int(r["n"]))
        for r in sums
    ]


def _lloyd_update(
    assigned: DataFrame, centroids: list[list[float]]
) -> list[list[float]]:
    """One Lloyd step: component means per cell, L2-normalized
    (spherical k-means — centroids stay unit vectors so dot = cosine
    up to the row's own norm). A cell with no members keeps its
    previous centroid (mirrored by the oracle's LEFT JOIN/COALESCE)."""
    dim = len(centroids[0])
    means: dict[int, list[float]] = {}
    for cell, pos, m, _n in _component_means(assigned):
        means.setdefault(cell, [0.0] * dim)[pos] = m
    out: list[list[float]] = []
    for i, old in enumerate(centroids):
        mv = means.get(i + 1)
        if mv is None:
            out.append(old)
            continue
        norm = math.sqrt(sum(x * x for x in mv))
        out.append([x / norm for x in mv] if norm > 0 else old)
    return out


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic spherical k-means: returns (assignment, centroids)
    where assignment is ``(vec_id, cluster, sim)`` under the final
    centroids (sim = cosine to the assigned centroid, rounded 9 dp) and
    centroids are the final unit vectors (inline them in any oracle or
    hand them to ``build_ivf_index`` — the cluster model doubles as an
    IVF index).
    """
    corpus = ensure_parallelism(corpus)
    centroids = _ivf_centroids(corpus, id_col, vec_col, k)
    for _ in range(iters):
        assigned = _assign_cells(corpus, centroids, id_col, vec_col)
        centroids = _lloyd_update(assigned, centroids)
    final = _assign_cells(corpus, centroids, id_col, vec_col)
    cent_arr = [F.array(*[F.lit(x) for x in c]) for c in centroids]
    pick = F.element_at(F.array(*cent_arr), F.col("cell").cast("int"))
    out = final.select(
        F.col("neighbor_id").alias(id_col),
        F.col("cell").cast("long").alias("cluster"),
        F.round(cosine(F.col("cvec"), pick), 9).alias("sim"),
    )
    return out, centroids


def semdedup(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup pruning: ``(vec_id, cluster, kept)`` — a document is
    dropped iff a LOWER-id document in the SAME cluster has cosine
    ≥ ``tau`` (the greedy keep-first rule; lowest id is the
    deterministic stand-in for the paper's keep-one-per-group choice).

    The pairwise cosine join is cluster-local: candidates co-group on
    the cluster key, so the quadratic term is bounded by cluster
    population, not corpus size — grow ``k`` with the corpus to hold
    cluster size constant (the paper uses k≈100k for web scale). No
    corpus-wide nested-loop join exists in this plan.
    """
    corpus = ensure_parallelism(corpus)
    centroids = _ivf_centroids(corpus, id_col, vec_col, k)
    for _ in range(iters):
        assigned = _assign_cells(corpus, centroids, id_col, vec_col)
        centroids = _lloyd_update(assigned, centroids)
    # (Exchange reuse can NOT deduplicate the assignment across the
    # self-join sides: lambda variables in higher-order functions don't
    # canonicalize, so the identical subtrees never compare equal — the
    # real lever is _assign_cells' non-nullable cell key, which stops
    # InferFiltersFromConstraints from re-inlining the assignment into
    # pre-exchange filters on every join side.)
    final = _assign_cells(corpus, centroids, id_col, vec_col)
    a = final.select(
        F.col("cell"), F.col("neighbor_id").alias("id_a"), F.col("cvec").alias("va")
    )
    b = final.select(
        F.col("cell"), F.col("neighbor_id").alias("id_b"), F.col("cvec").alias("vb")
    )
    pruned = (
        a.join(b, "cell")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 9) >= F.lit(tau))
        .select(F.col("id_a").alias("pruned_id"))
        .distinct()
    )
    return (
        final.join(
            pruned.withColumn("_pruned", F.lit(True)),
            final["neighbor_id"] == pruned["pruned_id"],
            "left",
        )
        .select(
            F.col("neighbor_id").alias(id_col),
            F.col("cell").cast("long").alias("cluster"),
            F.col("_pruned").isNull().alias("kept"),
        )
    )
