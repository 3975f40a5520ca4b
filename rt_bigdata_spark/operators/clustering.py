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
    dot,
    lit_double_matrix,
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
    pick = F.element_at(lit_double_matrix(centroids), F.col("cell").cast("int"))
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

    EXACT-DUPLICATE COLLAPSE (r12, found by the 30× probe — the same
    cliff the r11 tau-sweep fix closed): the standard scale replica
    repeats every vector 30×, and fixed-k cluster populations made the
    cluster-local pairwise term quadratic in duplication factor
    (3.7 s → 271 s, ratio 74 at 30×). Identical vectors always share a
    cluster at sim exactly 1.0 ≥ τ, so within a clique every member
    except the minimum id is pruned BY CONSTRUCTION, and the minimum
    (the rep) is pruned iff some lower-id rep of ANOTHER clique in the
    same cluster clears τ — a doc d < rep_A in group B implies
    rep_B ≤ d, and sim is a function of the distinct vectors alone, so
    rep-level pairwise is bit-exact against naive enumeration (the
    unchanged DuckDB oracle pins this). Centroid training still runs
    over the RAW corpus (linear work; collapsing it would change the
    means and break exactness); only the quadratic stage collapses.
    Requires τ ≤ 1.0 — above cosine's ceiling the within-clique fold
    would diverge from naive enumeration, so it raises.

    INPUT CONTRACT (enforced): vectors must be non-null — run
    ``similarity.valid_embeddings`` first (module contract). The
    exact-dup collapse would otherwise silently fold every NULL-vector
    row into one cluster-(-1) clique and keep only the min id, where
    pre-collapse semantics surfaced each with cluster NULL — rather
    than pick either behavior for out-of-contract input, the plan
    carries a per-row assert_true that fails the job on the first NULL
    vector (no extra pass; the guard rides the existing scan).
    """
    if tau > 1.0:
        raise ValueError(f"tau must be <= 1.0 (cosine ceiling), got {tau}")
    corpus = ensure_parallelism(corpus).filter(
        F.assert_true(
            F.col(vec_col).isNotNull(),
            F.lit(
                "semdedup: NULL vector — input contract requires "
                "similarity.valid_embeddings() before clustering"
            ),
        ).isNull()
    )
    centroids = _ivf_centroids(corpus, id_col, vec_col, k)
    for _ in range(iters):
        assigned = _assign_cells(corpus, centroids, id_col, vec_col)
        centroids = _lloyd_update(assigned, centroids)
    # Collapse bit-identical vectors: ONE groupBy on the raw vector,
    # carrying the member-id list so the fan-back-out is an explode
    # instead of a second corpus join on the 512-byte array key (the
    # first cut joined corpus↔groups on _vec: two SortMergeJoins
    # ordering array<double> keys cost ~3× the whole pre-collapse
    # query at 1×). Member lists are clique-sized — the same
    # bounded-group assumption as every collapse operator in dedup.py.
    groups = corpus.groupBy(F.col(vec_col).alias("_vec")).agg(
        F.min(id_col).alias("_rep"), F.collect_list(id_col).alias("_ids")
    )
    reps = groups.select(F.col("_rep").alias(id_col), F.col("_vec").alias(vec_col))
    # (Exchange reuse can NOT deduplicate the assignment across the
    # self-join sides: lambda variables in higher-order functions don't
    # canonicalize, so the identical subtrees never compare equal — the
    # real lever is _assign_cells' non-nullable cell key, which stops
    # InferFiltersFromConstraints from re-inlining the assignment into
    # pre-exchange filters on every join side.)
    # Numbered repartition on the CELL key before the self-join —
    # parallelism control for the quadratic stage: the sides now hang
    # off the tiny distinct-vector aggregate, and AQE coalesces that
    # exchange to ONE partition, serializing the Σ|cell|² interpreted
    # cosines (measured: a single 7.5 s task doing 96% of the query).
    # An explicit numPartitions (REPARTITION_BY_NUM) is exempt from
    # AQE coalescing, and hash(cell) spreads the pairwise across up to
    # k tasks — the stage's natural parallelism.
    n_parts = max(corpus.sparkSession.sparkContext.defaultParallelism, k)
    # Norms HOISTED out of the pair loop with staged materialization
    # (the winnow lesson — each select boundary binds the alias once
    # per ROW): cosine(va, vb) re-derives sqrt(dot(v,v)) for BOTH
    # vectors per PAIR, tripling the interpreted-HOF work in the
    # quadratic stage; precomputing (_vd, _nrm) per row leaves one dot
    # per pair. Same float ops in the same order — bit-identical sims.
    final = (
        _assign_cells(reps, centroids, id_col, vec_col)
        .repartition(n_parts, F.col("cell"))
        .select(
            "cell",
            "neighbor_id",
            F.transform(F.col("cvec"), lambda x: x.cast("double")).alias("_vd"),
        )
        .select(
            "cell", "neighbor_id", "_vd", F.sqrt(dot(F.col("_vd"), F.col("_vd"))).alias("_nrm")
        )
    )
    a = final.select(
        F.col("cell"),
        F.col("neighbor_id").alias("id_a"),
        F.col("_vd").alias("va"),
        F.col("_nrm").alias("na"),
    )
    b = final.select(
        F.col("cell"),
        F.col("neighbor_id").alias("id_b"),
        F.col("_vd").alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    pruned = (
        a.join(b, "cell")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 9)
            >= F.lit(tau)
        )
        .select(F.col("id_a").alias("pruned_id"))
        .distinct()
    )
    rep_flags = final.join(
        pruned.withColumn("_pruned", F.lit(True)),
        final["neighbor_id"] == pruned["pruned_id"],
        "left",
    ).select(
        F.col("neighbor_id").alias("_rep"),
        F.col("cell").cast("long").alias("cluster"),
        F.col("_pruned").isNull().alias("_rep_kept"),
    )
    # Fan the rep verdicts back out: every clique member shares the
    # rep's cluster (identical vector ⇒ identical assignment) and only
    # the rep itself can be kept.
    members = groups.select(F.col("_rep"), F.explode("_ids").alias(id_col))
    return members.join(rep_flags, "_rep").select(
        F.col(id_col),
        "cluster",
        ((F.col(id_col) == F.col("_rep")) & F.col("_rep_kept")).alias("kept"),
    )
