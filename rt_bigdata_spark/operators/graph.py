"""Iterative graph operators for dedup post-processing.

Near-dup discovery (minhash_lsh / ngram_jaccard) emits PAIRS; curation
needs CLUSTERS — pick one canonical doc per group of transitively-
connected near-dups. Connected components is the canonical iterative
Spark workload: no single-pass SQL expresses it, but a short loop of
joins does, with the driver controlling convergence.

Scale design (100 TB): min-label propagation converges in O(diameter)
rounds; near-dup graphs have tiny diameters (clusters are cliques-ish),
so 2-4 rounds dominate in practice. Each round is one join + one
aggregate, both partitioned by node id — AQE coalesces the tail.
Intermediates are persisted and the previous round unpersisted so
lineage (and thus task re-execution scope) stays one round deep; for
adversarial diameters switch to alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which bounds rounds by O(log² n) — the loop structure below
is unchanged, only the neighbor expansion differs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it
    (undirected reachability): output ``(node, label)``; nodes in the
    same component share a label, singletons label themselves.

    Deterministic (min over ids — no hash-partitioning dependence), so
    results are oracle-comparable; the DuckDB equivalent is a recursive
    CTE over the symmetrized edge set.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label")).persist()
    try:
        for _ in range(max_iter):
            # each node also receives its neighbors' current labels …
            neigh = e.join(labels, e["b"] == labels["node"]).select(
                F.col("a").alias("node"), F.col("label")
            )
            new_labels = (
                labels.unionByName(neigh).groupBy("node").agg(F.min("label").alias("label")).persist()
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("label", "_old"), "node")
                .filter(F.col("label") != F.col("_old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        # labels stays persisted for the caller; edges can go (a later
        # recompute of an evicted labels partition would rebuild them
        # from source — correctness is unaffected)
        return labels
    finally:
        e.unpersist()
