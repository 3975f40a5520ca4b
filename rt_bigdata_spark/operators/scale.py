"""Parallelism/scale utilities.

Spark's scan parallelism is file-granular: a single small parquet file
becomes one task even when the per-row work downstream is heavy
(higher-order array functions are interpreted, not codegen'd — see the
tokenize/shingle operators). ``ensure_parallelism`` widens such inputs
before the compute so every core participates; it's a no-op when the
source already has enough partitions (the 100 TB case, where file
count provides parallelism and an extra shuffle would be pure waste).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Repartition iff the DataFrame has fewer partitions than
    ``min_factor ×`` the cluster's default parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
