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
    ``min_factor ×`` the cluster's default parallelism.

    Streaming DataFrames pass through untouched: the partition probe
    (`df.rdd`) is an eager action that streaming plans forbid, and
    micro-batch parallelism is governed by the source's own options
    (maxFilesPerTrigger, minPartitions) — so the batch-only widening
    simply doesn't apply. This keeps every operator that calls it
    usable verbatim on streams (the batch=stream contract)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df


def salted_join(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> "DataFrame":
    """Equi-join with key salting for skewed keys.

    The standard fix when one join key carries a disproportionate share
    of rows and a plain shuffle join stalls on the hot partition: the
    LEFT (large, skewed) side gets a random salt in [0, buckets); the
    RIGHT side is replicated once per salt value (explode of a literal
    range — right should be the smaller side). The join key becomes
    (key, salt), spreading the hot key over ``salt_buckets`` tasks.

    AQE's skew-join split (enabled in the session defaults) handles
    most cases automatically; this operator is for the residual ones —
    deterministic-partition requirements, or skew AQE can't see
    (first-stage joins with no runtime stats yet).
    """
    import pyspark.sql.functions as F

    salted_l = left.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_l.join(salted_r, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: "DataFrame",
    table: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    The co-located-join primitive for repeated fact⋈fact joins (the
    order_wide case in SCALE.md): both sides bucketed on their join key
    with the same bucket count hash-partition the data AT WRITE TIME, so
    every later join/aggregation on that key is exchange-free — Spark
    reads matching buckets task-aligned instead of shuffling 100 TB per
    query. ``sortBy`` pre-sorts within buckets, but note Spark only
    elides the SMJ sort when each bucket is a single file — with
    multi-partition input every task writes its own file per bucket, so
    the per-task sort still runs (verified: Sort nodes present on both
    sides of the bucketed order⋈lineitem plan; only the Exchange is
    eliminated, which is the dominant saving). Compact each bucket to
    one file (coalesce/AQE rebalance before write) to also skip the
    sort. Asserted exchange-free in
    tests/test_plan_quality.py::test_bucketed_join_is_exchange_free.

    This is the Spark-native replacement for the reference's
    partition-aligned parallelism (keyBy into RocksDB state,
    rt-flink …/app/dwd/OdsBaseLogApp.scala:39): alignment is a property
    of the stored table, not of a running job.
    """
    writer = df.write.mode("overwrite").format(fmt).bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def compact_small_files(
    df: "DataFrame",
    target_files: int,
    path: str,
    fmt: str = "parquet",
    partition_by: "list[str] | None" = None,
) -> None:
    """Small-file compaction: rewrite an input as ``target_files``
    right-sized files (reference parity: the commented Spark util at
    rt-flink …/common/CommonTool.scala:168-244 — union + repartition +
    overwrite partition).

    ``coalesce`` when shrinking (no shuffle — merges map-side),
    ``repartition`` when growing (needs the shuffle to split). At
    100 TB run this per partition directory, not globally.
    """
    n = df.rdd.getNumPartitions()
    out = df.coalesce(target_files) if target_files < n else df.repartition(target_files)
    writer = out.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def zorder_value(cols: "list", bits: int = 16) -> "object":
    """Z-order (Morton) interleave of non-negative int columns, as a
    pure JVM-side expression: bit i of column j lands at position
    ``i*ncols + j`` of the z-value. Callers scale/clamp each column
    into [0, 2^bits) first (rank or min-max); 16 bits × 2 cols fits a
    long with room to spare.
    """
    import pyspark.sql.functions as F

    ncols = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cc = c.cast("long")
        for i in range(bits):
            z = z + (F.shiftleft(F.shiftrightunsigned(cc, i) % 2, i * ncols + j)).cast("long")
    return z


def write_zordered(
    df: "DataFrame",
    cols: "list[str]",
    path: str,
    num_files: int = 32,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols`` so that later
    scans filtering on ANY subset of those columns prune files via
    parquet min/max statistics.

    Why this matters at 100 TB: sorting by a single key prunes filters
    on THAT key only — a filter on the second column reads every file.
    Z-order interleaving makes each file cover a small hyper-box of the
    key space, bounding the WORST case across filter dimensions:
    measured on lineitem (sf0.01, 32 files, 10% ranges), a second-
    column filter reads 10/32 files under z-order vs 32/32 under
    single-key layout; the trade is coarser single-column resolution
    (a first-column filter reads 19/32 vs 4/32 under its dedicated
    sort — interleaving halves per-dimension bits). Choose z-order
    when queries filter on different column subsets; keep a dedicated
    sort when one column dominates. ``repartitionByRange`` on the
    z-value gives contiguous, balanced z-ranges per file; the
    within-partition sort tightens per-row-group stats.
    """
    import pyspark.sql.functions as F

    zcols = [F.col(c) for c in cols]
    out = (
        df.withColumn("_z", zorder_value(zcols, bits))
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode("overwrite").format(fmt).save(path)
