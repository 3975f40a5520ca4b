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


def bounded_window_key(col):
    """A constant-valued but NON-foldable partition key for windows
    whose input is provably bounded (post-LIMIT top-k ranks, the
    ≤ n_buckets offset rows): the empty string for every row, derived
    from a real column so FoldablePropagation cannot erase it the way
    it erases ``F.lit(1)`` (verified: a literal key is folded out of
    the optimized windowspec and WindowExec still warns "No Partition
    Defined"). With this key the physical partition spec stays
    non-empty — execution is identical (all rows hash to the one
    group), bench tails stay warning-free, and the plan suite can BAN
    genuinely unpartitioned windows outright
    (tests/test_plan_quality.py::test_bounded_windows_carry_literal_partition_key).
    """
    import pyspark.sql.functions as F

    return F.substring(F.coalesce(col.cast("string"), F.lit("")), 1, 0)


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


def bucketed_group_order(
    df: "DataFrame",
    pr_col: str,
    id_col: str,
    group_col: "str | None" = None,
    n_buckets: int = 256,
    sum_col: "str | None" = None,
    rank_col: "str | None" = None,
    cumsum_col: "str | None" = None,
    prune_rank: "int | None" = None,
    prune_sum: "int | None" = None,
    broadcast_offsets: bool = True,
) -> "DataFrame":
    """Bucket-decomposed per-group rank / running sum over the order
    ``(pr_col, id_col)`` — the shared kernel behind ``global_shuffle``,
    ``stratified_sample``, ``mix_schedule``, ``concat_pack`` and
    ``token_budget_threshold``.

    A plain ``Window.partitionBy(group).orderBy(pr, id)`` sorts EVERY
    row of a group in one task: with one dominant source (the 100 TB
    skew case) that is a single-task total sort — the canonical scale
    cliff. This kernel decomposes the total order by a prefix of the
    order key itself: ``bucket = floor(u(pr) * n_buckets)`` where
    ``u(pr)`` maps the 32-hex md5 priority to a uniform [0,1) double
    via its top 60 bits. The mapping is monotone non-decreasing along
    the (pr, id) order (hex-string order is numeric order for fixed
    length; IEEE rounding is monotone), so ordering by
    ``(bucket, pr, id)`` equals ordering by ``(pr, id)`` and per-group
    ranks/cumsums decompose exactly:

    1. one hash-agg of counts (and ``sum_col`` sums) per
       (group, bucket) — ≤ ``n_buckets`` rows per group;
    2. a window over that TINY table gives each bucket its rows-before
       (``_noff``) and sum-before (``_soff``) offsets;
    3. optional prefix prune: with ``prune_rank``/``prune_sum`` set,
       buckets whose offset already meets the cap are dropped BEFORE
       the sort (valid because rank and running sum are monotone along
       the order — the kept set is a prefix);
    4. the offsets broadcast-join back and the exact window runs
       per (group, bucket): ~n/n_buckets rows per sort task instead of
       the whole group. Global rank = ``_noff + row_number``; global
       running sum = ``_soff + in-bucket running sum``.

    Outputs are bit-identical to the naive per-group window, so callers
    keep their oracles verbatim. The group key is carried as a
    single-field struct, which compares null-safely in joins and
    aggregations — NULL-group rows survive the broadcast join exactly
    as they survive ``Window.partitionBy`` (NULL forms its own
    partition). ``pr_col`` must be a 32-hex md5 column already present
    on ``df``.

    Reference motivation: the reference never total-sorts a keyed
    stream — per-key incremental state is its only pattern
    (rt-flink …/app/dws/VisitorStatsApp.scala:177-186); this is the
    batch equivalent with the same no-single-task-hotspot property.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    out_cols = list(df.columns) + [c for c in (rank_col, cumsum_col) if c]
    u = F.conv(F.substring(pr_col, 1, 15), 16, 10).cast("double") / F.lit(float(16**15))
    # Clamp to [0, n_buckets): md5 prefixes within ~2^7 of 2^60 round up
    # to u == 1.0 in double, which would emit the stray bucket id
    # n_buckets. least() is monotone, so the order-decomposition proof
    # is untouched (r7 ADVICE).
    b = df.withColumn(
        "_bkt", F.least(F.floor(u * n_buckets), F.lit(n_buckets - 1)).cast("int")
    )
    gkeys = []
    if group_col is not None:
        b = b.withColumn("_gk", F.struct(F.col(group_col).alias("g")))
        gkeys = ["_gk"]

    aggs = [F.count(F.lit(1)).alias("_bn")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_bs"))
    counts = b.groupBy(*gkeys, "_bkt").agg(*aggs)
    # groupless form: the window spans the <= n_buckets offset rows
    # (bounded by construction); the non-foldable constant key keeps
    # the physical partition spec non-empty (r7 item 6)
    w_off = (
        (Window.partitionBy(*gkeys) if gkeys else Window.partitionBy(bounded_window_key(F.col("_bkt"))))
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_noff")]
    if sum_col is not None:
        off_cols.append(F.coalesce(F.sum("_bs").over(w_off), F.lit(0)).alias("_soff"))
    offsets = counts.select(*gkeys, "_bkt", *off_cols)
    if prune_rank is not None:
        offsets = offsets.filter(F.col("_noff") < prune_rank)
    if prune_sum is not None:
        offsets = offsets.filter(F.col("_soff") < prune_sum)

    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    joined = b.join(offsets, on=gkeys + ["_bkt"], how="inner")
    w_bkt = Window.partitionBy(*gkeys, "_bkt").orderBy(pr_col, id_col)
    out = joined
    if rank_col is not None:
        out = out.withColumn(rank_col, (F.col("_noff") + F.row_number().over(w_bkt)).cast("long"))
    if cumsum_col is not None:
        w_run = w_bkt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(cumsum_col, F.col("_soff") + F.sum(sum_col).over(w_run))
    return out.select(*out_cols)


def key_skew_profile(df: "DataFrame", key_col: str, top_n: int = 20) -> "DataFrame":
    """Key-distribution diagnostics: the top-``top_n`` heaviest values
    of ``key_col`` with their row counts, corpus share, and multiple of
    the mean per-key load — the numbers that DECIDE the scale
    mitigations this module ships (``salted_join`` when skew_x is
    large on a join key, broadcast when n_keys is small, AQE skew
    thresholds otherwise). Output: (rank, key, n_rows, share, n_keys,
    skew_x), rank by count desc with key-string ties ascending —
    deterministic and oracle-comparable.

    Scale shape: one map-side-combinable count aggregate over the key,
    then ``orderBy().limit(top_n)`` — Spark plans that as
    TakeOrderedAndProject (per-partition heaps + a top_n-row merge),
    NEVER a global sort of the key space; totals reduce to one row and
    broadcast back. The only window ranks the ≤ top_n surviving rows.
    NULL keys profile as their own value (often the heaviest skew
    culprit in practice — that is the point of seeing them).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_tot"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc_nulls_first("key")).limit(top_n)
    # ≤ top_n rows; the non-foldable constant key keeps the partition
    # spec non-empty without changing the (bounded) execution (r7 item 6)
    w = Window.partitionBy(bounded_window_key(F.col("n_rows"))).orderBy(
        F.desc("n_rows"), F.asc_nulls_first("key")
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_tot").cast("double")).alias(
                "share"
            ),
            F.col("n_keys").cast("long").alias("n_keys"),
            (
                F.col("n_rows").cast("double")
                / (F.col("_tot").cast("double") / F.col("n_keys").cast("double"))
            ).alias("skew_x"),
        )
    )


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
