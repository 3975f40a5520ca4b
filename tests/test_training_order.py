"""Training-order operators: deterministic global shuffle (bucketed
contiguous positions) and stride-scheduled source interleaving."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from rt_bigdata_spark.operators.sampling import global_shuffle, mix_schedule


def test_global_shuffle_positions_are_a_contiguous_permutation(spark):
    df = spark.range(1, 501).withColumnRenamed("id", "doc_id")
    out = global_shuffle(df, seed="7").collect()
    positions = sorted(r.position for r in out)
    assert positions == list(range(1, 501))  # contiguous, 1-based, no dups
    # matches the naive single-window definition exactly
    naive = {
        r.doc_id: r.position
        for r in df.select(
            "doc_id",
            F.row_number()
            .over(
                Window.orderBy(
                    F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string"))), "doc_id"
                )
            )
            .cast("long")
            .alias("position"),
        ).collect()
    }
    assert {r.doc_id: r.position for r in out} == naive


def test_global_shuffle_seed_changes_permutation_deterministically(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.position for r in global_shuffle(df, seed="a").collect()}
    a2 = {r.doc_id: r.position for r in global_shuffle(df, seed="a").collect()}
    b = {r.doc_id: r.position for r in global_shuffle(df, seed="b").collect()}
    assert a == a2  # reproducible
    assert a != b  # seed actually permutes


def test_mix_schedule_respects_weights_at_every_horizon(spark):
    rows = [(i, "heavy" if i % 2 == 0 else "light", f"doc {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    out = mix_schedule(df, {"heavy": 3.0}, default_weight=1.0).collect()
    ordered = sorted(out, key=lambda r: (r.sched_key, r.source, r.src_rank))
    # in any prefix, heavy (weight 3) appears ~3x as often as light
    prefix = ordered[:40]
    heavy = sum(1 for r in prefix if r.source == "heavy")
    assert 27 <= heavy <= 33  # 3:1 stride => 30 of 40, +/- boundary effects
    # per-source ranks are dense permutations
    for src in ("heavy", "light"):
        ranks = sorted(r.src_rank for r in out if r.source == src)
        assert ranks == list(range(1, 101))


def test_mix_schedule_and_stratified_null_groups_survive(spark):
    """Null-safety of the bucket kernel's broadcast offsets join: a
    NULL source is its own stratum/stride group, exactly as the naive
    Window.partitionBy treats its NULL partition."""
    from rt_bigdata_spark.operators.sampling import stratified_sample

    rows = [(i, None if i % 2 else "s", f"doc {i} text w{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")

    sched = mix_schedule(df, {"s": 2.0}).collect()
    assert {r.doc_id for r in sched} == set(range(20))
    null_ranks = sorted(r.src_rank for r in sched if r.source is None)
    assert null_ranks == list(range(1, 11))  # contiguous per-group ranks

    samp = stratified_sample(df, 3, seed="1").collect()
    by_group = {}
    for r in samp:
        by_group.setdefault(r.source, []).append(r.sample_rank)
    assert sorted(by_group[None]) == [1, 2, 3]
    assert sorted(by_group["s"]) == [1, 2, 3]
