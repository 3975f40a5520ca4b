"""scd2_from_changes: version intervals, same-ts last-writer-wins,
is_current flag, and the one-shuffle-one-sort plan shape."""

from __future__ import annotations

from datetime import datetime

from rt_bigdata_spark.operators.scd import scd2_from_changes


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _build(spark, rows):
    df = spark.createDataFrame(rows, "k long, ts timestamp, seq long, attr string")
    return scd2_from_changes(df, keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])


def test_versions_chain_and_current_flag(spark):
    out = _build(
        spark,
        [
            (1, _ts("2021-01-01 00:00:00"), 1, "v1"),
            (1, _ts("2021-01-02 00:00:00"), 2, "v2"),
            (1, _ts("2021-01-03 00:00:00"), 3, "v3"),
        ],
    ).orderBy("valid_from").collect()
    assert [r["attr"] for r in out] == ["v1", "v2", "v3"]
    assert out[0]["valid_to"] == out[1]["valid_from"] == _ts("2021-01-02 00:00:00")
    assert out[1]["valid_to"] == out[2]["valid_from"] == _ts("2021-01-03 00:00:00")
    assert [r["is_current"] for r in out] == [False, False, True]
    # open-version sentinel: bounded (2200) so results survive pandas
    # datetime64[ns] conversion (max 2262) — the driver hashes via pandas
    assert out[2]["valid_to"].year == 2200


def test_same_ts_last_writer_wins(spark):
    out = _build(
        spark,
        [
            (1, _ts("2021-01-01 00:00:00"), 1, "first"),
            (1, _ts("2021-01-01 00:00:00"), 3, "winner"),
            (1, _ts("2021-01-01 00:00:00"), 2, "middle"),
        ],
    ).collect()
    assert len(out) == 1
    assert out[0]["attr"] == "winner" and out[0]["is_current"]


def test_keys_are_independent(spark):
    out = _build(
        spark,
        [
            (1, _ts("2021-01-01 00:00:00"), 1, "a1"),
            (2, _ts("2021-01-05 00:00:00"), 2, "b1"),
        ],
    ).collect()
    by_key = {r["k"]: r for r in out}
    assert by_key[1]["is_current"] and by_key[2]["is_current"]


def test_single_exchange_and_sort(spark):
    df = spark.createDataFrame(
        [(1, _ts("2021-01-01 00:00:00"), 1, "x")], "k long, ts timestamp, seq long, attr string"
    )
    out = scd2_from_changes(df, keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])
    out.collect()
    # AdaptiveSparkPlan.toString() prints Final Plan AND Initial Plan;
    # count only the executed (final) section
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # the dedup filter preserves (k)-partitioning and (ts, seq) order,
    # so the second window adds NO new Exchange or Sort
    assert plan.count("Exchange") <= 1, plan
    assert plan.count("Sort ") <= 1, plan


def test_scd2_merge_equals_full_rebuild(spark):
    """Equivalence contract: merging a later batch into a built table
    is indistinguishable from rebuilding from the union."""
    from rt_bigdata_spark.operators.scd import scd2_from_changes, scd2_merge

    c1 = [
        (1, _ts("2021-01-01 00:00:00"), 1, "a1"),
        (1, _ts("2021-01-03 00:00:00"), 2, "a2"),
        (2, _ts("2021-01-02 00:00:00"), 3, "b1"),
        (3, _ts("2021-01-01 00:00:00"), 4, "c1"),  # untouched by batch 2
    ]
    c2 = [
        (1, _ts("2021-01-05 00:00:00"), 5, "a3"),
        (2, _ts("2021-01-04 00:00:00"), 6, "b2"),
    ]
    schema = "k long, ts timestamp, seq long, attr string"
    kw = dict(keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])
    built = scd2_from_changes(spark.createDataFrame(c1, schema), **kw)
    merged = scd2_merge(built, spark.createDataFrame(c2, schema), **kw)
    full = scd2_from_changes(spark.createDataFrame(c1 + c2, schema), **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_scd2_merge_late_change_splices_history(spark):
    """A LATE change (older than the key's current version) must splice
    a correct interval into the middle of history, not append."""
    from rt_bigdata_spark.operators.scd import scd2_from_changes, scd2_merge

    schema = "k long, ts timestamp, seq long, attr string"
    kw = dict(keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])
    built = scd2_from_changes(
        spark.createDataFrame(
            [(1, _ts("2021-01-01 00:00:00"), 1, "v1"), (1, _ts("2021-01-10 00:00:00"), 2, "v3")],
            schema,
        ),
        **kw,
    )
    late = spark.createDataFrame([(1, _ts("2021-01-05 00:00:00"), 3, "v2")], schema)
    out = sorted(scd2_merge(built, late, **kw).collect(), key=lambda r: r.valid_from)
    assert [r.attr for r in out] == ["v1", "v2", "v3"]
    assert out[0].valid_to == out[1].valid_from == _ts("2021-01-05 00:00:00")
    assert out[1].valid_to == out[2].valid_from == _ts("2021-01-10 00:00:00")
    assert [r.is_current for r in out] == [False, False, True]


def test_scd2_merge_same_ts_new_batch_wins(spark):
    """(key, ts) collision between an existing version and a new
    change: the new batch wins (upsert redelivery parity)."""
    from rt_bigdata_spark.operators.scd import scd2_from_changes, scd2_merge

    schema = "k long, ts timestamp, seq long, attr string"
    kw = dict(keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])
    built = scd2_from_changes(
        spark.createDataFrame([(1, _ts("2021-01-01 00:00:00"), 9, "old")], schema), **kw
    )
    redelivered = spark.createDataFrame([(1, _ts("2021-01-01 00:00:00"), 1, "new")], schema)
    out = scd2_merge(built, redelivered, **kw).collect()
    assert len(out) == 1 and out[0].attr == "new" and out[0].is_current


def test_scd2_merge_untouched_keys_pass_through(spark):
    from rt_bigdata_spark.operators.scd import scd2_from_changes, scd2_merge

    schema = "k long, ts timestamp, seq long, attr string"
    kw = dict(keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])
    built = scd2_from_changes(
        spark.createDataFrame(
            [(1, _ts("2021-01-01 00:00:00"), 1, "a"), (2, _ts("2021-01-01 00:00:00"), 2, "b")],
            schema,
        ),
        **kw,
    )
    batch = spark.createDataFrame([(2, _ts("2021-01-02 00:00:00"), 3, "b2")], schema)
    out = scd2_merge(built, batch, **kw)
    k1 = [r for r in out.collect() if r.k == 1]
    assert len(k1) == 1 and k1[0].attr == "a" and k1[0].is_current
