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
