"""asof_join edge semantics: nearest-match selection, exact-ts ties,
null payloads on the nearest row, same-ts tiebreaks, forward direction,
and tolerance cutoffs."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from rt_bigdata_spark.operators.joins import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _run(spark, left_rows, right_rows, **kw):
    left = _mk(spark, left_rows, "k long, lt timestamp, tag string")
    right = _mk(spark, right_rows, "rk long, rt timestamp, v string, pri long")
    defaults = dict(
        left_on="k",
        right_on="rk",
        left_ts="lt",
        right_ts="rt",
        right_payload=["v", "pri"],
        right_tiebreak="pri",
    )
    defaults.update(kw)
    out = asof_join(left, right, **defaults)
    return {(r["k"], r["tag"]): (r["v"], r["pri"]) for r in out.collect()}


def test_backward_picks_latest_at_or_before(spark):
    got = _run(
        spark,
        [(1, _ts("2021-01-01 10:00:00"), "a"), (1, _ts("2021-01-01 12:00:00"), "b"), (2, _ts("2021-01-01 10:00:00"), "c")],
        [(1, _ts("2021-01-01 09:00:00"), "early", 1), (1, _ts("2021-01-01 11:00:00"), "late", 2)],
    )
    assert got[(1, "a")] == ("early", 1)
    assert got[(1, "b")] == ("late", 2)
    assert got[(2, "c")] == (None, None)  # no right rows for key 2 → left join nulls


def test_exact_ts_right_row_matches(spark):
    got = _run(
        spark,
        [(1, _ts("2021-01-01 10:00:00"), "a")],
        [(1, _ts("2021-01-01 10:00:00"), "same", 1)],
    )
    assert got[(1, "a")] == ("same", 1)


def test_null_payload_on_nearest_row_is_kept(spark):
    # The nearest right row has v=NULL; a per-column last(ignorenulls)
    # would wrongly reach past it to "old". The struct fill must not.
    got = _run(
        spark,
        [(1, _ts("2021-01-01 12:00:00"), "a")],
        [(1, _ts("2021-01-01 09:00:00"), "old", 1), (1, _ts("2021-01-01 11:00:00"), None, 2)],
    )
    assert got[(1, "a")] == (None, 2)


def test_same_ts_tiebreak_takes_max(spark):
    got = _run(
        spark,
        [(1, _ts("2021-01-01 10:00:00"), "a")],
        [
            (1, _ts("2021-01-01 09:00:00"), "x", 7),
            (1, _ts("2021-01-01 09:00:00"), "y", 9),
            (1, _ts("2021-01-01 09:00:00"), "z", 8),
        ],
    )
    assert got[(1, "a")] == ("y", 9)


def test_forward_picks_earliest_at_or_after(spark):
    got = _run(
        spark,
        [(1, _ts("2021-01-01 10:00:00"), "a"), (1, _ts("2021-01-01 08:00:00"), "b")],
        [(1, _ts("2021-01-01 09:00:00"), "nine", 1), (1, _ts("2021-01-01 11:00:00"), "eleven", 2)],
        direction="forward",
    )
    assert got[(1, "a")] == ("eleven", 2)
    assert got[(1, "b")] == ("nine", 1)


def test_tolerance_nulls_out_stale_match(spark):
    got = _run(
        spark,
        [(1, _ts("2021-01-01 10:00:00"), "a"), (1, _ts("2021-01-01 10:00:30"), "b")],
        [(1, _ts("2021-01-01 09:59:50"), "fresh", 1)],
        tolerance_seconds=15,
    )
    assert got[(1, "a")] == ("fresh", 1)  # 10 s gap ≤ 15 s
    assert got[(1, "b")] == (None, None)  # 40 s gap > 15 s → nulled

def test_single_shuffle_plan(spark):
    left = _mk(spark, [(1, _ts("2021-01-01 10:00:00"), "a")], "k long, lt timestamp, tag string")
    right = _mk(spark, [(1, _ts("2021-01-01 09:00:00"), "x", 1)], "rk long, rt timestamp, v string, pri long")
    out = asof_join(left, right, "k", "rk", "lt", "rt", ["v", "pri"], right_tiebreak="pri")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # union + one window: no Join node at all in the plan
    assert "Join" not in plan
