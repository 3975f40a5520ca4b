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


# --- property check against pandas.merge_asof (independent oracle) ---

from hypothesis import given, settings, strategies as st  # noqa: E402

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # key
        st.integers(min_value=0, max_value=100_000),  # ts seconds
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(left=_EVENTS, right=_EVENTS)
def test_asof_backward_matches_pandas_merge_asof(spark, left, right):
    import pandas as pd

    def ts(s):
        return datetime.fromtimestamp(s + 1_600_000_000)

    # unique (key, ts) per side: merge_asof's duplicate-ts pick is
    # positional, asof_join's is tiebreak-based — dedup to compare the
    # well-defined core semantics
    lrows = sorted({(k, t) for k, t in left})
    rrows = sorted({(k, t) for k, t in right})
    ldf = spark.createDataFrame([(k, ts(t), f"L{k}-{t}") for k, t in lrows], "k long, lt timestamp, tag string")
    rdf = spark.createDataFrame(
        [(k, ts(t), f"R{k}-{t}", t) for k, t in rrows], "rk long, rt timestamp, v string, pri long"
    )
    got = {
        (r["k"], r["tag"]): r["v"]
        for r in asof_join(
            ldf, rdf, "k", "rk", "lt", "rt", right_payload=["v", "pri"], right_tiebreak="pri"
        ).collect()
    }

    lp = pd.DataFrame([(k, ts(t), f"L{k}-{t}") for k, t in lrows], columns=["k", "lt", "tag"]).sort_values("lt")
    rp = pd.DataFrame([(k, ts(t), f"R{k}-{t}") for k, t in rrows], columns=["k", "rt", "v"]).sort_values("rt")
    merged = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k", direction="backward")
    expect = {
        (row.k, row.tag): (row.v if isinstance(row.v, str) else None) for row in merged.itertuples()
    }
    assert got == expect
