"""Unit tests for the round-5 third batch: funnel / cohort behavior
analytics (operators/behavior.py) and the text→vector bridge
(hashed_doc_embedding, random_projection). Oracle parity for the
registered queries is covered by test_oracle_parity.py; these pin the
operator semantics on hand-built fixtures.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from rt_bigdata_spark.operators.behavior import cohort_retention, funnel_stages
from rt_bigdata_spark.operators.similarity import lcg_planes, random_projection
from rt_bigdata_spark.operators.text_analysis import hashed_doc_embedding
from tests.conftest import SF_DIR


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture()
def funnel_events(spark):
    rows = [
        # u1: full ordered funnel
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: click BEFORE first view — click must not count; stage 1
        (2, _ts(2), "click"), (2, _ts(3), "view"),
        # u3: same-timestamp progression counts (inclusive >=)
        (3, _ts(5), "view"), (3, _ts(5), "click"), (3, _ts(5), "purchase"),
        # u4: purchase before click — stage 2 only
        (4, _ts(1), "view"), (4, _ts(2), "purchase"), (4, _ts(3), "click"),
        # u5: no funnel event at all
        (5, _ts(1), "error"),
        # NULL user: excluded entirely (a window would pool NULLs into
        # one pseudo-user; any join-based SQL rewrite drops them —
        # there is no consistent cross-engine answer, so neither emits)
        (None, _ts(1), "view"), (None, _ts(2), "click"),
    ]
    return spark.createDataFrame(rows, "user_id: long, ts: timestamp, event_type: string")


def test_funnel_order_and_tie_semantics(funnel_events):
    out = {r.user_id: r.funnel_stage for r in
           funnel_stages(funnel_events, ("view", "click", "purchase")).collect()}
    assert out == {1: 3, 2: 1, 3: 3, 4: 2, 5: 0}


def test_funnel_single_exchange_plan(funnel_events):
    """The chained conditional window MINs must share one user-key
    Exchange — the whole point of the window formulation over
    per-step aggregate+join."""
    import contextlib
    import io

    df = funnel_stages(funnel_events, ("view", "click", "purchase"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    # one user-key hash exchange feeds all three windows + the final
    # agg (ensure_parallelism may add a round-robin exchange below it)
    assert p.count("hashpartitioning") <= 2, p
    assert "Join" not in p, p


def test_cohort_retention_matrix(spark):
    rows = [
        (1, _ts(1)), (1, _ts(10)),   # cohort wk of Jan 1; active offsets 0 and 1
        (2, _ts(10)), (2, _ts(24)),  # cohort wk of Jan 8; offsets 0 and 2
        (3, _ts(1)),                 # cohort wk of Jan 1; offset 0 only
        (None, _ts(1)),              # NULL user: excluded
    ]
    ev = spark.createDataFrame(rows, "user_id: long, ts: timestamp")
    out = {(r.cohort_week.date(), r.week_offset): r.active_users
           for r in cohort_retention(ev).collect()}
    assert out == {
        (dt.date(2024, 1, 1), 0): 2,
        (dt.date(2024, 1, 1), 1): 1,
        (dt.date(2024, 1, 8), 0): 1,
        (dt.date(2024, 1, 8), 2): 1,
    }


def test_hashed_doc_embedding_unit_norm_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma"), (3, None)],
        "doc_id: long, text: string",
    )
    out = hashed_doc_embedding(docs, dim=8)
    rows = out.collect()
    assert all(r.doc_id != 3 for r in rows)  # null text -> no tokens -> no rows
    by_doc: dict[int, float] = {}
    for r in rows:
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0.0) + r.weight * r.weight
    for doc, sq in by_doc.items():
        assert math.isclose(sq, 1.0, rel_tol=1e-6), (doc, sq)
    again = hashed_doc_embedding(docs.repartition(5), dim=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_random_projection_matches_manual_dot(spark):
    vec = [float(i % 5 - 2) for i in range(64)]
    df = spark.createDataFrame([(1, vec)], "vec_id: long, embedding: array<float>")
    out = {r.dim: r.val for r in random_projection(df, out_dim=4, seed=7).collect()}
    planes = lcg_planes(4, 64, 7)
    import struct as _struct

    f32 = [  # the operator casts float32 inputs to double — mirror that
        _struct.unpack("f", _struct.pack("f", x))[0] for x in vec
    ]
    for j, plane in enumerate(planes):
        acc = 0.0
        for x, p in zip(f32, plane):
            acc += x * p
        assert out[j] == round(acc, 9), j


def test_cms_overestimates_never_under(spark):
    """CMS contract: est ≥ true for EVERY token (min of per-row
    counters can collide upward, never down), and each sketch row's
    counters sum to the total token count (the grid is a partition of
    the stream per row)."""
    from rt_bigdata_spark.operators.sketches import cms_build, cms_heavy_hitters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = cms_heavy_hitters(docs, threshold_frac=0.0, depth=4, width=64).collect()
    assert out, "threshold 0 must return every distinct token"
    assert all(r.est_count >= r.true_count for r in out)
    grid = cms_build(docs, depth=4, width=64)
    row_sums = {sum(row) for row in grid}
    assert len(row_sums) == 1  # every row counts the same stream


def test_cms_candidate_mode_and_depth_one(spark):
    """Production mode: a bounded candidate set is estimated against
    the grid with no truth column and no vocabulary aggregate; the
    depth=1 configuration (single sketch row) must also build."""
    from rt_bigdata_spark.operators.sketches import cms_heavy_hitters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cand = spark.createDataFrame([("hash",), ("join",), ("zzz_absent",)], "tok: string")
    out = cms_heavy_hitters(docs, threshold_frac=0.0, depth=4, width=64, candidates=cand)
    rows = {r.token: r.est_count for r in out.collect()}
    assert out.columns == ["token", "est_count"]
    assert rows["hash"] > 0 and rows["join"] > 0
    # full verification run agrees with the candidate-mode estimates
    full = {r.token: r.est_count
            for r in cms_heavy_hitters(docs, threshold_frac=0.0, depth=4, width=64).collect()}
    assert rows["hash"] == full["hash"] and rows["join"] == full["join"]
    d1 = cms_heavy_hitters(docs, threshold_frac=0.0, depth=1, width=64, candidates=cand)
    assert {r.token for r in d1.collect()} >= {"hash", "join"}


def test_similar_activity_topk_hand_fixture(spark):
    """Integer-exact Pearson over bucketed series on a hand-computable
    fixture (4 buckets over a 40 s span): a user with the probe's exact
    shape scores r=1.0, the inverted shape r=-1.0, and a FLAT user
    (zero variance — Pearson undefined) is excluded entirely."""
    import datetime as dt

    from rt_bigdata_spark.operators.behavior import activity_buckets, similar_activity_topk

    def at(sec: int) -> dt.datetime:
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    rows = []
    # probe user 0: counts per quarter [3, 1, 2, 0]
    for s in (1, 2, 3, 11, 21, 22):
        rows.append((0, at(s)))
    # user 10: same shape → r = 1.0
    for s in (4, 5, 6, 12, 23, 24):
        rows.append((10, at(s)))
    # user 11: inverted shape [0, 2, 1, 3] → r = -1.0
    for s in (13, 14, 25, 31, 32, 33):
        rows.append((11, at(s)))
    # user 12: flat [2, 2, 2, 2] → excluded; also pins the global span
    for s in (0, 5, 10, 15, 20, 25, 30, 39):
        rows.append((12, at(s)))
    ev = spark.createDataFrame(rows, "user_id: long, ts: timestamp")

    mat = {
        (r.user_id, r.bucket): r.c
        for r in activity_buckets(ev, n_buckets=4).collect()
    }
    assert [mat.get((0, b), 0) for b in range(4)] == [3, 1, 2, 0]
    assert [mat.get((12, b), 0) for b in range(4)] == [2, 2, 2, 2]

    out = similar_activity_topk(ev, k=3, n_buckets=4, probe_ids_below=5)
    got = [(r.neighbor_id, r.sim, r.rk) for r in out.orderBy("rk").collect()]
    # flat user 12 is ineligible; only two neighbors remain
    assert got == [(10, 1.0, 1), (11, -1.0, 2)]
