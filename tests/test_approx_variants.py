"""The sketch-based 100 TB query variants estimate within tight bounds
of their exact counterparts, and their physical plans drop the
expansion that makes the exact forms shuffle O(rows).

These are the swaps SCALE.md documents next to the measured shuffle
table: exact COUNT(DISTINCT) expands to one row per (group, id) before
the exchange; HLL exchanges fixed-size registers. Exact percentile
materializes each group's values; Greenwald-Khanna keeps a bounded
sketch that merges map-side.

Since r6 the registered specs are the sketches' accuracy AUDITS
(exact deterministic columns + within-tolerance verdicts, all
driver-hashable); these tests pin (a) the raw estimates against the
exact queries, and (b) the plan claim that the PRODUCTION projection —
sketch columns only — prunes the exact expansion entirely.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow


_ensure_loaded()
SF = "/root/testdata/sf0.01"


def _by_key(rows, keys):
    return {tuple(getattr(r, k) for k in keys): r for r in rows}


def _agg_key_lists(plan: str) -> list[str]:
    return [
        line.split("keys=[", 1)[1].split("]", 1)[0]
        for line in plan.splitlines()
        if "HashAggregate" in line and "keys=[" in line
    ]


def test_province_stats_approx_accuracy_and_plan(spark):
    from rt_bigdata_spark.plans.warehouse import _province_stats_approx_full

    exact = _by_key(
        REGISTRY["province_stats"].spark(spark, SF).collect(),
        ("stt", "province_name", "area_name"),
    )
    full = _province_stats_approx_full(spark, SF)
    approx = _by_key(full.collect(), ("stt", "province_name", "area_name"))

    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        # rsd=0.01 → a 3-sigma envelope of 3%; groups here are small
        # enough that HLL is usually dead-on
        assert abs(a.order_count_approx - e.order_count) <= max(3, 0.03 * e.order_count), k
        assert a.order_count == e.order_count, k  # exact column is exact
        assert a.order_amount == e.order_amount, k  # sums unchanged

    # the registered audit: every group's verdict is TRUE at this sf
    # (the oracle asserts the same, so a FALSE is a red driver row)
    audit = REGISTRY["province_stats_approx"].spark(spark, SF)
    assert audit.filter(~F.col("approx_within_rsd")).count() == 0

    # Production form (province_stats_hll): the single pure-HLL
    # aggregate — NO aggregation keyed by the distinct column anywhere
    # in the plan; only fixed-size HLL buffers cross the exchange.
    # (The audit frame above deliberately joins this with the exact
    # aggregate instead of mixing both into one — mixed distinct+HLL
    # pre-aggregates per (group, o_orderkey) carrying the ~13 KB
    # rsd=0.01 HLL buffer per distinct order id: measured 15.9 s vs
    # 1.5 s at sf0.1, the r12 finding.)
    from rt_bigdata_spark.plans.warehouse import province_stats_hll

    prod = province_stats_hll(spark, SF)
    exact_plan = REGISTRY["province_stats"].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    prod_plan = prod._jdf.queryExecution().executedPlan().toString()
    assert any("o_orderkey" in ks for ks in _agg_key_lists(exact_plan))
    assert not any("o_orderkey" in ks for ks in _agg_key_lists(prod_plan))
    # and production values match the audit's approx column
    prod_vals = _by_key(prod.collect(), ("stt", "province_name", "area_name"))
    for k, a in approx.items():
        assert prod_vals[k].order_count_approx == a.order_count_approx, k


def test_corpus_profile_approx_accuracy(spark):
    from rt_bigdata_spark.sources.tables import load_table

    exact = _by_key(REGISTRY["corpus_profile"].spark(spark, SF).collect(), ("source",))

    # raw estimates (the production projection computes only these)
    docs = load_table(spark, SF, "documents")
    raw = _by_key(
        docs.groupBy("source")
        .agg(
            F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("p50_chars"),
            F.percentile_approx("n_chars", F.lit(0.95), F.lit(10000)).alias("p95_chars"),
            F.approx_count_distinct("lang").cast("long").alias("n_langs"),
        )
        .collect(),
        ("source",),
    )
    assert set(exact) == set(raw)
    for k, e in exact.items():
        a = raw[k]
        # GK returns an actual group element while exact interpolates
        # between two, so even a perfect sketch lands one element off —
        # 5% covers the interpolation gap at these group sizes
        assert a.p50_chars == pytest.approx(e.p50_chars, rel=0.05), k
        assert a.p95_chars == pytest.approx(e.p95_chars, rel=0.05), k
        assert abs(a.n_langs - e.n_langs) <= max(1, 0.05 * e.n_langs), k

    # the registered audit: deterministic columns exact, verdicts TRUE
    audit = _by_key(REGISTRY["corpus_profile_approx"].spark(spark, SF).collect(), ("source",))
    assert set(audit) == set(exact)
    for k, e in exact.items():
        r = audit[k]
        assert r.n_docs == e.n_docs and r.total_chars == e.total_chars, k
        assert r.n_langs == e.n_langs, k
        assert r.p50_within_tol and r.p95_within_tol and r.n_langs_within_tol, k


def test_active_users_hll_accuracy_and_no_user_explode(spark):
    """The HLL swap for the ×N activity expansion (r6 verdict item 4):
    per-day estimates within the documented envelope of the exact
    rolling distincts, and the PRODUCTION operator's plan fans out
    only the O(days) sketch table — no explode ever touches
    per-(user, day) rows."""
    import contextlib
    import io

    from rt_bigdata_spark.operators.behavior import active_users, active_users_hll
    from rt_bigdata_spark.sources.tables import load_table

    events = load_table(spark, SF, "events")
    exact = {r.day: r for r in active_users(events, window_days=7).collect()}
    approx_df = active_users_hll(events, window_days=7)
    approx = {r.day: r for r in approx_df.collect()}

    assert set(exact) == set(approx) and len(exact) > 0
    for day, e in exact.items():
        a = approx[day]
        assert abs(a.dau_approx - e.dau) <= max(2, 0.05 * e.dau), day
        assert abs(a.wau_approx - e.wau) <= max(2, 0.05 * e.wau), day

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx_df.explain(mode="formatted")
    plan = buf.getvalue()
    # exactly one Generate in the executed (final) plan tree: the
    # days-scale window fan-out only (AQE re-prints the initial plan
    # with different node ids — slice it off)
    final_tree = plan.split("== Initial Plan ==")[0]
    assert final_tree.count("Generate") == 1, final_tree
    assert "hll_union_agg" in plan and "hll_sketch_agg" in plan
    # the only explode input is the daily-sketch aggregate, so no
    # user-id column may appear in any Generate node's detail block
    import re

    gen_blocks = [b for b in plan.split("\n\n") if re.match(r"\(\d+\) Generate", b)]
    assert gen_blocks and all("user_id" not in b for b in gen_blocks), gen_blocks

    # the registered audit: every verdict TRUE at this sf
    audit = REGISTRY["active_users_hll"].spark(spark, SF).collect()
    assert audit and all(r.dau_within_tol and r.wau_within_tol for r in audit)
