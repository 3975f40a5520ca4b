"""The sketch-based 100 TB query variants estimate within tight bounds
of their exact counterparts, and their physical plans drop the
expansion that makes the exact forms shuffle O(rows).

These are the swaps SCALE.md documents next to the measured shuffle
table: exact COUNT(DISTINCT) expands to one row per (group, id) before
the exchange; HLL exchanges fixed-size registers. Exact percentile
materializes each group's values; Greenwald-Khanna keeps a bounded
sketch that merges map-side.
"""

from __future__ import annotations

import pytest

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.01"


def _by_key(rows, keys):
    return {tuple(getattr(r, k) for k in keys): r for r in rows}


def test_province_stats_approx_accuracy_and_plan(spark):
    exact = _by_key(
        REGISTRY["province_stats"].spark(spark, SF).collect(),
        ("stt", "province_name", "area_name"),
    )
    approx_df = REGISTRY["province_stats_approx"].spark(spark, SF)
    approx = _by_key(approx_df.collect(), ("stt", "province_name", "area_name"))

    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        # rsd=0.01 → a 3-sigma envelope of 3%; groups here are small
        # enough that HLL is usually dead-on
        assert abs(a.order_count - e.order_count) <= max(3, 0.03 * e.order_count), k
        assert a.order_amount == e.order_amount, k  # sums unchanged

    # the exact form's first aggregation phase keys by the DISTINCT
    # column itself — every order id crosses the exchange; the sketch
    # form's aggregate keys never include it (only fixed-size HLL
    # buffers are exchanged) — that's the whole point
    exact_plan = REGISTRY["province_stats"].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx_df._jdf.queryExecution().executedPlan().toString()

    def agg_key_lists(plan: str) -> list[str]:
        return [
            line.split("keys=[", 1)[1].split("]", 1)[0]
            for line in plan.splitlines()
            if "HashAggregate" in line and "keys=[" in line
        ]

    assert any("o_orderkey" in ks for ks in agg_key_lists(exact_plan))
    assert not any("o_orderkey" in ks for ks in agg_key_lists(approx_plan))


def test_corpus_profile_approx_accuracy(spark):
    exact = _by_key(REGISTRY["corpus_profile"].spark(spark, SF).collect(), ("source",))
    approx = _by_key(REGISTRY["corpus_profile_approx"].spark(spark, SF).collect(), ("source",))

    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert a.n_docs == e.n_docs and a.total_chars == e.total_chars, k
        # GK returns an actual group element while exact interpolates
        # between two, so even a perfect sketch lands one element off —
        # 5% covers the interpolation gap at these group sizes
        assert a.p50_chars == pytest.approx(e.p50_chars, rel=0.05), k
        assert a.p95_chars == pytest.approx(e.p95_chars, rel=0.05), k
        assert abs(a.n_langs - e.n_langs) <= max(1, 0.05 * e.n_langs), k
