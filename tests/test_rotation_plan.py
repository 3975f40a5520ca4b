"""Pin the rotation planner to the staleness ratchet it exists to
serve (r10 verdict item 2: the planner had an off-by-one — it
pre-credited the current window with a green and started planning at
next_round + 1, so its first printed plan was never the round whose
dues tests/test_registry_window.py::test_stale_specs_cycle_back_into_window
actually enforces). These tests make the two computations structurally
inseparable on the committed artifacts: the planner's FIRST plan must
be for the exact round the ratchet evaluates, and its DUE set must
equal the ratchet's overdue set."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from rotation_plan import history, plan_rounds  # noqa: E402

from rt_bigdata_spark.plans.registry import REGISTRY, get_queries
from tests.test_registry_window import (
    DRIVER_WINDOW,
    STALENESS_BOUND_ROUNDS,
    _last_green_rounds,
)


def _ratchet_overdue() -> tuple[list[str], int]:
    """The EXACT computation test_stale_specs_cycle_back_into_window
    asserts empty, reproduced from its own helpers."""
    last, current_round = _last_green_rounds()
    window = set(list(get_queries())[:DRIVER_WINDOW])
    overdue = sorted(
        s.name
        for s in REGISTRY.values()
        if s.oracle is not None
        and s.name in last
        and current_round - last[s.name] > STALENESS_BOUND_ROUNDS
        and s.name not in window
    )
    return overdue, current_round


def test_planner_first_plan_is_the_enforced_round():
    """plan_rounds()[0] must target history()'s next_round, which must
    equal the ratchet's current_round — the round the current window
    will be driver-verified in."""
    _, _, next_round = history()
    _, current_round = _ratchet_overdue()
    plans = plan_rounds(STALENESS_BOUND_ROUNDS, rounds=1)
    assert plans[0]["round"] == next_round == current_round


def test_planner_due_set_equals_ratchet_overdue_set():
    """The planner's round-N DUE list and the test's round-N overdue
    list are the same set on the same committed artifacts — if the
    ratchet would fail, the planner surfaces exactly the specs to pull
    back; if the rotation landed (ratchet green), the planner's first
    DUE list is empty too."""
    overdue, _ = _ratchet_overdue()
    plans = plan_rounds(STALENESS_BOUND_ROUNDS, rounds=1)
    assert plans[0]["due"] == overdue


def test_planner_simulation_credits_window_only_after_first_round():
    """Regression pin for the off-by-one itself: the first plan must
    NOT pre-credit the current window. A window member whose committed
    last green makes it overdue at next_round would (correctly) never
    appear in DUE (it's in-window), but an OUT-of-window overdue spec
    must appear in plan[0], not plan[1]. We verify via the r12 preview:
    every spec in plan[1]'s DUE has committed age == bound+1 at round
    next_round+1 (i.e. freshly due), none carried over from plan[0]."""
    last, _, next_round = history()
    plans = plan_rounds(STALENESS_BOUND_ROUNDS, rounds=2)
    carried = set(plans[0]["due"]) & set(plans[1]["due"])
    assert not carried, f"plan[1] re-lists plan[0] dues (simulation broken): {carried}"
    for name in plans[1]["due"]:
        age = (next_round + 1) - last[name]
        assert age == STALENESS_BOUND_ROUNDS + 1, (
            f"{name} in round-{next_round + 1} DUE with committed age {age}; "
            "expected freshly-due (bound+1) — pre-credit off-by-one is back"
        )
