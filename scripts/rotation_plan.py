"""Driver-window rotation planner (mechanizes r9 verdict item 2's
process for every future round).

The correctness driver verifies the FIRST 50 entries of queries();
tests/test_registry_window.py enforces (a) never-green specs must be
in the window, (b) no spec's last driver-green may age beyond
STALENESS_BOUND_ROUNDS without cycling back, (c) the priority<=50
budget is exactly 50. Satisfying all three each round is a small
scheduling problem — this script solves it from the committed
CORRECTNESS_r*.json artifacts and prints the edit list:

    python scripts/rotation_plan.py            # plan for the NEXT round
    python scripts/rotation_plan.py --rounds 2 # also preview the round after

Output per round:
  - DUE: specs whose last green will exceed the staleness bound —
    set priority=40 (pull back through the window)
  - YIELD CANDIDATES: in-window specs with the most greens (newest
    last) — set priority=80 for as many as DUE + NEW require
  - headroom arithmetic so the budget test stays exactly spent

Pure stdlib + registry import; runs in seconds, no Spark session.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rt_bigdata_spark.plans.registry import REGISTRY, get_queries  # noqa: E402

ROOT = Path(__file__).resolve().parents[1]


def history() -> tuple[dict[str, int], dict[str, int], int]:
    """(last_green_round, green_count) per spec + next round number,
    counting only non-vacuous hash-green driver rows (the same rule as
    tests/test_registry_window.py)."""
    last: dict[str, int] = {}
    greens: dict[str, int] = {}
    max_round = 0
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.stem).group(1))
        max_round = max(max_round, rnd)
        for name, row in json.loads(f.read_text()).items():
            ok = (
                row.get("err") is None
                and row.get("hash_match")
                and (row.get("spark_rows") or 0) > 0
            )
            if ok:
                last[name] = rnd
                greens[name] = greens.get(name, 0) + 1
    return last, greens, max_round + 1


def plan_rounds(bound: int, rounds: int = 1) -> list[dict]:
    """Plan the NEXT round first (k=0) from the committed artifacts
    with NO pre-credit — round `next_round` is exactly the round
    tests/test_registry_window.py::test_stale_specs_cycle_back_into_window
    enforces on the same on-disk history, so plan[0]["due"] must equal
    that test's overdue set by construction (pinned by
    tests/test_rotation_plan.py). Only rounds AFTER the first credit
    the window with a green (the window is verified each round)."""
    last, greens, next_round = history()
    window = list(get_queries())[:50]
    window_set = set(window)
    oracle_backed = {s.name for s in REGISTRY.values() if s.oracle is not None}

    sim_last = dict(last)
    plans: list[dict] = []
    for k in range(rounds):
        rnd = next_round + k
        due = sorted(
            n for n in oracle_backed
            if n in sim_last and rnd - sim_last[n] > bound and n not in window_set
        )
        never = sorted(n for n in oracle_backed if n not in sim_last and n not in window_set)
        yielders = sorted(
            (n for n in window_set if greens.get(n, 0) + 1 >= 3),
            key=lambda n: -(greens.get(n, 0)),
        )
        plans.append({"round": rnd, "due": due, "never": never, "yielders": yielders})
        # Roll the simulation forward AFTER planning this round: the
        # current window greens at rnd, and the due/never specs are
        # assumed pulled in and green too.
        for n in window_set:
            sim_last[n] = rnd
        for n in due + never:
            sim_last[n] = rnd
    return plans


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=1, help="how many future rounds to plan")
    ap.add_argument("--bound", type=int, default=None,
                    help="staleness bound (default: the test's STALENESS_BOUND_ROUNDS)")
    args = ap.parse_args()

    if args.bound is None:
        from tests.test_registry_window import STALENESS_BOUND_ROUNDS as bound
    else:
        bound = args.bound

    for k, p in enumerate(plan_rounds(bound, args.rounds)):
        due, never, yielders = p["due"], p["never"], p["yielders"]
        print(f"== plan for round {p['round']} (staleness bound {bound}) ==")
        print(f"DUE ({len(due)}): pull back at priority=40: {due or '—'}")
        if never:
            print(f"NEVER-GREEN ({len(never)}): MUST enter at priority<=40: {never}")
        need = len(due) + len(never)
        print(f"YIELD {need} of these (most greens first, priority=80): "
              f"{yielders[:max(need, 0)] or '—'}")
        if k == 0 and args.rounds > 1:
            print("(later rounds: DUE lists are exact under the green-everything "
                  "assumption; YIELD lists are indicative only — the window "
                  "composition changes each round)")
        print()


if __name__ == "__main__":
    main()
