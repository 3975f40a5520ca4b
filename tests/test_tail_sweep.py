"""Tripwire over the committed full-registry timing sweeps
(``scripts/tail_sweep.py`` → ``TAIL_SWEEP_r{N}.json``): any spec that
got >2× slower between the two most recent sweeps — AFTER dividing out
the uniform container-load drift — fails the build until adjudicated
(r13 verdict item 4; the r12 one-off sweep caught two winnow O(n²)
plans exactly this way)."""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

# A spec may legitimately get slower (deliberately heavier parameters,
# a correctness fix that adds work). Adjudicate by listing it here with
# the round pair and reason — the tripwire then skips it for that pair.
ADJUDICATED: dict[tuple[int, int, str], str] = {
    # (prev_round, new_round, spec): "reason" — e.g.
    # (14, 15, "some_spec"): "param N deliberately doubled; plan shape
    # unchanged, paired bench_isolated table in BASELINE.md r15",
}

# Sub-absolute-floor timings are startup-noise-dominated at sf0.1
# (BASELINE.md: the tail median is ~0.5 s and single-run noise there
# swamps ratios); only trips where the NEW time is at least this slow.
FLOOR_SEC = 1.0
RATIO_TRIP = 2.0


def _sweeps() -> list[tuple[int, dict]]:
    out = []
    for f in ROOT.glob("TAIL_SWEEP_r*.json"):
        rnd = int(re.search(r"r(\d+)", f.stem).group(1))
        out.append((rnd, json.loads(f.read_text())))
    return sorted(out)


def test_tail_sweep_artifact_exists_for_current_round():
    """Every round commits a sweep: the newest TAIL_SWEEP artifact must
    be at least as recent as the newest CORRECTNESS artifact (the
    previous round's close)."""
    sweeps = _sweeps()
    assert sweeps, "no TAIL_SWEEP_r*.json committed — run scripts/tail_sweep.py"
    corr = [
        int(re.search(r"r(\d+)", f.stem).group(1))
        for f in ROOT.glob("CORRECTNESS_r*.json")
    ]
    assert sweeps[-1][0] >= max(corr), (
        f"latest sweep r{sweeps[-1][0]} predates driver round r{max(corr)}; "
        "run scripts/tail_sweep.py"
    )


def test_no_query_doubled_between_sweeps():
    sweeps = _sweeps()
    if len(sweeps) < 2:
        pytest.skip("fewer than two sweeps committed — nothing to compare")
    (r_prev, prev), (r_new, new) = sweeps[-2], sweeps[-1]
    p, q = prev["queries"], new["queries"]
    common = sorted(set(p) & set(q))
    assert len(common) >= 50, "sweeps share too few specs to compare"
    # Uniform container-load drift (BASELINE.md documents up to ~1.3×
    # round-over-round on UNTOUCHED queries) cancels via the median
    # ratio; the tripwire is about a SPECIFIC plan getting slower.
    ratios = sorted(q[n] / p[n] for n in common if p[n] > 0)
    median_drift = ratios[len(ratios) // 2]
    movers = {
        n: {
            "prev": p[n],
            "new": q[n],
            "raw_ratio": round(q[n] / p[n], 2),
            "drift_adjusted": round(q[n] / p[n] / median_drift, 2),
        }
        for n in common
        if q[n] >= FLOOR_SEC
        and p[n] > 0
        and q[n] / p[n] / median_drift > RATIO_TRIP
        and (r_prev, r_new, n) not in ADJUDICATED
    }
    assert not movers, (
        f"specs >{RATIO_TRIP}x slower r{r_prev}->r{r_new} after dividing "
        f"out median drift {median_drift:.2f}: {json.dumps(movers, indent=1)}; "
        "fix the plan or adjudicate in ADJUDICATED with a reason"
    )
