"""Full-registry timing sweep (r13 verdict item 4 — mechanizes the
one-off r12 sweep that caught the two winnow O(n²) plans hiding below
the ≥3 s bench threshold).

``bench.py`` times only the headline (``bench=True``) set; ~80 sub-3 s
specs never get a recorded number, so a quadratic plan that is merely
*slow-ish* at sf0.1 can sit there unmeasured until it becomes a 100 TB
scale-killer. This sweep times EVERY registered spec once (min-of-1:
the tripwire threshold is 2× on top of median-drift normalization, far
above single-run noise) and commits the table as ``TAIL_SWEEP_r{N}.json``;
``tests/test_tail_sweep.py`` then trips if any spec grew >2× between
the two most recent committed sweeps after dividing out the
container-load envelope (the uniform drift BASELINE.md documents at up
to ~1.3×).

    python scripts/tail_sweep.py              # sweep at sf0.1, write artifact
    python scripts/tail_sweep.py --sf-dir ... # other scale
    python scripts/tail_sweep.py --round 14   # pin the artifact round
    python scripts/tail_sweep.py --reps 2     # per-spec min-of-N (see below)

``--reps N`` (r15): per-spec MIN across N full passes — the same
noise-floor methodology bench.py has always used. Added when two
consecutive r15 single-pass sweeps each produced a DIFFERENT set of
8-21× spikes on untouched specs (this container's load arrives in
multi-minute blocks, so min-of-1 rows die in whichever block overlaps
their slot; the blocks moved between the two runs, pinning the cause
as load). The artifact records ``reps``; with reps > 1 the
``cold_build`` flags are dropped because the min is a warm reading
(the build cost is amortized exactly as in bench.py).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def find_movers(
    prev: dict[str, float],
    new: dict[str, float],
    floor_sec: float = 1.0,
    ratio_trip: float = 2.0,
    skip: frozenset[str] = frozenset(),
) -> tuple[float, dict[str, dict]]:
    """The tripwire kernel (unit-tested in tests/test_tail_sweep.py):
    returns (median_drift, movers). Uniform container-load drift
    (BASELINE.md documents up to ~1.3× round-over-round on UNTOUCHED
    queries) cancels via the median ratio across all common specs; a
    mover is a spec whose drift-adjusted ratio exceeds ``ratio_trip``
    AND whose new time clears ``floor_sec`` (sub-floor timings are
    startup-noise-dominated — the tail median is ~0.5 s at sf0.1)."""
    common = sorted(n for n in set(prev) & set(new) if prev[n] > 0)
    if not common:
        return 1.0, {}
    ratios = sorted(new[n] / prev[n] for n in common)
    median_drift = ratios[len(ratios) // 2]
    movers = {
        n: {
            "prev": prev[n],
            "new": new[n],
            "raw_ratio": round(new[n] / prev[n], 2),
            "drift_adjusted": round(new[n] / prev[n] / median_drift, 2),
        }
        for n in common
        if new[n] >= floor_sec
        and new[n] / prev[n] / median_drift > ratio_trip
        and n not in skip
    }
    return median_drift, movers


def next_round() -> int:
    """The round currently being built = latest committed driver round + 1."""
    rounds = [
        int(re.search(r"r(\d+)", f.stem).group(1))
        for f in ROOT.glob("CORRECTNESS_r*.json")
    ]
    return (max(rounds) if rounds else 0) + 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    rnd = args.round if args.round is not None else next_round()

    from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded
    from rt_bigdata_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("rt_bigdata_spark-tail-sweep")
    spark.sparkContext.setLogLevel("WARN")

    # Warmup absorbs JVM/codegen/parquet-footer startup (same as bench.py).
    REGISTRY["pricing_summary"].spark(spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Cold-index-build labeling (r14 verdict item 3): the IVF / PQ /
    # IVF-PQ artifacts are built lazily once per (process, sf_dir)
    # (plans/textops._ivf_index_for and friends) — whichever spec
    # touches one FIRST pays the build that bench.py's warm min-of-3
    # amortizes away (r14: filtered_ann_indexed 8.61 s cold vs 1.75 s
    # warm). Marking those rows in the artifact keeps the >2× tripwire
    # and human readers from misattributing a build-cost shift (e.g.
    # registry-order churn moving the first touch) to a plan regression.
    from rt_bigdata_spark.plans import textops as _textops

    def _builds_done() -> int:
        return (
            len(_textops._IVF_INDEX_PATHS)
            + len(_textops._PQ_BOOKS)
            + len(_textops._IVFPQ_INDEX_PATHS)
        )

    timings: dict[str, float] = {}
    cold_build: dict[str, bool] = {}
    for rep in range(max(1, args.reps)):
        for i, spec in enumerate(REGISTRY.values()):
            before = _builds_done()
            t0 = time.perf_counter()
            spec.spark(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            prior = timings.get(spec.name)
            timings[spec.name] = elapsed if prior is None else min(prior, elapsed)
            if rep == 0 and _builds_done() > before:
                cold_build[spec.name] = True
            print(
                f"rep{rep + 1} [{i + 1}/{len(REGISTRY)}] {spec.name}: {elapsed}s"
                + (" (cold index build)" if rep == 0 and spec.name in cold_build else ""),
                file=sys.stderr,
            )
    if args.reps > 1:
        # min across reps is a WARM reading — no row carries build cost
        cold_build = {}

    out = ROOT / f"TAIL_SWEEP_r{rnd}.json"
    out.write_text(json.dumps({
        "round": rnd,
        "sf_dir": args.sf_dir,
        "n_specs": len(timings),
        "reps": max(1, args.reps),
        "total": round(sum(timings.values()), 3),
        "cold_build": dict(sorted(cold_build.items())),
        "queries": dict(sorted(timings.items())),
    }, indent=1))
    print(
        f"wrote {out} ({len(timings)} specs, total {sum(timings.values()):.1f}s, "
        f"cold builds: {sorted(cold_build) or 'none'})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
