"""Paired old-vs-new bench adjudication (r9 verdict item 5).

This container has external tenant load (BASELINE.md records uniform
×1.1-2 drift across UNTOUCHED queries in four separate rounds), so a
single-run bench delta can't distinguish "my commit regressed q" from
"the neighbor started a compile". The r8→r9 `active_users_hll` scare
was adjudicated by hand the right way: check out the OLD code in a
temp clone and interleave old/new min-of-3 runs minutes apart under
the SAME load — identical timings ⇒ drift, divergent ⇒ code. This
script mechanizes that procedure:

    python scripts/bench_isolated.py --ref <old-commit> --queries a,b,c
    python scripts/bench_isolated.py --ref <old-commit> \
        --auto BENCH_r08.json BENCH_r09.json [--threshold 1.3] [--top 5]

- clones the repo (``git clone --shared``) at ``--ref`` into a temp dir
- runs the named queries in alternating old/new subprocesses
  (old, new, old, new, ...) for ``--reps`` rounds, one fresh Spark
  session each, so both sides sample the same load window
- per query takes the MIN per side and prints a paired table with a
  verdict per query: ratio ≤ --noise-band ⇒ ``drift/noise``,
  > --threshold ⇒ ``CODE REGRESSION``, between ⇒ ``watch``

NEVER runs two Spark jobs at once (the one hard rule for timing on
this VM): the old/new subprocesses strictly alternate.

``--auto OLD.json NEW.json`` reads two driver bench artifacts and
selects the queries common to both whose new/old ratio exceeds
``--threshold`` (capped at ``--top``) — i.e. "any >1.3× mover gets an
automatic paired verdict".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Runs inside EITHER tree (old or new): only depends on the registry +
# session API, stable since round 1. Prints one tagged JSON line.
_RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded
from rt_bigdata_spark.session import get_spark

names, sf_dir = sys.argv[1].split(","), sys.argv[2]
_ensure_loaded()
spark = get_spark("bench-isolated")
spark.sparkContext.setLogLevel("ERROR")
REGISTRY["pricing_summary"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for n in names:
    t0 = time.perf_counter()
    REGISTRY[n].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[n] = round(time.perf_counter() - t0, 3)
print("BENCH_ISOLATED_JSON:" + json.dumps(out))
spark.stop()
"""


def _loadavg() -> str:
    try:
        with open("/proc/loadavg") as f:
            return f.read().split()[0]
    except OSError:  # non-Linux dev box
        return "?"


def _run_once(tree: str, names: list[str], sf_dir: str) -> dict[str, float]:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, ",".join(names), sf_dir],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_ISOLATED_JSON:"):
            return json.loads(line[len("BENCH_ISOLATED_JSON:"):])
    raise RuntimeError(
        f"runner in {tree} produced no timing line; stderr tail:\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )


def _artifact_queries(path: str) -> dict[str, float]:
    """Per-query timings from either artifact shape: bench.py's own
    output ({"queries": ...}) or the driver's wrapper
    ({"parsed": {"queries": ...}} — ``parsed`` may be null when the
    driver truncated the line; fail loudly then, the caller should
    name queries explicitly with --queries)."""
    d = json.load(open(path))
    q = d.get("queries") or (d.get("parsed") or {}).get("queries")
    if not q:
        raise SystemExit(
            f"{path} carries no per-query map (driver-truncated artifact?); "
            "pass --queries explicitly"
        )
    return q


def _pick_movers(old_path: str, new_path: str, threshold: float, top: int) -> list[str]:
    old = _artifact_queries(old_path)
    new = _artifact_queries(new_path)
    movers = sorted(
        ((n, new[n] / old[n]) for n in new if n in old and old[n] > 0),
        key=lambda kv: -kv[1],
    )
    picked = [n for n, r in movers if r > threshold][:top]
    if not picked:
        print(f"no common query moved more than {threshold}x — nothing to adjudicate")
    return picked


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ref", required=True, help="git ref of the OLD code")
    ap.add_argument("--queries", help="comma-separated query names")
    ap.add_argument("--auto", nargs=2, metavar=("OLD_BENCH", "NEW_BENCH"),
                    help="pick movers from two bench JSON artifacts")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="new/old ratio above which the verdict is CODE REGRESSION")
    ap.add_argument("--noise-band", type=float, default=1.15,
                    help="paired ratio at or below this is drift/noise")
    ap.add_argument("--top", type=int, default=5, help="max movers in --auto mode")
    ap.add_argument("--reps", type=int, default=3, help="alternating rounds per side")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    args = ap.parse_args()

    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    elif args.auto:
        names = _pick_movers(args.auto[0], args.auto[1], args.threshold, args.top)
    else:
        ap.error("one of --queries / --auto is required")
    if not names:
        return

    with tempfile.TemporaryDirectory(prefix="bench_isolated_") as tmp:
        old_tree = os.path.join(tmp, "old")
        subprocess.run(["git", "clone", "-q", "--shared", "--no-checkout", REPO, old_tree],
                       check=True)
        subprocess.run(["git", "-C", old_tree, "checkout", "-q", args.ref], check=True)

        mins: dict[str, dict[str, float]] = {"old": {}, "new": {}}
        loads: list[str] = []
        for rep in range(args.reps):
            # strict alternation: both sides sample the same load window
            for label, tree in (("old", old_tree), ("new", REPO)):
                loads.append(_loadavg())
                got = _run_once(tree, names, args.sf_dir)
                for n, t in got.items():
                    cur = mins[label].get(n)
                    mins[label][n] = t if cur is None else min(cur, t)
                print(f"  rep {rep + 1}/{args.reps} {label:3s} load={loads[-1]:>5s} "
                      + " ".join(f"{n}={got[n]:.2f}s" for n in names), file=sys.stderr)

        rows = []
        print(f"\npaired min-of-{args.reps}, old={args.ref} vs new=HEAD, "
              f"sf_dir={args.sf_dir}, loadavg seen: {', '.join(loads)}")
        print(f"{'query':30s} {'old_s':>8s} {'new_s':>8s} {'ratio':>6s}  verdict")
        for n in names:
            o, w = mins["old"][n], mins["new"][n]
            ratio = w / o if o else float("inf")
            verdict = ("drift/noise" if ratio <= args.noise_band
                       else "CODE REGRESSION" if ratio > args.threshold
                       else "watch")
            print(f"{n:30s} {o:8.3f} {w:8.3f} {ratio:6.2f}  {verdict}")
            rows.append({"query": n, "old_s": o, "new_s": w,
                         "ratio": round(ratio, 3), "verdict": verdict})
        print("BENCH_ISOLATED_PAIRS:" + json.dumps(
            {"ref": args.ref, "sf_dir": args.sf_dir, "reps": args.reps,
             "loadavg": loads, "pairs": rows}))


if __name__ == "__main__":
    main()
