"""Per-query empirical breakdown (guide §1: measure first).

Runs selected bench queries once each (noop sink, same methodology as
bench.py), tagging every Spark job with the query name via
``setJobGroup``; then pulls the UI REST API (local[…] serves it on
127.0.0.1:4040+) and aggregates per query:

- wall seconds (driver-observed, includes planning + py4j)
- numJobs / numStages / numTasks
- executorRunTime sum (task compute, ms)
- shuffle read/write bytes, input bytes
- jvm+python plan time = wall − max(stage wall spans)  (rough)

    python scripts/bench_metrics.py q1,q2,...     # subset
    python scripts/bench_metrics.py bench         # the whole bench set
    SPARK_GRAFT_SF_DIR=... to change scale (default sf0.1)

Output: one JSON line per query + a sorted summary table on stderr.
Measurement-only tool — bench.py (the driver contract) is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded  # noqa: E402
from rt_bigdata_spark.session import get_spark  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sel = sys.argv[1] if len(sys.argv) > 1 else "bench"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    if sel == "bench":
        names = [s.name for s in REGISTRY.values() if s.bench]
    else:
        names = [n.strip() for n in sel.split(",") if n.strip()]
    spark = get_spark("bench-metrics")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl  # e.g. http://host:4040
    # warmup (same as bench.py)
    REGISTRY["pricing_summary"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    walls: dict[str, float] = {}
    tags: list[str] = []
    seen: dict[str, int] = {}
    for name in names:
        seen[name] = seen.get(name, 0) + 1
        tag = name if seen[name] == 1 else f"{name}#{seen[name]}"
        tags.append(tag)
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[tag] = round(time.perf_counter() - t0, 3)
        sc.setJobGroup("", "")
    names = tags

    app_id = sc.applicationId
    jobs = _get(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
    stages = _get(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE")
    st_by_id = {}
    for st in stages:
        st_by_id.setdefault(st["stageId"], st)  # latest attempt wins order; fine

    per: dict[str, dict] = {}
    for j in jobs:
        g = j.get("jobGroup")
        if g not in walls:
            continue
        d = per.setdefault(
            g,
            {
                "jobs": 0,
                "stages": 0,
                "tasks": 0,
                "run_ms": 0,
                "gc_ms": 0,
                "shuf_r": 0,
                "shuf_w": 0,
                "input": 0,
                "cpu_ms": 0,
            },
        )
        d["jobs"] += 1
        for sid in j.get("stageIds", []):
            st = st_by_id.pop(sid, None)
            if st is None:
                continue
            d["stages"] += 1
            d["tasks"] += st.get("numCompleteTasks", 0)
            d["run_ms"] += st.get("executorRunTime", 0)
            d["cpu_ms"] += st.get("executorCpuTime", 0) // 1_000_000
            d["gc_ms"] += st.get("jvmGcTime", 0)
            d["shuf_r"] += st.get("shuffleReadBytes", 0)
            d["shuf_w"] += st.get("shuffleWriteBytes", 0)
            d["input"] += st.get("inputBytes", 0)

    rows = []
    for name in names:
        d = per.get(name, {})
        rows.append(
            {
                "query": name,
                "wall_s": walls[name],
                **{k: d.get(k, 0) for k in ("jobs", "stages", "tasks")},
                "run_s": round(d.get("run_ms", 0) / 1000, 2),
                "cpu_s": round(d.get("cpu_ms", 0) / 1000, 2),
                "gc_s": round(d.get("gc_ms", 0) / 1000, 2),
                "shuf_r_mb": round(d.get("shuf_r", 0) / 1e6, 2),
                "shuf_w_mb": round(d.get("shuf_w", 0) / 1e6, 2),
                "input_mb": round(d.get("input", 0) / 1e6, 2),
            }
        )
    print(json.dumps({"sf_dir": sf_dir, "rows": rows}))
    rows.sort(key=lambda r: -r["wall_s"])
    hdr = f"{'query':34s}{'wall':>7s}{'jobs':>5s}{'stg':>5s}{'task':>6s}{'run_s':>8s}{'cpu_s':>8s}{'gc':>6s}{'shR_MB':>8s}{'shW_MB':>8s}{'in_MB':>8s}"
    print(hdr, file=sys.stderr)
    for r in rows:
        print(
            f"{r['query']:34s}{r['wall_s']:7.2f}{r['jobs']:5d}{r['stages']:5d}{r['tasks']:6d}"
            f"{r['run_s']:8.2f}{r['cpu_s']:8.2f}{r['gc_s']:6.2f}{r['shuf_r_mb']:8.2f}{r['shuf_w_mb']:8.2f}{r['input_mb']:8.2f}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
