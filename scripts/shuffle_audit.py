"""Measure ACTUAL shuffle volume per headline query — evidence for
SCALE.md's shuffle-inventory claims. For each bench query: run it,
then attribute the new stages' metrics (via the Spark UI REST API) to
that query. Exchange bytes are the scale-limiting resource at 100 TB;
a query whose shuffle is O(groups) shows KB here while scanning MB-GB.

Usage:
    python scripts/shuffle_audit.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line: {"sf_dir": ..., "queries": {name:
shuffle_write_mb}}. (Stage inputBytes is NOT reported — its
attribution across reused/cached scans proved unreliable; shuffle
write bytes are exact per stage.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded  # noqa: E402
from rt_bigdata_spark.session import get_spark  # noqa: E402


def stage_metrics(spark) -> dict[int, tuple[int, int]]:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url))
    return {
        s["stageId"]: (s.get("inputBytes", 0), s.get("shuffleWriteBytes", 0)) for s in data
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None,
                    help="comma-separated spec names (default: every bench spec)")
    args = ap.parse_args()

    _ensure_loaded()
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in REGISTRY.values() if s.bench]
    if args.only:
        names = {n.strip() for n in args.only.split(",")}
        missing = names - {s.name for s in REGISTRY.values()}
        if missing:
            ap.error(f"unknown spec names: {sorted(missing)}")
        specs = [REGISTRY[n] for n in sorted(names)]
    specs[0].spark(spark, args.sf_dir).write.format("noop").mode("overwrite").save()  # warmup

    out: dict[str, float] = {}
    for spec in specs:
        before = stage_metrics(spark)
        spec.spark(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        after = stage_metrics(spark)
        new = [v for k, v in after.items() if k not in before]
        out[spec.name] = round(sum(w for _, w in new) / 1e6, 3)
    print(json.dumps({"sf_dir": args.sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
