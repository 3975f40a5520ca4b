"""Capture .explain("formatted") for named queries into plans/r16/.

Optimization-round deliverable (OPTIMIZATION_r16.md contract): the
judge cannot run Spark, so every plan claim is backed by a committed
``plans/r16/<query>_<tag>.txt``. Usage:

    python scripts/explain_r16.py before q1,q2,...   # or 'bench' / 'all'
    python scripts/explain_r16.py after  q1,q2,...

Plans are captured WITHOUT executing (explain only), at
$SPARK_GRAFT_SF_DIR (default sf0.1) so scan statistics match the bench.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded  # noqa: E402
from rt_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sel = sys.argv[2] if len(sys.argv) > 2 else "bench"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    if sel == "bench":
        names = [s.name for s in REGISTRY.values() if s.bench]
    elif sel == "all":
        names = list(REGISTRY)
    else:
        names = [n.strip() for n in sel.split(",") if n.strip()]
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    out_dir = ROOT / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-r16")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
