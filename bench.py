"""Benchmark harness: runs the headline queries (QuerySpec.bench) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a count-style collect (noop write) so
the full plan executes; a warmup run of the flagship query absorbs JVM
/ codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded
from rt_bigdata_spark.session import get_spark

# The r1-r3 rounds benched these 19 queries; later rounds added heavier
# ones. Their subtotal keeps cross-round totals comparable as the
# headline set grows, and they always receive the full rep count.
R1_SET = {
    "dedup_exact", "text_quality", "ngram_jaccard", "ann_cosine_topk", "minhash_lsh",
    "embedding_dedup_lsh", "doc_curation", "pricing_summary", "visitor_stats",
    "province_stats", "keyword_stats", "order_wide", "order_wide_enriched",
    "shipping_priority", "supplier_volume", "product_stats", "purchase_attribution",
    "nation_trade", "rolling_revenue",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    _ensure_loaded()
    spark = get_spark("rt_bigdata_spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    bench_specs = [s for s in REGISTRY.values() if s.bench]

    # Warmup: JVM + codegen + parquet footer caches.
    warm = REGISTRY["pricing_summary"].spark(spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()

    # Per-query MIN across reps — the noise floor, robust to container
    # load spikes. Default 3: the r3 single-pass run recorded a phantom
    # +28% "regression" on queries whose code had not changed (uniform
    # ~1.3-2× drift across unrelated joins = sandbox load, not plans);
    # min-of-3 makes the recorded number a property of the code again.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Wall-clock budget control (r12: the set grew to 56 queries and a
    # cold full run approaches the driver's timeout): queries whose
    # FIRST rep measures heavy get one fewer extra rep — their noise is
    # proportionally small (multi-second intrinsic audits), while the
    # sub-second queries that min-of-N exists for keep every rep. The
    # r1 comparison set always gets full reps (methodology continuity).
    heavy_cutoff = float(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_CUTOFF", "3.0"))
    timings: dict[str, float] = {}
    rep_counts: dict[str, int] = {}
    for rep in range(reps):
        for spec in bench_specs:
            prior = timings.get(spec.name)
            if (
                rep >= max(2, reps - 1)
                and prior is not None
                and prior >= heavy_cutoff
                and spec.name not in R1_SET
            ):
                continue  # heavy non-r1 query: min-of-(reps-1) is enough
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[spec.name] = min(prior if prior is not None else elapsed, elapsed)
            rep_counts[spec.name] = rep_counts.get(spec.name, 0) + 1

    total = round(sum(timings.values()), 3)
    total_r1_set = round(sum(v for k, v in timings.items() if k in R1_SET), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                # advice-r12: heavy non-R1 queries run one fewer rep under
                # the wall-clock control; emit the ACTUAL per-query rep
                # count so cross-round comparisons can see which numbers
                # are min-of-2 vs min-of-3. Only DEVIATIONS from `reps`
                # are listed (r14: BENCH_r13's driver artifact truncated
                # the full line to `parsed: null` — every byte counts;
                # absent name ⇒ the query ran all `reps` reps).
                "rep_counts": {n: c for n, c in rep_counts.items() if c != reps},
                "total_r1_set": total_r1_set,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
