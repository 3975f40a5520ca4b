"""Scale probe: replicate the FACT tables N× (dims stay fixed — the
realistic shape of growth) and time the headline queries against the
scaled copy. This is the evidence behind SCALE.md's "holds at scale"
claims: a query whose plan is right scales ~linearly in fact rows; a
quadratic or skew-bound plan shows super-linear time immediately.

Replica keys are offset per copy so FK relationships stay valid
(lineitem.l_orderkey tracks orders.o_orderkey); document texts get a
per-replica suffix so the near-dup operators face realistic ~identical
clusters instead of pure exact duplicates.

Usage:
    python scripts/scale_probe.py [--factor 10] [--src /root/testdata/sf0.1]
                                  [--out .scratch/sf1] [--skip-build]
Prints one JSON line per run: {"factor": N, "queries": {...}, "total": s}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rt_bigdata_spark.config import TESTDATA_TABLES  # noqa: E402
from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded  # noqa: E402
from rt_bigdata_spark.session import get_spark  # noqa: E402
from rt_bigdata_spark.sources.tables import load_table  # noqa: E402

FACTS = {
    # table: (key columns to offset, text column to perturb or None)
    "orders": (("o_orderkey",), None),
    "lineitem": (("l_orderkey",), None),
    "events": (("event_id",), None),
    "documents": (("doc_id",), "text"),
    "embeddings": (("vec_id",), None),
}


def build(
    spark,
    src: str,
    out: str,
    factor: int,
    exact_dups: bool = False,
    only_tables: set[str] | None = None,
) -> None:
    """``only_tables`` (optional) restricts the replica to a subset —
    the iterative-family probe needs ONLY documents+embeddings at 100×,
    and replicating the unused fact tables would dominate the build."""
    os.makedirs(out, exist_ok=True)
    # one key-space stride shared by orders+lineitem so FKs stay aligned
    strides: dict[str, int] = {}
    tables = [t for t in TESTDATA_TABLES if only_tables is None or t in only_tables]
    for name in tables:
        df = load_table(spark, src, name)
        if name not in FACTS:
            df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
            continue
        keys, text_col = FACTS[name]
        stride_key = "orders" if name in ("orders", "lineitem") else name
        if stride_key not in strides:
            kcol = FACTS[stride_key][0][0]
            src_df = load_table(spark, src, stride_key)
            strides[stride_key] = int(src_df.agg(F.max(kcol)).first()[0]) + 1
        stride = strides[stride_key]
        rep = spark.range(factor).withColumnRenamed("id", "__rep")
        scaled = df.crossJoin(F.broadcast(rep))
        for k in keys:
            scaled = scaled.withColumn(k, F.col(k) + F.col("__rep") * F.lit(stride))
        if text_col and not exact_dups:
            # near-identical clusters (realistic near-dup shape); with
            # --exact-dups the suffix is skipped so every replica forms
            # an EXACT-duplicate clique of size `factor` — the worst
            # case for pair-enumerating consumers of LSH candidates
            # (the shape that exposed the r11 tau-sweep quadratic).
            scaled = scaled.withColumn(text_col, F.concat(F.col(text_col), F.lit(" r"), F.col("__rep")))
        scaled.drop("__rep").write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))


def hot_key_rewrite(spark, out: str, hot_share: float) -> None:
    """Rewrite ~``hot_share`` of the scaled events' user_id to ONE hot
    key (c_custkey=1 — present in the dim, so joins hit): the genuinely
    skewed JOIN-KEY shape the dup-heavy replica (which skews text, not
    keys) doesn't produce. Deterministic (rand seed) so reruns measure
    the same corpus."""
    path = os.path.join(out, "events.parquet")
    ev = spark.read.parquet(path)
    hot = ev.withColumn(
        "user_id",
        F.when(F.rand(seed=5) < hot_share, F.lit(1).cast("long")).otherwise(F.col("user_id")),
    )
    tmp = path + ".hot"
    hot.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)


def run_hot_key_adjudication(spark, out: str) -> dict:
    """Salted-vs-unsalted join adjudication on the hot-key replica
    (r12 verdict item 3): the events→customer enrichment join + agg
    (the salted_enrichment shape) timed under
    - broadcast        : dim under the threshold — skew is irrelevant
                         (the real answer whenever the dim fits);
    - plain_aqe_skew   : shuffle join, AQE skew-join ON (the session
                         default) — what a 100 TB dim-too-big join does;
    - plain_no_skew    : shuffle join, AQE skew handling OFF — the
                         naive baseline the hot key actually hurts;
    - salted_4/16/64   : scale.salted_join at three widths (shuffle
                         join forced) — proves the width that matters.
    Broadcast is disabled for every shuffle variant so the probe
    measures the skewed exchange, not the dim broadcast."""
    from rt_bigdata_spark.operators.scale import salted_join

    events = spark.read.parquet(os.path.join(out, "events.parquet")).select(
        "user_id", "event_type", "value"
    )
    dim = spark.read.parquet(os.path.join(out, "customer.parquet")).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    def agg(joined):
        return joined.groupBy("c_mktsegment", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-2: variant gaps here are ~0.3-1 s
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    conf = spark.conf
    results: dict[str, float] = {}
    # warm the scans once
    events.count(); dim.count()

    results["broadcast"] = timed(lambda: agg(events.join(F.broadcast(dim), "user_id")))

    prev_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        results["plain_aqe_skew"] = timed(lambda: agg(events.join(dim, "user_id")))
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        results["plain_no_skew"] = timed(lambda: agg(events.join(dim, "user_id")))
        for width in (4, 16, 64):
            results[f"salted_{width}"] = timed(
                lambda w=width: agg(salted_join(events, dim, "user_id", salt_buckets=w))
            )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "scaled"))
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--exact-dups", action="store_true",
                    help="replicate document texts WITHOUT the per-copy "
                    "suffix: exact-dup cliques of size `factor` (worst "
                    "case for LSH-pair consumers)")
    ap.add_argument("--hot-key", action="store_true",
                    help="rewrite ~20%% of the scaled events' user_id to "
                    "ONE key and run the salted-vs-unsalted join "
                    "adjudication instead of the bench specs")
    ap.add_argument("--hot-share", type=float, default=0.2)
    ap.add_argument("--only", default=None,
                    help="comma-separated spec names: probe only these "
                    "(default: every bench spec)")
    args = ap.parse_args()

    _ensure_loaded()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    if not args.skip_build:
        build(spark, args.src, args.out, args.factor, exact_dups=args.exact_dups)
        if args.hot_key:
            hot_key_rewrite(spark, args.out, args.hot_share)

    if args.hot_key:
        variants = run_hot_key_adjudication(spark, args.out)
        print(json.dumps({
            "factor": args.factor, "hot_share": args.hot_share, "variants": variants,
        }))
        spark.stop()
        return

    specs = [s for s in REGISTRY.values() if s.bench]
    if args.only:
        names = {n.strip() for n in args.only.split(",")}
        missing = names - {s.name for s in REGISTRY.values()}
        if missing:
            ap.error(f"unknown spec names: {sorted(missing)}")
        specs = [REGISTRY[n] for n in sorted(names)]
    # Warmup: run the first spec once untimed so JVM/codegen/session
    # startup doesn't land in the first timed query — without this the
    # 1× run (no build() pre-warming the session) absorbs several
    # seconds of startup that the N× runs don't, corrupting ratios.
    specs[0].spark(spark, args.out).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        spec.spark(spark, args.out).write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"factor": args.factor, "total": round(sum(timings.values()), 3), "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
