"""Streaming throughput probe for the stateful operators (T1-T3).

Generates a deterministic page-event stream (Spark-side, no Python
loop), writes it as a multi-file parquet input, then drives each
stateful operator end-to-end as a file-source stream with an
availableNow trigger into a noop sink — i.e. the full micro-batch
machinery: keyBy shuffle, Arrow transfer into applyInPandasWithState,
state store commits per batch. Reports events/sec per operator plus
the batch-analog bounce path for comparison.

The reference's equivalents process these per-record on Flink keyed
state (rt-flink …/app/dwm/UniqueVisitApp.scala, UserJumpDetailApp.scala,
…/app/dwd/OdsBaseLogApp.scala); throughput here is micro-batch
amortized, which is the Structured Streaming trade documented in
SURVEY.md §4b.

Usage:
    python scripts/streaming_probe.py [--events 200000] [--mids 20000]
                                      [--files 8]
Prints ONE JSON line: {"events": N, "ops": {op: {"sec": s, "eps": r}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rt_bigdata_spark.session import get_spark  # noqa: E402
from rt_bigdata_spark.streaming.stateful import (  # noqa: E402
    PAGE_EVENT_SCHEMA,
    correct_is_new,
    detect_bounces,
    detect_bounces_batch,
    unique_visits,
)

PAGES = ["home", "good_list", "detail", "cart", "pay"]


def gen_events(spark, n: int, n_mids: int, files: int, path: str) -> None:
    """Deterministic synthetic page log: ~n/n_mids events per mid,
    mix of entry events (last_page_id null) and follow-ups. The ts
    step is sized so the stream spans ~1.5 days regardless of n: the
    per-mid gap always exceeds the 10 s bounce timeout, AND the UV
    day boundary + 1-day TTL eviction actually fire (with a fixed
    20 ms step a 200k-event stream spans only ~67 minutes and the TTL
    machinery is armed but never exercised)."""
    step_ms = max(20, int(1.5 * 86_400_000 / n))
    df = (
        spark.range(n)
        .select(
            (F.col("id") % n_mids).cast("string").alias("mid"),
            F.element_at(F.array(*[F.lit(p) for p in PAGES]), (F.col("id") % len(PAGES) + 1).cast("int")).alias(
                "page_id"
            ),
            F.when(F.col("id") % 3 == 0, F.lit(None).cast("string")).otherwise(F.lit("home")).alias("last_page_id"),
            F.when(F.col("id") % 7 == 0, F.lit("1")).otherwise(F.lit("0")).alias("is_new"),
            (F.lit(1_600_000_000_000) + F.col("id") * step_ms).alias("ts"),
        )
    )
    df.repartition(files).write.mode("overwrite").parquet(path)


def run_stream(spark, in_dir: str, op, needs_watermark: bool) -> float:
    ckpt = tempfile.mkdtemp(prefix="probe_ckpt_")
    stream = spark.readStream.schema(PAGE_EVENT_SCHEMA).parquet(in_dir)
    if needs_watermark:
        stream = stream.withColumn("eventTime", F.timestamp_millis(F.col("ts"))).withWatermark(
            "eventTime", "2 seconds"
        )
    t0 = time.perf_counter()
    q = (
        op(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sec = time.perf_counter() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return sec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--mids", type=int, default=20_000)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("streaming-probe")
    spark.sparkContext.setLogLevel("WARN")
    in_dir = tempfile.mkdtemp(prefix="probe_events_")
    gen_events(spark, args.events, args.mids, args.files, in_dir)

    ops = {
        "is_new_correction": (correct_is_new, False),
        "uv_dedup": (lambda s: unique_visits(s), False),
        "uv_dedup_ttl": (lambda s: unique_visits(s, ttl=True), True),
        "bounce_detection": (detect_bounces, True),
    }
    results: dict[str, dict[str, float]] = {}
    # warmup: absorb session/Arrow/python-worker startup on a genuinely
    # small separate input (replaying the full stream would double the
    # first operator's cost at large --events for no extra benefit)
    warm_dir = tempfile.mkdtemp(prefix="probe_warm_")
    gen_events(spark, 2_000, 200, 2, warm_dir)
    run_stream(spark, warm_dir, correct_is_new, False)
    shutil.rmtree(warm_dir, ignore_errors=True)
    for name, (op, wm) in ops.items():
        sec = run_stream(spark, in_dir, op, wm)
        results[name] = {"sec": round(sec, 3), "eps": round(args.events / sec)}

    # batch analog of the hardest op, same data, for the micro-batch-vs-batch gap
    batch_df = spark.read.parquet(in_dir)
    t0 = time.perf_counter()
    detect_bounces_batch(batch_df).write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    results["bounce_batch_analog"] = {"sec": round(sec, 3), "eps": round(args.events / sec)}

    shutil.rmtree(in_dir, ignore_errors=True)
    print(json.dumps({"events": args.events, "mids": args.mids, "ops": results}))
    spark.stop()


if __name__ == "__main__":
    main()
