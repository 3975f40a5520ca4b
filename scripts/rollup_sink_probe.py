"""Throughput probe for the mergeable-state maintenance sinks
(streaming/sinks.versioned_state_sink instances): drives a
multi-batch event stream through rollup_maintenance_sink and a
document stream through cms_maintenance_sink, measuring events/sec of
the FULL loop — micro-batch read, fold, O(state) merge with the
persisted version, committed parquet write per batch. The claim under
test is history-independence: per-batch cost must not grow with how
many batches came before.

Usage:
    python scripts/rollup_sink_probe.py [--events 200000] [--batches 8]
Prints ONE JSON line:
  {"events": N, "batches": B, "rollup": {"sec": s, "eps": r,
   "first_batch_s": f, "last_batch_s": l}, "cms": {...}}
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
from rt_bigdata_spark.streaming.sinks import (  # noqa: E402
    cms_maintenance_sink,
    rollup_maintenance_sink,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("rollup-sink-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sink_probe_")
    per_batch = args.events // args.batches

    # deterministic synthetic events, one DataFrame per micro-batch
    base = (
        spark.range(args.events)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("ts"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 1000 / 10.0).alias("value"),
        )
        .cache()
    )
    base.count()

    out: dict = {"events": args.events, "batches": args.batches}

    state = os.path.join(work, "rollup_state")
    sink = rollup_maintenance_sink(state, ["event_type"])
    t0 = time.time()
    batch_times = []
    for b in range(args.batches):
        bt = time.time()
        sink(base.filter((F.col("event_id") % args.batches) == b), b)
        batch_times.append(time.time() - bt)
    sec = time.time() - t0
    out["rollup"] = {
        "sec": round(sec, 2),
        "eps": round(args.events / sec),
        "first_batch_s": round(batch_times[0], 2),
        "last_batch_s": round(batch_times[-1], 2),
    }

    docs = base.select(
        F.col("event_id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.col("event_type"),
            (F.col("event_id") % 997).cast("string"),
            (F.col("event_id") % 89).cast("string"),
            (F.col("event_id") % 13).cast("string"),
        ).alias("text"),
    ).cache()
    docs.count()
    state2 = os.path.join(work, "cms_state")
    sink2 = cms_maintenance_sink(state2)
    t0 = time.time()
    batch_times = []
    for b in range(args.batches):
        bt = time.time()
        sink2(docs.filter((F.col("doc_id") % args.batches) == b), b)
        batch_times.append(time.time() - bt)
    sec = time.time() - t0
    out["cms"] = {
        "sec": round(sec, 2),
        "eps": round(args.events / sec),
        "first_batch_s": round(batch_times[0], 2),
        "last_batch_s": round(batch_times[-1], 2),
    }

    # Behavioral activity matrix (r14 verdict item 6): same
    # history-independence claim for activity_matrix_maintenance_sink —
    # per-batch cost is O(batch) fold + O(state) merge; state is
    # O(users · active buckets) regardless of how many events streamed.
    # 5k users × up to 56 daily buckets over an 8-week span exercises a
    # state (≤280k cells) much larger than one batch's cell count.
    from rt_bigdata_spark.streaming.sinks import (
        activity_matrix_maintenance_sink,
        read_activity_matrix,
    )

    ev = base.select(
        (F.col("event_id") % 5000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("event_id") * 37) % (56 * 86400)
        ).alias("ts"),
        F.col("event_id"),
    ).cache()
    ev.count()
    state3 = os.path.join(work, "activity_state")
    sink3 = activity_matrix_maintenance_sink(state3, bucket_ms=86_400_000)
    t0 = time.time()
    batch_times = []
    for b in range(args.batches):
        bt = time.time()
        sink3(ev.filter((F.col("event_id") % args.batches) == b), b)
        batch_times.append(time.time() - bt)
    sec = time.time() - t0
    out["activity"] = {
        "sec": round(sec, 2),
        "eps": round(args.events / sec),
        "first_batch_s": round(batch_times[0], 2),
        "last_batch_s": round(batch_times[-1], 2),
        "state_cells": read_activity_matrix(spark, state3).count(),
    }

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
