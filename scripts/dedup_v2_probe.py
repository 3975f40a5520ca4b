"""State-growth probe for the v2 curation id-dedup gate
(``stateful_v2.dedup_docs_v2`` — r14).

The scale question for an exact seen-set: does PER-BATCH latency stay
flat as the RocksDB state grows? A per-batch cost that tracks |state|
(full-store scans, compaction stalls) kills a long-running ingest at
100 TB even when each batch is small. This probe feeds B batches of K
fresh doc ids each (plus a 10% redelivery slice from the PREVIOUS
batch — so every batch exercises both the miss and the hit path),
timing each ``processAllAvailable`` while state accumulates to B×K
keys.

Requires the TWS protobuf runtime (bridged from the gcloud SDK like
tests/conftest.py); exits with a clear message otherwise.

    python scripts/dedup_v2_probe.py [--batches 8] [--per-batch 20000]

Prints ONE JSON line: per-batch seconds + rows emitted; paste the
table into SCALE.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# protobuf bridge, same as tests/conftest.py (must precede SparkSession)
_PBSHIM = os.path.join(ROOT, "tests", "_pbshim")
try:
    _have_pb = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _have_pb = False
if not _have_pb and os.path.isdir(
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
):
    sys.path.insert(0, _PBSHIM)
    os.environ["PYTHONPATH"] = _PBSHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    _have_pb = True
if not _have_pb:
    raise SystemExit("no protobuf runtime available — TWS cannot run here")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--per-batch", type=int, default=20000)
    args = ap.parse_args()

    from rt_bigdata_spark.session import get_spark, use_rocksdb_state
    from rt_bigdata_spark.streaming.stateful_v2 import dedup_docs_v2

    spark = get_spark("dedup-v2-probe")
    spark.sparkContext.setLogLevel("ERROR")
    use_rocksdb_state(spark)

    with tempfile.TemporaryDirectory(prefix="dedup_v2_probe_") as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        stream = spark.readStream.schema("doc_id LONG, text STRING").json(src)
        emitted: list[int] = []

        def sink(df, bid: int) -> None:
            emitted.append(df.count())

        q = (
            dedup_docs_v2(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "chk"))
            .outputMode("append")
            .start()
        )
        per_batch: list[float] = []
        k = args.per_batch
        try:
            for b in range(args.batches):
                lines = []
                # 10% redeliveries from the previous batch: hit path
                redeliver = range((b - 1) * k, (b - 1) * k + k // 10) if b else range(0)
                for i in list(range(b * k, (b + 1) * k)) + list(redeliver):
                    lines.append(json.dumps({"doc_id": i, "text": f"doc {i}"}))
                path = os.path.join(src, f"b{b}.json")
                with open(path + ".tmp", "w") as f:
                    f.write("\n".join(lines))
                os.rename(path + ".tmp", path)
                t0 = time.perf_counter()
                q.processAllAvailable()
                per_batch.append(round(time.perf_counter() - t0, 3))
        finally:
            q.stop()

    print(json.dumps({
        "batches": args.batches,
        "per_batch_keys": k,
        "state_keys_final": args.batches * k,
        "per_batch_sec": per_batch,
        "emitted": emitted,
        "eps_final_batch": round((k + k // 10) / per_batch[-1]) if per_batch[-1] else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
