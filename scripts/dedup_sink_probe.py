"""History-independence probe for the CELL-PARTITIONED streaming
dedup delta stores (streaming/sinks.near_dup_maintenance_sink and
embedding_dedup_maintenance_sink): drives B fixed-size micro-batches
through each sink so the persisted store grows B×, and measures
per-batch wall time of the FULL loop — fence check, batch
signature/cell computation, PARTITION-PRUNED store read, pair join,
pairs + partitioned store writes.

The claim under test is the r7 verdict item 1 fix: per-trigger cost
must be O(batch + matching cells), NOT O(corpus) — before the fix the
sinks re-read and re-celled the ENTIRE store every trigger, so the
last batch cost ~B× the first. After the fix last/first should be
~flat (bounded by the genuinely growing parts: O(#batches) dir
listings and the matching-cell data, which at a fixed duplicate rate
grows with corpus but is read without any re-derivation). The probe
reports first/last batch seconds and the late/early ratio over the
middle batches (first batch excluded — it has no store to read and
pays JVM warmup).

Since r9 the sinks compact INLINE on their own ``compact_every``
cadence, so the probe detects compaction batches (committed-dir count
shrank) and reports the trigger-work ratio EXCLUDING them next to the
spike-inclusive ratio — compaction is O(store) once per cadence (LSM
discipline), a different cost class from the per-trigger work whose
flatness this probe certifies. ``--cadence-sweep`` adds the IVF-sink
operating table across cadences 2/4/8/never.

Usage:
    python scripts/dedup_sink_probe.py [--docs 24000] [--batches 12]
                                       [--compact-every N] [--cadence-sweep]
Prints ONE JSON line:
  {"docs": N, "batches": B,
   "minhash": {"sec": s, "first_batch_s": f, "last_batch_s": l,
               "late_early_ratio": r, "late_early_ratio_incl_compaction": ri,
               "n_compactions": c, "n_fence_only": f},
   "embedding": {...}, "ivf_index": {...},
   "ivf_cadence_sweep": {...}}   # with --cadence-sweep
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
    embedding_dedup_maintenance_sink,
    near_dup_maintenance_sink,
)


def _ratio(batch_times: list[float]) -> float:
    """Median of the last 3 batches over median of batches 2-4 (skip
    batch 1: empty store + warmup)."""
    early = sorted(batch_times[1:4])[1]
    late = sorted(batch_times[-3:])[1]
    return round(late / early, 2)


def _drive(spark, sink_fn, state_dir: str, feed) -> dict:
    """Run the batch loop and time each trigger, DETECTING inline
    compactions (r9: the sinks compact inside the trigger, so a
    compaction batch's wall time is trigger work + an O(store) fold).
    The flatness claim is about the TRIGGER work, so the headline
    ratio excludes compaction batches (their cost is the amortized
    store-maintenance term, reported separately as n_compactions —
    LSM discipline: compaction is inherently O(store), paid once per
    cadence, never per trigger)."""
    import time as _t

    from rt_bigdata_spark.streaming.sinks import _fs_committed_ids

    times, compacted, fence_only = [], [], 0
    t0 = _t.time()
    for b, batch in feed:
        before = len(_fs_committed_ids(spark, state_dir, "batch="))
        base_before = _fs_committed_ids(spark, state_dir, "base_v")
        bt = _t.time()
        sink_fn(batch, b)
        times.append(_t.time() - bt)
        after = len(_fs_committed_ids(spark, state_dir, "batch="))
        base_after = _fs_committed_ids(spark, state_dir, "base_v")
        # r9 ADVICE: an unchanged dir count is AMBIGUOUS — a fence-only
        # batch (all rows already stored; receipt only, no data commit)
        # also leaves it flat. Compaction is detected by its own
        # unambiguous signature: a NEW base_v version appeared. Fence-
        # only batches stay in the headline ratio (they are real
        # trigger work) and are reported separately.
        compacted.append(bool(base_after) and (
            not base_before or base_after[-1] > base_before[-1]
        ))
        fence_only += int(after == before and not compacted[-1])
    clean = [t for t, c in zip(times, compacted) if not c]
    out = {
        "sec": round(_t.time() - t0, 2),
        "first_batch_s": round(times[0], 2),
        "last_batch_s": round(times[-1], 2),
        "late_early_ratio": _ratio(clean) if len(clean) >= 6 else None,
        "late_early_ratio_incl_compaction": _ratio(times),
        "n_compactions": sum(compacted),
        "n_fence_only": fence_only,
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=24_000)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--compact-every", type=int, default=None,
                    help="compact_every passed to ALL THREE sinks (their "
                    "BUILT-IN inline cadence since r9 — no external "
                    "maintenance call); default None = the sinks' own "
                    "default (8); 0 = never")
    ap.add_argument("--cadence-sweep", action="store_true",
                    help="additionally re-run the IVF phase at cadences "
                    "2/4/8/never and report the late/early ratio per "
                    "cadence (the compaction operating table)")
    args = ap.parse_args()
    if args.batches < 4:
        # _ratio needs batches 2-4 for its early median — fail BEFORE
        # minutes of sink work, not after (review finding, r8)
        ap.error("--batches must be >= 4 (the late/early ratio needs them)")

    spark = get_spark("dedup-sink-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dedup_sink_probe_")
    out: dict = {"docs": args.docs, "batches": args.batches}

    # synthetic docs: ~1% near-dup rate via shared template ids
    docs = (
        spark.range(args.docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("alpha beta gamma delta"),
                (F.col("id") % (args.docs // 100 + 1)).cast("string"),
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") * 7).cast("string")),
            ).alias("text"),
        )
        .cache()
    )
    docs.count()

    state = os.path.join(work, "sigs")
    pairs = os.path.join(work, "pairs")
    sink_kw = {} if args.compact_every is None else {"compact_every": args.compact_every}
    sink = near_dup_maintenance_sink(state, pairs, threshold=0.3, **sink_kw)
    out["minhash"] = _drive(
        spark, sink, state,
        ((b, docs.filter((F.col("doc_id") % args.batches) == b)) for b in range(args.batches)),
    )

    # synthetic unit-ish vectors, dim 16, deterministic
    dim = 16
    vecs = (
        spark.range(args.docs)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.sin(F.col("id") * (i + 1) * 0.7) + F.cos(i * 1.3),
            ).alias("embedding"),
        )
        .cache()
    )
    vecs.count()

    state2 = os.path.join(work, "vecs")
    pairs2 = os.path.join(work, "vpairs")
    sink2 = embedding_dedup_maintenance_sink(state2, pairs2, threshold=0.9, dim=dim, **sink_kw)
    out["embedding"] = _drive(
        spark, sink2, state2,
        ((b, vecs.filter((F.col("vec_id") % args.batches) == b)) for b in range(args.batches)),
    )

    # streaming IVF index maintenance (r8.2): same flatness claim —
    # per-trigger cost is assignment (map-side) + redelivery anti-join
    # against the pruned store + one partitioned write, never a
    # corpus-wide read
    from rt_bigdata_spark.operators.similarity import _ivf_centroids
    from rt_bigdata_spark.streaming.sinks import ivf_index_maintenance_sink

    cents = _ivf_centroids(vecs, "vec_id", "embedding", 16)

    def run_ivf(tag: str, **kw) -> dict:
        # the IVF sink's per-batch data work is tiny (map-side assign +
        # small anti-join), so the O(#batches) dir-listing residual the
        # dedup sinks amortize under their hashing cost is RELATIVELY
        # visible here; the sink's BUILT-IN compaction cadence (r9 —
        # previously this probe had to call compact_dedup_store itself)
        # is what the flatness claim is conditioned on
        state3 = os.path.join(work, f"ivf_{tag}")
        sink3 = ivf_index_maintenance_sink(state3, cents, **kw)
        r = _drive(
            spark, sink3, state3,
            ((b, vecs.filter((F.col("vec_id") % args.batches) == b)) for b in range(args.batches)),
        )
        r["compact_every"] = kw.get("compact_every", "default(8)")
        return r

    out["ivf_index"] = run_ivf("main", **sink_kw)

    if args.cadence_sweep:
        # the operating table: how the flatness ratio responds to the
        # compaction knob (0 = never, i.e. O(#batches) listing growth)
        out["ivf_cadence_sweep"] = {
            str(c): {k: v for k, v in run_ivf(f"sweep{c}", compact_every=c).items()
                     if k in ("late_early_ratio", "late_early_ratio_incl_compaction",
                              "n_compactions", "sec")}
            for c in (2, 4, 8, 0)
        }

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
