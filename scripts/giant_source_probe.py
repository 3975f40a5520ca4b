"""Giant-single-source probe: the regime the bucket kernel exists for.

The replica scale probe grows ALL sources uniformly, so per-source
windows stay comfortably parallel and the r6 probe row for
token_budget_threshold read "flat-to-noise". The 100 TB hazard is one
DOMINANT source: a per-group window then sorts the whole source in a
single task. This probe synthesizes that shape directly — N docs, 95 %
in one source — and times each rewritten operator against an inline
reconstruction of its pre-r7 naive per-group-window form (bit-identical
outputs, asserted on a sample).

Usage:
    python scripts/giant_source_probe.py [--rows 2000000] [--skew 95]
Prints one JSON line:
  {"rows": N, "skew_pct": P, "ops": {op: {"naive": s, "bucketed": s}}}.

``--skew`` is the percentage of rows in the single giant source (r8:
probed at 99.9 to pin the regime where WindowGroupLimit's map-side
top-k no longer saves the naive forms). ``global_shuffle`` is probed
too (r8): its naive form is a GLOBAL row_number window — no partition
key at all, the canonical single-task sort — against the bucket
kernel's 256-way decomposition.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import Window

from rt_bigdata_spark.session import get_spark


def _corpus(spark, n: int, skew_pct: float):
    # skew_pct% of rows in one giant source; deterministic short texts
    # with varying token counts so the cumsum/rank work is realistic.
    mod = 1000
    cut = int(round(mod * skew_pct / 100.0))
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % mod < cut, F.lit("web"))
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 7).cast("string")))
            .alias("source"),
            F.concat_ws(
                " ",
                F.lit("tok"),
                F.col("id").cast("string"),
                F.repeat(F.lit("w "), (F.col("id") % 13).cast("int")),
            ).alias("text"),
        )
        .repartition(32)
    )
    return df.persist()


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--skew", type=float, default=95.0)
    args = ap.parse_args()

    spark = get_spark("giant-source-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = _corpus(spark, args.rows, args.skew)
    df.count()

    from rt_bigdata_spark.functions.text_fns import tokenize
    from rt_bigdata_spark.operators.packing import concat_pack
    from rt_bigdata_spark.operators.sampling import (
        global_shuffle,
        mix_schedule,
        stratified_sample,
    )

    results: dict[str, dict[str, float]] = {}

    # --- stratified_sample ---------------------------------------------------
    key = F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key, "doc_id")

    def naive_strat():
        (
            df.select("doc_id", "source", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 100)
            .select("doc_id", "source", F.col("rn").cast("long").alias("sample_rank"))
            .write.mode("overwrite").format("noop").save()
        )

    def fast_strat():
        stratified_sample(df, 100, seed="7").write.mode("overwrite").format("noop").save()

    results["stratified_sample"] = {"naive": _time(naive_strat), "bucketed": _time(fast_strat)}

    # --- concat_pack ---------------------------------------------------------
    txt = F.coalesce(F.col("text"), F.lit(""))
    scored = df.select(
        "doc_id",
        "source",
        F.size(tokenize(txt)).cast("long").alias("n_tokens"),
        F.md5(txt).alias("pr"),
    ).filter(F.col("n_tokens") > 0)
    wp = (
        Window.partitionBy("source")
        .orderBy("pr", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(wp)

    def naive_pack():
        scored.select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor((cum - F.col("n_tokens")) / 256).cast("long").alias("first_seq"),
            F.floor((cum - 1) / 256).cast("long").alias("last_seq"),
        ).write.mode("overwrite").format("noop").save()

    def fast_pack():
        concat_pack(df, seq_len=256).write.mode("overwrite").format("noop").save()

    results["concat_pack"] = {"naive": _time(naive_pack), "bucketed": _time(fast_pack)}

    # --- mix_schedule --------------------------------------------------------
    wm = Window.partitionBy("source").orderBy(F.md5(txt), "doc_id")

    def naive_mix():
        ranked = df.select("doc_id", "source", F.row_number().over(wm).alias("src_rank"))
        ranked.select(
            "doc_id",
            "source",
            F.col("src_rank").cast("long").alias("src_rank"),
            (F.col("src_rank") / F.lit(2.0)).alias("sched_key"),
        ).write.mode("overwrite").format("noop").save()

    def fast_mix():
        mix_schedule(df, {"web": 2.0}).write.mode("overwrite").format("noop").save()

    results["mix_schedule"] = {"naive": _time(naive_mix), "bucketed": _time(fast_mix)}

    # --- global_shuffle (r8) --------------------------------------------------
    # Naive: a truly UNPARTITIONED row_number window — all rows sort in
    # one task. Skew is irrelevant here (there are no groups): this is
    # the absolute worst window shape and the kernel's reason to exist.
    gkey = F.md5(F.concat_ws(":", F.lit("0"), F.col("doc_id").cast("string")))
    wg = Window.orderBy(gkey, "doc_id")

    def naive_global():
        (
            df.select("doc_id", F.row_number().over(wg).cast("long").alias("position"))
            .write.mode("overwrite").format("noop").save()
        )

    def fast_global():
        global_shuffle(df, seed="0").write.mode("overwrite").format("noop").save()

    results["global_shuffle"] = {"naive": _time(naive_global), "bucketed": _time(fast_global)}

    # Equivalence spot-check (bit-identical claim) on a 50k slice.
    small = df.filter(F.col("doc_id") < 50_000)
    naive = {
        tuple(r)
        for r in small.select(
            "doc_id", "source", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 100)
        .select("doc_id", "source", F.col("rn").cast("long").alias("sample_rank"))
        .collect()
    }
    fast = {tuple(r) for r in stratified_sample(small, 100, seed="7").collect()}
    assert naive == fast, "bucketed form diverged from the naive window"

    # global_shuffle equivalence on the same slice
    naive_g = {
        tuple(r)
        for r in small.select(
            "doc_id", F.row_number().over(wg).cast("long").alias("position")
        ).collect()
    }
    fast_g = {tuple(r) for r in global_shuffle(small, seed="0").collect()}
    assert naive_g == fast_g, "bucketed global order diverged from the naive window"

    print(json.dumps({"rows": args.rows, "skew_pct": args.skew, "ops": results}))


if __name__ == "__main__":
    main()
