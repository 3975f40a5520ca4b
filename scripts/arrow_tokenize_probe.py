"""Arrow-kernel A/B for the tokenize/shingle hot path (r16 verdict
item 4, guide §4.2): measure the JVM expression chain (split + filter
+ transform/slice HOFs) against a ``mapInArrow`` + ``pyarrow.compute``
batch kernel on the SAME corpus, and check output equality.

This is a MEASUREMENT probe, not a shipped operator: adopting the
Arrow kernel would also require proving Java-regex ≡ RE2 semantics for
``[^\\p{L}\\p{N}]+`` and JVM ``lower()`` ≡ ``utf8_lower`` on every
corpus the oracle replays. The probe quantifies whether that proof is
worth pursuing at a scale factor where CPU dominates scheduling.

Both sides compute the same map-only quantity — per-doc DISTINCT
3-gram shingle count (``word_shingles`` semantics incl. the <n-token
clamp and NULL≡'' coalesce) — so the comparison isolates the
tokenize+shingle kernel, no shuffle on either side. The Arrow kernel
is fully vectorized (offset arithmetic + dictionary-encode + lexsort);
a row-at-a-time Python loop here would measure the loop, not Arrow.

    SPARK_GRAFT_SF_DIR=.scratch/sf1 python scripts/arrow_tokenize_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from rt_bigdata_spark.functions.text_fns import tokenize  # noqa: E402
from rt_bigdata_spark.operators.dedup import _shingles_of_tokens  # noqa: E402
from rt_bigdata_spark.session import get_spark  # noqa: E402
from rt_bigdata_spark.sources.tables import load_table  # noqa: E402


def arrow_shingles(it):
    """mapInArrow kernel: lower + regex-split + per-row distinct
    3-gram count, all via pyarrow.compute / numpy offset arithmetic —
    zero per-row Python."""
    for batch in it:
        texts = pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar("")))
        toks = pc.split_pattern_regex(texts, r"[^\p{L}\p{N}]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        flat = toks.flatten()
        # drop empty tokens (JVM `filter(t != '')`) and rebuild row
        # boundaries with a prefix sum over the keep mask
        keep = pc.not_equal(flat, pa.scalar(""))
        keep_np = keep.to_numpy(zero_copy_only=False)
        prefix = np.concatenate(([0], np.cumsum(keep_np)))
        noffs = prefix[offs]
        f = flat.filter(keep)
        n_tok = np.diff(noffs)  # tokens per row
        n_rows = len(n_tok)
        n = len(f)
        counts = np.zeros(n_rows, dtype=np.int64)
        if n >= 3:
            # gram starting at filtered position i spans i..i+2; valid
            # iff all three tokens belong to the same row
            grams = pc.binary_join_element_wise(
                f.slice(0, n - 2), f.slice(1, n - 2), f.slice(2, n - 2), " "
            )
            row_of = np.repeat(np.arange(n_rows), n_tok)
            valid = row_of[: n - 2] == row_of[2:n]
            gram_rows = row_of[: n - 2][valid]
            gv = grams.filter(pa.array(valid))
            # DISTINCT per row: dictionary-encode, then count unique
            # (row, code) pairs via one lexsort — vectorized dedup
            codes = pc.dictionary_encode(gv).indices.to_numpy(zero_copy_only=False)
            if len(codes):
                order = np.lexsort((codes, gram_rows))
                r_s, c_s = gram_rows[order], codes[order]
                first = np.concatenate(
                    ([True], (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1]))
                )
                counts = np.bincount(r_s[first], minlength=n_rows).astype(np.int64)
        # <3-token rows clamp to ONE gram (join of the whole row; ''
        # for empty docs) — word_shingles' greatest(k-n+1, 1) sequence
        counts = np.where(n_tok >= 3, counts, 1)
        yield pa.RecordBatch.from_arrays([pa.array(counts, pa.int64())], ["n_sh"])


def arrow_shingle_explode(it):
    """mapInArrow analog of ``shingle_explode``: emits (doc_id,
    shingle) rows — the FULL-OUTPUT variant adoption would need, which
    ships every distinct shingle string back across the Arrow→JVM
    boundary instead of one int64 per doc."""
    for batch in it:
        texts = pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar("")))
        toks = pc.split_pattern_regex(texts, r"[^\p{L}\p{N}]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        flat = toks.flatten()
        keep = pc.not_equal(flat, pa.scalar(""))
        keep_np = keep.to_numpy(zero_copy_only=False)
        prefix = np.concatenate(([0], np.cumsum(keep_np)))
        noffs = prefix[offs]
        f = flat.filter(keep)
        n_tok = np.diff(noffs)
        n_rows = len(n_tok)
        n = len(f)
        doc_ids = batch.column("doc_id")
        out_rows: list[np.ndarray] = []
        out_grams: list[pa.Array] = []
        if n >= 3:
            grams = pc.binary_join_element_wise(
                f.slice(0, n - 2), f.slice(1, n - 2), f.slice(2, n - 2), " "
            )
            row_of = np.repeat(np.arange(n_rows), n_tok)
            valid = row_of[: n - 2] == row_of[2:n]
            gram_rows = row_of[: n - 2][valid]
            gv = grams.filter(pa.array(valid))
            codes = pc.dictionary_encode(gv).indices.to_numpy(zero_copy_only=False)
            if len(codes):
                order = np.lexsort((codes, gram_rows))
                r_s, c_s = gram_rows[order], codes[order]
                first = np.concatenate(
                    ([True], (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1]))
                )
                out_rows.append(r_s[first])
                out_grams.append(gv.take(pa.array(order[first])))
        clamped = np.nonzero(n_tok < 3)[0]
        if len(clamped):
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(noffs, pa.int32()), f), pa.scalar(" ")
            )
            out_rows.append(clamped)
            out_grams.append(joined.take(pa.array(clamped)))
        rows = np.concatenate(out_rows) if out_rows else np.zeros(0, np.int64)
        gcol = pa.concat_arrays([a.cast(pa.string()) for a in out_grams]) if out_grams else pa.array([], pa.string())
        yield pa.RecordBatch.from_arrays(
            [doc_ids.take(pa.array(rows)), gcol], ["doc_id", "shingle"]
        )


def arrow_shingles_from_tokens(it):
    """DIALECT-SAFE hybrid: tokenize (lower + regex-split + filter)
    stays in the JVM; the batch arrives as a list<string> token column
    and this kernel does ONLY the n-gram construction — byte-level " "
    joins + per-row distinct. No string transformation that could
    diverge between utf8proc/RE2 and the JVM (measured divergences:
    U+0130 İ and Greek final sigma under utf8_lower) ever runs in
    Python."""
    for batch in it:
        toks = batch.column("_toks")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        f = toks.flatten()
        base = offs[0]
        noffs = offs - base
        n_tok = np.diff(noffs)
        n_rows = len(n_tok)
        n = len(f)
        doc_ids = batch.column("doc_id")
        out_rows: list[np.ndarray] = []
        out_grams: list[pa.Array] = []
        if n >= 3:
            grams = pc.binary_join_element_wise(
                f.slice(0, n - 2), f.slice(1, n - 2), f.slice(2, n - 2), " "
            )
            row_of = np.repeat(np.arange(n_rows), n_tok)
            valid = row_of[: n - 2] == row_of[2:n]
            gram_rows = row_of[: n - 2][valid]
            gv = grams.filter(pa.array(valid))
            codes = pc.dictionary_encode(gv).indices.to_numpy(zero_copy_only=False)
            if len(codes):
                order = np.lexsort((codes, gram_rows))
                r_s, c_s = gram_rows[order], codes[order]
                first = np.concatenate(
                    ([True], (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1]))
                )
                out_rows.append(r_s[first])
                out_grams.append(gv.take(pa.array(order[first])))
        clamped = np.nonzero(n_tok < 3)[0]
        if len(clamped):
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(noffs, pa.int32()), f), pa.scalar(" ")
            )
            out_rows.append(clamped)
            out_grams.append(joined.take(pa.array(clamped)))
        rows = np.concatenate(out_rows) if out_rows else np.zeros(0, np.int64)
        gcol = pa.concat_arrays([a.cast(pa.string()) for a in out_grams]) if out_grams else pa.array([], pa.string())
        yield pa.RecordBatch.from_arrays(
            [doc_ids.take(pa.array(rows)), gcol], ["doc_id", "shingle"]
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("arrow-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def timed_interleaved(arms: "dict[str, object]", reps: int = 4) -> "dict[str, float]":
        """Alternate the arms within each rep so every arm samples the
        same load window (this container's external load swings 0.4→7
        loadavg minute-to-minute); min per arm."""
        import os as _os

        best = {k: float("inf") for k in arms}
        for rep in range(reps):
            for label, df in arms.items():
                spark.sparkContext.setJobDescription(f"arrow-probe {label} rep{rep}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best[label] = min(best[label], time.perf_counter() - t0)
            print(
                f"rep {rep}: " + " ".join(f"{k}={best[k]:.2f}" for k in arms)
                + f" load={_os.getloadavg()[0]:.1f}",
                file=sys.stderr,
            )
        return {k: round(v, 3) for k, v in best.items()}

    # JVM staged HOF chain, map-only: per-doc distinct-shingle count
    # (same staging discipline as shingle_explode — tokenize once)
    jvm_df = docs.select(
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("_toks")
    ).select(F.size(_shingles_of_tokens(F.col("_toks"), 3)).alias("n_sh"))
    arrow_df = docs.select("text").mapInArrow(arrow_shingles, "n_sh long")

    # full-output arms: exploded (doc_id, shingle) rows — what adopting
    # the kernel inside shingle_explode would actually ship
    from rt_bigdata_spark.operators.dedup import shingle_explode

    jvm_explode = shingle_explode(docs, "text", n=3, keep=["doc_id"])
    arrow_explode = docs.select("doc_id", "text").mapInArrow(
        arrow_shingle_explode, "doc_id long, shingle string"
    )
    hybrid = docs.select(
        "doc_id", tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("_toks")
    ).mapInArrow(arrow_shingles_from_tokens, "doc_id long, shingle string")

    results: dict = {"sf_dir": sf_dir}
    results.update(
        {
            k + "_s": v
            for k, v in timed_interleaved(
                {
                    "jvm_count": jvm_df,
                    "arrow_count": arrow_df,
                    "jvm_explode": jvm_explode,
                    "arrow_explode": arrow_explode,
                    "hybrid_explode": hybrid,
                }
            ).items()
        }
    )
    ck = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.concat_ws("|", F.col("doc_id"), F.col("shingle")))).alias("h"),
    ).first()
    je, ae, he = ck(jvm_explode), ck(arrow_explode), ck(hybrid)
    results["explode_equal"] = bool(je.n == ae.n and je.h == ae.h)
    results["hybrid_equal"] = bool(je.n == he.n and je.h == he.h)
    results["explode_rows"] = int(je.n)
    # equality check: per-corpus sum AND distribution of per-doc counts
    jvm_hist = {r.n_sh: r.c for r in jvm_df.groupBy("n_sh").agg(F.count(F.lit(1)).alias("c")).collect()}
    arrow_hist = {r.n_sh: r.c for r in arrow_df.groupBy("n_sh").agg(F.count(F.lit(1)).alias("c")).collect()}
    results["equal"] = jvm_hist == arrow_hist
    results["jvm_total_shingles"] = int(sum(k * v for k, v in jvm_hist.items()))
    results["arrow_total_shingles"] = int(sum(k * v for k, v in arrow_hist.items()))
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
