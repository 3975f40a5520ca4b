"""Corpus curation rules for training-data pipelines: repetition
quality signals (Gopher-style), PII detection/redaction, and benchmark
contamination checks.

Beyond-reference operators extending the SURVEY.md §7.2 step-9 layer.
Scale design notes per operator:

- ``repetition_stats``: the Gopher repetition filters (Rae et al. 2021,
  "Scaling Language Models", App. A1.1) — most-frequent-token fraction
  and duplicate/top bigram fractions. Two exploded two-level
  aggregations keyed by (doc_id, gram): maximal key cardinality, so the
  shuffle cannot skew; partial aggregation combines map-side.
- ``pii_scrub``: pure map-side regexp count + chained redaction — one
  scan, no shuffle, no Python. Patterns are written in the common
  Java-regex/RE2 dialect subset so the DuckDB oracle runs the SAME
  pattern strings (the oracle is the cross-engine dialect check).
- ``contamination_pairs``: n-gram overlap against a small probe set
  (the benchmark/eval suite in a real deployment). The probe side is
  broadcast — corpus-side work is one map-side shingle explode + a
  broadcast hash join; the only shuffle is the final per-pair count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rt_bigdata_spark.functions.text_fns import tokenize
from rt_bigdata_spark.operators.dedup import shingle_explode
from rt_bigdata_spark.operators.scale import ensure_parallelism

# PII patterns — the Java-regex ∩ RE2 dialect subset (no lookarounds,
# no backrefs), so Spark and DuckDB execute the identical strings.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc repetition signals: (doc_id, n_tokens, top_token_frac,
    top_bigram_frac, dup_bigram_frac).

    top_token_frac = count of the most frequent token / n_tokens;
    top_bigram_frac likewise over all (overlapping) bigrams;
    dup_bigram_frac = 1 − distinct_bigrams / total_bigrams. High values
    of any of these are the classic low-quality/templated-content
    signal the Gopher rules cut on. Docs with zero tokens drop out
    (nothing to score); docs with one token carry NULL bigram columns
    (mirrored by the oracle's LEFT JOIN).
    """
    df = ensure_parallelism(df)
    ident = F.col(id_col)
    toks = df.select(ident, F.explode(tokenize(F.col(text_col))).alias("tok"))
    tokc = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("ct"))
    tstats = tokc.groupBy(id_col).agg(
        F.sum("ct").cast("long").alias("n_tokens"),
        (F.max("ct").cast("double") / F.sum("ct")).alias("top_token_frac"),
    )
    tl = df.select(ident, tokenize(F.col(text_col)).alias("t")).filter(F.size("t") >= 2)
    bigram = tl.select(
        ident,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice("t", i, 2)),
            )
        ).alias("bg"),
    )
    bgc = bigram.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("ct"))
    bstats = bgc.groupBy(id_col).agg(
        (F.max("ct").cast("double") / F.sum("ct")).alias("top_bigram_frac"),
        (F.lit(1) - F.count(F.lit(1)).cast("double") / F.sum("ct")).alias(
            "dup_bigram_frac"
        ),
    )
    return tstats.join(bstats, id_col, "left")


def _redact(text: Column) -> Column:
    """Chained redaction; order matters (and is mirrored in the oracle):
    emails first (most specific), then SSN-shaped, then the broad phone
    pattern which would otherwise eat SSN digit runs."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_SSN, "<SSN>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII accounting + redaction: (doc_id, email_ct, ssn_ct,
    phone_ct, clean_sig) where clean_sig is md5 of the redacted text
    (the compact, hashable witness that both engines redacted to the
    same bytes). One map-side pass; counts run against the ORIGINAL
    text so overlapping patterns don't hide each other."""
    t = F.col(text_col)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("email_ct"),
        F.regexp_count(t, F.lit(PII_SSN)).cast("long").alias("ssn_ct"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("phone_ct"),
        F.md5(_redact(t)).alias("clean_sig"),
    )


def contamination_pairs(
    df: DataFrame,
    probe_ids_below: int = 5,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    probes: DataFrame | None = None,
) -> DataFrame:
    """Benchmark-contamination check: (doc_id, probe_id, shared_ngrams)
    for every corpus doc sharing ≥1 word ``n``-gram with a probe doc.
    Shingles are distinct per doc, so shared_ngrams counts distinct
    shared n-grams.

    ``probes`` is the eval-suite decontamination list as a
    ``(probe_id, text_col)`` DataFrame; when None, corpus docs with
    ``id < probe_ids_below`` stand in (self-pairs excluded by the
    ``id != probe_id`` filter — external probe lists should use an id
    namespace disjoint from doc ids so the filter never misfires).

    The DERIVED probe side (``probes=None``) is tiny by construction
    (id < probe_ids_below) and gets an explicit broadcast hint. A
    CALLER-SUPPLIED ``probes`` frame is left unhinted: a real
    eval-suite decontamination list (thousands of docs × distinct
    8-grams) can exceed the broadcast/driver limit, and AQE already
    broadcasts it at runtime when its measured size fits (r7 ADVICE).
    The corpus side is one map-side shingle explode. 8-grams are the
    standard decontamination unit (GPT-3 appendix C uses 8-13)."""
    df = ensure_parallelism(df)
    grams = shingle_explode(df, text_col, n=n, alias="g", keep=[id_col])
    if probes is None:
        probe_grams = F.broadcast(
            grams.filter(F.col(id_col) < probe_ids_below).select(
                F.col(id_col).alias("probe_id"), "g"
            )
        )
    else:
        probe_grams = shingle_explode(
            probes, text_col, n=n, alias="g", keep=["probe_id"]
        )
    return (
        grams.join(probe_grams, "g")
        .filter(F.col(id_col) != F.col("probe_id"))
        .groupBy(id_col, "probe_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
    )


def derived_probe_set(
    df: DataFrame,
    every: int = 53,
    probe_tokens: int = 27,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """A deterministic probe set DERIVED from the corpus: every
    ``every``-th doc with ≥1 token contributes its first
    ``probe_tokens`` tokens as a probe, with ``probe_id = -doc_id - 1``
    — the negative ids are disjoint from ANY non-negative corpus id
    space (an additive offset is only disjoint while ids stay under
    it; review finding, r7), so a doc pairs with the probe derived
    from ITSELF and overlap is guaranteed by construction.
    NULL/zero-token docs contribute no probe (their would-be probe
    text is empty, and an empty probe's single '' shingle would plant
    meaningless matches against every other empty doc). This is the
    verification harness for ``contamination_pairs`` on corpora where
    no real eval suite overlaps the fixture (the r6 verdict's
    vacuous-driver-row hole): it exercises the full probe-shingle →
    broadcast → overlap-count path with planted, engine-reproducible
    hits. Production passes the real decontamination list instead."""
    from rt_bigdata_spark.functions.text_fns import tokenize

    toks = tokenize(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.filter(F.col(id_col) % every == 0)
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 1)
        .select(
            (-F.col(id_col) - 1).alias("probe_id"),
            F.concat_ws(" ", F.slice(F.col("_t"), 1, probe_tokens)).alias(text_col),
        )
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII spans in ``text_col`` with typed placeholder tags
    (same chained redaction ``pii_scrub`` hashes): the KEEP-with-
    redaction path of the curation pipeline — docs whose only problem
    is an email/phone stay in the corpus with the span masked. Pure
    map-side."""
    return df.withColumn(text_col, _redact(F.col(text_col)))


# --- Bloom-filter decontamination ------------------------------------
#
# The fixed-size-state scale path for ``contamination_pairs``: a real
# eval-suite decontamination list at 100 TB scale can hold billions of
# distinct 8-grams — too big to broadcast raw and expensive even to
# shuffle-join against every corpus shingle. A Bloom filter collapses
# the ENTIRE probe gram set to ``m`` bits (relationally: at most ``m``
# distinct set-bit positions), broadcast-able BY CONSTRUCTION no matter
# how large the probe list grows. Membership is one-sided: a gram in
# the probe set ALWAYS hits (no false negatives — decontamination must
# never leak a benchmark doc), while a clean gram hits with probability
# ~(set_bits/m)^k (false positives over-drop, never under-drop).
#
# Hash family: position_i(g) = md5_32(i || ':' || g) mod m for
# i = 0..k-1 — the repo's standard portable md5-prefix hash, so DuckDB
# replays the positions bit-for-bit and the whole audit (including
# which grams false-positive) is hash-oracle-exact.

BLOOM_M = 65536  # filter bits (production sizes ~10 bits/element)
BLOOM_K = 4  # hash functions


def _bloom_pos(g: Column, salt: Column, m: int) -> Column:
    key = F.concat_ws(":", salt.cast("string"), g)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % F.lit(m)


def bloom_bits(
    probes: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """The filter itself: distinct set-bit positions (``pos`` column,
    ≤ m rows) of the probe set's word ``n``-grams under the k-salt md5
    family. Set-bit sets are a UNION MONOID — bits from disjoint probe
    slices merge by distinct-union, and re-merging is idempotent — so
    a growing eval suite maintains its filter incrementally
    (``streaming/sinks.bloom_maintenance_sink``) without ever
    re-scanning past probes."""
    salts = F.array(*[F.lit(i) for i in range(k)])
    pgrams = shingle_explode(probes, text_col, n=n, alias="g").distinct()
    return (
        pgrams.select(F.explode(salts).alias("salt"), "g")
        .select(_bloom_pos(F.col("g"), F.col("salt"), m).alias("pos"))
        .distinct()
    )


def merge_bloom_bits(parts: "list[DataFrame]") -> DataFrame:
    """Monoid merge: distinct union of set-bit positions (idempotent —
    unlike the count-monoid sinks, a replayed merge cannot corrupt a
    Bloom filter, though the sink keeps the standard version fence)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_contamination(
    df: DataFrame,
    probes: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: DataFrame | None = None,
) -> DataFrame:
    """Per-doc Bloom-membership decontamination AUDIT:
    ``(doc_id, n_grams, bloom_hits, exact_hits, false_pos)`` where
    ``bloom_hits`` counts the doc's distinct word ``n``-grams whose k
    Bloom positions are all set by the probe set, ``exact_hits`` counts
    grams literally present in the probe set, and
    ``false_pos = bloom_hits − exact_hits`` (≥ 0 always: Bloom filters
    have no false negatives — the property test pins it).

    This is the sketch-audit shape (province_stats_approx / HLL
    discipline): the registered spec carries BOTH arms so the driver
    hash-checks the filter's exact behavior INCLUDING its false
    positives; the production path drops the exact arm and keeps only
    the ≤ ``m``-row broadcast bits join.

    Plan: probe grams → k md5 positions → ≤ m distinct set bits
    (broadcast by construction); corpus grams fan out k rows each and
    equi-join the bits — a gram is flagged when all k salts match. The
    exact arm is one unhinted equi-join against the distinct probe
    grams (AQE broadcasts it while it fits; at eval-suite scale it is
    exactly the join the Bloom arm exists to replace)."""
    df = ensure_parallelism(df)
    salts = F.array(*[F.lit(i) for i in range(k)])
    grams = shingle_explode(df, text_col, n=n, alias="g", keep=[id_col])
    pgrams = shingle_explode(probes, text_col, n=n, alias="g").distinct()

    # Build: at most m rows regardless of probe-set size. A maintained
    # filter (bloom_maintenance_sink state, read back) drops in via
    # ``bits`` — it MUST have been built with the same (m, k, n).
    if bits is None:
        bits = bloom_bits(probes, m=m, k=k, n=n, text_col=text_col)

    probe_pos = grams.select(
        F.col(id_col), "g", F.explode(salts).alias("salt")
    ).withColumn("pos", _bloom_pos(F.col("g"), F.col("salt"), m))
    # Distinct grams per doc × distinct salts → count(*) == matched salts.
    bloomed = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("k_hit"))
        .filter(F.col("k_hit") == k)
    )
    exact = grams.join(pgrams, "g")

    per_doc = grams.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    b = bloomed.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("bloom_hits"))
    e = exact.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("exact_hits"))
    return (
        per_doc.join(b, id_col, "left")
        .join(e, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce(F.col("bloom_hits"), F.lit(0)).cast("long").alias("bloom_hits"),
            F.coalesce(F.col("exact_hits"), F.lit(0)).cast("long").alias("exact_hits"),
            (F.coalesce(F.col("bloom_hits"), F.lit(0)) - F.coalesce(F.col("exact_hits"), F.lit(0)))
            .cast("long")
            .alias("false_pos"),
        )
    )
