"""Curation-rule operators: Gopher repetition signals, PII scrub
(including cross-engine regex-dialect parity on a fixture that
actually contains PII — the corpus has none), and benchmark
contamination pairs."""

from __future__ import annotations

import duckdb
import pytest

from rt_bigdata_spark.operators.curation_rules import (
    PII_EMAIL,
    PII_PHONE,
    PII_SSN,
    contamination_pairs,
    pii_scrub,
    repetition_stats,
)


@pytest.fixture(scope="module")
def rep_docs(spark):
    rows = [
        (1, "spam spam spam spam"),  # one token repeated: top_token_frac 1.0
        (2, "a b a b a b"),  # alternating: top bigram "a b" = 3/5
        (3, "all words here differ completely"),  # no repetition
        (4, "solo"),  # single token: bigram columns NULL
        (5, ""),  # zero tokens: dropped entirely
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_repetition_stats_values(spark, rep_docs):
    out = {r.doc_id: r for r in repetition_stats(rep_docs).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 5 (zero tokens) drops

    assert out[1].n_tokens == 4
    assert out[1].top_token_frac == 1.0
    assert out[1].top_bigram_frac == 1.0  # all 3 bigrams are "spam spam"
    assert out[1].dup_bigram_frac == pytest.approx(1 - 1 / 3, abs=1e-6)

    assert out[2].n_tokens == 6
    assert out[2].top_token_frac == 0.5
    assert out[2].top_bigram_frac == 0.6  # "a b" 3 of 5
    assert out[2].dup_bigram_frac == 0.6  # 2 distinct of 5

    assert out[3].top_token_frac == 0.2
    assert out[3].top_bigram_frac == 0.25
    assert out[3].dup_bigram_frac == 0.0

    assert out[4].n_tokens == 1
    assert out[4].top_bigram_frac is None and out[4].dup_bigram_frac is None


PII_ROWS = [
    (1, "contact jane.doe+spam@example-mail.co.uk or call +1 (555) 123-4567 now"),
    (2, "ssn 123-45-6789 appears, then email bob@corp.io, then 555 867 5309"),
    (3, "no pii at all in this document"),
    (4, "double first.last@a.de second@b.fr emails"),
]


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(PII_ROWS, "doc_id: long, text: string")
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (out[1].email_ct, out[1].ssn_ct, out[1].phone_ct) == (1, 0, 1)
    assert (out[2].email_ct, out[2].ssn_ct, out[2].phone_ct) == (1, 1, 2)
    assert (out[3].email_ct, out[3].ssn_ct, out[3].phone_ct) == (0, 0, 0)
    assert out[4].email_ct == 2


def test_pii_scrub_matches_duckdb_on_pii_fixture(spark):
    """The registered pii_scrub oracle only sees the PII-free corpus;
    this pins the dialect equivalence (Java regex vs RE2) where it
    matters — on text with real matches, including the redacted-bytes
    md5 witness."""
    df = spark.createDataFrame(PII_ROWS, "doc_id: long, text: string")
    s_rows = {tuple(r) for r in pii_scrub(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PII_ROWS)
    d_rows = set(
        con.execute(
            f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT),
                   CAST(len(regexp_extract_all(text, '{PII_SSN}')) AS BIGINT),
                   CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT),
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_SSN}', '<SSN>', 'g'),
                       '{PII_PHONE}', '<PHONE>', 'g'))
            FROM d
            """
        ).fetchall()
    )
    assert s_rows == d_rows


def test_contamination_pairs(spark):
    toks = "one two three four five six seven eight nine ten"
    rows = [
        (0, toks),  # probe
        (10, "prefix words then " + toks + " suffix"),  # contains probe 8-grams
        (11, "entirely unrelated words with no overlap whatsoever here"),
        (12, toks),  # identical to probe
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {(r.doc_id, r.probe_id): r.shared_ngrams for r in contamination_pairs(df, probe_ids_below=5).collect()}
    assert (10, 0) in out and out[(10, 0)] == 3  # probe's 3 distinct 8-grams all present
    assert (12, 0) in out and out[(12, 0)] == 3
    assert all(doc != 11 for doc, _ in out)


def test_contamination_probe_side_is_broadcast(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(i, f"w{i} x y z a b c d e") for i in range(20)], "doc_id: long, text: string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        contamination_pairs(df).explain(mode="formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_curation_ops_run_unchanged_on_streams(spark, tmp_path):
    """Batch=stream promise for the map-side curation layer: pii_scrub
    and chunk_documents are plain DataFrame->DataFrame functions, so
    the SAME code must run on a streaming DataFrame (file source,
    micro-batch) and produce the batch answer."""
    import json

    from rt_bigdata_spark.operators.packing import chunk_documents

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "mail me at a@b.io today one two three four five six"},
        {"doc_id": 2, "text": "clean text with several words to chunk into pieces"},
    ]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    assert stream.isStreaming

    scrubbed = pii_scrub(stream)
    chunked = chunk_documents(stream, chunk_tokens=4)

    q1 = scrubbed.writeStream.format("memory").queryName("pii_out").outputMode("append").start()
    q2 = chunked.writeStream.format("memory").queryName("chunk_out").outputMode("append").start()
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        got_pii = {r.doc_id: r.email_ct for r in spark.sql("SELECT * FROM pii_out").collect()}
        got_chunks = spark.sql("SELECT * FROM chunk_out").count()
    finally:
        q1.stop()
        q2.stop()

    batch_df = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows], "doc_id: long, text: string")
    assert got_pii == {r.doc_id: r.email_ct for r in pii_scrub(batch_df).collect()}
    assert got_pii[1] == 1 and got_pii[2] == 0
    assert got_chunks == chunk_documents(batch_df, chunk_tokens=4).count()


def test_derived_probe_set_planted_overlap_and_null_safety(spark):
    """derived_probe_set: negative-namespace probe ids (disjoint for
    any non-negative corpus ids), NULL/zero-token docs contribute no
    probe, and the composition with contamination_pairs plants the
    guaranteed self-overlap pair."""
    from rt_bigdata_spark.operators.curation_rules import (
        contamination_pairs,
        derived_probe_set,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (53, None),                      # selected but NULL -> no probe
        (106, ""),                       # selected but empty -> no probe
        (7, "unrelated words entirely here today friends"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    probes = derived_probe_set(df, every=53)
    got = {(r.probe_id, r.text) for r in probes.collect()}
    assert {p for p, _ in got} == {-1}  # only doc 0 qualifies; -doc_id-1
    pairs = contamination_pairs(df, probes=probes).collect()
    assert {(r.doc_id, r.probe_id) for r in pairs} == {(0, -1)}  # self-overlap planted
    assert all(r.shared_ngrams >= 1 for r in pairs)


# --- Bloom-filter decontamination -----------------------------------


def test_bloom_no_false_negatives(spark):
    """Defining Bloom property: every exact probe-set gram hits the
    filter, so bloom_hits >= exact_hits per doc, and a doc sharing an
    8-gram with a probe is ALWAYS flagged."""
    from rt_bigdata_spark.operators.curation_rules import bloom_contamination

    shared = "one two three four five six seven eight"
    rows = [
        (1, shared + " tail tokens here"),   # contains the probe gram
        (2, "totally different words with no overlap at all x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    probes = spark.createDataFrame([(0, shared)], "probe_id: long, text: string")
    got = {r.doc_id: r for r in bloom_contamination(docs, probes).collect()}
    assert got[1].exact_hits == 1 and got[1].bloom_hits >= 1
    for r in got.values():
        assert r.bloom_hits >= r.exact_hits
        assert r.false_pos == r.bloom_hits - r.exact_hits >= 0


def test_bloom_false_positives_forced_at_tiny_m(spark):
    """At m=1 every position is 0, so ANY probe gram saturates the
    filter and every corpus gram false-positives — the FP accounting
    columns must show exactly that (bloom_hits = n_grams, exact_hits
    unchanged). Pins the arithmetic the registered spec's m=65536
    keeps (deliberately) below saturation."""
    from rt_bigdata_spark.operators.curation_rules import bloom_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id: long, text: string",
    )
    probes = spark.createDataFrame(
        [(0, "p1 p2 p3 p4 p5 p6 p7 p8")], "probe_id: long, text: string"
    )
    r = bloom_contamination(docs, probes, m=1).collect()[0]
    assert r.exact_hits == 0
    assert r.bloom_hits == r.n_grams  # every gram collides at m=1
    assert r.false_pos == r.n_grams


def test_bloom_bits_side_is_broadcast(spark):
    """The ≤m-row set-bits side must enter the membership join as a
    broadcast (the fixed-size-state contract)."""
    from rt_bigdata_spark.operators.curation_rules import (
        bloom_contamination,
        derived_probe_set,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d e") for i in range(60)], "doc_id: long, text: string"
    )
    plan = bloom_contamination(docs, derived_probe_set(docs))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_script_profile_multilingual_fixture(spark):
    """Cross-script semantics the ASCII corpus can't exercise: CJK+latin
    mixes flag, kana dominates cjk when it outnumbers it, cyrillic
    detected, NULL ≡ empty → 'none', pure punctuation → other_ct."""
    from rt_bigdata_spark.operators.text_analysis import script_profile

    rows = [
        (1, "Hello 世界 123"),
        (2, "Привет мир"),
        (3, None),
        (4, "日本語のテキストです"),
        (5, "!!! ???"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r for r in script_profile(df).collect()}

    r1 = got[1]
    assert (r1.latin_ct, r1.digit_ct, r1.cjk_ct, r1.space_ct) == (5, 3, 2, 2)
    assert r1.dominant_script == "latin" and r1.mixed_script
    assert r1.nonascii_frac == 2 / 12

    r2 = got[2]
    assert r2.cyrillic_ct == 9 and r2.dominant_script == "cyrillic"
    assert not r2.mixed_script

    r3 = got[3]
    assert r3.n_chars == 0 and r3.dominant_script == "none"
    assert r3.nonascii_frac == 0.0 and not r3.mixed_script

    r4 = got[4]
    assert (r4.cjk_ct, r4.kana_ct) == (3, 7)
    assert r4.dominant_script == "kana" and r4.mixed_script
    assert r4.nonascii_frac == 1.0

    r5 = got[5]
    assert r5.other_ct == 6 and r5.dominant_script == "none"


def test_script_profile_dominant_ties_to_earlier_script(spark):
    """Equal top counts resolve to the earlier SCRIPT_CLASSES entry on
    both the operator and the oracle (first-max argmax)."""
    from rt_bigdata_spark.operators.text_analysis import script_profile

    df = spark.createDataFrame([(1, "ab 世界")], "doc_id: long, text: string")
    r = script_profile(df).collect()[0]
    assert r.latin_ct == r.cjk_ct == 2
    assert r.dominant_script == "latin"


def test_trigram_backoff_levels_and_values(spark):
    """Hand-computed stupid-backoff cascade on a fixture where every
    level fires: train = doc 0 ("a b c a b d"), test = doc 1
    ("x a b c x") → trigram 'x a b' backs off to the bigram level
    (0.4·c(ab)/c(a) = 0.4), 'a b c' hits the trigram level
    (c(abc)/c(ab) = 0.5), 'b c x' falls to the unseen floor
    (0.4·0.4·1/N, N=6)."""
    import math

    from rt_bigdata_spark.operators.text_analysis import trigram_backoff_surprisal

    df = spark.createDataFrame(
        [(0, "a b c a b d"), (1, "x a b c x")], "doc_id: long, text: string"
    )
    rows = trigram_backoff_surprisal(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_id == 1 and r.n_trigrams == 3
    assert (r.tri_hits, r.bi_hits, r.uni_hits, r.oov_hits) == (1, 1, 0, 1)
    expect = round(
        (-math.log(0.4) - math.log(0.5) - math.log(0.4 * (0.4 * (1.0 / 6.0)))) / 3.0, 6
    )
    assert r.surprisal == expect


def test_trigram_backoff_unigram_level_and_short_docs(spark):
    """A test trigram whose last word exists in train but whose vw
    bigram does not scores at the unigram level; docs with <3 tokens
    emit no row."""
    import math

    from rt_bigdata_spark.operators.text_analysis import trigram_backoff_surprisal

    df = spark.createDataFrame(
        [(0, "a b c a b d"), (1, "b c a d"), (3, "a b")], "doc_id: long, text: string"
    )
    got = {r.doc_id: r for r in trigram_backoff_surprisal(df).collect()}
    assert set(got) == {1}
    r = got[1]
    # 'b c a': tri level (c=1 / c('b c')=1); 'c a d': vw='a d' unseen,
    # w='d' seen once → unigram level 0.4·0.4·(1/6)
    assert (r.tri_hits, r.bi_hits, r.uni_hits, r.oov_hits) == (1, 0, 1, 0)
    expect = round((-math.log(1.0) - math.log(0.4 * (0.4 * (1.0 / 6.0)))) / 2.0, 6)
    assert r.surprisal == expect


def test_psi_zero_on_single_source_and_nonnegative(spark):
    """A single source IS the corpus, so every smoothed p equals q and
    PSI is exactly 0.0; PSI is a sum of (p-q)ln(p/q) terms, each >= 0,
    so it can never go negative."""
    from rt_bigdata_spark.operators.expectations import source_length_psi

    one = spark.createDataFrame(
        [(i, "s0", 10 * i) for i in range(40)], "doc_id: long, source: string, n_chars: long"
    )
    r = source_length_psi(one).collect()
    assert len(r) == 1 and r[0].psi == 0.0

    two = spark.createDataFrame(
        [(i, f"s{i % 2}", 37 * (i % 13)) for i in range(80)],
        "doc_id: long, source: string, n_chars: long",
    )
    for row in source_length_psi(two).collect():
        assert row.psi >= 0.0


def test_psi_flags_planted_length_drift(spark):
    """A source whose docs are all far longer than the corpus norm must
    score a much higher PSI than sources matching the norm."""
    from rt_bigdata_spark.operators.expectations import source_length_psi

    # drift as a MINORITY feed (the realistic monitoring shape: the
    # corpus reference is dominated by healthy sources)
    rows = []
    for i in range(60):
        rows.append((i, "normal_a", 80 + (i % 40)))
        rows.append((1000 + i, "normal_b", 90 + (i % 40)))
    for i in range(10):
        rows.append((2000 + i, "drifted", 5000 + i))  # all in the top bucket
    df = spark.createDataFrame(rows, "doc_id: long, source: string, n_chars: long")
    got = {r.source: r.psi for r in source_length_psi(df).collect()}
    assert got["drifted"] > 0.25  # the "action" band
    assert got["drifted"] > 3 * max(got["normal_a"], got["normal_b"])
