"""End-to-end training-corpus curation (rt_bigdata_spark.pipelines):
a fixture corpus with one planted defect per stage, asserting each
stage removes exactly its target and the survivors export to
deterministic shards — the LLM-layer counterpart of the warehouse
DAG test in test_pipeline_e2e.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.pipelines import curate_training_corpus

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow


BASE = " ".join(f"w{i}" for i in range(30))  # 30 distinct tokens
PROBE2_TAIL = "followed by quite a few more benign trailing filler tokens attached"


@pytest.fixture()
def corpus(spark):
    near_a = BASE
    near_b = BASE.replace("w7", "edited")  # one-word edit: near-dup of near_a
    rows = [
        # ids 0-2: eval probes (decontamination list)
        (0, "held out benchmark question about the meaning of life", "eval"),
        (1, "another eval item nobody may train on ever", "eval"),
        # probe 2 contains an SSN: the curation gates would drop it as
        # TRAINING data, but it must still decontaminate the corpus
        # (probes are drawn from the raw input, not the survivors)
        (2, "benchmark answer key 123-45-6789 " + PROBE2_TAIL, "eval"),
        # probe 3 carries an email mid-n-gram (pairs with corpus doc 22)
        (3, "please email john@corp.com for the secret benchmark key", "eval"),
        # 10: contaminated — contains probe 0's full text (≥ one 8-gram)
        (10, "prefix words " + "held out benchmark question about the meaning of life" + " suffix", "web"),
        # 11/12: exact duplicates
        (11, "identical copy of this exact document body here", "web"),
        (12, "identical copy of this exact document body here", "web"),
        # 13/14: near-duplicates; 14 is longer-margin? margins differ by content
        (13, near_a, "web"),
        (14, near_b, "web"),
        # 15: repetitive spam
        (15, " ".join(["buy"] * 40), "web"),
        # 16: SSN → dropped; 17: email → kept with redaction
        (16, "my social security number is 123-45-6789 " + BASE, "web"),
        (17, "contact me at someone@example.com " + " ".join(f"own{i}" for i in range(25)), "web"),
        # 18: too short
        (18, "too short", "web"),
        # 21: contaminated by the PII-laden probe 2 — only detectable
        # if the probe set is NOT gated by the curation rules
        # shares probe 2's SSN-free 11-token tail (>= one 8-gram) but
        # carries no PII itself, so only decontamination can catch it
        (21, "leading words " + PROBE2_TAIL + " trailing", "web"),
        # 19-20: clean survivors in another source
        (19, " ".join(f"alpha{i}" for i in range(25)), "books"),
        (20, " ".join(f"beta{i}" for i in range(25)), "books"),
        # 22: contaminated by probe 3, whose every shared 8-gram SPANS
        # an email address — detectable only if matching runs on
        # PRE-redaction text (ADVICE r5: redact after the anti-join);
        # masking first would rewrite the corpus side to <EMAIL> and
        # the raw probe n-grams could never match
        (22, "unrelated opening please email john@corp.com for the secret benchmark key closing words", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, source: string")


def test_each_stage_removes_its_planted_defect(spark, corpus, tmp_path):
    from rt_bigdata_spark.operators.text_analysis import lcg_classifier_weights

    # all-positive weights: the classifier keeps everything (margin > 0),
    # isolating the other stages; quality-awareness of the keeper is
    # still exercised (distinct margins per near-dup member)
    weights = [abs(w) + 0.001 for w in lcg_classifier_weights(16, seed=3)]
    out = curate_training_corpus(
        corpus,
        weights,
        min_tokens=5,
        margin_threshold=0.0,
        max_top_token_frac=0.30,
        probe_ids_below=5,
        near_dup_threshold=0.5,
        export_path=str(tmp_path / "shards"),
        n_shards=2,
    )
    kept = {r.doc_id: r for r in out["kept"].collect()}

    assert 18 not in kept, "length gate"
    assert 15 not in kept, "repetition rule"
    assert 16 not in kept, "SSN drop"
    assert 10 not in kept, "decontamination"
    assert 21 not in kept, "decontamination via a probe the curation gates would drop"
    assert 22 not in kept, "decontamination across an email span (pre-redaction matching)"
    assert not {0, 1, 2, 3} & set(kept), "probes excluded from corpus"
    # exact dup: exactly one of 11/12 survives (the min id)
    assert (11 in kept) and (12 not in kept)
    # near-dup: exactly one of 13/14 survives — the HIGHER-margin one
    margins = {r.doc_id: r.quality_margin for r in out["quality"].collect()}
    want = 13 if margins[13] >= margins[14] else 14
    assert (want in kept) and ({13, 14} - {want}).pop() not in kept
    # email doc kept, text redacted
    assert 17 in kept and "someone@example.com" not in kept[17].text
    assert "<EMAIL>" in kept[17].text  # the typed placeholder tag, exactly
    # clean survivors untouched
    assert 19 in kept and 20 in kept

    # publish: every kept doc landed in a shard; manifest totals agree
    manifest = out["manifest"].collect()
    assert sum(r.n_docs for r in manifest) == len(kept)
    exported = spark.read.parquet(str(tmp_path / "shards"))
    assert sorted(r.doc_id for r in exported.collect()) == sorted(kept)


def test_budget_stage_caps_per_source(spark, corpus):
    from rt_bigdata_spark.operators.text_analysis import lcg_classifier_weights

    weights = [abs(w) + 0.001 for w in lcg_classifier_weights(16, seed=3)]
    out = curate_training_corpus(
        corpus,
        weights,
        min_tokens=5,
        margin_threshold=0.0,
        probe_ids_below=5,
        budget_tokens=30,  # tight: roughly one 25-30-token doc per source
    )
    kept = out["kept"].collect()
    by_source = {}
    for r in kept:
        by_source.setdefault(r.source, []).append(r)
    # greedy fill: tokens BEFORE a kept doc stay under budget, so at
    # most budget may be exceeded by one doc — with 25-token docs that
    # means ≤2 per source
    budget_rows = {r.doc_id: r for r in out["budget"].collect()}
    for src, rows in by_source.items():
        assert len(rows) <= 2, (src, rows)
        for r in rows:
            assert budget_rows[r.doc_id].cum_tokens - budget_rows[r.doc_id].n_tokens < 30


def test_order_stage_schedules_kept_set(spark, corpus):
    """Stage 9 (mix_alpha): the order table covers exactly the kept
    ids, weights derive from the POST-curation per-source counts, and
    it never filters the corpus (additive)."""
    import math

    from rt_bigdata_spark.operators.text_analysis import lcg_classifier_weights

    weights = [abs(w) + 0.001 for w in lcg_classifier_weights(16, seed=3)]
    out = curate_training_corpus(
        corpus,
        weights,
        min_tokens=5,
        margin_threshold=0.0,
        probe_ids_below=5,
        mix_alpha=0.5,
    )
    kept = {r.doc_id for r in out["kept"].collect()}
    order = out["order"].collect()
    assert {r.doc_id for r in order} == kept  # additive, complete
    # sched_key = src_rank / sqrt(n_source) on SURVIVING counts
    n_by_source = {}
    for r in out["kept"].collect():
        n_by_source[r.source] = n_by_source.get(r.source, 0) + 1
    for r in order:
        assert r.sched_key == r.src_rank / math.sqrt(n_by_source[r.source])
