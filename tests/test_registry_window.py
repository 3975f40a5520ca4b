"""Driver-window composition guard: the correctness driver verifies
exactly the FIRST 50 entries of queries() (observed r01-r03). These
assertions fail the build if a registration change silently alters
which queries receive driver verification — forcing the window
composition to be a conscious choice, not a side effect."""

from __future__ import annotations

import json
from pathlib import Path

from rt_bigdata_spark.plans.registry import REGISTRY, get_oracles, get_queries

DRIVER_WINDOW = 50

# Queries that MUST sit inside the driver's verified window: the six
# round-4 operators that have never had a driver row + the round-5
# additions (filtered_ann_indexed, re-shaped embedding_dedup) + the
# never-rotated bench headliners. Seven multi-round-green trivials
# (nation_trade, integrity_audit, value_histogram, event_pivot,
# order_priority, province_stats_sql, top_k_products) yielded their
# slots in round 5 (priority=80; still oracle-verified every CI run by
# tests/test_oracle_parity.py).
MUST_BE_IN_WINDOW = {
    "repetition_stats", "pii_scrub", "contamination", "doc_chunks",
    "token_budget", "filtered_ann_indexed",
    # (filtered_ann — thrice-green r5-r7, indexed sibling keeps the
    # family in-window — yielded its slot in r8 to packed_sequences)
    "packed_sequences",
    "concat_pack", "global_shuffle", "mix_schedule", "paragraph_dedup",
    "dim_history_merge",
    # round-5 second batch (five more greens — text_quality,
    # ann_cosine_topk, corpus_profile, quality_gate, unigram_surprisal
    # — yielded their slots; all stay CI-oracle-verified):
    "semantic_clusters", "bm25_search", "stratified_sample",
    # (semdedup — thrice-green r5-r7 — yielded its slot in r8 to
    # bpe_encode_tokens, the full tokenizer application)
    "bpe_encode_tokens",
    # round-5 third batch (is_new_correction, bounce_detection,
    # cdc_routing, doc_keywords yielded their slots):
    "event_funnel", "cohort_retention",
    # round-5 fourth batch (sales_rollup — green r1-r4 — yielded its slot):
    "heavy_hitters",
    # round-5 fifth batch (order_wide_enriched, shipping_priority,
    # supplier_volume, product_stats — all green r1-r4 — yielded their
    # slots; still oracle-verified every CI run):
    "quality_classifier", "substring_dedup", "events_rollup",
    # round-5 sixth batch (keyword_stats, order_wide — green r1-r4 —
    # yielded their slots):
    "bpe_encode",  # r7: bpe_pairs (twice-green; the single step bpe_merges
    # subsumes) yielded its slot to the train->encode round trip
    # round-5 seventh batch (visitor_stats, province_stats — green
    # r1-r4 — yielded their slots):
    # (winnow_fingerprint — thrice-green r5-r7 — yielded in r8.2)
    # round-5 eighth batch (pricing_summary — green r1-r4 — yielded
    # its slot):
    # (point_in_time_join — thrice-green r5-r7 — yielded in r8.2)
    # (cluster_split — green r1-r4 — yielded its slot to this one):
    "contrastive_samples",
    # round-5 ninth batch (dup_clusters — green r1-r4 — yielded its slot):
    "key_skew",  # r7: bigram_surprisal (twice-green; unigram twin parked
    # four-times-green) yielded its slot to the skew diagnostics op
    # (doc_curation — green r1-r4 — yielded its slot):
    "dedup_keepers",
    # round-5 tenth batch (ngram_jaccard — green r1-r4, unchanged — yielded
    # its slot so the re-shaped embedding_dedup keeps its place):
    "event_anomalies",
    # round-5 eleventh batch (dedup_exact — green r1-r4 — yielded its slot):
    # (media_embedding — thrice-green r5-r7 — yielded in r8.3;
    # media_dedup composes the same encoder and stays in-window)
    # round-5 twelfth batch (sales_cube — green r4 — yielded its slot):
    "events_rollup_daily",
    # round-5 thirteenth batch (customer_quartiles, customer_max_order —
    # green r4 — yielded their slots):
    # (active_users — thrice-green r5-r7 — yielded in r8.2; r7 note:
    # winnow_pairs yielded its slot to media_resize)
    "dim_history",
    "embedding_dedup_lsh",
    # (embedding_dedup — six greens r1-r7 — yielded in r8.2)
    # round-6 batch: the two red-r5 rows re-verify with their fixed
    # oracles, embedding_dedup re-verifies non-vacuously, the four
    # forever-rows-only specs get their first hash rows, and the 100 TB
    # token-budget shape gets its first row. Five twice-green r4/r5
    # specs (simhash, sales_grouping_sets, rolling_revenue,
    # purchase_attribution, customer_activity) yielded their slots
    # (priority=80; still oracle-verified every CI run).
    "token_budget_threshold", "media_features", "media_frames",
    "province_stats_approx", "corpus_profile_approx",
    # round-6 second batch (ann_lsh_topk / ann_ivf_topk — twice-green —
    # yielded their slots): the composed multimodal dedup pipeline and
    # the iterative BPE merge loop
    "media_dedup", "bpe_merges",
    # round-6 third batch (minhash_lsh — twice-green — yielded its
    # slot): quality_gate's promised broadcast-threshold scale form
    "quality_gate_threshold",
    # round-7 batch: six twice-green r5 first-timers (corpus_diff,
    # doc_embedding, embedding_project, event_transitions,
    # user_sessions, dq_orders) yielded their slots (priority=80; still
    # oracle-verified every CI run). In: the HLL swap for the xN
    # activity expansion (new), and five once-green parked specs pulled
    # back through the window for their second green (priority=40).
    "active_users_hll", "media_resize",
    # round-8 batch: the five r4-green p40 specs pulled back in r7
    # (sales_cube, customer_quartiles, customer_max_order, nation_trade,
    # integrity_audit) got their second green in r7 and yielded their
    # slots (priority=80; still CI-oracle-verified). In: the skew
    # mitigation query (new — r7 verdict item 3), and the four
    # remaining once-green parked specs pulled back for their second
    # green (priority=40).
    "salted_enrichment",
    # (value_histogram, event_pivot, order_priority, province_stats_sql
    # — pulled back at p40 in r8, got their second green r04+r08,
    # yielded in r9; still CI-oracle-verified every run)
    # round-8 second batch: four multi-round greens yielded their
    # slots (embedding_dedup — six greens r1-r7, embedding_dedup_lsh
    # keeps the family; winnow_fingerprint — thrice-green r5-r7;
    # active_users — thrice-green, active_users_hll hash-checks the
    # exact columns too; point_in_time_join — thrice-green,
    # dim_history/dim_history_merge keep the SCD family; all stay
    # CI-oracle-verified every run). In: the approximate-index recall
    # audit, temperature sampling, and the PQ-compressed vector store
    # + its ADC search.
    "ann_recall", "temperature_mix", "pq_codes", "pq_ann_topk",
    # round-8 third batch: the IVF-PQ compressed-index probe
    # (media_embedding yielded).
    "ivfpq_topk",
    # round-9 batch: the four r8 p40 pull-backs yielded after their
    # second green. In: the production-shaped two-stage retrieval
    # (verdict r8 item 3) and three operational-audit diagnostics —
    # PQ reconstruction error, IVF-PQ cell-occupancy skew, and the
    # near-dup cluster-size profile.
    "ivfpq_rerank_topk", "pq_distortion", "ivfpq_cell_stats",
    "dup_cluster_sizes",
}


def test_window_is_entirely_oracle_backed():
    window = list(get_queries())[:DRIVER_WINDOW]
    oracles = get_oracles()
    missing = [n for n in window if n not in oracles]
    assert not missing, f"rows-only specs waste driver window slots: {missing}"


def test_must_verify_queries_are_inside_window():
    window = set(list(get_queries())[:DRIVER_WINDOW])
    out = sorted(MUST_BE_IN_WINDOW - window)
    assert not out, f"queries pushed out of the driver-verified window: {out}"


def test_window_budget_is_exactly_spent():
    """Oracle-backed specs with priority <= 50 fill the window exactly.
    If this fails on the high side, a new default-priority registration
    just displaced the tail of the window (pick priority=70 for new
    out-of-window specs, or consciously demote something to 80); on the
    low side, free slots exist — promote a priority-70/80 spec."""
    in_budget = [s for s in REGISTRY.values() if s.oracle is not None and s.priority <= 50]
    assert len(in_budget) == DRIVER_WINDOW, (
        f"{len(in_budget)} oracle-backed specs at priority<=50 vs window of {DRIVER_WINDOW}"
    )


def test_no_oracle_backed_spec_is_never_driver_verified():
    """Window honesty across rounds: every oracle-backed spec must
    either already have a driver row in some committed
    CORRECTNESS_r*.json, or sit inside the CURRENT window (so it gets
    its first row this round). Fails if a spec is parked outside the
    window before it has ever been externally verified — the r4
    failure mode where the newest operators were the only ones the
    driver never saw."""
    root = Path(__file__).resolve().parents[1]
    seen: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            # A 0-row hash match is vacuous (both engines emitted
            # nothing — the r5 embedding_dedup hole): it does not count
            # as having been verified.
            if (row.get("spark_rows") or 0) > 0:
                seen.add(name)
    window = set(list(get_queries())[:DRIVER_WINDOW])
    never = sorted(
        s.name
        for s in REGISTRY.values()
        if s.oracle is not None and s.name not in seen and s.name not in window
    )
    assert not never, (
        "oracle-backed specs with no non-vacuous driver row ever, parked "
        f"outside the window: {never}"
    )


def test_no_spec_stays_vacuous_in_window(spark):
    """r6 verdict item 2: a spec whose LAST >=2 driver rows were all
    vacuous (0 = 0 rows) has occupied a verified-window slot for two
    rounds without verifying anything. For every such spec still in
    the current window, actually RUN the registered Spark query at the
    test SF and require rows > 0 — i.e. the registration must have
    been changed (planted probes, different fixture slice) before this
    round's driver runs, or this test fails the build."""
    from tests.conftest import SF_DIR

    root = Path(__file__).resolve().parents[1]
    trailing_vacuous: dict[str, int] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if row.get("err") is None and (row.get("spark_rows") or 0) == 0:
                trailing_vacuous[name] = trailing_vacuous.get(name, 0) + 1
            else:
                trailing_vacuous[name] = 0
    window = set(list(get_queries())[:DRIVER_WINDOW])
    stale = sorted(n for n, k in trailing_vacuous.items() if k >= 2 and n in window)
    queries = get_queries()
    still_vacuous = [n for n in stale if queries[n](spark, SF_DIR).limit(1).count() == 0]
    assert not still_vacuous, (
        "in-window specs vacuous for >=2 consecutive driver rounds and STILL "
        f"producing 0 rows: {still_vacuous} — plant overlap or rotate them out"
    )
