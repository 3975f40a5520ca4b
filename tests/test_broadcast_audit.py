"""Source-level audit: every explicit ``F.broadcast(...)`` hint in the
package must broadcast a side that is BOUNDED — constant-size, bounded
by construction (query set / grid / vocab / batch), or bounded by a
documented caller contract — never a frame whose row count scales with
the corpus/fact SF.

Why source-level rather than plan-level: a broadcast hint looks
identical in the Catalyst plan whether the side is a 25-row nation
table or one-row-per-document; boundedness is a property of the
DATAFLOW feeding the hint, which only the source shows. The r11 verdict
flagged exactly this failure mode (ngram_jaccard_pairs force-broadcast
per-doc size frames — fine at sf0.1, an executor OOM in its documented
verify-at-100TB role), so the rule is now enforced mechanically: any
NEW ``F.broadcast`` call site fails this test until it is added to the
allowlist below with a written boundedness argument, which makes the
review explicit in the diff.

Complements tests/test_plan_quality.py's plan-level audits (no NL
joins, no Python UDFs, pushdown/pruning) — this one is the only audit
that must read source, because size-at-test-SF proves nothing about
size-at-100TB.
"""

from __future__ import annotations

import ast
import pathlib

import rt_bigdata_spark

PKG_ROOT = pathlib.Path(rt_bigdata_spark.__file__).parent

# (module-relative path, enclosing function) -> why the broadcast side
# is bounded. "Bounded" means its row count does NOT grow with the
# corpus / fact-table SF.
ALLOWED: dict[tuple[str, str], str] = {
    ("operators/behavior.py", "active_users_hll"): "day list — O(active days), calendar-bounded",
    ("operators/behavior.py", "activity_buckets"): "1-row global (lo, hi) time span",
    ("operators/behavior.py", "similar_from_activity_matrix"): (
        "probe matrix (probe_ids_below users × n_buckets rows) and the probe "
        "stats row set — both bounded by the probe-set parameter, never the "
        "corpus (r15: the scoring stage moved here out of "
        "similar_activity_topk so maintained matrices can feed it)"
    ),
    ("operators/expectations.py", "source_length_psi"): (
        "1-row corpus bucket totals (10 fixed conditional-agg columns)"
    ),
    ("operators/text_analysis.py", "trigram_backoff_surprisal"): (
        "1-row train-corpus token total N — the unigram/bigram surprisal shape"
    ),
    ("operators/curation_rules.py", "bloom_contamination"): (
        "Bloom set-bit positions — at most m (=65536) rows BY CONSTRUCTION, "
        "independent of probe-set and corpus size; that bound is the operator's "
        "entire reason to exist"
    ),
    ("operators/curation_rules.py", "contamination_pairs"): (
        "probe 8-gram set — filtered to id < probe_ids_below (eval-suite sized, "
        "not corpus sized); the probes!=None branch documents the AQE escape for big lists"
    ),
    ("operators/dedup.py", "embedding_near_dup_pairs"): (
        "VERIFY arm by contract: input is an LSH candidate subset, and the non-equi "
        "condition needs BNL — broadcast is the only non-cartesian physical strategy; "
        "discovery-scale input is documented as embedding_near_dup_lsh's job"
    ),
    ("operators/joins.py", "enrich_dims"): (
        "J3 dim-enrichment contract: dims mirror the reference's async-lookup caches "
        "(OrderWideAp.scala) — lookup tables bounded by the dim domain, per docstring"
    ),
    ("operators/quantization.py", "pq_adc_topk"): "query set — vec_id < n_queries, bounded by construction",
    ("operators/quantization.py", "sq8_encode"): "1-row per-dim min/max model",
    ("operators/quantization.py", "sq8_adc_topk"): (
        "1-row min/max model + caller-bounded query set — never the corpus"
    ),
    ("operators/quantization.py", "ivfpq_topk"): "query set with cell assignments — n_queries × n_probe rows",
    ("operators/quantization.py", "ivfpq_rerank_topk"): "query set — bounded by construction",
    ("operators/quantization.py", "ivfpq_cell_stats"): "1-row global totals",
    ("operators/routing.py", "route_by_config"): "routing config table — MySQL config source, admin-sized",
    ("operators/sampling.py", "temperature_mix"): "per-source counts — bounded by source (feed) cardinality",
    ("operators/sampling.py", "priority_sample"): (
        "1-row threshold τ (the (N+1)-th priority) joined onto the N-row "
        "TakeOrdered sample — constant-size both sides, never the corpus"
    ),
    ("operators/scale.py", "bucketed_group_order"): (
        "flag-gated (broadcast_offsets, default off): offsets are O(groups × n_buckets) "
        "and the caller opts in only where groups are known-small"
    ),
    ("operators/scale.py", "key_skew_profile"): "1-row totals crossJoined onto top-N rows",
    ("operators/scd.py", "scd2_merge"): "touched-key set — one row per key in the INGEST BATCH, churn-sized",
    ("operators/search.py", "bm25_topk"): "1-row corpus stats (N, avgdl, df_t)",
    ("operators/similarity.py", "brute_force_topk"): "query set — vec_id < n_queries",
    ("operators/similarity.py", "hyperplane_lsh_topk"): "query set with bucket ids",
    ("operators/similarity.py", "_topk_scored"): "query set with cell ids (IVF probe arm)",
    ("operators/similarity.py", "ivf_nprobe_sweep"): "query set — one exact pass amortized over the grid",
    ("operators/similarity.py", "contrastive_samples"): "query/anchor set — bounded by construction",
    ("operators/text_analysis.py", "unigram_surprisal"): "1-row corpus token total",
    ("operators/text_analysis.py", "bigram_surprisal"): "1-row context-vocab size",
    ("operators/text_analysis.py", "dsir_score"): (
        "hashed-feature log-ratios and 1-row totals — bounded by the num_buckets "
        "hash space (densified onto the bucket spine), not the corpus"
    ),
    ("operators/text_analysis.py", "_bpe_token_ids"): "BPE symbol table — vocab-bounded (n_merges + alphabet)",
    ("plans/textops.py", "q_doc_keywords"): "1-row n_docs scalar",
    ("plans/textops.py", "q_quality_gate_threshold"): "per-source median cutoffs — source-cardinality rows",
    ("plans/warehouse.py", "q_nation_trade"): "nation slice — constant 25-row table filtered to 2 names",
    ("plans/warehouse.py", "q_supplier_volume"): "nation (25 rows) and region (5 rows) — constant-size",
    ("streaming/sinks.py", "near_dup_batch_keepers"): "dropped-id set — bounded by the micro-batch's pair output",
}


def _broadcast_sites() -> list[tuple[str, str, int]]:
    """(module-relative path, enclosing function, line) for every
    F.broadcast call in the package source."""
    sites = []
    for path in sorted(PKG_ROOT.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        spans = [
            (n.lineno, n.end_lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        rel = str(path.relative_to(PKG_ROOT))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
            ):
                enclosing = [name for s, e, name in spans if s <= node.lineno <= (e or s)]
                fn = enclosing[-1] if enclosing else "<module>"
                sites.append((rel, fn, node.lineno))
    return sites


def test_every_broadcast_hint_is_reviewed_bounded():
    """No F.broadcast of an unbounded side anywhere in the package: each
    call site must carry an allowlist entry arguing boundedness."""
    sites = _broadcast_sites()
    assert sites, "audit found no broadcast sites — extraction broke?"
    unreviewed = [
        f"{rel}:{line} in {fn}()" for rel, fn, line in sites if (rel, fn) not in ALLOWED
    ]
    assert not unreviewed, (
        "F.broadcast call sites without a boundedness review — if the side is "
        "bounded (constant / query-set / batch / vocab / config sized), add an "
        "ALLOWED entry in tests/test_broadcast_audit.py explaining why; if it "
        f"scales with the corpus, drop the hint and let AQE decide: {unreviewed}"
    )


def test_allowlist_carries_no_dead_entries():
    """Entries for removed call sites must be deleted — a stale allowlist
    row could silently re-authorize a reintroduced unbounded hint."""
    live = {(rel, fn) for rel, fn, _ in _broadcast_sites()}
    dead = [k for k in ALLOWED if k not in live]
    assert not dead, f"allowlist entries with no matching call site: {dead}"


def test_known_unbounded_sites_stay_fixed():
    """The r11 flaw class, pinned: these functions previously force-
    broadcast SF-scaling frames (per-doc sizes; full customer/part;
    nation-filtered supplier/customer; per-key moments). None of them
    may carry a broadcast hint again."""
    by_fn = {(rel, fn) for rel, fn, _ in _broadcast_sites()}
    regressions = [
        key
        for key in [
            ("operators/dedup.py", "ngram_jaccard_pairs"),
            ("operators/aggregations.py", "zscore_outliers"),
            ("plans/warehouse.py", "q_keyword_stats_4product"),
            ("plans/warehouse.py", "q_customer_quartiles"),
        ]
        if key in by_fn
    ]
    assert not regressions, f"unbounded broadcast hints reintroduced: {regressions}"
