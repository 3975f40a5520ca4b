"""Physical-plan audits: the scale properties SURVEY.md §4 promises —
predicate pushdown, column pruning, broadcast dim joins, whole-stage
codegen, and no row-at-a-time Python in any registered query — asserted
on the actual Catalyst output, not taken on faith.

These run `explain` only (no execution), so they cover every registered
query cheaply.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from __spark_entry__ import queries
from tests.conftest import SF_DIR


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark) -> dict[str, str]:
    """ALL registered plans — ~2 min to build, so only the slow-tier
    blanket audits use it; targeted tests use plan_for (lazy, cached)."""
    return {name: plan_of(fn(spark, SF_DIR)) for name, fn in queries().items()}


_PLAN_CACHE: dict[str, str] = {}


def plan_for(spark, name: str, mode: str = "formatted") -> str:
    """Lazy cached plan of ONE registered query — keeps the targeted
    plan assertions in the <5 min fast tier (r10 verdict item 6)."""
    key = f"{name}:{mode}"
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = plan_of(queries()[name](spark, SF_DIR), mode=mode)
    return _PLAN_CACHE[key]


@pytest.mark.slow
def test_no_row_at_a_time_python_udf_anywhere(plans):
    """Every registered query stays JVM-side: no BatchEvalPython (legacy
    per-row Python UDF) in any plan. Arrow-batched Python (MapInPandas /
    ArrowEvalPython) is the sanctioned escape hatch and appears ONLY in
    the multimodal kernels, where a C codec would live."""
    from rt_bigdata_spark.plans.registry import REGISTRY

    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"per-row Python UDF in: {offenders}"
    arrow_users = [n for n, p in plans.items() if "ArrowEvalPython" in p or "MapInPandas" in p]
    assert all("multimodal" in REGISTRY[n].tags for n in arrow_users), arrow_users


def test_dim_enrichment_uses_broadcast_joins(spark):
    """J3: the reference's async-lookup-with-cache apparatus must appear
    as BroadcastHashJoin — a shuffle join over the tiny dims would be the
    100 TB failure mode."""
    p = plan_for(spark, "order_wide_enriched")
    assert p.count("BroadcastHashJoin") >= 4
    p2 = plan_for(spark, "province_stats")
    assert "BroadcastHashJoin" in p2


def test_filter_pushdown_reaches_scan(spark):
    """Catalyst pushes the pricing_summary shipdate predicate into the
    parquet scan (PushedFilters), so at 100 TB row groups that can't
    match are skipped at the source."""
    p = plan_for(spark, "pricing_summary")
    assert "PushedFilters: [" in p
    # at least one real pushed predicate, not just an empty list
    assert any(
        tok in p for tok in ("IsNotNull", "EqualTo", "GreaterThan", "LessThan", "In(")
    ), p[p.index("PushedFilters") : p.index("PushedFilters") + 200]


def test_column_pruning_reaches_scan(spark):
    """pricing_summary touches 7 of lineitem's 16 columns; the scan's
    ReadSchema must not include untouched wide columns like l_comment."""
    p = plan_for(spark, "pricing_summary")
    assert "l_comment" not in p
    assert "l_quantity" in p


def test_aggregates_are_partial_then_final(spark):
    """A8: map-side partial aggregation before the exchange — two
    HashAggregate nodes around one Exchange for the flagship agg."""
    p = plan_for(spark, "pricing_summary")
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_exact_dedup_is_single_shuffle(spark):
    """dedup_exact is one groupBy on the md5 key: exactly one
    hashpartitioning exchange, nothing else."""
    p = plan_for(spark, "dedup_exact")
    assert p.count("hashpartitioning") == 1


def test_whole_stage_codegen_covers_flagship(spark):
    """Simple-mode plans mark codegen'd stages with `*(n)` — the
    flagship agg must be inside a WholeStageCodegen span."""
    df = queries()["pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE finalizes the plan only on execution
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in p  # star prefix = inside a WholeStageCodegen span


def test_bucketed_join_is_exchange_free(spark):
    """SCALE.md's order_wide claim: pre-bucketing both fact tables on
    the order key eliminates the join shuffle. Write orders and
    lineitem bucketed on their keys, join them, and assert the executed
    plan contains NO Exchange — the join reads matching buckets
    task-aligned. Broadcast is disabled so the test exercises the SMJ
    path a 100 TB fact⋈fact join would take."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.scale import write_bucketed
    from rt_bigdata_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "bkt_orders", "o_orderkey", num_buckets=8)
    write_bucketed(lineitem, "bkt_lineitem", "l_orderkey", num_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bkt_orders")
            .join(spark.table("bkt_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        n = joined.count()
        p = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p
        # same rows as the plain (shuffling) join over the raw parquet
        expected = (
            load_table(spark, SF_DIR, "orders")
            .join(load_table(spark, SF_DIR, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .select("o_orderkey")
            .distinct()
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_interval_join_avoids_cartesian(spark):
    """J1: the order⋈detail interval join has an equi key (order id), so
    the planner must use a keyed join (SMJ/SHJ), never
    BroadcastNestedLoopJoin/CartesianProduct over the fact tables."""
    p = plan_for(spark, "order_wide")
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or ("BroadcastHashJoin" in p)


def test_ngram_jaccard_registered_query_is_df_capped(spark):
    """The registered dedup-discovery query must carry the stop-shingle
    document-frequency cap (textops._JACCARD_DF_CAP) — the uncapped
    shingle self-join is the named 100 TB hazard (a shingle in k docs
    creates k² pair rows). The cap surfaces as a post-aggregate filter
    on the shingle df column in the physical plan."""
    from rt_bigdata_spark.plans.textops import _JACCARD_DF_CAP

    assert f"<= {_JACCARD_DF_CAP}" in plan_for(spark, "ngram_jaccard")
    assert "NestedLoopJoin" not in plan_for(spark, "ngram_jaccard")


def test_embedding_dedup_lsh_is_cell_bucketed_not_nested_loop(spark):
    """The flagship-scale embedding dedup (LSH→exact-verify pipeline)
    must pair rows via an equi-join on the (table, bucket) cell — never
    a corpus-wide nested-loop/cartesian join. (Locally the tiny cell
    table broadcasts; at scale the same equi-join shuffles on the cell
    key — both are the bucketed shape.)"""
    p = plan_for(spark, "embedding_dedup_lsh")
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p or "ShuffledHashJoin" in p


def test_embedding_dedup_verify_is_hash_joins_not_nested_loop(spark):
    """Since round 5 ``embedding_dedup`` is the two-stage pipeline
    (LSH candidates → exact rescore of the candidate subset): its plan
    must contain ONLY equi joins — the raw O(n²) all-pairs kernel
    (``dedup.embedding_near_dup_pairs``) stays unregistered."""
    p = plan_for(spark, "embedding_dedup")
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p


@pytest.mark.slow
def test_no_corpus_wide_nested_loop_join_in_any_registered_plan(plans):
    """No registered query may pair the corpus against itself with a
    nested-loop/cartesian join. The only sanctioned NL joins broadcast
    a provably TINY side (bounded query set or 1-row scalar) against
    one corpus scan — O(n·k) with k bounded, not O(n²)."""
    justified = {
        "ann_cosine_topk",  # broadcast query set (vec_id < 5) vs corpus
        "filtered_ann",  # same broadcast query set, over the filtered corpus
        "unigram_surprisal",  # broadcast 1-row corpus token total
        "doc_keywords",  # broadcast 1-row n_docs scalar
        "bm25_search",  # broadcast 1-row corpus stats (N, avgdl, df_t)
        "contrastive_samples",  # broadcast query set (vec_id < 5) vs corpus
        "bigram_surprisal",  # broadcast 1-row context-vocab size V
        "key_skew",  # broadcast 1-row totals (sum, n_keys) onto the top-N rows
        "ann_recall",  # broadcast query set (vec_id < 5) — the exact arm
        # inside the recall audit is ann_cosine_topk's own shape
        "pq_ann_topk",  # broadcast query set (vec_id < 5) vs ONE scan of
        # the m-codes-per-row compressed corpus (O(n·queries), k bounded)
        "ivfpq_cell_stats",  # broadcast 1-row totals (t, n_cells) onto
        # the ≤n_centroids occupancy rows — the key_skew shape
        "ivf_nprobe_sweep",  # broadcast query set (vec_id < 5) — the
        # exact arm (recall denominator) is ann_cosine_topk's own shape;
        # everything downstream is k·|Q| pair rows
        "dsir_importance",  # broadcast 1-row feature totals (r_tot,
        # t_tot) onto the num_buckets-row stats table — the
        # unigram_surprisal/bm25 1-row-stats shape
        "similar_users",  # broadcast 1-row global time span (lo, hi)
        # onto the events scan — the bm25 corpus-stats shape; the
        # similarity join itself is a bucket EQUI-join vs a bounded
        # probe matrix (probes × n_buckets rows)
        "priority_sample",  # broadcast 1-row threshold τ onto the
        # already-TakeOrdered N-row sample (N×1 rows — constant work;
        # the corpus side is one scan into per-partition top-k heaps)
        "sq8_ann_topk",  # broadcast 1-row min/max model + broadcast
        # query set (vec_id < 5) vs ONE scan of the byte-code corpus
        # (O(n·queries), k bounded — the pq_ann_topk shape)
        "hybrid_search_rrf",  # composes the two sanctioned arms
        # verbatim: bm25_search's 1-row corpus-stats broadcast and
        # ann_cosine_topk's broadcast single-query set; the fusion
        # itself is a full-outer join of two <= k_arm-row rankings
        "trigram_surprisal",  # broadcast 1-row train-token total N
        # onto the scored trigram stream — the unigram_surprisal /
        # bigram_surprisal 1-row-stats shape one level up; all count
        # joins are equi-joins on gram keys
        "source_length_psi",  # broadcast 1-row corpus bucket totals
        # onto the O(sources)-row per-source frame — the key_skew /
        # ivfpq_cell_stats 1-row-totals shape
    }
    offenders = [
        n for n, pl in plans.items()
        if ("BroadcastNestedLoopJoin" in pl or "CartesianProduct" in pl) and n not in justified
    ]
    assert not offenders, f"nested-loop/cartesian joins outside the justified set: {offenders}"


def test_filtered_ann_indexed_prunes_partitions_and_semi_joins(spark):
    """filtered_ann_indexed must (a) partition-prune the IVF index scan
    to the probed cells (PartitionFilters on the cell directory key)
    and (b) apply the metadata filter as a semi-join BEFORE scoring."""
    df = queries()["filtered_ann_indexed"](spark, SF_DIR)
    p = plan_of(df)
    assert "PartitionFilters" in p and "cell" in p.split("PartitionFilters", 1)[1][:200], p
    assert "LeftSemi" in p, p
    assert "NestedLoopJoin" not in p and "CartesianProduct" not in p


def test_paragraph_dedup_is_single_scan_no_joins(spark):
    """paragraph_dedup must stay the one-scan two-agg shape: the naive
    chunk->keeper->join-back->totals composition plans THREE
    scan+tokenize+explode branches (the tokenize kernel 3x); the
    rewrite carries n_chunks on chunk rows and keeps full rows in the
    min(struct) keeper, so no join ever re-reads the corpus."""
    p = plan_for(spark, "paragraph_dedup")
    assert p.count("Scan parquet") + p.count("FileScan") <= 2, p  # formatted lists the node once + details
    assert "Join" not in p, p


def test_token_budget_threshold_prunes_before_the_sort(spark):
    """The 100 TB token-budget form must NOT contain a per-source full
    sort of the corpus: the exact window's input has to be the
    broadcast bucket-prune join (candidates ~ budget tokens per
    source), i.e. in the printed tree the first Window sits ABOVE a
    BroadcastHashJoin. The exact form (token_budget) windows the raw
    scan directly — that sort-everything shape must be absent here."""
    p = plan_for(spark, "token_budget_threshold")
    tree = p.split("(1) Scan")[0]
    first_window = tree.index("Window")
    join = tree.index("BroadcastHashJoin")
    assert first_window < join, (
        "exact-sort Window must consume the bucket-prune join, not the raw scan:\n" + tree
    )
    # The only OTHER window is the bucket-table cumulative sum (input
    # bounded by n_buckets rows per source), inside the broadcast build.
    assert tree.count("Window") == 2, tree
    bcast = tree.index("BroadcastExchange")
    assert tree.index("Window", first_window + 1) > bcast, tree


@pytest.mark.slow
def test_no_registered_query_sorts_a_full_group_partition(plans):
    """The r6-verdict blanket ban: no registered plan may contain a
    window that sorts a whole per-group partition by an md5-priority
    key — the single-giant-source 100 TB cliff. Mechanically: every
    ``windowspecdefinition`` whose ORDER key is an md5-priority column
    (the training-order operators name theirs ``_pr``/``pr``/``skey``)
    must carry the kernel's ``_bkt`` bucket in its PARTITION spec, so
    each sort task sees ~n/n_buckets rows. The offsets window (ordered
    BY ``_bkt`` over the bucket-counts table) is bounded by n_buckets
    rows per group and exempt by construction. ``token_budget`` is the
    registered EXACT contrast form (the oracle-readable reference
    semantics) whose production path is ``token_budget_threshold`` —
    the same exemption shape as quality_gate vs
    quality_gate_threshold."""
    import re

    exempt = {"token_budget"}
    offenders = []
    for name, p in plans.items():
        if name in exempt:
            continue
        for spec in re.findall(r"windowspecdefinition\((.*?), specifiedwindowframe", p):
            orders_by_priority = re.search(r"\b_?pr#|\bskey#", spec)
            if orders_by_priority and "_bkt#" not in spec:
                offenders.append((name, spec[:120]))
    assert not offenders, f"full-group md5-order windows (unbucketed sorts): {offenders}"


def test_pack_and_sample_windows_are_bucket_decomposed(spark):
    """concat_pack, mix_schedule, stratified_sample (and global_shuffle)
    must run on the bucket-decomposed kernel: exactly two windows — the
    bounded bucket-offsets window (ordered by _bkt) and the in-bucket
    exact window (partitioned by _bkt) — with the offsets broadcast
    back (BroadcastHashJoin), never a plain per-group full sort."""
    import re

    for name in ("concat_pack", "mix_schedule", "stratified_sample", "global_shuffle"):
        p = plan_for(spark, name)
        tree = p.split("(1) Scan")[0]
        specs = re.findall(r"windowspecdefinition\((.*?), specifiedwindowframe", p)
        assert len(specs) == 2, f"{name}: expected offsets + in-bucket windows, got {specs}"
        assert all("_bkt#" in s for s in specs), f"{name}: window not bucket-decomposed: {specs}"
        assert "BroadcastHashJoin" in tree, f"{name}: offsets not broadcast back:\n{tree}"
        first_window = tree.index("Window")
        assert first_window < tree.index("BroadcastHashJoin"), (
            f"{name}: exact window must consume the broadcast offsets join:\n{tree}"
        )


def test_quality_gate_threshold_has_no_corpus_sort(spark):
    """quality_gate_threshold exists to REPLACE quality_gate's
    per-source percent_rank sort: its plan must be a tiny percentile
    aggregate broadcast back onto the scan — no Window, no Sort over
    the corpus (the only sort the exact form needs is inside the
    window)."""
    p = plan_for(spark, "quality_gate_threshold")
    assert "Window" not in p, p
    assert "BroadcastHashJoin" in p, p
    exact = plan_for(spark, "quality_gate")
    assert "Window" in exact  # the contrast this variant removes


def test_salted_enrichment_plan_shape(spark):
    """r7 verdict item 3: the registered skew mitigation must actually
    route through the salt — the dim side's literal-range explode
    (Generate explode) is in the plan, and the join condition carries
    BOTH the natural key and the salt (grep the composite join key in
    the simple-mode plan, where join keys print inline)."""
    from __spark_entry__ import queries

    p = plan_for(spark, "salted_enrichment")
    # 16x dim replication: a Generate node whose generator is explode
    # (formatted mode prints the node name and the generator detail
    # in separate sections)
    assert "Generate" in p and "explode" in p, p
    df = queries()["salted_enrichment"](
        __import__("pyspark.sql", fromlist=["SparkSession"]).SparkSession.getActiveSession(),
        SF_DIR,
    )
    simple = plan_of(df, mode="simple")
    import re as _re

    join_lines = [ln for ln in simple.splitlines() if "Join" in ln]
    assert any(
        _re.search(r"user_id#\d+", ln) and _re.search(r"_salt#\d+", ln)
        for ln in join_lines
    ), simple


def test_windowgrouplimit_protects_naive_rank_filter(spark):
    """r7 verdict item 4: SCALE.md:253's honest finding — the naive
    `row_number() OVER (PARTITION BY g ORDER BY o) <= k` filter shape
    is protected by Spark's WindowGroupLimit rewrite (map-side per-
    group top-k BEFORE the exchange, so a giant group's final sort sees
    <= k x map-tasks rows, not the group). That protection is a
    VERSION-DEPENDENT optimizer rewrite, not a structural property:
    pin it so a Spark upgrade that drops or renames the rewrite is
    caught here instead of silently turning every naive rank filter
    back into a full per-group sort."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("doc_id"))
    naive = docs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    assert "WindowGroupLimit" in plan_of(naive), plan_of(naive)

    # and the rewrite does NOT fire once the rank column escapes the
    # filter shape (rank exposed, filter downstream of another op) —
    # the drift case SCALE.md documents as the reason the bucketed
    # kernel stays structural
    exposed = docs.withColumn("rn", F.row_number().over(w))
    assert "WindowGroupLimit" not in plan_of(exposed)


@pytest.mark.slow
def test_bounded_windows_carry_literal_partition_key(spark):
    """r7 verdict item 6: the three provably-bounded one-partition
    windows (key_skew_profile's top-N rank, bucketed_group_order's
    groupless offsets, BM25's top-k rank) are partitioned by a literal
    key, so BENCH tails stay free of `WindowExec: No Partition Defined`
    warnings and a FUTURE unpartitioned window stands out. Asserted
    structurally: no registered query's analyzed plan contains a
    window with an empty partition spec."""
    import re as _re

    from __spark_entry__ import queries as _qs

    offenders = []
    for name, fn in _qs().items():
        df = fn(spark, SF_DIR)
        ext = plan_of(df, mode="extended")
        for ln in ext.splitlines():
            m = _re.search(r"windowspecdefinition\((.*)\)", ln)
            if not m:
                continue
            args = m.group(1)
            # empty partition spec <=> the spec starts directly with an
            # ordering expression (ASC/DESC in the FIRST TOP-LEVEL
            # argument — a naive comma split would let an unpartitioned
            # window whose first ORDER key is a multi-arg function call
            # like round(x, 2) escape the ban; review finding, r8)
            depth, first = 0, args
            for i, ch in enumerate(args):
                if ch in "([":
                    depth += 1
                elif ch in ")]":
                    depth -= 1
                elif ch == "," and depth == 0:
                    first = args[:i]
                    break
            if " ASC" in first or " DESC" in first:
                offenders.append(f"{name}: {ln.strip()[:120]}")
    assert not offenders, offenders


def test_pq_distortion_is_joinless_constant_agg(spark):
    """pq_distortion's plan must be ONE corpus scan into a global
    (keyless) HashAggregate whose single row unpivots via Generate —
    no Join anywhere (codebooks/norms are literals), and no per-row
    Python. A Join or a grouped shuffle here would mean the audit
    stopped being the free by-product it is designed to be."""
    p = plan_for(spark, "pq_distortion")
    assert "Join" not in p, p
    assert "Generate" in p, p  # the m-row unpivot of the 1-row agg
    assert "HashAggregate" in p, p


def test_ivfpq_cell_stats_reads_only_partition_metadata(spark):
    """The occupancy audit counts rows per partition directory — its
    scan must read ZERO data columns (ReadSchema: struct<>; `cell` is
    the partition column, served from directory names), and the 1-row
    totals frame must come back via a broadcast, not a shuffle."""
    p = plan_for(spark, "ivfpq_cell_stats")
    assert "ReadSchema: struct<>" in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p


def test_ivfpq_rerank_stage2_is_pruned_and_broadcast(spark):
    """Two-stage retrieval: stage 1's index scan stays partition-pruned
    to the probed cells (PartitionFilters carries a cell filter), and
    stage 2's true-vector fetch joins via broadcast (the shortlist and
    query sides are tiny by construction) — a shuffle join or an
    unpruned index scan would re-introduce the corpus-wide read the
    two-stage design exists to avoid."""
    import re as _re

    p = plan_for(spark, "ivfpq_rerank_topk")
    assert _re.search(r"PartitionFilters: \[[^\]]*cell(#\d+)? IN", p), p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_sweep_family_leaves_no_unowned_persisted_rdds(spark):
    """r10 verdict item 5: the sweep audits persist their bounded pair
    sets (load-bearing — the 30× probe measured 2× without it) but the
    persists are OWNED now: _pair_threshold_counts materializes the
    grid-size curve, unpersists every owned cache, and hands back a
    local table. Registered sweep queries must therefore leave the
    session's persistent-RDD registry exactly as they found it — the
    compounding-cache leak (one pair set + one signature table per
    call, ADVICE r10) stays dead."""
    from rt_bigdata_spark.plans.registry import get_queries

    sc = spark.sparkContext
    # Drain caches other module-scoped fixtures may have left behind so
    # the delta below is attributable to the sweeps alone.
    before = dict(sc._jsc.getPersistentRDDs())
    qs = get_queries()
    for name in ("dedup_threshold_sweep", "embedding_tau_sweep"):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name
    after = dict(sc._jsc.getPersistentRDDs())
    leaked = set(after) - set(before)
    assert not leaked, (
        f"sweep queries left {len(leaked)} persisted RDD(s) cached with no "
        f"owner: ids {sorted(leaked)}"
    )


@pytest.mark.slow
def test_minhash_lsh_caller_owned_persist_is_bounded(spark):
    """ADVICE r11: minhash_lsh_pairs persists its signature table with a
    documented caller-owned lifetime — the one sanctioned in-session
    cache outside the sweeps' owned persists. The accepted leak is ONE
    entry, not one PER CALL: Spark's CacheManager keys cached plans
    canonically, so re-running the registered query re-hits the same
    entry. This pins that bound — if a refactor ever makes the plan
    non-canonical between runs (e.g. a fresh random seed in the plan),
    the cache would compound and this fails."""
    from rt_bigdata_spark.plans.registry import get_queries

    sc = spark.sparkContext
    q = get_queries()["minhash_lsh"]
    before = dict(sc._jsc.getPersistentRDDs())
    assert q(spark, SF_DIR).count() > 0
    after_one = dict(sc._jsc.getPersistentRDDs())
    first_run = set(after_one) - set(before)
    assert len(first_run) <= 1, (
        f"minhash_lsh should cache at most the signature table, got "
        f"{len(first_run)} new persisted RDDs"
    )
    for _ in range(2):
        assert q(spark, SF_DIR).count() > 0
    after_three = dict(sc._jsc.getPersistentRDDs())
    repeats = set(after_three) - set(after_one)
    assert not repeats, (
        f"repeated minhash_lsh runs accumulated {len(repeats)} extra "
        f"cached RDD(s) — the caller-owned cache must be plan-keyed, "
        f"not per-invocation"
    )
    # leave the session as found: drop the accepted cache entry
    for rdd_id in first_run:
        jrdd = dict(sc._jsc.getPersistentRDDs()).get(rdd_id)
        if jrdd is not None:
            jrdd.unpersist()


@pytest.mark.slow
def test_ngram_jaccard_caller_owned_persist_is_bounded(spark):
    """r15: ngram_jaccard_pairs persists its capped (doc, shingle-hash)
    table with the same caller-owned lifetime as minhash_lsh_pairs'
    signature persist — without it the interpreted shingle pipeline is
    re-planned on every plan branch (measured: 16 scans / 0
    ReusedExchange, 46 s executor CPU for a ~6 s tokenize pass). Same
    bound as the minhash test: at most ONE new cache entry on first
    run, ZERO growth on repeats (CacheManager keys the canonical
    plan)."""
    from rt_bigdata_spark.plans.registry import get_queries

    sc = spark.sparkContext
    q = get_queries()["ngram_jaccard"]
    before = dict(sc._jsc.getPersistentRDDs())
    assert q(spark, SF_DIR).count() > 0
    after_one = dict(sc._jsc.getPersistentRDDs())
    first_run = set(after_one) - set(before)
    assert len(first_run) <= 1, (
        f"ngram_jaccard should cache at most the shingle table, got "
        f"{len(first_run)} new persisted RDDs"
    )
    for _ in range(2):
        assert q(spark, SF_DIR).count() > 0
    after_three = dict(sc._jsc.getPersistentRDDs())
    repeats = set(after_three) - set(after_one)
    assert not repeats, (
        f"repeated ngram_jaccard runs accumulated {len(repeats)} extra "
        f"cached RDD(s) — the caller-owned cache must be plan-keyed, "
        f"not per-invocation"
    )
    for rdd_id in first_run:
        jrdd = dict(sc._jsc.getPersistentRDDs()).get(rdd_id)
        if jrdd is not None:
            jrdd.unpersist()


@pytest.mark.slow
def test_no_reinlined_expression_bomb_in_any_filter():
    """r12 guard for the inferred-filter re-inlining class: predicate
    pushdown substitutes alias definitions, so an inferred constraint
    (isnotnull on a join key, size>0 from a Generate) can re-inline a
    whole computed-column tree into a per-row Filter — semdedup carried
    its full k-means assignment (27 k chars) in an isnotnull filter,
    and winnow_pairs its quadratic gram tree in a size()>0 filter,
    each evaluated redundantly per row. Fixes: non-nullable join keys
    (coalesce), explode_outer + post-filter, staged materialization.
    This audit bounds every registered plan's longest Filter condition;
    plans whose OPERATOR IS a big filter are allowlisted with the
    measured intrinsic size."""
    from rt_bigdata_spark.plans.registry import get_queries

    # intrinsic big-filter operators: the filter IS the semantics
    ALLOWED_BIG = {
        "doc_curation": 12_000,  # quality-feature gate evaluates the feature struct in its filter (~8.7k)
        "quality_gate": 12_000,  # same feature-gate shape
        "quality_gate_threshold": 12_000,
        "heavy_hitters": 6_000,  # literal CMS grid array in the estimate filter (~2.9k)
    }
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    offenders = []
    for name, fn in get_queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
        longest = max(
            (len(l.strip()) for l in plan.splitlines() if l.strip().lstrip(":+- ").startswith("Filter")),
            default=0,
        )
        if longest > ALLOWED_BIG.get(name, 2_500):
            offenders.append(f"{name}: {longest}-char Filter")
    assert not offenders, (
        "registered plans carry suspiciously large Filter conditions — likely a "
        f"re-inlined computed column (see test docstring for fixes): {offenders}"
    )


@pytest.mark.slow
def test_packed_sequences_caller_owned_persist_is_bounded(spark):
    """r16: pack_token_sequences persists its per-doc (id, ids, n, _pr)
    frame — bucketed_group_order consumes it twice (offsets aggregate +
    join-back) and without the cache each branch re-plans the whole
    tokenize→encode→per-doc-agg pipeline (the r15 plan dump shows the
    token-ids subtree duplicated: 8 parquet scans for one table). Same
    caller-owned bound as the minhash/ngram persists: at most ONE new
    cache entry on first run, ZERO growth on repeats."""
    from rt_bigdata_spark.plans.registry import get_queries

    sc = spark.sparkContext
    q = get_queries()["packed_sequences"]
    before = dict(sc._jsc.getPersistentRDDs())
    assert q(spark, SF_DIR).count() > 0
    after_one = dict(sc._jsc.getPersistentRDDs())
    first_run = set(after_one) - set(before)
    assert len(first_run) <= 1, (
        f"packed_sequences should cache at most the per-doc ids frame, "
        f"got {len(first_run)} new persisted RDDs"
    )
    for _ in range(2):
        assert q(spark, SF_DIR).count() > 0
    after_three = dict(sc._jsc.getPersistentRDDs())
    repeats = set(after_three) - set(after_one)
    assert not repeats, (
        f"repeated packed_sequences runs accumulated {len(repeats)} extra "
        f"cached RDD(s) — the caller-owned cache must be plan-keyed, "
        f"not per-invocation"
    )
    for rdd_id in first_run:
        jrdd = dict(sc._jsc.getPersistentRDDs()).get(rdd_id)
        if jrdd is not None:
            jrdd.unpersist()


def test_stateful_kernels_prune_columns_before_python_boundary(spark):
    """r16 streaming fix (guide §4.1): stateful kernels must project to
    exactly the columns they read (plus the watermarked ``eventTime``)
    BEFORE the keyed shuffle and the JVM→Arrow→Python boundary — Spark
    cannot prune columns it cannot see into an opaque Python function,
    so a wide production log schema would otherwise cross both in full
    every micro-batch. Pins the projection helper and that the batch
    bounce kernel is insensitive to extra payload columns."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.streaming.stateful import (
        _prune_for_state,
        detect_bounces_batch,
    )

    wide = spark.createDataFrame(
        [("101", "home", None, "1", 10000, "x" * 64, 1.5)],
        "mid: string, page_id: string, last_page_id: string, is_new: string,"
        " ts: long, payload: string, score: double",
    ).withColumn("eventTime", F.timestamp_millis(F.col("ts")))

    pruned = _prune_for_state(wide, ("mid", "page_id", "ts"))
    # Exactly the kernel columns, plus eventTime kept for watermarks/timers.
    assert pruned.columns == ["mid", "page_id", "ts", "eventTime"]

    no_et = _prune_for_state(wide.drop("eventTime"), ("mid", "ts"))
    assert no_et.columns == ["mid", "ts"]

    # The kernel result must not depend on the pruned payload columns.
    out = {(r.mid, r.ts) for r in detect_bounces_batch(wide).collect()}
    assert out == {("101", 10000)}
