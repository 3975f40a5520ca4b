"""Unit/property tests for the round-5 second batch: spherical k-means
+ SemDeDup (operators/clustering.py), BM25 search (operators/search.py),
exact-N stratified sampling and snapshot diff.

The oracle-parity suite already hash-checks each registered query
against DuckDB; these tests pin the operator-level CONTRACTS the
oracles can't see — partition-layout independence of the k-means model
(the property the integer quantization buys), SemDeDup's keep rule
against a brute-force reference, BM25 ranking monotonicity, exact
per-stratum counts, and diff-status semantics.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.operators.clustering import kmeans_lloyd, semdedup
from rt_bigdata_spark.operators.sampling import stratified_sample
from rt_bigdata_spark.operators.search import bm25_topk
from rt_bigdata_spark.operators.versioning import snapshot_diff
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_kmeans_is_partition_layout_independent(spark, emb):
    """The centroid chain (and therefore every assignment) must be
    bit-identical regardless of how the input is partitioned — the
    exact-integer component sums are what make Lloyd's float math
    order-independent. A plain double sum fails this test."""
    a1, c1 = kmeans_lloyd(emb.repartition(3), k=4, iters=2)
    a2, c2 = kmeans_lloyd(emb.repartition(17, "label"), k=4, iters=2)
    assert c1 == c2  # float-exact centroid equality
    r1 = sorted(map(tuple, a1.collect()))
    r2 = sorted(map(tuple, a2.collect()))
    assert r1 == r2


def test_kmeans_assigns_every_vector_once(emb):
    out, cents = kmeans_lloyd(emb, k=4, iters=1)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert len({r.vec_id for r in rows}) == len(rows)
    assert {r.cluster for r in rows} <= set(range(1, 5))
    # spherical k-means: final centroids are unit vectors
    for c in cents:
        assert math.isclose(sum(x * x for x in c), 1.0, rel_tol=1e-9)


def test_semdedup_prunes_exact_duplicates_keeps_lowest_id(spark):
    """Two identical vectors land in the same cluster (cosine 1.0);
    the higher id must be pruned, the lower kept. An orthogonal
    vector survives."""
    dim = 4
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 0),  # exact dup of 1 -> pruned
        (3, [0.0, 1.0, 0.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")
    out = {r.vec_id: r.kept for r in semdedup(df, k=2, iters=1, tau=0.9).collect()}
    assert out[1] is True
    assert out[2] is False
    assert out[3] is True and out[4] is True


def test_semdedup_matches_bruteforce_rule(emb):
    """kept == 'no lower-id same-cluster neighbor with cosine >= tau',
    checked against a driver-side brute force over the same final
    assignment."""
    tau = 0.4
    out = semdedup(emb, k=4, iters=1, tau=tau)
    asg, cents = kmeans_lloyd(emb, k=4, iters=1)
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    cluster = {r.vec_id: r.cluster for r in asg.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 9)

    for r in out.collect():
        expect_pruned = any(
            cluster[j] == cluster[r.vec_id] and j < r.vec_id and cos(vecs[j], vecs[r.vec_id]) >= tau
            for j in vecs
        )
        assert r.kept == (not expect_pruned), r.vec_id


def test_bm25_ranks_term_density_over_length(spark):
    """A short doc saturated with the query terms must outrank a long
    doc that mentions one term once; a doc with zero hits scores 0."""
    docs = [
        (1, "hash join hash join hash"),
        (2, "join " + "filler word soup " * 40),
        (3, "entirely unrelated content here"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = {r.doc_id: (r.score, r.rank) for r in bm25_topk(df, ("hash", "join"), k=3).collect()}
    assert out[1][1] == 1
    assert out[3][0] == 0.0
    assert out[1][0] > out[2][0] > out[3][0]


def test_bm25_handles_null_text_and_k_bound(spark):
    df = spark.createDataFrame(
        [(1, "hash"), (2, None), (3, "hash hash")], "doc_id: long, text: string"
    )
    rows = bm25_topk(df, ("hash",), k=2).collect()
    assert len(rows) == 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
    assert all(r.doc_id != 2 for r in rows)  # null text = empty doc, scores 0, cut by k


def test_stratified_sample_exact_counts_and_layout_independence(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = stratified_sample(docs, 3, seed="9")
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    src_totals = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, total in src_totals.items():
        assert counts.get(s, 0) == min(3, total)
    # deterministic under repartitioning
    again = stratified_sample(docs.repartition(13), 3, seed="9")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, ""), (5, "new")], "doc_id: long, text: string"
    )
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # NULL hashes as '' — equal to the new empty string
        5: "added",
    }


def test_ivf_nprobe_sweep_monotone_and_consistent_with_search(spark):
    """The n_probe/recall curve from one pass must (a) be monotone
    non-decreasing in n_probe, (b) reach recall 1.0 at n_probe =
    n_centroids (every cell probed ⇒ every true neighbor reachable),
    and (c) agree with an actual ivf_topk run at each grid point:
    every exact neighbor the sweep calls reachable at p sits in a
    probed cell of the real search with n_probe=p."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.similarity import (
        _assign_cells,
        _ivf_centroids,
        _probe_queries,
        brute_force_topk,
        ivf_nprobe_sweep,
    )
    from rt_bigdata_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 200)
    queries = emb.filter(F.col("vec_id") < 3)
    n_cent = 8
    grid = (1, 2, 4, 8)
    rows = {
        int(r.n_probe): r
        for r in ivf_nprobe_sweep(emb, queries, grid, k=5, n_centroids=n_cent).collect()
    }
    assert set(rows) == set(grid)
    recalls = [rows[p].recall for p in sorted(grid)]
    assert recalls == sorted(recalls)
    assert rows[n_cent].recall == 1.0 and rows[n_cent].n_reachable == rows[n_cent].n_true
    assert all(r.n_true == rows[1].n_true for r in rows.values())  # constant denominator

    # cross-check one interior point against the real search machinery
    cents = _ivf_centroids(emb, "vec_id", "embedding", n_cent)
    exact = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    p = 2
    probed = _probe_queries(queries, cents, "vec_id", "embedding", n_probe=p).select(
        "query_id", "cell"
    )
    ncell = _assign_cells(emb, cents, "vec_id", "embedding").select("neighbor_id", "cell")
    reachable_direct = (
        exact.join(ncell, "neighbor_id").join(probed, ["query_id", "cell"], "semi").count()
    )
    assert reachable_direct == rows[p].n_reachable


def test_semdedup_collapse_equals_naive_on_duplicate_cliques(spark):
    """r12: the exact-dup collapse must be bit-identical to naive
    cluster-local enumeration on a corpus of 6-way duplicate cliques —
    the shape whose quadratic blowup the 30× probe caught (3.7 s →
    271 s pre-fix). The naive form is computed inline here (the
    pre-collapse algebra) rather than kept as a second code path."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.clustering import kmeans_lloyd, semdedup
    from rt_bigdata_spark.operators.similarity import cosine

    base = [
        [1.0, 0.0, 0.0, 0.0], [0.9, 0.1, 0.0, 0.0],  # near-dup pair, same cluster
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0], [0.0, 0.05, 0.95, 0.0],
    ]
    rows = []
    vid = 0
    for rep in range(6):  # 6-way exact-dup cliques, interleaved ids
        for v in base:
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    docs = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {r.vec_id: (r.cluster, r.kept) for r in semdedup(docs, k=3, iters=1, tau=0.9).collect()}
    assert len(got) == len(rows)

    # naive enumeration: assignment from the SAME trained model, then
    # raw cluster-local pairwise
    assigned, cents = kmeans_lloyd(docs, k=3, iters=1)
    asg = assigned.select(F.col("vec_id"), F.col("cluster"))
    a = asg.alias("a").join(docs.alias("da"), F.col("a.vec_id") == F.col("da.vec_id")).select(
        F.col("a.vec_id").alias("id_a"), F.col("a.cluster").alias("c_a"), F.col("da.embedding").alias("va")
    )
    b = a.select(F.col("id_a").alias("id_b"), F.col("c_a").alias("c_b"), F.col("va").alias("vb"))
    pruned = {
        r.id_a
        for r in a.join(b, (F.col("c_a") == F.col("c_b")) & (F.col("id_b") < F.col("id_a")))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 9) >= 0.9)
        .select("id_a").distinct().collect()
    }
    naive = {r.vec_id: (r.cluster, r.vec_id not in pruned) for r in asg.collect()}
    assert got == naive
    # sanity: every non-minimum clique member is pruned
    assert sum(1 for _, (c, kept) in got.items() if kept) <= len(base)


def test_semdedup_rejects_tau_above_cosine_ceiling(spark):
    import pytest as _pt

    from rt_bigdata_spark.operators.clustering import semdedup

    docs = spark.createDataFrame([(1, [0.1, 0.2])], "vec_id: long, embedding: array<double>")
    with _pt.raises(ValueError, match="<= 1.0"):
        semdedup(docs, tau=1.2)


def test_embedding_validation_gate_classifies_all_failure_modes(spark):
    """r12 vector ingest contract: nulls, wrong dims, NaN and ±Inf are
    counted apart and excluded by valid_embeddings; the two halves of
    the gate (audit + filter) must agree on every row."""
    from rt_bigdata_spark.operators.similarity import (
        embedding_validation_stats,
        valid_embeddings,
    )

    rows = [
        (1, [1.0, 2.0]),
        (2, None),
        (3, [1.0]),                     # wrong dim
        (4, [float("nan"), 1.0]),       # NaN
        (5, [float("inf"), 0.0]),       # +Inf
        (6, [0.5, -0.5]),
        (7, [1.0, 2.0, 3.0]),           # wrong dim (too long)
        (8, [1.0, None]),               # NULL element: forall→NULL trap
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    audit = embedding_validation_stats(df, dim=2).collect()[0]
    assert (audit.n_rows, audit.n_valid, audit.n_null, audit.n_wrong_dim, audit.n_nonfinite) == (
        8, 2, 1, 2, 3
    )
    # every row lands in exactly one bucket — the NULL-element row used
    # to land in NONE (forall returned NULL, advice-r12)
    assert audit.n_valid + audit.n_null + audit.n_wrong_dim + audit.n_nonfinite == audit.n_rows
    kept = sorted(r.vec_id for r in valid_embeddings(df, dim=2).collect())
    assert kept == [1, 6]
    assert len(kept) == audit.n_valid


def test_embedding_validation_oracle_parity_on_malformed_vectors(spark, tmp_path):
    """advice-r12: the registered DuckDB oracle must classify the
    NULL-ELEMENT row exactly like Spark — DuckDB's list_filter drops
    NULL-predicate elements, so without the explicit `x IS NULL OR`
    arm the oracle counted [1.0, NULL] as n_valid while Spark's
    un-coalesced forall counted it nowhere. Both sides now route it to
    n_nonfinite; this test runs the REGISTERED oracle SQL on the same
    malformed corpus Spark sees."""
    import duckdb

    from rt_bigdata_spark.operators.similarity import embedding_validation_stats
    from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = [
        (1, [1.0] * 64),
        (2, None),
        (3, [1.0]),
        (4, [float("nan")] + [0.0] * 63),
        (5, [1.0, None] + [0.0] * 62),  # NULL element
        (6, [0.5] * 64),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = str(tmp_path / "embeddings.parquet")
    df.write.mode("overwrite").parquet(out)

    spark_row = embedding_validation_stats(
        spark.read.parquet(out), dim=64
    ).collect()[0]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{out}/*.parquet')"
    )
    res = con.execute(REGISTRY["embedding_validation"].oracle)
    o_cols = [d[0] for d in res.description]
    oracle = dict(zip(o_cols, res.fetchone()))
    got = {c: getattr(spark_row, c) for c in o_cols}
    assert got == oracle
    assert got == {
        "n_rows": 6, "n_valid": 2, "n_null": 1, "n_wrong_dim": 1, "n_nonfinite": 2,
    }


def test_semdedup_enforces_non_null_vector_contract(spark):
    """advice-r12: out-of-contract NULL vectors must fail loudly at
    execution (in-plan assert_true, no extra pass) instead of silently
    folding into one cluster-(-1) clique under the exact-dup collapse."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(Exception, match="valid_embeddings"):
        semdedup(df, k=2, iters=1, tau=0.9).collect()


# --- Hybrid retrieval (RRF fusion) ----------------------------------


def test_hybrid_rrf_matches_python_reference(spark):
    """Fuse the two arms' collected rankings in plain python and
    assert identical fusion output (doc set, ranks, 9-dp scores)."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.search import bm25_topk, hybrid_search_rrf
    from rt_bigdata_spark.operators.similarity import brute_force_topk
    from rt_bigdata_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    terms = ("hash", "join", "vector")

    got = {
        r.rank: (r.doc_id, r.bm25_rank, r.vec_rank, r.rrf_score)
        for r in hybrid_search_rrf(docs, emb, terms, k_arm=20, k=10).collect()
    }

    lex = {r.doc_id: r.rank for r in bm25_topk(docs, terms, k=20).collect()}
    vec = {
        r.neighbor_id: r.rk
        for r in brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).collect()
    }
    fused = {}
    for d in set(lex) | set(vec):
        s = (1.0 / (60.0 + lex[d]) if d in lex else 0.0) + (
            1.0 / (60.0 + vec[d]) if d in vec else 0.0
        )
        fused[d] = (round(s, 9), lex.get(d, 0), vec.get(d, 0))
    order = sorted(fused, key=lambda d: (-fused[d][0], d))[:10]
    for rk, d in enumerate(order, start=1):
        score, lr, vr = fused[d]
        assert got[rk] == (d, lr, vr, score), (rk, got[rk], (d, lr, vr, score))


def test_hybrid_rrf_both_arms_beat_single_arm_at_same_rank(spark):
    """A doc ranked r in BOTH arms must outscore a doc ranked r in only
    one arm — the defining monotonicity of RRF."""
    from rt_bigdata_spark.operators.search import hybrid_search_rrf
    from rt_bigdata_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = hybrid_search_rrf(docs, emb, ("hash", "join", "vector"), k_arm=20, k=10).collect()
    for r in rows:
        assert (r.bm25_rank > 0) or (r.vec_rank > 0)
        single_best = 1.0 / 61.0  # best possible one-arm score
        if r.bm25_rank > 0 and r.vec_rank > 0:
            assert r.rrf_score > round(1.0 / (60.0 + max(r.bm25_rank, r.vec_rank)), 9) - 1e-12
        else:
            assert r.rrf_score <= round(single_best, 9) + 1e-12
