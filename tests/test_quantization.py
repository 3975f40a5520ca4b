"""Product quantization (operators/quantization.py) + temperature mix
+ ANN recall-audit properties. Oracle parity for the four registered
queries runs in test_oracle_parity.py; these tests pin the operator
CONTRACTS the oracle can't see: partition-layout independence of
training, the exact-ADC relationship, the probe-everything=exact
recall identity, and temperature_mix ≡ mix_schedule under derived
weights."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow



def _emb(spark, n=200):
    from rt_bigdata_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < n)


def test_pq_train_is_partition_layout_independent(spark):
    """The integer-grid component sums make the codebooks independent
    of physical layout — same guarantee clustering.kmeans_lloyd
    documents, here for the L2 (un-normalized) variant."""
    from rt_bigdata_spark.operators.quantization import pq_train

    emb = _emb(spark)
    b1 = pq_train(emb.repartition(13), m=4, ks=4, iters=2)
    b2 = pq_train(emb.coalesce(1), m=4, ks=4, iters=2)
    assert b1 == b2  # bit-identical floats, not approx


def test_pq_codes_shape_and_range(spark):
    from rt_bigdata_spark.operators.quantization import pq_encode, pq_train

    emb = _emb(spark)
    books = pq_train(emb, m=4, ks=4, iters=2)
    codes = pq_encode(emb, books)
    n = emb.count()
    assert codes.count() == 4 * n
    stats = codes.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi"),
        F.countDistinct("sub").alias("subs"),
    ).first()
    assert stats["lo"] >= 1 and stats["hi"] <= 4 and stats["subs"] == 4


def test_pq_adc_matches_python_reference(spark):
    """ADC distance = sum over subspaces of ‖q_j − c_{assigned}‖² —
    recompute in plain python for one query and assert the operator's
    distances match to the rounding the operator applies."""
    from rt_bigdata_spark.operators.quantization import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = _emb(spark, n=60)
    books = pq_train(emb, m=4, ks=4, iters=2)
    queries = emb.filter(F.col("vec_id") < 1)
    got = {
        r["neighbor_id"]: r["dist"]
        for r in pq_adc_topk(emb, queries, books, k=5).collect()
    }
    codes = {
        (r["vec_id"], r["sub"]): r["code"] for r in pq_encode(emb, books).collect()
    }
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    rows = {r["vec_id"]: r for r in emb.collect()}
    for nid, dist in got.items():
        expect = 0.0
        for j in range(4):
            qj = qv[j * 16 : (j + 1) * 16]
            c = books[j][codes[(nid, j)] - 1]
            expect += (
                sum(x * x for x in qj) + sum(x * x for x in c)
                - 2 * sum(a * b for a, b in zip(qj, c))
            )
        assert dist == pytest.approx(expect, abs=2e-9), (nid, dist, expect)
        assert nid in rows and nid != 0


def test_pq_planted_near_duplicate_lands_in_minimal_adc_group(spark):
    """A vector nearly identical to the query codes identically in
    every subspace, so its ADC distance equals the query's own
    quantization error — the MINIMAL possible distance. ADC cannot
    rank candidates WITHIN one code cell (that's the PQ trade: rerank
    the short list against true vectors when intra-cell order
    matters), so the assertion is membership in the minimal-distance
    tie group, not rank 1."""
    from rt_bigdata_spark.operators.quantization import pq_adc_topk, pq_train

    emb = _emb(spark, n=100)
    near = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-6)).alias("embedding"),
        F.col("label"),
    )
    corpus = emb.unionByName(near)
    books = pq_train(emb, m=4, ks=4, iters=2)  # train without the plant
    queries = emb.filter(F.col("vec_id") < 1)
    top = pq_adc_topk(corpus, queries, books, k=101).collect()
    best = min(r["dist"] for r in top)
    plant = next(r for r in top if r["neighbor_id"] == 100000)
    assert plant["dist"] == best


def test_ivf_probe_all_cells_equals_brute_force_recall_one(spark):
    """Recall identity anchoring the audit: probing EVERY cell makes
    IVF exhaustive, so its top-k is exactly the brute-force top-k
    (same score, same tie rule) and recall@k is 1.0 per query."""
    from rt_bigdata_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=8)
    allprobe = ivf_topk(emb, queries, k=8, n_centroids=8, n_probe=8)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, allprobe.collect()))


def test_ann_recall_audit_values_are_recalls(spark):
    from rt_bigdata_spark.plans.textops import q_ann_recall

    rows = q_ann_recall(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        for arm in ("lsh", "ivf", "pq", "ivfpq"):
            assert 0 <= r[f"{arm}_hits"] <= 10
            assert r[f"{arm}_recall"] == r[f"{arm}_hits"] / 10.0


def test_registered_rerank_recall_dominates_adc_per_query(spark):
    """r8 verdict item 3's audit assertion, at the REGISTERED spec
    settings (shortlist=50, n_probe=4, k=10): per query,
    recall(ivfpq_rerank_topk) >= recall(ivfpq_topk). Guaranteed by
    construction — any exact-top-k member inside the ADC shortlist
    ranks top-k by true sim within it (at most k−1 corpus items beat
    it anywhere) — so a failure means the two stages stopped sharing
    the same probe/shortlist universe."""
    from rt_bigdata_spark.operators.similarity import brute_force_topk
    from rt_bigdata_spark.plans.textops import (
        _RECALL_K,
        q_ivfpq_rerank_topk,
        q_ivfpq_topk,
    )
    from rt_bigdata_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=_RECALL_K).collect()
    }

    def hits_by_query(df):
        got = {}
        for r in df.collect():
            key = (r["query_id"], r["neighbor_id"])
            got[r["query_id"]] = got.get(r["query_id"], 0) + (key in exact)
        return got

    adc = hits_by_query(q_ivfpq_topk(spark, SF_DIR))
    rr = hits_by_query(q_ivfpq_rerank_topk(spark, SF_DIR))
    assert set(rr) == set(adc)
    for q in adc:
        assert rr[q] >= adc[q], f"query {q}: rerank recall {rr[q]} < ADC {adc[q]}"


def test_temperature_mix_equals_mix_schedule_with_sqrt_weights(spark):
    """temperature_mix(alpha=0.5) must equal mix_schedule fed the
    explicit weights sqrt(n_s): python math.sqrt and the engine's
    F.sqrt are both IEEE-correctly-rounded, so sched keys match
    bit-for-bit."""
    from rt_bigdata_spark.operators.sampling import mix_schedule, temperature_mix
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    counts = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    via_mix = mix_schedule(docs, {s: math.sqrt(n) for s, n in counts.items()})
    via_temp = temperature_mix(docs, alpha=0.5)
    assert sorted(map(tuple, via_mix.collect())) == sorted(map(tuple, via_temp.collect()))


def test_temperature_mix_horizon_ratio(spark):
    """Stride property with derived weights: at any schedule horizon a
    source with 4× the docs of another appears ~sqrt(4) = 2× as often
    (temperature damps, doesn't erase, size differences)."""
    from rt_bigdata_spark.operators.sampling import temperature_mix

    rows = [(i, "big", f"doc {i} text") for i in range(400)] + [
        (1000 + i, "small", f"other {i} words") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    sched = (
        temperature_mix(df, alpha=0.5)
        .orderBy("sched_key", "source", "src_rank")
        .limit(150)
        .collect()
    )
    n_big = sum(1 for r in sched if r["source"] == "big")
    n_small = len(sched) - n_big
    # ideal 2:1 at every horizon; allow slack for boundary effects
    assert 1.5 <= n_big / max(n_small, 1) <= 2.5, (n_big, n_small)


def test_ivfpq_model_roundtrip_and_pruned_probe(spark, tmp_path):
    """build_ivfpq_index persists the coarse+codebook model losslessly,
    and ivfpq_topk's candidate scan partition-prunes to the probed
    cells (the property that bounds probe cost at any corpus size)."""
    from rt_bigdata_spark.operators.quantization import (
        _load_ivfpq_model,
        build_ivfpq_index,
        ivfpq_topk,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    coarse, books = build_ivfpq_index(emb, path, n_centroids=8, m=4, ks=4, iters=2)
    got_coarse, got_books = _load_ivfpq_model(spark, path)
    assert got_coarse == coarse and got_books == books  # bit-exact doubles

    queries = emb.filter(F.col("vec_id") < 2)
    res = ivfpq_topk(spark, path, queries, k=5, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in pf
    rows = res.collect()
    assert rows and all(r["rk"] <= 5 and r["neighbor_id"] != r["query_id"] for r in rows)


def test_ivfpq_distance_matches_python_reference(spark, tmp_path):
    """IVF-PQ's ADC estimate for one query: recompute ‖q_res − ĉ‖²
    terms in plain python from the persisted model + codes and assert
    the operator's distances match."""
    from rt_bigdata_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    emb = _emb(spark, n=80)
    path = str(tmp_path / "ivfpq")
    coarse, books = build_ivfpq_index(emb, path, n_centroids=4, m=4, ks=4, iters=2)
    queries = emb.filter(F.col("vec_id") < 1)
    got = {
        (r["neighbor_id"],): r["dist"] for r in ivfpq_topk(spark, path, queries, k=6, n_probe=4).collect()
    }
    idx = {r["neighbor_id"]: r for r in spark.read.parquet(path).collect()}
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # per candidate: the probed (query,cell) pair used for scoring is
    # the candidate's OWN cell (it appears once per matching probe)
    for (nid,), dist in got.items():
        row = idx[nid]
        cell = int(row["cell"])
        qres = [x - c for x, c in zip(qv, coarse[cell - 1])]
        expect = 0.0
        for j in range(4):
            qj = qres[j * 16 : (j + 1) * 16]
            c = books[j][int(row[f"c{j}"]) - 1]
            expect += (
                sum(x * x for x in qj) + sum(x * x for x in c)
                - 2 * sum(a * b for a, b in zip(qj, c))
            )
        assert dist == pytest.approx(expect, abs=2e-9), (nid, dist, expect)


def test_ivfpq_planted_near_duplicate_minimal_group(spark, tmp_path):
    """A near-identical vector shares the query's coarse cell AND
    residual codes, so with the query's home cell probed its ADC
    distance is the minimal possible (the query's own quantization
    error) — same tie-group contract as flat PQ."""
    from rt_bigdata_spark.operators.quantization import build_ivfpq_index, ivfpq_topk

    emb = _emb(spark, n=100)
    near = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-6)).alias("embedding"),
        F.col("label"),
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb.unionByName(near), path, n_centroids=8, m=4, ks=4, iters=2)
    queries = emb.filter(F.col("vec_id") < 1)
    top = ivfpq_topk(spark, path, queries, k=101, n_probe=8).collect()
    best = min(r["dist"] for r in top)
    plant = next(r for r in top if r["neighbor_id"] == 100000)
    assert plant["dist"] == best


def test_ivfpq_rerank_improves_on_adc_and_converges(spark, tmp_path):
    """Two-stage retrieval contract: (a) exact re-rank of the ADC
    shortlist matches brute force restricted to the probed cells when
    the shortlist covers them (convergence), and (b) rerank recall@k
    vs brute force is >= raw ADC recall@k (re-ranking can only fix
    intra-cell order, never lose a candidate it was given)."""
    from rt_bigdata_spark.operators.quantization import (
        build_ivfpq_index,
        ivfpq_rerank_topk,
        ivfpq_topk,
    )
    from rt_bigdata_spark.operators.similarity import brute_force_topk

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=8, m=4, ks=4, iters=2)
    queries = emb.filter(F.col("vec_id") < 3)
    k = 8

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=k).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(spark, path, queries, k=k, n_probe=8).collect()
    }
    rr = ivfpq_rerank_topk(
        spark, path, emb, queries, k=k, shortlist=1000, n_probe=8
    )
    rr_set = {(r["query_id"], r["neighbor_id"]) for r in rr.collect()}

    # (a) probing ALL cells with an exhaustive shortlist = brute force
    # (including scores and tie ranks)
    want = brute_force_topk(emb, queries, k=k)
    assert sorted(map(tuple, rr.collect())) == sorted(map(tuple, want.collect()))
    # (b) recall ordering
    assert len(rr_set & exact) >= len(adc & exact)


# --- SQ8 scalar quantization ----------------------------------------


def test_sq8_codes_shape_and_range(spark):
    from rt_bigdata_spark.operators.quantization import sq8_encode, sq8_stats

    emb = _emb(spark)
    codes = sq8_encode(emb, sq8_stats(emb)).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 64
        assert all(0 <= c <= 255 for c in r.codes)


def test_sq8_reconstruction_error_bounded_by_one_step(spark):
    """Dequantized component must sit within one quantization step
    (span/255) of the original — the defining fidelity bound of
    8-bit linear quantization."""
    from rt_bigdata_spark.operators.quantization import sq8_encode, sq8_stats

    emb = _emb(spark, n=100)
    stats = sq8_stats(emb)
    st = stats.collect()[0]
    by_id = {r.vec_id: r.embedding for r in emb.collect()}
    for r in sq8_encode(emb, stats).collect():
        vec = by_id[r.vec_id]
        for d, c in enumerate(r.codes):
            span = st.mxs[d] - st.mns[d]
            deq = st.mns[d] + (c * span) / 255.0
            assert abs(deq - float(vec[d])) <= span / 255.0 + 1e-12


def test_sq8_matches_python_reference(spark):
    """Full pipeline (stats → codes → dequant → asymmetric cosine →
    rank) against an independent driver-side float implementation."""
    from rt_bigdata_spark.operators.quantization import sq8_adc_topk

    emb = _emb(spark, n=60)
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.rk): (r.neighbor_id, r.sim)
        for r in sq8_adc_topk(emb, queries, k=5).collect()
    }

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    dim = 64
    mns = [min(v[d] for v in vecs.values()) for d in range(dim)]
    mxs = [max(v[d] for v in vecs.values()) for d in range(dim)]
    deq = {}
    for vid, v in vecs.items():
        out = []
        for d in range(dim):
            span = mxs[d] - mns[d]
            if span == 0.0:
                out.append(mns[d])
                continue
            c = min(255, max(0, int(math.floor(((v[d] - mns[d]) * 255.0) / span))))
            out.append(mns[d] + (c * span) / 255.0)
        deq[vid] = out

    for qid in (0, 1, 2):
        qv = vecs[qid]
        sims = []
        for nid, cv in deq.items():
            if nid == qid:
                continue
            num = sum(a * b for a, b in zip(qv, cv))
            den = math.sqrt(sum(a * a for a in qv)) * math.sqrt(sum(b * b for b in cv))
            sims.append((round(num / den, 9), nid))
        sims.sort(key=lambda t: (-t[0], t[1]))
        for rk, (sim, nid) in enumerate(sims[:5], start=1):
            assert got[(qid, rk)][0] == nid
            assert abs(got[(qid, rk)][1] - sim) < 1e-9


def test_sq8_planted_duplicate_ranks_first(spark):
    """An exact copy of a query vector quantizes to the same codes, so
    it must rank 1. The score is asymmetric (full-precision query vs
    dequantized copy), so sim is NEAR 1 — within quantization error —
    not exactly 1."""
    from rt_bigdata_spark.operators.quantization import sq8_adc_topk

    emb = _emb(spark, n=50)
    clone = emb.filter(F.col("vec_id") == 2).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label"
    )
    out = sq8_adc_topk(emb.unionByName(clone), emb.filter(F.col("vec_id") == 2), k=3)
    top = [r for r in out.collect() if r.rk == 1][0]
    assert top.neighbor_id == 9002
    assert top.sim > 0.999
