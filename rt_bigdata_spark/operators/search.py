"""Full-text relevance search (Okapi BM25) over the documents table.

Beyond-reference operator: the retrieval scoring half of a text search
engine, expressed as two scans and zero Python — corpus statistics
(N, avgdl, per-term document frequencies) reduce to ONE broadcast row,
and scoring is a map-side expression over the corpus, so the whole
query costs one aggregate + one scan regardless of corpus size. The
top-k materializes via sort+limit (Spark's TakeOrdered — per-partition
top-k then a k-row merge, never a global single-partition window).

Determinism contract (DuckDB-replayable, same discipline as the ANN
oracles): tf/df/dl are exact integer counts; avgdl is an exact long
sum divided once in IEEE double; idf = ln(1 + (N - df + ½)/(df + ½))
is a deterministic double function of exact ints; the per-term score
contributions are summed in FIXED query-term order as one chained
``+`` expression (not a float aggregate, whose order would depend on
partitioning). Scores round to 9 dp before ranking; ties break on
doc_id.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from rt_bigdata_spark.functions.text_fns import tokenize
from rt_bigdata_spark.operators.scale import ensure_parallelism


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 relevance to ``terms``.

    Returns ``(doc_id, score, rank)``. The rank window runs AFTER the
    sort+limit, over exactly k rows — the global ordering itself is a
    TakeOrdered, not a single-partition window.
    """
    base = ensure_parallelism(df).select(
        F.col(id_col),
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("toks"),
    )
    base = base.select(
        id_col,
        F.size("toks").cast("long").alias("dl"),
        *[_tf(F.col("toks"), t).cast("long").alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score: Column | None = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        contrib = idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
        score = contrib if score is None else score + contrib
    top = (
        scored.select(id_col, F.round(score, 9).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    # the window ranks the <= k LIMIT survivors (bounded by
    # construction); the non-foldable constant key keeps the partition
    # spec non-empty so BENCH tails stay free of the "No Partition
    # Defined" warning that would otherwise train readers to ignore a
    # REAL unpartitioned window (r7 verdict item 6)
    from rt_bigdata_spark.operators.scale import bounded_window_key

    w = Window.partitionBy(bounded_window_key(F.col("score"))).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    query_vec_id: int = 0,
    k_arm: int = 20,
    k: int = 10,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-``k_arm`` fused with exact
    cosine vector top-``k_arm`` by Reciprocal Rank Fusion
    (Cormack/Clarke/Büttcher 2009):
    ``rrf = Σ_arms 1/(rrf_k + rank)`` over the arms where the doc
    appears — the standard RAG retrieval composition (sparse catches
    exact terms, dense catches paraphrase; RRF needs no score
    calibration because it only consumes RANKS).

    Contract: ``emb``'s ``vec_id`` shares the document id space
    (``vec_id i`` embeds doc ``i``); ids outside either arm's universe
    simply never match that arm. Output ``(doc_id, bm25_rank,
    vec_rank, rrf_score, rank)`` — absent-arm ranks emit 0 (rank 0
    does not exist; it means "not in that arm's top-k_arm") and
    contribute 0.0 to the fusion.

    Scale shape: each arm is its own proven bounded plan (bm25_topk:
    1-row stats broadcast + TakeOrdered; brute_force_topk: broadcast
    query vs one corpus scan — swap in ``ivf_topk``/``sq8_adc_topk``
    at index scale); the fusion itself touches ≤ 2·k_arm rows."""
    from rt_bigdata_spark.operators.similarity import brute_force_topk

    lex = bm25_topk(docs, terms, k=k_arm, k1=k1, b=b, id_col=id_col).select(
        F.col(id_col), F.col("rank").alias("bm25_rank")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id)
    vec = brute_force_topk(emb, q, k=k_arm).select(
        F.col("neighbor_id").alias(id_col), F.col("rk").alias("vec_rank")
    )
    fused = lex.join(vec, id_col, "full_outer")
    lex_c = F.when(
        F.col("bm25_rank").isNull(), F.lit(0.0)
    ).otherwise(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("bm25_rank")))
    vec_c = F.when(
        F.col("vec_rank").isNull(), F.lit(0.0)
    ).otherwise(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("vec_rank")))
    top = (
        fused.select(
            id_col,
            F.coalesce(F.col("bm25_rank"), F.lit(0)).cast("long").alias("bm25_rank"),
            F.coalesce(F.col("vec_rank"), F.lit(0)).cast("long").alias("vec_rank"),
            F.round(lex_c + vec_c, 9).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )
    from rt_bigdata_spark.operators.scale import bounded_window_key

    w = Window.partitionBy(bounded_window_key(F.col("rrf_score"))).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
