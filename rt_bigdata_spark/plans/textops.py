"""Training-data pipeline query plans: dedup, similarity search, text
analysis over ``documents`` / ``embeddings`` (SURVEY.md §7.2 step 9).

MinHash-LSH / SimHash / hyperplane-LSH are registered without oracle
SQL (driver does a rows-only check) — their semantics are validated by
unit tests against constructed near-duplicates; the exact n-gram
Jaccard and brute-force cosine queries are the oracle-checked ground
truth the approximate variants are measured against.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rt_bigdata_spark.operators.dedup import (
    embedding_near_dup_lsh,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from rt_bigdata_spark.operators.similarity import brute_force_topk, hyperplane_lsh_topk, ivf_topk
from rt_bigdata_spark.operators.text_analysis import (
    fingerprint,
    language_id,
    quality_features,
    token_stats,
)
from rt_bigdata_spark.plans.registry import QuerySpec, register
from rt_bigdata_spark.sources.tables import load_table

# Shared DuckDB fragment: tokenization identical to functions.text_fns.tokenize.
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


_ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS sig, MIN(doc_id) AS keep_id, COUNT(*) AS dup_ct
FROM documents GROUP BY md5(text)
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fingerprint")


_ORACLE_FINGERPRINT = f"""
SELECT doc_id, md5(array_to_string({_DUCK_TOKS}, ' ')) AS fingerprint
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id",
        "n_tokens",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
    )


_ORACLE_QUALITY = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       ROUND(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t), 6) AS avg_token_len,
       ROUND(CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))) AS DOUBLE) / len(t), 6) AS stopword_ratio
FROM toks
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang_pred")


# CASE order mirrors language_id's first-max-wins loop (en,fr,es,de,zh).
_ORACLE_LANG = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
hits AS (
  SELECT doc_id,
         len(list_filter(t, x -> x IN ('the','a','and','of','to'))) AS h_en,
         len(list_filter(t, x -> x IN ('le','la','et','les','des'))) AS h_fr,
         len(list_filter(t, x -> x IN ('el','la','los','de','y'))) AS h_es,
         len(list_filter(t, x -> x IN ('der','die','und','das','ein'))) AS h_de,
         len(list_filter(t, x -> x IN ('的','是','在','了','和'))) AS h_zh
  FROM toks
)
SELECT doc_id,
       CASE WHEN greatest(h_en,h_fr,h_es,h_de,h_zh) = 0 THEN 'und'
            WHEN h_en = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'en'
            WHEN h_fr = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'fr'
            WHEN h_es = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'es'
            WHEN h_de = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'de'
            ELSE 'zh' END AS lang_pred
FROM hits
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"))


_ORACLE_TOKEN_STATS = f"""
SELECT doc_id,
       CAST(len({_DUCK_TOKS}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text),
            '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \\t\\n\\x0b\\f\\r'']+')) AS BIGINT) AS bpe_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 131 + b) % 2147483647) AS rolling_fp
FROM documents
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.1)


# Shared CTE block: shingle → pair → Jaccard ≥ 0.1 (reused by the
# cluster oracle below, which needs the same pair set as its edges).
_JACCARD_CTES = f"""toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id,
         UNNEST(list_distinct([array_to_string(t[i:i+2], ' ')
                               FOR i IN generate_series(1, greatest(len(t) - 2, 1))])) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT doc_a, doc_b,
         CAST(inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - inter) >= 0.1
)"""

_ORACLE_JACCARD = f"WITH {_JACCARD_CTES} SELECT doc_a, doc_b, jaccard FROM jpairs"


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10)


_ORACLE_ANN = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cvec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_inner_product(qvec, cvec)
               / (sqrt(list_inner_product(qvec, qvec)) * sqrt(list_inner_product(cvec, cvec))), 9) AS sim
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, sim, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
  FROM scored
)
WHERE rk <= 10
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.1)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return hyperplane_lsh_topk(emb, queries, k=10)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the embeddings table (inline variant: cells
    assigned on the fly). The 100 TB path is `build_ivf_index` (corpus
    written ``partitionBy("cell")`` once) + `ivf_topk_indexed` (probe
    scan partition-pruned to the probed cells) — same rows touched,
    asserted equal in tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=10)


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.35)


_ORACLE_EMB_DEDUP = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 9) >= 0.35
"""


def q_embedding_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_lsh(load_table(spark, sf_dir, "embeddings"), threshold=0.35)


def q_doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data curation pipeline, one plan: language-ID
    filter (en) → quality thresholds (≥20 tokens, stopword ratio ≥2%)
    → exact dedup keeping the lowest doc_id per md5(text).

    The realistic 100 TB curation job shape: all scoring stages fuse
    into the single document scan (map-side, no shuffle); the only
    exchange is the final dedup groupBy on the md5 key, and the keep-
    lowest-id choice is a `min(struct(...))` hash aggregation — partial
    per scan task (each task emits one candidate per sig), NOT a
    row_number window, which would sort every partition. Filters run
    before the shuffle, so only surviving docs are exchanged.

    tokenize (lower + regex split + filter over the full text) is the
    dominant per-row kernel, so the whole score-and-keep decision is
    fused into ONE ``tok_bound`` lambda (see text_analysis.tok_bound):
    naive operator composition left 61 inlined copies of the tokenize
    regex in the optimized plan (CollapseProject + filter pushdown);
    the fused form has 2 (one for the keep filter, one for the kept
    features), measured ~25% faster end-to-end at sf0.1.
    """
    from rt_bigdata_spark.functions.text_fns import tokenize
    from rt_bigdata_spark.operators.scale import ensure_parallelism
    from rt_bigdata_spark.operators.text_analysis import LANG_STOPWORDS, lang_vote, stopword_hit_count, tok_bound

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))

    def per_doc(t):
        n = F.size(t)
        swr = stopword_hit_count(t, LANG_STOPWORDS["en"]).cast("double") / n
        keep = (lang_vote(t, LANG_STOPWORDS) == F.lit("en")) & (n >= 20) & (swr >= 0.02)
        return F.struct(n.cast("long").alias("n_tokens"), F.round(swr, 6).alias("swr"), keep.alias("keep"))

    kept = docs.withColumn("r", tok_bound(tokenize(F.col("text")), per_doc)).filter(F.col("r.keep"))
    best = F.min(
        F.struct("doc_id", F.col("r.n_tokens").alias("n_tokens"), F.col("r.swr").alias("stopword_ratio"))
    ).alias("k")
    return (
        kept.withColumn("sig", F.md5("text"))
        .groupBy("sig")
        .agg(best)
        .select("sig", F.col("k.doc_id").alias("doc_id"), F.col("k.n_tokens").alias("n_tokens"), F.col("k.stopword_ratio").alias("stopword_ratio"))
    )


_ORACLE_CURATION = f"""
WITH toks AS (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents),
f AS (
  SELECT doc_id, text,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))) AS DOUBLE) / len(t) AS swr,
         len(list_filter(t, x -> x IN ('the','a','and','of','to'))) AS h_en,
         len(list_filter(t, x -> x IN ('le','la','et','les','des'))) AS h_fr,
         len(list_filter(t, x -> x IN ('el','la','los','de','y'))) AS h_es,
         len(list_filter(t, x -> x IN ('der','die','und','das','ein'))) AS h_de,
         len(list_filter(t, x -> x IN ('的','是','在','了','和'))) AS h_zh
  FROM toks
)
SELECT md5(text) AS sig, doc_id, n_tokens, ROUND(swr, 6) AS stopword_ratio
FROM f
WHERE h_en > 0 AND h_en = greatest(h_en, h_fr, h_es, h_de, h_zh)
  AND n_tokens >= 20 AND swr >= 0.02
QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: the post-processing step every dedup
    pipeline needs after pair discovery — transitively connect the
    Jaccard ≥ 0.1 pairs and label each doc with its component's
    smallest doc_id (the canonical keeper). Iterative min-label
    propagation (operators/graph.py); the oracle is a DuckDB recursive
    CTE over the same pair set, making this one of the few iterative
    Spark workloads with an exact SQL cross-check.
    """
    from rt_bigdata_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.1).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return (
        connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
        .select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))
    )


_ORACLE_CLUSTERS = f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs UNION SELECT doc_b, doc_a FROM jpairs),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, MIN(root) AS cluster FROM reach GROUP BY node
"""


def q_doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/valid/test split (80/10/10) keyed on
    md5(text): byte-identical docs land in the same split even before
    dedup runs. Pure map-side expression (operators/sampling.py); the
    oracle inlines the same hex boundaries (0.8·16⁴ = 0xcccc,
    0.9·16⁴ = 0xe666)."""
    from rt_bigdata_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "text", [("train", 0.8), ("valid", 0.1), ("test", 0.1)]).select(
        "doc_id", "split"
    )


_ORACLE_SPLIT_DOCS = """
SELECT doc_id,
       CASE WHEN substring(md5(text), 1, 4) < 'cccc' THEN 'train'
            WHEN substring(md5(text), 1, 4) < 'e666' THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/valid/test split: the split key is the
    doc's CLUSTER label (smallest doc_id of its transitively-connected
    near-dup group), so near-duplicate documents can never straddle
    train and eval — the leakage mode a content-hash split misses
    (near-dups hash differently). Composition of dup_clusters +
    hash_split; the hex boundaries are shared with doc_split.
    """
    from rt_bigdata_spark.operators.sampling import hash_split

    clusters = q_dup_clusters(spark, sf_dir)
    return hash_split(
        clusters, F.col("cluster").cast("string"), [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    ).select("doc_id", "cluster", "split")


_ORACLE_CLUSTER_SPLIT = f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs UNION SELECT doc_b, doc_a FROM jpairs),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
),
clusters AS (SELECT node AS doc_id, MIN(root) AS cluster FROM reach GROUP BY node)
SELECT doc_id, cluster,
       CASE WHEN substring(md5(CAST(cluster AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
            WHEN substring(md5(CAST(cluster AS VARCHAR)), 1, 4) < 'e666' THEN 'valid'
            ELSE 'test' END AS split
FROM clusters
"""


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profiling: doc counts, char volume, exact p50/
    p95 length percentiles, language spread — the dashboard numbers a
    curation run starts from. Exact ``percentile`` holds O(group) state
    (it materializes each group's values), which is fine for tens of
    sources; at 100 TB swap in ``percentile_approx`` (Greenwald-Khanna
    sketch, bounded state, mergeable map-side) — same call shape, ~1%
    error. Exact is used here because it hash-matches the DuckDB
    ``quantile_cont`` oracle bit-for-bit (verified: identical linear
    interpolation).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias("p95_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


_ORACLE_PROFILE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 6) AS avg_chars,
       ROUND(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
       ROUND(quantile_cont(n_chars, 0.95), 6) AS p95_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY source
"""


def q_corpus_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of ``corpus_profile``: ``percentile_approx``
    (Greenwald-Khanna sketch — bounded per-group state, mergeable
    map-side, so partial aggregation works and no group ever
    materializes its full value list) and HLL ``approx_count_distinct``
    for the language spread. accuracy=10000 bounds rank error at
    1/10000 of the group. No SQL oracle (sketch estimates are
    engine-specific); accuracy vs the exact query is asserted in
    tests/test_approx_variants.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("p50_chars"),
        F.percentile_approx("n_chars", F.lit(0.95), F.lit(10000)).alias("p95_chars"),
        F.approx_count_distinct("lang").cast("long").alias("n_langs"),
    )


# Data-mixing rates: keep all of src0, halve src1, quarter src2, 10% of
# src3, default 75% elsewhere. The oracle CASE is generated from the
# SAME dict + boundary function, so Spark and SQL can never drift.
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_DEFAULT = 0.75


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source downsampling (data mixing): one
    map-side md5-threshold filter, content-keyed so re-runs and rate
    raises produce nested subsets (see operators/sampling.py)."""
    from rt_bigdata_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "text", "source", _MIX_RATES, _MIX_DEFAULT).select("doc_id", "source")


def _mix_oracle() -> str:
    from rt_bigdata_spark.operators.sampling import rate_boundary

    def cond(rate: float) -> str:
        b = rate_boundary(rate)
        return "true" if b is None else f"substring(md5(text), 1, 4) < '{b}'"

    whens = " ".join(f"WHEN source = '{g}' THEN {cond(r)}" for g, r in _MIX_RATES.items())
    return f"SELECT doc_id, source FROM documents WHERE CASE {whens} ELSE {cond(_MIX_DEFAULT)} END"


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percentile quality gate: keep each source's top half
    by document length. Percentile thresholds per GROUP (not global)
    are the standard guard against one verbose source flooding the
    kept set. percent_rank is rank-based — ties get equal rank in both
    engines, so the cut is deterministic. One shuffle (partition by
    source) + per-partition sort; at 100 TB with few sources, compute
    approx per-source thresholds first and broadcast them instead
    (percentile_approx + join) to avoid sorting whole sources.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").asc())
    return (
        docs.withColumn("len_pct", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("len_pct") >= 0.5)
        .select("doc_id", "source", "n_chars", "len_pct")
    )


_ORACLE_QUALITY_GATE = """
SELECT doc_id, source, n_chars, ROUND(len_pct, 6) AS len_pct
FROM (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY n_chars ASC) AS len_pct
  FROM documents
)
WHERE ROUND(len_pct, 6) >= 0.5
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing on real data: documents' bytes as opaque
    media content → mapInPandas feature extraction (Arrow-batched; the
    decode kernel is the deterministic stub — no codecs in container).

    Output is canon-safe: the array<float> feature vector is flattened
    to f0..f15 double columns (driver canonicalization can't sort list
    cells). Re-rounding to 6 decimals after the float32 round-trip
    recovers the exact 6-decimal value the kernel produced (float32
    abs error < 6e-8 on [0,1] ≪ the 5e-7 rounding half-width), so the
    values are engine-reproducible."""
    from rt_bigdata_spark.operators.multimodal import FEATURE_DIM, documents_as_media, extract_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs))
    flat = [
        F.round(F.element_at("features", i + 1).cast("double"), 6).alias(f"f{i}")
        for i in range(FEATURE_DIM)
    ]
    return feats.select("media_id", "media_type", "n_bytes", *flat)


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring (see text_analysis.
    unigram_surprisal): average −ln p(token) per doc under corpus
    unigram stats — corpus-rare content scores high."""
    from rt_bigdata_spark.operators.scale import ensure_parallelism
    from rt_bigdata_spark.operators.text_analysis import unigram_surprisal

    return unigram_surprisal(ensure_parallelism(load_table(spark, sf_dir, "documents")))


_ORACLE_SURPRISAL = f"""
WITH toks AS (SELECT doc_id, UNNEST({_DUCK_TOKS}) AS tok FROM documents),
tf AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
tot AS (SELECT SUM(tf) AS n FROM tf)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(-LN(tf / n)), 6) AS surprisal
FROM toks JOIN tf USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf·ln(N/df), ties broken lexicographically. The same exploded-token
    shape as unigram_surprisal with the document-frequency table in
    place of term counts; the per-doc top-k is a row_number window over
    the scored (doc, term) pairs. At 100 TB prune the df table to
    df ≥ 2 terms and broadcast it; the window partitions by doc_id —
    maximal key cardinality, no skew possible.
    """
    from pyspark.sql import Window

    from rt_bigdata_spark.functions.text_fns import tokenize
    from rt_bigdata_spark.operators.scale import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_tbl, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


_ORACLE_KEYWORDS = f"""
WITH toks AS (SELECT doc_id, UNNEST({_DUCK_TOKS}) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, tok, ROUND(tf * LN(n_docs / df), 6) AS tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ROUND(tf * LN(n_docs / df), 6) DESC, tok ASC) AS BIGINT) AS rk
FROM tf JOIN dft USING (tok) CROSS JOIN nd
QUALIFY rk <= 3
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing on real data: documents-as-media →
    per-frame rows at 1 s cadence (decode stubbed; the Spark-side
    shape — sequence/explode fan-out, byte slicing, schema — is real).
    Rows-only check: frame bytes are outside DuckDB's vocabulary."""
    from rt_bigdata_spark.operators.multimodal import documents_as_media, frame_sample

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(documents_as_media(docs))


for spec in [
    QuerySpec("dedup_exact", q_dedup_exact, _ORACLE_DEDUP_EXACT, ("dedup",), bench=True),
    QuerySpec("doc_fingerprint", q_doc_fingerprint, _ORACLE_FINGERPRINT, ("text",)),
    QuerySpec("text_quality", q_text_quality, _ORACLE_QUALITY, ("text",), bench=True),
    QuerySpec("language_id", q_language_id, _ORACLE_LANG, ("text",)),
    QuerySpec("token_stats", q_token_stats, _ORACLE_TOKEN_STATS, ("text",)),
    QuerySpec("ngram_jaccard", q_ngram_jaccard, _ORACLE_JACCARD, ("dedup",), bench=True),
    QuerySpec("ann_cosine_topk", q_ann_cosine_topk, _ORACLE_ANN, ("similarity",), bench=True),
    QuerySpec("minhash_lsh", q_minhash_lsh, None, ("dedup", "approx"), bench=True),
    QuerySpec("simhash", q_simhash, None, ("dedup", "approx")),
    QuerySpec("ann_lsh_topk", q_ann_lsh_topk, None, ("similarity", "approx")),
    QuerySpec("ann_ivf_topk", q_ann_ivf_topk, None, ("similarity", "approx")),
    QuerySpec("embedding_dedup", q_embedding_dedup, _ORACLE_EMB_DEDUP, ("dedup",)),
    QuerySpec("embedding_dedup_lsh", q_embedding_dedup_lsh, None, ("dedup", "approx"), bench=True),
    QuerySpec("media_features", q_media_features, None, ("multimodal",)),
    QuerySpec("media_frames", q_media_frames, None, ("multimodal",)),
    QuerySpec("doc_curation", q_doc_curation, _ORACLE_CURATION, ("text", "dedup"), bench=True),
    QuerySpec("dup_clusters", q_dup_clusters, _ORACLE_CLUSTERS, ("dedup", "iterative")),
    QuerySpec("doc_split", q_doc_split, _ORACLE_SPLIT_DOCS, ("sampling",)),
    QuerySpec("cluster_split", q_cluster_split, _ORACLE_CLUSTER_SPLIT, ("sampling", "dedup")),
    QuerySpec("corpus_profile", q_corpus_profile, _ORACLE_PROFILE, ("profiling", "agg")),
    QuerySpec("corpus_profile_approx", q_corpus_profile_approx, None, ("profiling", "agg", "approx")),
    QuerySpec("quality_gate", q_quality_gate, _ORACLE_QUALITY_GATE, ("profiling", "window_fn")),
    QuerySpec("unigram_surprisal", q_unigram_surprisal, _ORACLE_SURPRISAL, ("text", "profiling")),
    QuerySpec("doc_keywords", q_doc_keywords, _ORACLE_KEYWORDS, ("text", "window_fn")),
    QuerySpec("source_mix", q_source_mix, _mix_oracle(), ("sampling",)),
]:
    register(spec)
