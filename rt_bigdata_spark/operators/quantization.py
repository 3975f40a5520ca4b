"""Product quantization (PQ) over embedding columns.

Beyond-reference training-data operator: the canonical compression for
a 100 TB vector corpus (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search"). The ``dim``-dimensional space is split into
``m`` orthogonal subspaces of ``dim/m`` components each; every
subspace gets its own ``ks``-centroid codebook (plain L2 k-means), and
a vector is stored as ``m`` small codes — 64 float32 components
(256 B) become 4 codes (4 B at ks ≤ 256): a 64× store shrink that
keeps approximate distances computable WITHOUT touching the original
vectors (asymmetric distance computation, ADC: per query, distances to
the m × ks centroids form a lookup table and each candidate scores as
a sum of m table entries).

Scale shape: training is ``iters`` passes, each ONE corpus scan + ONE
hash-aggregate with ≤ m·ks·(dim/m) = ks·dim groups (the bounded model
collect — 256 cells at the registered m=4, ks=4, dim=64, identical to
the k-means discipline in ``clustering.py``); production systems train
on a fixed-size sample, which slots in here unchanged (pass the sample
DataFrame). Encoding and ADC scoring are pure map-side column
expressions: the codebooks travel as literals (an m × ks × dsub
"model", same as the IVF centroid pattern in ``similarity.py``), so
neither step shuffles or runs per-row Python.

Determinism contract (what lets DuckDB replay this exactly — the same
discipline as ``clustering.kmeans_lloyd``, which the oracle notes in
``plans/textops.py`` spell out):

- per-subspace seeding is the first ``ks`` corpus subvectors by id,
  UN-normalized (PQ codebooks live in plain L2 space — spherical
  normalization would destroy the magnitude information the
  reconstruction needs);
- assignment minimizes ``‖x − c‖² = ‖x‖² + ‖c‖² − 2·x·c``; the row's
  own ``‖x‖²`` is constant across candidate centroids, so the
  comparison key is ``‖c‖² − 2·x·c`` (mirrored literally by the
  oracle's ``ORDER BY list_inner_product(cv,cv) −
  2·list_inner_product(sv,cv) ASC, cell ASC``); ties take the lowest
  cell (``array_position`` returns the first minimum);
- Lloyd updates average components quantized to ``floor(x·2^20)``
  longs (exact power-of-two scaling, exact integer sums — order and
  partition-layout independent); an empty cell keeps its previous
  centroid;
- ADC distances add the m per-subspace terms in fixed left-to-right
  subspace order (a SQL ``SUM`` over m rows would be
  order-dependent), each term computed as
  ``(q_j·q_j + c·c) − 2·q_j·c`` with the same operand order on both
  engines.

Reference anchor: the reference has no vector operators at all (its
closest analogue is the dim-table point-lookup cache,
``…/utils/phoenix/DimUtil.scala:43-96``); this module exists for the
LLM-pipeline layer the build brief adds on top of SURVEY.md §2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from rt_bigdata_spark.operators.scale import ensure_parallelism
from rt_bigdata_spark.operators.similarity import dot, lit_double_array, lit_double_matrix

QUANT = 1048576.0  # 2^20 — exact power-of-two grid, matches clustering.QUANT


def _sub_slice(vec: Column, sub: int, dsub: int) -> Column:
    """Subvector ``sub`` (0-based) as array<double>: components
    ``sub·dsub+1 … (sub+1)·dsub`` (1-based, mirroring DuckDB's
    inclusive ``v[a:b]`` list slice in the oracle)."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    return F.slice(vd, sub * dsub + 1, dsub)


def _sqnorm(c: list[float]) -> float:
    """‖c‖² with the sequential left-to-right python sum — the fold
    order ``list_inner_product(cv, cv)`` uses on the oracle side (the
    equivalence every ANN oracle in this repo already rests on)."""
    acc = 0.0
    for x in c:
        acc += x * x
    return acc


def _assign_code(sv: Column, codebook: list[list[float]]) -> Column:
    """1-based code of subvector ``sv`` under one subspace codebook:
    first centroid minimizing ``‖c‖² − 2·sv·c`` (map-side, no Python
    per row). 1-based so codes align with the oracle's ROW_NUMBER
    cell ids."""
    scores = F.array(
        *[
            F.lit(_sqnorm(c)) - F.lit(2.0) * dot(sv, lit_double_array(c))
            for c in codebook
        ]
    )
    return F.array_position(scores, F.array_min(scores))


def _seed_codebooks(
    corpus: DataFrame, id_col: str, vec_col: str, m: int, ks: int, dsub: int
) -> list[list[list[float]]]:
    """First-ks-by-id seeding, per subspace, un-normalized."""
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(ks).collect()
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    return [[v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(m)]


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (deterministic L2 Lloyd).

    Each iteration is ONE corpus scan: every row's m subspace
    assignments explode to (sub, cell, pos, x) component rows that a
    single hash-aggregate reduces to ≤ m·ks·dsub integer sums (the
    bounded model collect). Returns ``codebooks[m][ks][dsub]``.
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    corpus = ensure_parallelism(corpus)
    books = _seed_codebooks(corpus, id_col, vec_col, m, ks, dsub)
    # slice each subvector ONCE into a named column: higher-order array
    # expressions are interpreted (no codegen CSE), so inlining
    # _sub_slice twice per subspace (assign arg + sv payload) would
    # re-run the cast+slice per use
    sliced = corpus.select(
        *[_sub_slice(F.col(vec_col), j, dsub).alias(f"_s{j}") for j in range(m)]
    )
    for _ in range(iters):
        per_sub = F.array(
            *[
                F.struct(
                    F.lit(j).alias("sub"),
                    _assign_code(F.col(f"_s{j}"), books[j]).alias("cell"),
                    F.col(f"_s{j}").alias("sv"),
                )
                for j in range(m)
            ]
        )
        sums = (
            sliced.select(F.explode(per_sub).alias("a"))
            .select("a.sub", "a.cell", F.posexplode("a.sv").alias("pos", "x"))
            .groupBy("sub", "cell", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(QUANT)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        means: dict[tuple[int, int], list[float]] = {}
        for r in sums:
            key = (int(r["sub"]), int(r["cell"]))
            # posexplode's pos is 0-based (same as clustering._component_means)
            means.setdefault(key, [0.0] * dsub)[int(r["pos"])] = (
                float(r["s"]) / QUANT / r["n"]
            )
        books = [
            [means.get((j, i + 1), old) for i, old in enumerate(books[j])]
            for j in range(m)
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, sub, code)`` exploded codes — the persisted form of the
    compressed corpus (m rows per vector; a packed array<byte> column
    is one ``groupBy(id).agg(collect_list)`` away, the exploded form
    is what cross-engine comparison and code-distribution profiling
    want). Pure map-side: one scan, no shuffle."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    per_sub = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                _assign_code(_sub_slice(F.col(vec_col), j, dsub), codebooks[j])
                .cast("long")
                .alias("code"),
            )
            for j in range(m)
        ]
    )
    return (
        ensure_parallelism(corpus)
        .select(F.col(id_col), F.explode(per_sub).alias("a"))
        .select(id_col, F.col("a.sub").alias("sub"), F.col("a.code").alias("code"))
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate L2 top-k by asymmetric distance: candidates carry
    only their m codes; each query scores a candidate as the fixed
    left-to-right sum of m per-subspace terms
    ``(q_j·q_j + c·c) − 2·q_j·c`` where c is the candidate's ASSIGNED
    centroid — i.e. exact query-to-centroid distances, the ADC
    estimator. The original corpus vectors are never touched at query
    time (at 100 TB they need not even be co-located with the codes).

    Queries broadcast; scoring is map-side over the code rows; the
    only shuffle is the per-query top-k window. Smaller distance =
    closer; ties break on neighbor id.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        *[
            _assign_code(_sub_slice(F.col(vec_col), j, dsub), codebooks[j]).alias(f"_c{j}")
            for j in range(m)
        ],
    )
    q = query_adc_cols(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec", m, dsub,
    )
    scored = c.join(F.broadcast(q), c["neighbor_id"] != q["query_id"])
    dist = adc_distance([F.col(f"_c{j}") for j in range(m)], codebooks)
    scored = scored.withColumn("dist", F.round(dist, 9))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", F.col("rk").cast("long").alias("rk"))
    )


def query_adc_cols(q: DataFrame, qvec_col: str, m: int, dsub: int) -> DataFrame:
    """Pre-project the query-constant halves of the ADC terms onto the
    (tiny, pre-broadcast) query frame: ``_q{j}`` = subvector slice,
    ``_qq{j}`` = its self-dot. Array expressions are interpreted (no
    codegen CSE), so computing these inside the scoring expression
    would re-slice and re-dot the query vector PER JOINED ROW — ~3
    array passes per subspace per candidate for values that only
    depend on the query. Values are bit-identical (same expressions,
    same inputs), so oracle hash-equality is untouched."""
    cols = list(q.columns)
    for j in range(m):
        qs = F.slice(F.transform(F.col(qvec_col), lambda x: x.cast("double")), j * dsub + 1, dsub)
        cols.append(qs.alias(f"_q{j}"))
    out = q.select(*cols)
    return out.select(
        *out.columns, *[dot(F.col(f"_q{j}"), F.col(f"_q{j}")).alias(f"_qq{j}") for j in range(m)]
    )


def adc_distance(
    code_cols: "list[Column]", codebooks: "list[list[list[float]]]"
) -> Column:
    """ADC distance of a query (whose ``_q{j}`` slice / ``_qq{j}``
    self-dot columns come pre-projected by ``query_adc_cols``) to a
    candidate that carries one 1-based code column per subspace: the
    fixed left-to-right sum over subspaces of
    ``(q_j·q_j + c·c) − 2·q_j·c`` with c the candidate's assigned
    centroid. Shared by the flat-PQ and IVF-PQ scorers so the operand
    order (and therefore any oracle mirror) cannot drift between
    them."""
    m = len(codebooks)
    dist: "Column | None" = None
    for j in range(m):
        cents = lit_double_matrix(codebooks[j])
        ccs = lit_double_array([_sqnorm(cc) for cc in codebooks[j]])
        sel = F.element_at(cents, code_cols[j].cast("int"))
        term = (F.col(f"_qq{j}") + F.element_at(ccs, code_cols[j].cast("int"))) - F.lit(
            2.0
        ) * dot(F.col(f"_q{j}"), sel)
        dist = term if dist is None else dist + term
    return dist


def _residual_frame(
    corpus: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, rvec, cell): each vector's coarse-cell assignment (the
    SAME dot-based rule as similarity.ivf_topk, so IVF and IVF-PQ
    agree on cells) and its residual x − c_cell — the quantity IVF-PQ
    codes (residuals are far more compact around 0 than raw vectors,
    so the same ks spends its codes where the data actually is). Pure
    map-side: centroids travel as literals."""
    from rt_bigdata_spark.operators.similarity import _assign_cells

    assigned = _assign_cells(ensure_parallelism(corpus), centroids, id_col, vec_col)
    cents = lit_double_matrix(centroids)
    sel = F.element_at(cents, F.col("cell").cast("int"))
    vd = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    return assigned.select(
        F.col("neighbor_id").alias(id_col),
        F.zip_with(vd, sel, lambda x, c: x - c).alias("rvec"),
        F.col("cell"),
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 4,
    ks: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "list[list[list[float]]] | None" = None,
) -> "tuple[list[list[float]], list[list[list[float]]]]":
    """Materialize an IVF-PQ index (Jégou et al. 2011 §IV — the FAISS
    ``IVFx,PQy`` layout): coarse Voronoi cells partition the corpus
    directories (probes prune at planning time, exactly like
    ``similarity.build_ivf_index``), and within each cell every vector
    is stored as m RESIDUAL codes instead of its components — at
    dim=64/m=4 the per-vector payload drops from 256 B to m bytes + id.
    At 100 TB this is the difference between an index that fits on the
    probe nodes and one that doesn't; the accuracy trade is re-ranking
    the short list against the true vectors (kept wherever the corpus
    lives), which callers compose downstream.

    Returns (coarse_centroids, residual_codebooks); both are also
    persisted under ``<path>/_model`` so probes need no side channel.
    """
    spark = corpus.sparkSession
    from rt_bigdata_spark.operators.similarity import _ivf_centroids

    coarse = centroids or _ivf_centroids(corpus, id_col, vec_col, n_centroids)
    res = _residual_frame(corpus, coarse, id_col, vec_col)
    books = pq_train(res, m=m, ks=ks, iters=iters, dim=dim, id_col=id_col, vec_col="rvec")
    dsub = dim // m
    coded = res.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell"),
        *[
            _assign_code(F.slice(F.col("rvec"), j * dsub + 1, dsub), books[j])
            .cast("long")
            .alias(f"c{j}")
            for j in range(m)
        ],
    )
    # ONE file per cell directory (r15, guide §6) — same small-files
    # fix as similarity.build_ivf_index: partitionBy from a 32-partition
    # frame wrote ~n_parts × n_centroids tiny code files, so every
    # probed read paid file-open overhead far above the byte cost.
    coded = coded.repartition(len(coarse), F.col("cell"))
    coded.write.mode("overwrite").partitionBy("cell").parquet(path)
    model_rows = [("coarse", i + 1, j, x) for i, c in enumerate(coarse) for j, x in enumerate(c)] + [
        (f"book{jj}", i + 1, j, x)
        for jj, book in enumerate(books)
        for i, c in enumerate(book)
        for j, x in enumerate(c)
    ]
    spark.createDataFrame(
        model_rows, "part: string, cell: long, pos: long, x: double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_model")
    return coarse, books


# Per-process cache of the tiny IVF-PQ MODEL (coarse centroids +
# codebooks), keyed by (path, mtime of _model) — same rationale as
# similarity._index_centroids: the model is index metadata the probes
# re-collected on every call (one read+collect job each), pure
# job-scheduling overhead at probe time. mtime serves fresh weights if
# an index is rebuilt at the same path in-process.
_IVFPQ_MODEL_CACHE: dict = {}


def _load_ivfpq_model(spark, path: str):
    import os as _os

    key = (path, _os.path.getmtime(f"{path}/_model"))
    hit = _IVFPQ_MODEL_CACHE.get(key)
    if hit is not None:
        return hit
    rows = spark.read.parquet(f"{path}/_model").collect()
    groups: dict[str, dict[int, dict[int, float]]] = {}
    for r in rows:
        groups.setdefault(r["part"], {}).setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["x"])

    def to_list(g: dict[int, dict[int, float]]) -> "list[list[float]]":
        return [
            [g[c][p] for p in sorted(g[c])] for c in sorted(g)
        ]

    coarse = to_list(groups["coarse"])
    books = [to_list(groups[f"book{j}"]) for j in range(len(groups) - 1)]
    _IVFPQ_MODEL_CACHE[key] = (coarse, books)
    return coarse, books


def ivfpq_topk(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Probe an IVF-PQ index: the query fans out to its ``n_probe``
    nearest coarse cells (partition-pruned directory scan, ≤
    n_probe/n_centroids of the files); within each probed cell the
    query's RESIDUAL against that cell's centroid scores candidates by
    ADC over their stored codes — the true vectors are never read.
    Ranking uses the per-(query, cell) residual distance, which is the
    IVF-PQ estimate of ‖q − x‖² (q_res = q − c_cell and x ≈ c_cell +
    decode(codes) share the cell anchor)."""
    from rt_bigdata_spark.operators.similarity import _probe_queries

    coarse, books = _load_ivfpq_model(spark, index_path)
    m = len(books)
    q = _probe_queries(queries, coarse, id_col, vec_col, n_probe)
    q_rows = q.collect()  # tiny: ≤ queries × n_probe
    probed = sorted({int(r["cell"]) for r in q_rows})
    q_local = spark.createDataFrame(q_rows, q.schema)
    cents = lit_double_matrix(coarse)
    qd = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    q_local = q_local.withColumn(
        "qres", F.zip_with(qd, F.element_at(cents, F.col("cell").cast("int")), lambda x, c: x - c)
    )
    q_local = query_adc_cols(q_local, "qres", m, len(books[0][0]))
    cand = spark.read.parquet(index_path).filter(F.col("cell").isin(probed))
    scored = cand.join(F.broadcast(q_local), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist = adc_distance([F.col(f"c{j}") for j in range(m)], books)
    scored = scored.withColumn("dist", F.round(dist, 9))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", F.col("rk").cast("long").alias("rk"))
    )


def ivfpq_rerank_topk(
    spark,
    index_path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """The standard two-stage IVF-PQ retrieval: ADC over the
    compressed index produces a ``shortlist``-sized candidate set per
    query (cheap — m-byte codes, pruned directories), then ONLY those
    candidates' true vectors are fetched and exactly cosine re-ranked
    to the final top-k. This recovers the intra-cell ordering ADC
    cannot see (codes are cell-constant) at the cost of reading
    ``shortlist`` true vectors per query instead of the corpus — the
    re-rank join is a semi-restriction of the corpus to
    queries × shortlist ids, so at 100 TB the heavy side is touched
    once by the index build and never by queries.

    Output schema matches ``similarity.brute_force_topk``
    (query_id, neighbor_id, sim, rk) — by construction the result
    CONVERGES to brute force as shortlist grows within the probed
    cells (property-tested)."""
    from rt_bigdata_spark.operators.similarity import cosine

    short = ivfpq_topk(
        spark, index_path, queries, k=shortlist,
        id_col=id_col, vec_col=vec_col, n_probe=n_probe,
    ).select("query_id", "neighbor_id")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cand = short.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
    scored = cand.withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 9))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rk").cast("long").alias("rk"))
    )


def pq_distortion(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace quantization-error audit: mean squared
    reconstruction error ``avg ‖x_j − c_j(code(x_j))‖²`` for each
    subspace j — the compression-quality number an operator consults
    BEFORE trusting ADC rankings from a compressed 100 TB store (a
    subspace whose MSE dwarfs the others dominates every ADC distance
    and should get more centroids or a re-split).

    One corpus scan, zero shuffles beyond a ks·0-group global agg:
    each row's m per-subspace errors are map-side column expressions
    (assigned centroid fetched from the broadcast codebook literals by
    code), summed in ONE agg row (2m+1 partial-agg columns), then the
    constant-size row unpivots to m output rows. Per-row error uses
    the ADC operand order ``(x·x + c·c) − 2·x·c`` and the mean uses
    the module's quantized-integer-sum discipline (floor(err·2^20)
    longs — exact, order- and partition-independent, replayed
    bit-identically by the DuckDB oracle)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # slice + assign ONCE into named columns (the pq_train discipline:
    # higher-order array exprs are interpreted, no codegen CSE)
    sliced = ensure_parallelism(corpus).select(
        *[_sub_slice(F.col(vec_col), j, dsub).alias(f"_s{j}") for j in range(m)]
    )
    coded = sliced.select(
        *[F.col(f"_s{j}") for j in range(m)],
        *[
            _assign_code(F.col(f"_s{j}"), codebooks[j]).cast("int").alias(f"_c{j}")
            for j in range(m)
        ],
    )

    def err(j: int) -> Column:
        sv = F.col(f"_s{j}")
        cents = lit_double_matrix(codebooks[j])
        norms = lit_double_array([_sqnorm(c) for c in codebooks[j]])
        cv = F.element_at(cents, F.col(f"_c{j}"))
        cn = F.element_at(norms, F.col(f"_c{j}"))
        return (dot(sv, sv) + cn) - F.lit(2.0) * dot(sv, cv)

    agg = coded.agg(
        *[
            F.sum(F.floor(err(j) * F.lit(QUANT)).cast("long")).alias(f"_s{j}")
            for j in range(m)
        ],
        F.count(F.lit(1)).alias("_n"),
    )
    subs = F.array(
        *[
            F.struct(F.lit(j).cast("long").alias("sub"), F.col(f"_s{j}").alias("s"))
            for j in range(m)
        ]
    )
    return agg.select(F.explode(subs).alias("a"), "_n").select(
        F.col("a.sub").alias("sub"),
        F.col("_n").cast("long").alias("n_vecs"),
        # Unrounded on purpose (standing decision, commit 3c8e7af): s is an
        # exact quantized-integer sum, /QUANT is exact power-of-two scaling,
        # /n is ONE shared IEEE division — both engines compute the same
        # bits, and a ROUND here can land on a half-way digit at some SF
        # (the quality_classifier failure mode).
        (F.col("a.s").cast("double") / F.lit(QUANT) / F.col("_n")).alias("mse"),
    )


def ivfpq_cell_stats(spark, index_path: str) -> DataFrame:
    """Occupancy/skew profile of a built IVF-PQ index — the vector-store
    analog of the key-skew diagnostic (operators/scale.py): per coarse
    cell, how many vectors it holds, its share of the corpus, and its
    skew vs the uniform expectation. The number that tells an operator
    whether n_probe-pruned queries actually prune (a cell holding 40%
    of a 100 TB corpus makes every probe that touches it a near-full
    scan — re-train with more centroids or split the hot cell).

    Cost shape: ONE scan of the index's code rows reading only the
    partition column (the parquet footers, effectively), one ≤
    n_centroids-group agg, and a broadcast 1-row totals join."""
    counts = (
        spark.read.parquet(index_path)
        .groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    tot = counts.agg(
        F.sum("n_vecs").alias("t"), F.count(F.lit(1)).cast("long").alias("n_cells")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            (F.col("n_vecs").cast("double") / F.col("t").cast("double")).alias("share"),
            "n_cells",
            (
                F.col("n_vecs").cast("double")
                / (F.col("t").cast("double") / F.col("n_cells").cast("double"))
            ).alias("skew_x"),
        )
    )


# --- SQ8 scalar quantization ----------------------------------------
#
# The OTHER standard vector-store compression next to PQ: per-dimension
# 8-bit linear quantization (FAISS ``ScalarQuantizer`` QT_8bit, Milvus/
# Lucene ``SQ8``). Each dimension d gets a corpus-wide [min_d, max_d]
# range; a component stores as ``floor((x − min_d) · 255 / span_d)``
# — one byte per dimension (64 float32 components → 64 B, a 4× shrink
# with far better fidelity than PQ's 64×), and search dequantizes
# candidates on the fly (asymmetric: the query stays full-precision).
#
# Scale shape: training is ONE partial-aggregable corpus scan producing
# a SINGLE row of 2·dim min/max cells (map-side combinable — the
# cheapest "model" in this module); encode and ADC are pure map-side
# column expressions with that 1-row model broadcast onto the scan.
# Nothing here shuffles the corpus.
#
# Determinism contract: min/max of floats are exact; the quantization
# arithmetic is the SAME IEEE expression tree on both engines
# (``((x − mn) · 255.0) / span`` then floor/clamp — all doubles, no
# engine-specific rounding), so codes are bit-identical and the
# dequantized cosine follows the ann_cosine_topk 9-dp discipline.


def sq8_stats(corpus: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """One-row frame ``(mns: array<double>, mxs: array<double>)`` of
    per-dimension corpus min/max — the entire SQ8 "model". One scan,
    2·dim partial-agg cells, map-side combinable."""
    aggs = []
    for d in range(dim):
        c = F.col(vec_col).getItem(d)
        aggs.append(F.min(c).alias(f"_mn{d}"))
        aggs.append(F.max(c).alias(f"_mx{d}"))
    row = corpus.agg(*aggs)
    return row.select(
        F.array(*[F.col(f"_mn{d}").cast("double") for d in range(dim)]).alias("mns"),
        F.array(*[F.col(f"_mx{d}").cast("double") for d in range(dim)]).alias("mxs"),
    )


def _sq8_mn(i: Column) -> Column:
    return F.element_at(F.col("mns"), (i + F.lit(1)).cast("int"))


def _sq8_span(i: Column) -> Column:
    return F.element_at(F.col("mxs"), (i + F.lit(1)).cast("int")) - _sq8_mn(i)


def sq8_encode(
    corpus: DataFrame,
    stats: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, codes: array<int>)`` with every code in [0, 255] (byte-
    packable payload: 1 B per dimension in a real store). A constant
    dimension (span 0) codes as 0 and dequantizes to its min. The
    1-row ``stats`` model is broadcast onto one corpus scan."""
    enc = ensure_parallelism(corpus).crossJoin(F.broadcast(stats))

    def code(x: Column, i: Column) -> Column:
        raw = F.floor(((x.cast("double") - _sq8_mn(i)) * F.lit(255.0)) / _sq8_span(i))
        clamped = F.least(F.lit(255), F.greatest(F.lit(0), raw.cast("long")))
        return F.when(_sq8_span(i) == F.lit(0.0), F.lit(0)).otherwise(clamped).cast("int")

    return enc.select(
        F.col(id_col),
        F.transform(F.col(vec_col), code).alias("codes"),
    )


def sq8_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric top-k over the SQ8-compressed corpus: candidates
    contribute only their byte codes (dequantized on the fly against
    the broadcast 1-row min/max model); queries stay full-precision.
    Output ``(query_id, neighbor_id, sim, rk)`` — the ann_cosine_topk
    shape, ranking by the asymmetric cosine rounded to 9 dp.

    Plan: one stats scan (1-row model) + one corpus scan carrying the
    broadcast model and the broadcast bounded query set; per-query
    ranking is one window over O(n·|Q|) scored rows. No corpus
    shuffle, no corpus×corpus pairing."""
    from rt_bigdata_spark.operators.similarity import cosine

    stats = sq8_stats(corpus, vec_col=vec_col)
    codes = sq8_encode(corpus, stats, vec_col=vec_col, id_col=id_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))

    def deq(c: Column, i: Column) -> Column:
        return _sq8_mn(i) + (c.cast("double") * _sq8_span(i)) / F.lit(255.0)

    scored = (
        codes.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cvec", F.transform(F.col("codes"), deq))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rk").cast("long").alias("rk"))
    )
