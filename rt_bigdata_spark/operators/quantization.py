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
from rt_bigdata_spark.operators.similarity import dot

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
            F.lit(_sqnorm(c)) - F.lit(2.0) * dot(sv, F.array(*[F.lit(x) for x in c]))
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
    for _ in range(iters):
        per_sub = F.array(
            *[
                F.struct(
                    F.lit(j).alias("sub"),
                    _assign_code(_sub_slice(F.col(vec_col), j, dsub), books[j]).alias("cell"),
                    _sub_slice(F.col(vec_col), j, dsub).alias("sv"),
                )
                for j in range(m)
            ]
        )
        sums = (
            corpus.select(F.explode(per_sub).alias("a"))
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
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = c.join(F.broadcast(q), c["neighbor_id"] != q["query_id"])
    dist: Column | None = None
    for j in range(m):
        qs = _sub_slice(F.col("qvec"), j, dsub)
        cents = F.array(*[F.array(*[F.lit(x) for x in cc]) for cc in codebooks[j]])
        ccs = F.array(*[F.lit(_sqnorm(cc)) for cc in codebooks[j]])
        sel = F.element_at(cents, F.col(f"_c{j}").cast("int"))
        term = (dot(qs, qs) + F.element_at(ccs, F.col(f"_c{j}").cast("int"))) - F.lit(
            2.0
        ) * dot(qs, sel)
        dist = term if dist is None else dist + term
    scored = scored.withColumn("dist", F.round(dist, 9))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", F.col("rk").cast("long").alias("rk"))
    )
