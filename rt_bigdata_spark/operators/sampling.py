"""Deterministic sampling / dataset splitting for training pipelines.

A train/valid/test split at 100 TB must be (a) reproducible across
runs and engines — no ``rand()``, no JVM-hash-seed dependence — and
(b) leakage-proof: byte-identical content must land in the same split
even BEFORE dedup has run, or near-dup copies of a training document
contaminate the eval set. Both follow from keying the split on a
stable content hash: the first ``hex_chars`` of md5 interpreted as a
number in [0, 16^hex_chars), compared against cumulative-ratio
boundaries. md5 prefixes are engine-portable (any SQL engine computes
the identical hex string) and the comparison stays a lexicographic
string compare — hex digits are ASCII-ordered — so the whole operator
is one map-side expression: no shuffle, no sampling pass, no state.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def split_boundaries(splits: Sequence[tuple[str, float]], hex_chars: int = 4) -> list[tuple[str, str]]:
    """(name, upper-hex-boundary) for all but the last split; the last
    takes the remainder. Boundaries are lowercase hex of the cumulative
    ratio scaled to 16^hex_chars — inline the SAME literals in any
    oracle SQL."""
    total = sum(w for _, w in splits)
    bounds: list[tuple[str, str]] = []
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        bounds.append((name, format(int(acc / total * 16**hex_chars), f"0{hex_chars}x")))
    return bounds


def rate_boundary(rate: float, hex_chars: int = 4) -> str | None:
    """Upper hex boundary for a keep-rate in [0, 1); None means keep
    everything (a rate ≥ 1 has no 4-hex-char boundary — '10000' would
    compare LOWER than 'ffff' lexicographically, so it must not be
    emitted as a string bound)."""
    if rate >= 1.0:
        return None
    return format(max(int(rate * 16**hex_chars), 0), f"0{hex_chars}x")


def weighted_sample(
    df: DataFrame,
    key_col: str | Column,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    hex_chars: int = 4,
) -> DataFrame:
    """Per-group deterministic downsampling (data mixing): keep a row
    iff the md5-prefix of its key falls under the group's rate
    boundary. The mixing step of a training-data pipeline — e.g. keep
    all of a high-quality source, 10%% of a noisy crawl — as one
    map-side filter: reproducible (content-keyed, no rand()), stable
    under re-runs and engine changes, zero shuffle, and composable
    with hash_split (different hash positions would be needed for
    independence; same position keeps subsets nested, which is what
    you want when raising a source's rate later).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    prefix = F.substring(F.md5(key), 1, hex_chars)

    def keep_cond(rate: float) -> Column:
        b = rate_boundary(rate, hex_chars)
        return F.lit(True) if b is None else (prefix < F.lit(b))

    chain: Column | None = None
    for g, r in rates.items():
        cond = keep_cond(r)
        chain = F.when(F.col(group_col) == g, cond) if chain is None else chain.when(F.col(group_col) == g, cond)
    keep = keep_cond(default_rate) if chain is None else chain.otherwise(keep_cond(default_rate))
    return df.filter(keep)


_PRIORITY_SCALE = (1 << 48) + 1  # 2^48+1 ≤ 2^53: exactly representable as a double


def priority_sample(
    df: DataFrame,
    n: int,
    weight_col: str | Column,
    key_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-N WEIGHTED sampling with unbiased subset-sum estimators
    — priority sampling (Duffield, Lund & Thorup, JACM 2007): each item
    gets priority ``q = w / u`` for a uniform ``u ∈ (0, 1]``; the N
    highest-priority items are the sample, the (N+1)-th priority is
    the threshold τ, and ``est_weight = max(w, τ)`` makes Σ est over
    the sample an unbiased estimator of Σ w over ANY subset — the
    principled way to cut a weighted training mix ("100k docs by
    quality weight") to a fixed budget while keeping downstream
    statistics estimable.

    Deterministic and engine-portable by construction: ``u`` derives
    from the first 12 hex chars of md5(key) — ``u = (v+1)/(2^48+1)``,
    so ``q = w·(2^48+1)/(v+1)`` is ONE IEEE multiply + ONE divide of
    exactly-representable integers (2^48+1 < 2^53): no ``rand()``, no
    ln/exp whose libm rounding could differ across engines (the
    Efraimidis-Spirakis ``u^(1/w)`` key needs transcendentals; the
    priority form is algebraically order-equivalent for integer
    weights and needs none). Re-runs, engine swaps, and the DuckDB
    oracle all produce bit-identical priorities.

    Scale shape: priority is a map-side expression over the scan;
    top-(N+1) is TakeOrderedAndProject (per-partition heaps merged on
    the driver — never a global sort of the corpus); τ is a 1-row
    broadcast. Ties break by id for full determinism."""
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast("double")
    v = F.conv(F.substring(F.md5(F.coalesce(F.col(key_col), F.lit(""))), 1, 12), 16, 10).cast(
        "long"
    )
    scored = df.select(
        F.col(id_col),
        w.cast("long").alias("weight"),
        (w * F.lit(float(_PRIORITY_SCALE)) / (v + F.lit(1)).cast("double")).alias("priority"),
    )
    top = scored.orderBy(F.col("priority").desc(), F.col(id_col)).limit(n + 1)
    tau = top.agg(
        F.when(F.count(F.lit(1)) > n, F.min("priority")).otherwise(F.lit(0.0)).alias("tau")
    )
    sample = top.orderBy(F.col("priority").desc(), F.col(id_col)).limit(n)
    return sample.crossJoin(F.broadcast(tau)).select(
        id_col,
        "weight",
        "priority",
        F.greatest(F.col("weight").cast("double"), F.col("tau")).alias("est_weight"),
    )


def hash_split(
    df: DataFrame,
    key_col: str | Column,
    splits: Sequence[tuple[str, float]],
    out_col: str = "split",
    hex_chars: int = 4,
) -> DataFrame:
    """Assign each row a split label by md5-prefix range of ``key_col``.

    ``splits`` is ordered (name, weight); weights are normalized.
    Resolution is 1/16^hex_chars (4 hex chars ≈ 0.0015%% granularity).
    Key on the content column for leakage-proof splits; key on a stable
    id for stratified-by-row splits.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    prefix = F.substring(F.md5(key), 1, hex_chars)
    bounds = split_boundaries(splits, hex_chars)
    out = F.when(prefix < F.lit(bounds[0][1]), F.lit(bounds[0][0]))
    for name, b in bounds[1:]:
        out = out.when(prefix < F.lit(b), F.lit(name))
    out = out.otherwise(F.lit(splits[-1][0]))
    return df.withColumn(out_col, out)


def stratified_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
    n_buckets: int = 256,
) -> DataFrame:
    """Exact-N-per-stratum deterministic sample: the first
    ``n_per_group`` rows of each group in ``md5(seed:id)`` order —
    eval-set construction ("take exactly 100 docs per source"), where
    ``weighted_sample``'s rate-based filter cannot promise an exact
    count. Output ``(id, group, sample_rank)``.

    The md5 order key makes the choice reproducible across
    runs/engines and independent of input layout, and a different
    ``seed`` draws a fresh, disjoint-in-expectation sample.

    Scale shape: the rank is computed by the bucket-decomposed kernel
    (``scale.bucketed_group_order``) with a ``prune_rank`` prefix
    prune — buckets whose rows-before offset already reaches
    ``n_per_group`` are dropped before any sort, so the exact window
    only ever sees ~n_per_group rows per group (plus one bucket's
    width) instead of the whole group. Bit-identical to the naive
    per-group ``row_number`` window (the kept set is a prefix of the
    order), so the oracle is unchanged.
    """
    from rt_bigdata_spark.operators.scale import bucketed_group_order, ensure_parallelism

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    scored = ensure_parallelism(df).select(F.col(id_col), F.col(group_col), key.alias("_pr"))
    ranked = bucketed_group_order(
        scored, "_pr", id_col, group_col=group_col, n_buckets=n_buckets,
        rank_col="_rn", prune_rank=n_per_group,
    )
    return (
        ranked.filter(F.col("_rn") <= n_per_group)
        .select(id_col, group_col, F.col("_rn").alias("sample_rank"))
    )


def global_shuffle(
    df: DataFrame,
    seed: str = "0",
    id_col: str = "doc_id",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    contiguous 1-based ``position`` in the order of
    ``(md5(seed:id), id)`` — the epoch-order materialization a
    resumable dataloader needs (seed change ⇒ a fresh, reproducible
    permutation; no ``rand()``, engine-portable).

    Scale shape: a naive global ``row_number`` window has NO partition
    key, which Catalyst executes as a single-partition sort — the
    canonical 100 TB failure. The bucket-decomposed kernel
    (``scale.bucketed_group_order``) splits the total order by a
    prefix of the key itself: per-bucket parallel windows over
    ~n/n_buckets rows each plus a ≤ n_buckets-row offsets aggregate
    broadcast back. One shuffle on the bucket + one tiny broadcast
    join; the only single-partition window runs over the bucket-count
    table.
    """
    from rt_bigdata_spark.operators.scale import bucketed_group_order, ensure_parallelism

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    b = ensure_parallelism(df).select(F.col(id_col), key.alias("_pr"))
    ranked = bucketed_group_order(b, "_pr", id_col, n_buckets=16**bucket_chars, rank_col="position")
    return ranked.select(id_col, "position")


def mix_schedule(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Stride-scheduled source interleaving: the deterministic global
    ORDER in which a training run should consume a weighted mix of
    sources (``weighted_sample`` decides WHAT to keep; this decides
    WHEN). Each source's docs are ranked in content-keyed md5 order,
    and doc r of source s is scheduled at key ``r / w_s`` — classic
    stride scheduling, so a weight-3 source appears 3× as often as a
    weight-1 source at every horizon of the schedule, not just in
    aggregate. Consumers materialize the order by sorting on
    ``(sched_key, group, src_rank)`` — a range-partition sort.

    Scale shape: the per-source rank comes from the bucket-decomposed
    kernel (``scale.bucketed_group_order``) — ~n/n_buckets rows per
    sort task instead of one task sorting a whole (possibly dominant)
    source. Bit-identical ranks, unchanged oracle. Size ``n_buckets``
    ≳ dominant-group rows / target-task rows.
    """
    from rt_bigdata_spark.operators.scale import bucketed_group_order, ensure_parallelism

    txt = F.coalesce(F.col(text_col), F.lit(""))
    scored = ensure_parallelism(df).select(
        F.col(id_col), F.col(group_col), F.md5(txt).alias("_pr")
    )
    ranked = bucketed_group_order(
        scored, "_pr", id_col, group_col=group_col, n_buckets=n_buckets, rank_col="src_rank"
    ).select(id_col, group_col, "src_rank")
    wexpr: Column | None = None
    for g, wt in weights.items():
        wexpr = (
            F.when(F.col(group_col) == g, F.lit(float(wt)))
            if wexpr is None
            else wexpr.when(F.col(group_col) == g, F.lit(float(wt)))
        )
    weight = F.lit(float(default_weight)) if wexpr is None else wexpr.otherwise(F.lit(float(default_weight)))
    return ranked.select(
        id_col,
        group_col,
        F.col("src_rank").cast("long").alias("src_rank"),
        (F.col("src_rank") / weight).alias("sched_key"),
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Temperature-based source interleaving: ``mix_schedule`` whose
    weights are DERIVED from the source sizes instead of hand-picked —
    ``w_s = n_s^alpha``, the standard temperature-sampling rule for
    multi-source / multilingual corpora (alpha = 1 reproduces natural
    proportions, alpha = 0 gives uniform source rotation, alpha = 0.5
    the usual compromise that up-samples small sources without letting
    them dominate; cf. the exponent-smoothed sampling of mC4/XLM-R and
    UniMax-style capped variants). ``sched_key = src_rank / n_s^alpha``
    — stride scheduling with the derived weight; the weight is used
    UN-normalized, which leaves the interleave order identical (the
    schedule is scale-invariant in the weights) and keeps the value
    engine-portable: no cross-source sum of doubles whose fold order
    an oracle would have to reproduce.

    Determinism: for the default alpha = 0.5 the weight is
    ``sqrt(n_s)`` — IEEE sqrt is correctly rounded in every engine, so
    the keys replay bit-identically (the registered query pins this).
    Other alphas go through ``pow``, whose last-ulp rounding is
    libm-specific — fine operationally, not hash-oracle-exact
    (documented trade; keep oracle-checked paths on 0.5).

    Scale shape: the per-source counts are O(sources) rows broadcast
    back; the rank rides the same bucket-decomposed kernel as
    ``mix_schedule`` — nothing new shuffles.
    """
    from rt_bigdata_spark.operators.scale import bucketed_group_order, ensure_parallelism

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    scored = ensure_parallelism(df).select(
        F.col(id_col), F.col(group_col), F.md5(txt).alias("_pr")
    )
    ranked = bucketed_group_order(
        scored, "_pr", id_col, group_col=group_col, n_buckets=n_buckets, rank_col="src_rank"
    ).select(id_col, group_col, "src_rank")
    nd = F.col("_n").cast("double")
    weight = F.sqrt(nd) if alpha == 0.5 else F.pow(nd, F.lit(float(alpha)))
    return (
        ranked.join(F.broadcast(counts), group_col)
        .select(
            id_col,
            group_col,
            F.col("src_rank").cast("long").alias("src_rank"),
            (F.col("src_rank") / weight).alias("sched_key"),
        )
    )
