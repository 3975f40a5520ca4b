"""User-behavior analytics over the events stream: funnel progression
and cohort retention.

Warehouse-side companions to the reference's visitor/bounce analytics
(same events table, same DWS layer): funnel analysis generalizes the
bounce CEP pattern (reference BounceDetection: "did step 2 happen
after step 1 in time?") to an ordered k-step sequence, and cohort
retention is the DWS aggregation marketing teams read next to it.

Scale shape — both are single-shuffle plans:

- ``funnel_stages`` computes the chained first-reach timestamps with
  three unbounded-window MINs over the SAME user partitioning: one
  Exchange, no Sort (min needs no frame order), no joins — vs the
  naive 3-level agg + 2 self-joins that re-shuffles the events table
  per step.
- ``cohort_retention`` is one scan → distinct hash-agg → user-key
  window MIN → final agg (three exchanges, no join); counts are exact
  and the output is O(weeks²) rows regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rt_bigdata_spark.operators.scale import ensure_parallelism


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """``(user_id, funnel_stage)``: the deepest step each user reached
    IN ORDER — step k counts only if it happens at-or-after the user's
    first qualifying step k-1 (ties allowed: same-timestamp progression
    counts, mirroring an inclusive CEP `followedBy`).

    All k first-reach timestamps come from unbounded conditional
    window MINs over one user partitioning — a single Exchange total,
    because each step's condition references the previous step's
    column, which Catalyst evaluates as chained Window nodes sharing
    the partitioning.

    NULL users are excluded: ``Window.partitionBy`` would group them
    into one pseudo-user (any SQL rewrite joining on the user key
    drops them instead — NULL never equi-joins), so a NULL funnel
    subject has no consistent cross-engine meaning."""
    w = Window.partitionBy(user_col)
    df = (
        ensure_parallelism(events)
        .filter(F.col(user_col).isNotNull())
        .select(user_col, type_col, ts_col)
    )
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        df = df.withColumn(f"s{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"s{i}"
    # deepest stage wins: each constructed WHEN wraps the previous one
    # as its OTHERWISE branch, so building s0→sk leaves the LAST step's
    # check outermost (building downward would let s0 shadow them all)
    stage = F.lit(0).cast("long")
    for i in range(len(steps)):
        stage = F.when(F.col(f"s{i}").isNotNull(), F.lit(i + 1).cast("long")).otherwise(stage)
    return (
        df.withColumn("funnel_stage", stage)
        .groupBy(user_col)
        .agg(F.max("funnel_stage").alias("funnel_stage"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(cohort_week, week_offset, active_users)``: users bucketed by
    the week of their first event; for each later week, how many of
    that cohort were active. Exact counts; weeks are ISO
    ``date_trunc('week', ts)`` so both engines agree on boundaries.

    Plan shape: ONE events scan → distinct (user, week) hash-agg →
    cohort week as a window MIN over the user key → final
    (cohort, offset) agg — three exchanges, no join, no second scan
    (the agg-then-join-back formulation reads the source twice and
    shuffles four times). The final count is a plain ``count``:
    activity is already distinct per (user, week) and the offset is
    injective in week given the cohort, so each user appears at most
    once per output group — a COUNT(DISTINCT) expansion would be
    redundant work for identical numbers. NULL users are excluded
    (same rationale as ``funnel_stages``: the window would pool them
    into one pseudo-user while any join-based rewrite drops them)."""
    ev = (
        ensure_parallelism(events)
        .filter(F.col(user_col).isNotNull())
        .select(F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("week"))
    )
    activity = ev.distinct()
    w = Window.partitionBy(user_col)
    return (
        activity.withColumn("cohort_week", F.min("week").over(w))
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(prev_event, event_type, transitions, p_transition)``
    — the "what do users do next" analysis that sits beside the funnel
    in the DWS layer (and the empirical transition model a
    next-event-prediction training set is built from).

    Per user, events are ordered by (ts, event_id) — the same
    deterministic tiebreak every window in this repo uses — and each
    consecutive pair contributes one transition. ``p_transition`` is
    row-normalized per source state (counts are exact longs; one
    double division per output row).

    Scale shape: one user-key window (single Exchange + Sort carrying
    only (user, type, ts, id)), then a hash-agg on (prev, cur) —
    k×k keys — and a window over that O(k²)-row result. NULL users
    are excluded for the same reason funnel_stages excludes them:
    partitionBy would pool all NULL users into one giant pseudo-user
    (a skew key AND a semantic lie), while join-based rewrites drop
    them.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    seq = (
        ensure_parallelism(events)
        .filter(F.col(user_col).isNotNull())
        .select(user_col, type_col, ts_col, id_col)
        .withColumn("prev_event", F.lag(F.col(type_col)).over(w))
        .filter(F.col("prev_event").isNotNull())
    )
    counts = seq.groupBy("prev_event", type_col).agg(
        F.count(F.lit(1)).alias("transitions")
    )
    total = Window.partitionBy("prev_event")
    return counts.select(
        F.col("prev_event"),
        F.col(type_col),
        F.col("transitions"),
        F.round(
            F.col("transitions").cast("double")
            / F.sum("transitions").over(total).cast("double"),
            6,
        ).alias("p_transition"),
    )


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session indices to events: a new session
    starts when a user is silent longer than ``gap_s`` seconds — the
    batch backbone of session analytics (the streaming twin is
    Spark's native ``session_window``, exercised by session_stats;
    this operator exists because downstream per-session work — funnel
    slicing, replay ordering, per-session labels — needs the session
    KEY on every event, which the windowed agg never materializes).

    Returns the input events (user/ts/id only) plus ``session_idx``:
    the per-user session ordinal (1-based). One user-key
    Exchange + Sort; the gap test and running sum both ride the same
    window. NULL users are excluded (same contract as every behavior
    operator here).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ→TIMESTAMP cast for unix_millis (UTC session; epoch-identical
    # to the oracle's epoch_ms on naive timestamps)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    new_sess = F.when(
        prev_ms.isNull() | ((ms - prev_ms) > gap_s * 1000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ensure_parallelism(events)
        .filter(F.col(user_col).isNotNull())
        .select(user_col, ts_col, id_col)
        .withColumn("session_idx", F.sum(new_sess).over(run))
    )


def user_sessions(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session summary over ``sessionize``: event count, start,
    end, duration_ms. The groupBy keys extend the window's user-key
    partitioning, so Catalyst satisfies the aggregation with the SAME
    Exchange the window used — one shuffle end to end
    (plan-asserted). Duration is an exact epoch-millis difference
    (long), not a float interval."""
    sess = sessionize(events, gap_s, user_col, ts_col, id_col)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    return (
        sess.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("sess_start"),
            F.max(ts_col).alias("sess_end"),
            (F.max(ms) - F.min(ms)).alias("duration_ms"),
        )
    )


def active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily actives + trailing-N-day actives + stickiness
    (DAU / WAU / DAU÷WAU): the engagement table every product
    dashboard leads with. Both counts are EXACT rolling distincts —
    the classically awkward aggregate — computed by the expansion
    trick: the distinct (user, day) activity pairs (a tiny table:
    users × active days) are fanned out to every window they fall in
    (×N map-side), then exactly distinct-counted per window-end day.
    The ×N expansion runs on the ACTIVITY table, never the event log,
    so at 100 TB the cost is days×users-scale, not events-scale; for
    N beyond ~30 (or user counts where days×users itself hurts)
    switch to ``active_users_hll`` — presketched daily HLL registers
    merged N-ways, no per-user fan-out at all.

    A day's WAU window covers days [d−N+1, d]; days with no activity
    emit no row (standard dashboard semantics — gap-fill downstream
    if the chart needs zeros). NULL users excluded (repo-wide
    behavior contract).
    """
    if window_days < 1:
        # F.sequence(0, N-1) DESCENDS for N <= 0 ([0, -1]): the fan-out
        # would silently include FUTURE days instead of erroring
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    ev = (
        ensure_parallelism(events)
        .filter(F.col(user_col).isNotNull())
        .select(F.col(user_col), F.date_trunc("day", F.col(ts_col)).alias("day"))
        .distinct()
    )
    # ev is distinct by (user, day), so a plain count IS the distinct
    # user count — countDistinct would re-plan the two-phase distinct
    # expansion over already-distinct rows
    dau = ev.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fanned = ev.select(
        F.col(user_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(window_days - 1)),
                lambda i: F.date_add(F.col("day").cast("date"), i.cast("int")),
            )
        ).alias("win_end"),
    )
    # fanned windows may extend past the last active day; keep only
    # window-ends that are real active days so the output matches the
    # dashboard's day axis
    wau = (
        fanned.join(ev.select(F.col("day").cast("date").alias("win_end")).distinct(), "win_end")
        .groupBy("win_end")
        .agg(F.countDistinct(user_col).alias("wau"))
    )
    return (
        dau.join(wau, dau["day"].cast("date") == wau["win_end"])
        .select(
            F.col("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


def active_users_hll(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lg_config_k: int = 12,
) -> DataFrame:
    """The sketch form of ``active_users`` — the documented HLL swap
    for large N, implemented (r6 verdict item 4). Returns
    ``(day, dau_approx, wau_approx, stickiness_approx)``.

    Shape difference that matters at 100 TB: the exact form fans the
    per-(user, day) ACTIVITY table ×N before the distinct count —
    days×users×N exchanged rows. Here each day folds into one
    fixed-size HLL register set FIRST (``hll_sketch_agg``, a Datasketches
    HLL_8 of ≤ 2^lg_config_k registers, partial-aggregated map-side),
    and only the O(days) sketch rows fan ×N for the trailing-window
    union (``hll_union_agg``) — the per-user explode disappears
    entirely, so shuffle bytes are days×sketch-size regardless of user
    count. No pre-distinct on (user, day) either: HLL insertion is
    idempotent, so the raw event projection feeds the sketch directly
    (one shuffle total where the exact form needs two).

    Mergeability is the same monoid property the rollup/CMS maintenance
    sinks exploit; persisted daily registers would make this
    incrementally maintainable by ``versioned_state_sink``. Estimate
    accuracy: standard error ≈ 1.04/√2^lg_config_k (~1.6 % at the
    default 12); the Datasketches sparse mode is near-exact at small
    cardinalities. Audited against the exact form by the registered
    ``active_users_hll`` spec (tolerance verdict hash-checked by the
    DuckDB oracle, the province_stats_approx recipe).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    ev = (
        ensure_parallelism(events)
        .filter(F.col(user_col).isNotNull())
        .select(F.col(user_col), F.date_trunc("day", F.col(ts_col)).alias("day"))
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg(user_col, F.lit(lg_config_k)).alias("sk")
    )
    fanned = daily.select(
        "sk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(window_days - 1)),
                lambda i: F.date_add(F.col("day").cast("date"), i.cast("int")),
            )
        ).alias("win_end"),
    )
    # window-ends clipped to real active days (same axis as the exact
    # form); the day list is O(days) — broadcast
    days = daily.select(F.col("day").cast("date").alias("win_end"))
    wau = (
        fanned.join(F.broadcast(days), "win_end")
        .groupBy("win_end")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_approx"))
    )
    dau = daily.select("day", F.hll_sketch_estimate("sk").alias("dau_approx"))
    return dau.join(wau, dau["day"].cast("date") == wau["win_end"]).select(
        "day",
        "dau_approx",
        "wau_approx",
        F.round(F.col("dau_approx").cast("double") / F.col("wau_approx"), 6).alias(
            "stickiness_approx"
        ),
    )


def activity_buckets(
    events: DataFrame,
    n_buckets: int = 16,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_ms: int | None = None,
) -> DataFrame:
    """Per-user activity time series in matrix form: ``(user_id,
    bucket, c)`` — event counts over ``n_buckets`` equal slices of the
    corpus's GLOBAL time span (the EDBT'19 streaming-similarity shape:
    fixed-dimension series so similarity reduces to vector math).

    Bucketing is INTEGER-exact and engine-portable:
    ``bucket = ((us − min_us) · n) div (max_us − min_us + 1)`` on epoch
    microseconds — no float division, no boundary ties. The global span
    is a 1-row aggregate broadcast onto the scan (the corpus-stats
    totals-join pattern, bm25's); the only shuffle is the
    (user, bucket) count hash-agg, map-side combinable. Output is the
    sparse matrix (zero buckets absent) — consumers that need density
    handle it relationally (``similar_activity_topk`` via COALESCE
    after the bucket join) rather than materializing dense arrays.

    ``bucket_ms`` switches to FIXED-EPOCH bucketing
    (``bucket = us div (bucket_ms·1000)``, absolute-time-aligned,
    ``n_buckets`` ignored): the form a STREAM can maintain
    incrementally — span-relative buckets shift whenever min/max move,
    so only the epoch-aligned matrix is a mergeable monoid
    (per-batch counts sum cell-wise). The streaming twin
    (``streaming.sinks.activity_matrix_maintenance_sink``) maintains
    exactly this output; batch and maintained matrices are
    row-identical over the same events (pinned by the rollup-sink
    equivalence test)."""
    # NTZ→TIMESTAMP cast for unix_micros (UTC session; epoch-identical
    # to the oracle's epoch_us on naive timestamps — sessionize's rule)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = ensure_parallelism(events).select(F.col(user_col).alias("user_id"), us.alias("us"))
    if bucket_ms is not None:
        binned = ev.select(
            "user_id",
            F.expr(f"CAST(us DIV {int(bucket_ms) * 1000} AS BIGINT)").alias("bucket"),
        )
    else:
        span = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
        binned = ev.crossJoin(F.broadcast(span)).select(
            "user_id",
            # SQL DIV: exact BIGINT division — a float `/` + floor could
            # flip a boundary where the true quotient is an exact integer
            F.expr(f"CAST(((us - lo) * {int(n_buckets)}) DIV (hi - lo + 1) AS BIGINT)").alias(
                "bucket"
            ),
        )
    return binned.groupBy("user_id", "bucket").agg(F.count(F.lit(1)).alias("c"))


def similar_activity_topk(
    events: DataFrame,
    k: int = 5,
    n_buckets: int = 16,
    probe_ids_below: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Behavioral similarity search: for each probe user, the top-k
    users with the most similar activity time series — Pearson
    correlation of the bucketed count series, computed RELATIONALLY
    from integer sums so both engines produce bit-identical values:

        r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Every Σ term is an exact integer (counts), summed as BIGINT — the
    classic float-summation-order drift cannot occur. The CROSS
    products (n·Σxy, Σx·Σy, varn·qvarn) are computed in DOUBLE on both
    engines: kept in BIGINT they overflow int64 once per-user event
    counts pass ~10⁹ (Spark non-ANSI would wrap silently while DuckDB
    raises — the engines would diverge exactly at scale), and a single
    IEEE multiply/subtract of exact-integer-valued doubles is
    bit-identical across engines. The BIGINT terms themselves (Σx, Σx²,
    varn = n·Σx² − (Σx)²) are exact while per-user totals stay below
    ~3×10⁹ events (and ~7.6×10⁸ in any single bucket for n=16) — far
    beyond any real per-user activity. ONE double division + sqrt at
    the end, rounded 9 dp (the engine-wide similarity discipline).

    Missing buckets are implicit zeros: Σxy over the INNER bucket join
    equals the dense dot product because zero terms contribute nothing,
    and Σx/Σx² come from the sparse rows alone. The inner join also
    means candidate GENERATION requires bucket overlap: a neighbor
    sharing no active bucket with the probe is never scored — by
    design, since with non-negative counts Σxy = 0 forces a NEGATIVE
    Pearson (covariance = −ΣxΣy/n), which can only matter when fewer
    than k overlapping candidates exist; in that case this top-k
    under-fills rather than surfacing anti-correlated users. Callers
    wanting dense-Pearson semantics over ALL users should generate
    candidates from the varn>0 user set with a left join instead
    (Σxy COALESCEd to 0). Zero-variance (flat) series carry no
    signal and are excluded on both sides — Pearson is undefined there.

    Scale shape: one (user, bucket) hash-agg over the events scan; the
    probe side (``probe_ids_below`` users × n_buckets rows) broadcasts
    onto the corpus matrix via the bucket equi-join, so scoring is one
    map-side pass + a per-probe top-k window — the brute_force_topk
    plan with the cosine kernel swapped for integer-exact Pearson. At
    ANN scale the same series feed the hyperplane-LSH/IVF machinery
    (a series IS an embedding once z-normalized).
    """
    return similar_from_activity_matrix(
        activity_buckets(events, n_buckets, user_col, ts_col),
        k=k,
        n_buckets=n_buckets,
        probe_ids_below=probe_ids_below,
    )


def similar_from_activity_matrix(
    mat: DataFrame,
    k: int = 5,
    n_buckets: int = 16,
    probe_ids_below: int = 5,
) -> DataFrame:
    """The Pearson top-k scoring stage of ``similar_activity_topk``,
    taking a prebuilt ``(user_id, bucket, c)`` activity matrix — the
    seam that lets the STREAMING-MAINTAINED matrix
    (``activity_matrix_maintenance_sink``) feed the same scoring plan
    instead of rescanning the events history per query (the shape a
    100 TB behavioral pipeline runs: matrix maintained per batch in
    O(batch), similarity served from O(users·active-buckets) state).
    ``n_buckets`` is the Pearson series length n — for a maintained
    fixed-epoch matrix pass the matrix's own bucket-universe size.
    Semantics, determinism discipline, and scale shape are documented
    on ``similar_activity_topk``."""
    n = n_buckets
    stats = mat.groupBy("user_id").agg(
        F.sum("c").alias("sx"),
        F.sum(F.col("c") * F.col("c")).alias("sxx"),
    )
    # integer variance numerator: n·Σx² − (Σx)²  (exact in BIGINT)
    stats = stats.withColumn("varn", F.lit(n) * F.col("sxx") - F.col("sx") * F.col("sx")).filter(
        F.col("varn") > 0
    )
    probes = stats.filter(F.col("user_id") < probe_ids_below).select(
        F.col("user_id").alias("query_id"), F.col("sx").alias("qsx"), F.col("varn").alias("qvarn")
    )
    pm = mat.filter(F.col("user_id") < probe_ids_below).select(
        F.col("user_id").alias("query_id"), "bucket", F.col("c").alias("qc")
    )
    sxy = (
        mat.join(F.broadcast(pm), "bucket")
        .filter(F.col("user_id") != F.col("query_id"))
        .groupBy("query_id", F.col("user_id").alias("neighbor_id"))
        .agg(F.sum(F.col("c") * F.col("qc")).alias("sxy"))
    )
    scored = (
        sxy.join(
            stats.select(F.col("user_id").alias("neighbor_id"), "sx", "varn"), "neighbor_id"
        )
        .join(F.broadcast(probes), "query_id")
        # cross products in DOUBLE (not BIGINT): see docstring — int64
        # would wrap on Spark / raise on DuckDB at large per-user counts
        .withColumn(
            "sim",
            F.round(
                (
                    F.lit(float(n)) * F.col("sxy").cast("double")
                    - F.col("sx").cast("double") * F.col("qsx").cast("double")
                )
                / F.sqrt(F.col("varn").cast("double") * F.col("qvarn").cast("double")),
                9,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rk").cast("long").alias("rk"))
    )
