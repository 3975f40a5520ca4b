"""Windowed / grouped aggregations (SURVEY.md §2.5, A1-A8).

Re-expresses the reference's DWS-layer window reduces as declarative
tumbling-window groupBy/agg:

- A1 VisitorStats keyed window reduce  (rt-flink …/app/dws/VisitorStatsApp.scala:167-201)
- A2 distinct-count via HashSet union  (…/app/dws/ProductStatsApp.scala:183-222)
- A3 SQL TUMBLE + COUNT(DISTINCT)      (…/app/dws/ProvinceStatsSqlApp.scala:70-78)
- A4 windowed keyword counts           (…/app/dws/KeywordStatsApp.scala:75-80)
- A5 non-windowed grouped agg          (…/ods/demo/FlinkKafkaSource_02.scala:110-124)
- A6 conditional aggregation           (…/ads/demo/JarSubmit.scala:72-111)

Scale notes: Catalyst plans all of these as partial + final
HashAggregate (map-side combine), which is the reference's hand-coded
incremental-ReduceFunction optimization for free (A8). The only
footgun at 100 TB is ``collect_set`` on a hot key — prefer
``countDistinct`` (exact, two-phase shuffle) or
``approx_count_distinct`` (HLL, single pass) and keep ``collect_set``
only where the set itself is the output.

All functions are DataFrame→DataFrame and work identically on static
and streaming inputs (streaming requires ``withWatermark`` upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    stt_edt: bool = True,
) -> DataFrame:
    """Tumbling event-time window + keyed aggregation (A1/A3/A4, T5).

    Emits ``stt``/``edt`` window-bound columns formatted
    ``yyyy-MM-dd HH:mm:ss`` like the reference's ProcessWindowFunction
    (VisitorStatsApp.scala:190-199) and ClickHouse DDL.
    """
    grouped = df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *[F.col(k) for k in keys])
    out = grouped.agg(*aggs)
    if stt_edt:
        out = out.withColumn("stt", F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")).withColumn(
            "edt", F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss")
        )
    return out.drop("w")


def distinct_count(col: str, approx: bool = False) -> Column:
    """A2's HashSet-union distinct count, Spark-native.

    ``approx=True`` switches to HyperLogLog — the 100 TB path when a
    2% error is acceptable (single-pass, no per-key set state).
    """
    return F.approx_count_distinct(col) if approx else F.countDistinct(col)


def conditional_sum(condition: Column, if_true: Column, if_false: Column) -> Column:
    """A6's ``SUM(IF(cond, a, b))`` pattern (JarSubmit.scala:75-90)."""
    return F.sum(F.when(condition, if_true).otherwise(if_false))


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows: per-key windows that extend while events arrive
    within ``gap`` of the last one, close after a quiet gap.

    The reference has no session operator (its bounce detection T3
    hand-rolls one with CEP timeouts); Spark's ``session_window`` is the
    declarative equivalent — SURVEY.md §2.7 T3 names sessionization as
    the alternative formulation. Works identically on static frames and
    streams (streaming needs ``withWatermark`` upstream; state is merged
    windows per key, bounded by the watermark).

    Session bounds come out as ``session_start`` (first event) and
    ``session_end`` (last event + gap — the window's close time).
    """
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *[F.col(k) for k in keys])
    return (
        grouped.agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    duration/slide overlapping windows. Free in Spark (`window(slide=)`),
    absent from the reference (T5 lists it as available-for-free).

    Scale note: the expansion factor IS duration/slide — each input row
    is duplicated into that many groups before the shuffle, so keep the
    ratio small at 100 TB or pre-aggregate to the slide granularity
    first (tumble by `slide`, then roll 2 buckets up map-side).
    """
    grouped = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("w"), *[F.col(k) for k in keys]
    )
    return (
        grouped.agg(*aggs)
        .withColumn("wstart", F.col("w.start"))
        .withColumn("wend", F.col("w.end"))
        .drop("w")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    unit: str = "hour",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-series downsampling (the hypertable / continuous-aggregate
    rollup): per key and calendar bucket, emit count, OHLC
    (open/high/low/close of ``value_col``) and a decimal-exact sum —
    the materialization that turns a raw 100 TB event log into the
    MB-scale series dashboards actually read.

    open/close order by ``(epoch_millis, id)`` — a total order both
    engines agree on — packed into ONE DECIMAL(38,0) key
    (``epoch_ms·10¹² + id``; ids must stay below 10¹², documented
    contract). The packing is what keeps the plan a single
    map-side-combinable HashAggregate: min_by over a string or struct
    key puts a non-mutable type in the aggregation buffer and Spark
    silently degrades to SortAggregate — a per-partition sort of
    EVERY input row — while a decimal buffer stays hash-updatable.
    One shuffle of O(groups) rows no matter the input size, THE
    reason continuous aggregates are cheap to maintain incrementally
    (plan-asserted).

    ``date_trunc(unit)`` buckets are calendar-aligned, so both engines
    agree on boundaries for units that divide a day (hour here; the
    registry's divides-a-day convention).

    Defined as ``finalize_time_rollup(time_rollup_state(...))`` so the
    key packing and agg list exist in exactly ONE place (a packing
    change that reached only one copy would silently break the
    merge≡rebuild contract); Catalyst prunes the unused o_key/c_key
    aggregates after the drop, so the plan is identical.
    """
    return finalize_time_rollup(
        time_rollup_state(df, ts_col, value_col, keys, unit, id_col)
    )


def time_rollup_state(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    unit: str = "hour",
    id_col: str = "event_id",
) -> DataFrame:
    """``time_rollup`` plus the two packed ordering keys (``o_key``,
    ``c_key``) that make the rollup MERGEABLE: with the arg-min/max
    keys materialized, two states over disjoint event slices combine
    into the state of their union (``merge_time_rollups``) without
    touching raw events — incremental view maintenance for the
    continuous aggregate. Persist this instead of the display form;
    ``finalize_time_rollup`` strips the keys for consumers."""
    val = F.col(value_col)
    okey = (
        F.unix_millis(F.col(ts_col).cast("timestamp")).cast("decimal(38,0)")
        * F.lit(10**12)
        + F.col(id_col).cast("decimal(38,0)")
    )
    return (
        df.groupBy(
            *[F.col(k) for k in keys],
            F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by(val, okey).alias("v_open"),
            F.min(okey).alias("o_key"),
            F.max_by(val, okey).alias("v_close"),
            F.max(okey).alias("c_key"),
            F.min(val).alias("v_low"),
            F.max(val).alias("v_high"),
            F.sum(val.cast("decimal(18,2)")).alias("v_sum"),
        )
    )


def merge_time_rollups(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Combine ``time_rollup_state`` outputs over disjoint event
    slices into the state of the union — the nightly "fold today's
    partial into the running aggregate" step. Algebra: counts and
    sums add; low/high take min/max; open follows the SMALLER o_key
    (min_by again, one level up), close the larger c_key. One
    hash-agg over O(groups) rows per input state; raw events are
    never re-read, which is the entire point of keeping the state
    mergeable.

    ``v_sum`` accumulates in DECIMAL(38,2) — the widest scale-2 decimal
    — not the DECIMAL(28,2) a single batch produces: with ANSI mode off
    a narrower cast on a long-lived continuous aggregate would overflow
    to silent NULL (ADVICE r5). Input rows are capped at (18,2), so 38,2
    holds ~10^20 batch-sums; unionByName promotes older (28,2) states
    transparently."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return (
        unioned.groupBy(*keys, "bucket_ts")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min_by(F.col("v_open"), F.col("o_key")).alias("v_open"),
            F.min("o_key").alias("o_key"),
            F.max_by(F.col("v_close"), F.col("c_key")).alias("v_close"),
            F.max("c_key").alias("c_key"),
            F.min("v_low").alias("v_low"),
            F.max("v_high").alias("v_high"),
            F.sum("v_sum").cast("decimal(38,2)").alias("v_sum"),
        )
    )


def finalize_time_rollup(state: DataFrame) -> DataFrame:
    """Display form of a rollup state: drop the mergeability keys."""
    return state.drop("o_key", "c_key")


def dec_to_double_portable(c: Column) -> Column:
    """Engine-portable DECIMAL→DOUBLE for sums whose unscaled value may
    exceed int64: chunk the integral part into three int64-fitting
    pieces with EXACT decimal/integer arithmetic (abs → ``% 1``
    fraction split → ``div``/``%`` by 10²⁰ and 10¹⁰), convert each
    piece with the universally correctly-rounded int64→double cast, and
    recombine with a fixed left-associated IEEE double expression —
    ``sign·(a·1e20 + m·1e10 + r + frac)``. DuckDB mirrors it via
    HUGEINT in ``plans/warehouse._dec_to_double_portable_sql``
    (prototyped r11: bit-identical across engines on values up to the
    DECIMAL(38,4) cap, where the naive casts enter engine-specific
    wide-decimal slow paths that may differ by 1 ulp).

    Bounds, all structural: ``a = w div 10²⁰ < 10¹⁴`` and
    ``m = (w % 10²⁰) div 10¹⁰ < 10¹⁰`` fit Spark's long-typed ``div``;
    the result may differ from the infinitely-precise value by a few
    ulps (three roundings instead of one) — identically on every
    engine, which is the property the cross-engine hash contract
    needs."""
    d20 = F.lit("100000000000000000000").cast("decimal(21,0)")
    d10 = F.lit("10000000000").cast("decimal(11,0)")
    sign = F.when(c < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    u = F.abs(c)
    frac = u % F.lit(1)
    w = (u - frac).cast("decimal(38,0)")
    a = F.call_function("div", w, d20).cast("double")
    m = F.call_function("div", w % d20, d10).cast("double")
    r = (w % d10).cast("double")
    return sign * (a * F.lit(1e20) + m * F.lit(1e10) + r + frac.cast("double"))


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    id_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flags: ``|value − μ| > z·σ`` against
    the group's own population moments — the statistical data-validation
    pass (sensor glitches, price errors, bot bursts) that sits beside
    the rule-based expectations suite.

    Determinism discipline: μ and σ come from DECIMAL-exact Σv and Σv²
    (values cast to DECIMAL(18,2) → squares exact in DECIMAL(38,4);
    decimal addition is order-independent, unlike the float partial
    sums inside a naive ``stddev_pop``, whose last-ulp drift across
    partition layouts breaks cross-engine comparison). One double
    conversion per GROUP at the end, then one subtraction/division per
    row — engine-portable like the money aggregations.

    Plan: one grouped hash-agg over the scan (O(groups) exchange) +
    one broadcast join of the tiny moments table back onto the rows —
    never a window over the raw data (a window would sort every row
    within group for two scalars).

    Cross-engine envelope — REMOVED STRUCTURALLY (r10 verdict item 7):
    the final decimal→double conversions go through
    ``dec_to_double_portable`` (below) instead of a bare cast, so the
    moments never depend on an engine's wide-decimal→double rounding.
    Every step in that helper is either exact decimal/integer
    arithmetic or an int64-fitting integer→double conversion
    (correctly rounded per IEEE 754 in every engine), and the final
    recombination is the same sequence of IEEE double ops on both
    sides. The old bound (per-group Σv² ≤ ~9.2e14, where the
    decimal64 compact fast path ends) is gone: the sums stay exact to
    the DECIMAL(38,4) cap (Σv² < 10³⁴ — unreachable), previously
    guarded by a since-retired measured-headroom test, now covered by
    tests/test_properties.py::test_zscore_moments_portable_beyond_decimal64_envelope
    which exercises the cross-engine identity PAST the old envelope.

    NULL-key exclusion (ADVICE r5, same convention as the behavior
    operators): rows whose group key is NULL have no population to
    score against — the equi-join back onto the moments table drops
    them from the report entirely (NULL never equals NULL), matching
    the oracle's INNER JOIN. Callers validating corpora where
    un-keyable rows are themselves suspect should pre-filter
    ``key IS NULL`` into a separate rule — this operator will not
    surface them.
    """
    v = F.col(value_col)
    dec = v.cast("decimal(18,2)")
    moments = df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(dec).alias("s1"),
        F.sum((dec * dec).cast("decimal(38,4)")).alias("s2"),
    )
    mu = dec_to_double_portable(F.col("s1")) / F.col("n")
    var = dec_to_double_portable(F.col("s2")) / F.col("n") - mu * mu
    stats = moments.select(
        *keys,
        mu.alias("mu"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("sigma"),
    )
    # no broadcast hint: `stats` is one row per distinct key tuple —
    # bounded only by the CALLER's key cardinality, which this generic
    # operator cannot promise is small. AQE broadcasts it at runtime
    # whenever the moments table measures under the threshold.
    joined = df.join(stats, list(keys))
    # zero-variance guard, explicit on BOTH engines: Spark's x/0.0 is
    # NaN (which compares false) while DuckDB's is NULL — and a raw
    # NaN literal compares GREATER than everything there, so leaving
    # the division bare diverges cross-engine exactly on degenerate
    # groups. A single-member/constant group has no outliers by
    # definition: z is NULL, the flag false.
    z = F.when(F.col("sigma") > 0, (v - F.col("mu")) / F.col("sigma"))
    return joined.select(
        F.col(id_col),
        *keys,
        v.alias("value"),
        F.col("mu"),
        F.col("sigma"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(z_threshold), F.lit(False)).alias("is_outlier"),
    )


def rollup_cascade(state: DataFrame, keys: Sequence[str], unit: str = "day") -> DataFrame:
    """Re-aggregate a finer ``time_rollup_state`` into a coarser one
    (hour → day → month) WITHOUT touching raw events — the hierarchy
    every continuous-aggregate system maintains (day views read the
    hourly state, not the event log). Same mergeable-state algebra as
    ``merge_time_rollups``, grouped by the coarser calendar bucket;
    cost is O(fine-grained groups), independent of event volume.
    Cascade ≡ direct rebuild is property-tested (the state carries the
    exact arg-min/max keys, so open/close survive re-bucketing)."""
    return (
        state.groupBy(
            *keys, F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min_by(F.col("v_open"), F.col("o_key")).alias("v_open"),
            F.min("o_key").alias("o_key"),
            F.max_by(F.col("v_close"), F.col("c_key")).alias("v_close"),
            F.max("c_key").alias("c_key"),
            F.min("v_low").alias("v_low"),
            F.max("v_high").alias("v_high"),
            F.sum("v_sum").cast("decimal(38,2)").alias("v_sum"),
        )
    )
