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
