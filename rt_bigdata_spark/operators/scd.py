"""Slowly-changing-dimension (SCD type 2) history builder.

The reference lands dimension changes as last-write-wins upserts into
HBase/Phoenix (rt-flink …/utils/flink/DimSink.scala:15-58), which
destroys history: a fact row joined later sees the dim's CURRENT
attributes, not the attributes at event time. The standard warehouse
fix is SCD-2: each change becomes a version row with a validity
interval, and event-time joins become `fact.ts BETWEEN valid_from AND
valid_to` (or an as-of join against valid_from).

Scale design — ONE shuffle + ONE sort for both stages: the same-ts
last-writer dedup and the interval assignment both run as windows over
``partitionBy(keys).orderBy(ts, tiebreak)``; the intermediate filter
preserves partitioning and sort order, so Catalyst satisfies the
second window's requirements without a new Exchange or Sort (asserted
in tests). A groupBy-dedup-then-window formulation would shuffle
twice (once on (key, ts), once on key).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Open-version sentinel. Deliberately BOUNDED: pandas datetime64[ns]
# (used by Arrow/driver-side conversions of query results) overflows at
# 2262-04-11, so the classic 9999-12-31 sentinel makes any consumer that
# converts results through pandas raise OutOfBoundsDatetime. 2200-01-01
# is far enough to order after any real event yet representable in ns.
END_OF_TIME = "2200-01-01 00:00:00"


def scd2_from_changes(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str,
    attr_cols: Sequence[str],
    end_of_time: str = END_OF_TIME,
) -> DataFrame:
    """Build SCD-2 version rows from a keyed change stream.

    Per key: order changes by (ts, tiebreak); the last writer wins
    among same-ts changes (upsert parity with the reference's dim
    sink); each surviving version is valid from its own ts until the
    next version's ts (``end_of_time`` sentinel for the open current
    version, so the column is non-null and range joins need no null
    handling). ``is_current`` marks the open version.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    ts = F.col(ts_col)
    # last writer per (key, ts): a row survives iff the next row in the
    # same key's (ts, tiebreak) order starts a DIFFERENT timestamp
    staged = changes.withColumn("_nxt_ts", F.lead(ts).over(w))
    kept = staged.filter(F.col("_nxt_ts").isNull() | (F.col("_nxt_ts") != ts)).drop("_nxt_ts")
    nxt = F.lead(ts).over(w)
    return kept.select(
        *keys,
        *attr_cols,
        ts.alias("valid_from"),
        F.coalesce(nxt, F.lit(end_of_time).cast("timestamp")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
