"""Joins (SURVEY.md §2.4, J1-J6).

- J1/J2 interval joins: the reference buffers both keyed streams in
  RocksDB and matches within event-time bounds
  (rt-flink …/app/dwm/OrderWideAp.scala:112-138,
  …/app/dwm/PaymentWideApp.scala:82-88). Spark-native: an equi-join on
  the key plus a time-range predicate. On streams this is the
  watermarked stream-stream join; on batch Catalyst plans the equi part
  as a hash join and evaluates the range as a post-filter — no custom
  buffering code.
- J3 dimension enrichment: the reference's async Phoenix lookups with a
  Redis look-aside cache (…/utils/DimAsyncFunction.scala:17-59,
  …/utils/phoenix/DimUtil.scala:43-96) collapse to broadcast
  stream-static left joins: the dim table ships once per executor, so
  the per-record RPC + cache + thread-pool apparatus disappears.
- J6: broadcast/shuffle-hash/sort-merge selection is Catalyst's job;
  we only hint ``broadcast`` where we know the side is a dim.

Scale notes: interval joins shuffle both sides by the join key once.
Dim enrichment must stay broadcast (dims ≤ ~100s of MB) — a shuffle
join per enrichment would be 6 extra shuffles of the fact table in
OrderWide. Chained broadcast joins reuse the single fact-side
partitioning: zero additional fact shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """J1/J2: equi-join + event-time range ``right_ts ∈ [left_ts+lower, left_ts+upper]``.

    OrderWide uses (−5 s, +5 s) (OrderWideAp.scala:133); PaymentWide
    uses (−1800 s, 0 s) (PaymentWideApp.scala:83). Column name
    collisions must be resolved by the caller (select/alias first).
    """
    lts, rts = F.col(left_ts), F.col(right_ts)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (rts >= lts + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return left.join(right, cond, how)


def enrich_dims(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column | Sequence[str]]],
    how: str = "left",
) -> DataFrame:
    """J3: chained broadcast dim enrichment.

    ``dims`` is a sequence of (dim_df, join_condition_or_keys); each dim
    is broadcast and left-joined in order, mirroring the reference's six
    chained AsyncDataStream enrichments (OrderWideAp.scala:143-236) with
    zero fact-side shuffles.
    """
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on, how)
    return out
