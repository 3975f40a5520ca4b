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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: enrich each left row with the single temporally
    nearest right row per key — ``backward`` takes the latest right row
    with ``right_ts <= left_ts``, ``forward`` the earliest with
    ``right_ts >= left_ts`` (pandas ``merge_asof`` semantics, left-join:
    unmatched left rows keep nulls). The canonical time-series
    enrichment the reference lacks (its interval join, OrderWideAp
    .scala:133, matches ALL rows in a window, not the nearest one).

    Scale design — union + one window, NOT a range join: a range
    predicate join explodes to O(left × right-per-key) candidate pairs
    before picking the nearest; here both sides union (plan-level, no
    materialization) and a single hash-partition-by-key + sort orders
    each key's timeline, so cost is one shuffle of left+right and a
    per-key sort, independent of time-window density. The right row
    rides as ONE struct column filled with ``last(ignorenulls)`` —
    per-column fills would be wrong when a right payload column is
    legitimately NULL (they would look past the nearest row).

    Ties: a right row at exactly ``left_ts`` matches in both
    directions; among right rows sharing (key, ts) the one with the
    highest ``right_tiebreak`` wins (pass one for deterministic
    output — required for oracle hash-comparison).
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    key, t, side, rstruct, filled = "_asof_key", "_asof_t", "_asof_side", "_asof_r", "_asof_last"
    lt = left.withColumn(key, F.col(left_on)).withColumn(t, F.col(left_ts)).withColumn(side, F.lit(1))
    rt = right.select(
        F.col(right_on).alias(key),
        F.col(right_ts).alias(t),
        F.lit(0).alias(side),
        F.struct(F.col(right_ts).alias("_rt"), *[F.col(c) for c in right_payload]).alias(rstruct),
    )
    u = lt.withColumn(rstruct, F.lit(None).cast(rt.schema[rstruct].dataType)).unionByName(
        rt, allowMissingColumns=True
    )

    t_order = F.col(t).asc() if direction == "backward" else F.col(t).desc()
    # side asc puts right rows before left at equal ts (so an exact-ts
    # right row matches); among right rows at equal (key, ts) the
    # tiebreak sorts the highest LAST so last() picks it (left rows
    # have a null tiebreak, but side already ordered them apart).
    order = [t_order, F.col(side).asc()]
    if right_tiebreak is not None:
        order.append(F.col(rstruct)[right_tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(filled, F.last(rstruct, ignorenulls=True).over(w)).filter(F.col(side) == 1)

    matched = F.col(filled).isNotNull()
    if tolerance_seconds is not None:
        gap = F.abs(F.unix_timestamp(F.col(t)) - F.unix_timestamp(F.col(filled)["_rt"]))
        matched = matched & (gap <= tolerance_seconds)
    payload_cols = {c: F.when(matched, F.col(filled)[c]) for c in right_payload}
    return out.withColumns(payload_cols).drop(key, t, side, rstruct, filled)


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    keys: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    dim_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Temporal (point-in-time) enrichment against an SCD-2 dimension:
    each fact joins the dim VERSION valid at its own timestamp
    (``valid_from <= ts < valid_to`` — half-open, so a fact at exactly
    a change instant sees the NEW version, matching upsert-read
    semantics). This is the consumption side of ``scd2_from_changes``
    — the query the reference's last-write-wins dim store answers
    WRONGLY for late-arriving facts (it always serves the current
    version; SURVEY's reason for SCD-2).

    Scale shape: the join is EQUI on the dim key with the interval as
    a residual predicate, so Catalyst plans a hash/sort-merge join on
    the key — never a range-only nested loop; versions-per-key is
    small (bounded by change frequency), so the residual scan per
    probe row is a few versions. Dim histories are usually MBs →
    broadcast; at fact-scale keys the one fact shuffle can be removed
    by pre-bucketing both sides on the key (``write_bucketed``).

    ``dim_cols`` selects which version attributes to carry (default:
    everything except keys, the interval bounds, and the SCD-2
    bookkeeping flag ``is_current`` — redundant given the emitted
    version bound and usually meaningless next to a historical fact);
    pass it explicitly to include ``is_current``. All dim outputs are
    emitted with a ``dim_`` prefix to keep fact columns unshadowed —
    INCLUDING the matched version's lower bound (``dim_<valid_from>``):
    facts tables often carry their own ``valid_from``, and an
    unprefixed duplicate output name would be unselectable downstream
    (ADVICE r5).
    """
    f = facts.alias("f")
    d = dim_history.alias("d")
    if dim_cols is None:
        excluded = set(keys) | {valid_from, valid_to, "is_current"}
        dim_cols = [c for c in dim_history.columns if c not in excluded]
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"f.{k}") == F.col(f"d.{k}"))
    ts = F.col(f"f.{fact_ts}")
    cond = cond & (ts >= F.col(f"d.{valid_from}")) & (ts < F.col(f"d.{valid_to}"))
    return f.join(d, cond, how).select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"d.{c}").alias(f"dim_{c}") for c in dim_cols],
        F.col(f"d.{valid_from}").alias(f"dim_{valid_from}"),
    )
