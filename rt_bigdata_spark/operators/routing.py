"""Routing / splitting / union (SURVEY.md §2.3, R1-R3) and
config-driven CDC routing (R2) + column allowlists (P7).

- R1: the reference's 3-way side-output split of the behavior log
  (rt-flink …/app/dwd/OdsBaseLogApp.scala:142-188) becomes N filtered
  DataFrames off one parsed source — Spark allows multiple sinks per
  source, and with ``.cache()`` (batch) or one query per sink
  (streaming) the parse happens once.
- R2: TableProcessFunction's MySQL-config routing
  (…/utils/flink/TableProcessFunction.scala:22-186) becomes a broadcast
  join of the CDC stream against a small config DataFrame keyed by
  (source_table, operate_type), yielding sink_type / sink_table /
  column-allowlist columns; per-sink branches filter on sink_type.
- R3: ``unionByName`` (VisitorStatsApp.scala:155-157 unions 4 streams).

Scale notes: the config join is broadcast (config table is tiny), so
routing adds zero shuffles. The split branches share one scan when the
source is cached or when AQE reuses the exchange.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def split_stream(df: DataFrame, branches: dict[str, Column]) -> dict[str, DataFrame]:
    """R1: one source → named filtered branches (side-output equivalent)."""
    return {name: df.filter(cond) for name, cond in branches.items()}


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """R3: union of identically-schemed streams, by column name."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def route_by_config(
    cdc: DataFrame,
    config: DataFrame,
    on: Sequence[str] = ("source_table", "operate_type"),
    normalize_bootstrap: bool = True,
) -> DataFrame:
    """R2: join a CDC stream with the routing-config table (broadcast).

    ``cdc`` must carry the ``on`` columns (e.g. table name + operation
    type); ``config`` carries (source_table, operate_type, sink_type,
    sink_table, sink_columns, …). ``bootstrap-insert`` is normalized to
    ``insert`` first (TableProcessFunction.scala:158-160). Unmatched CDC
    rows are dropped (inner join), mirroring the reference's
    "no config → no sink" behavior (:168-170).
    """
    if normalize_bootstrap and "operate_type" in cdc.columns:
        cdc = cdc.withColumn(
            "operate_type",
            F.when(F.col("operate_type") == "bootstrap-insert", F.lit("insert")).otherwise(F.col("operate_type")),
        )
    return cdc.join(F.broadcast(config), list(on), "inner")


def apply_column_allowlist(df: DataFrame, data_col: str, allow_col: str = "sink_columns") -> DataFrame:
    """P7: prune a map-typed payload to the config's CSV allowlist
    (TableProcessFunction.scala:140-151) — JVM-side via map_filter."""
    allow = F.split(F.col(allow_col), ",")
    return df.withColumn(data_col, F.map_filter(F.col(data_col), lambda k, _v: F.array_contains(allow, k)))


def multi_sink(df: DataFrame, sinks: dict[str, Callable[[DataFrame], None]], type_col: str = "sink_type") -> None:
    """Dispatch routed rows to per-type sinks (HBase-dim vs Kafka in the
    reference, OdsBaseDbApp.scala:100-116)."""
    for sink_type, write in sinks.items():
        write(df.filter(F.col(type_col) == sink_type))
