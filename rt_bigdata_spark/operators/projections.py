"""Projections / filters / per-record transforms (SURVEY.md §2.2, P1-P7).

The reference's DWD layer is JSON-in, JSON-out: parse (P1), validate
(P2), filter on nested fields (P3), project/alias (P4), mutate in
place (P5), map to beans (P6), prune by config (P7). Spark-native:
``from_json`` + struct field access + ``withColumn`` — all JVM-side.

Permissive parsing matches the reference's
``json.ignore-parse-errors=true`` (…/utils/kafka/KafkaUtil.scala:48-53):
malformed rows yield null structs and are droppable, never fatal.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType


def parse_json(df: DataFrame, raw_col: str, schema: StructType, out_col: str = "j", drop_malformed: bool = True) -> DataFrame:
    """P1: String → typed struct (rt-flink OdsBaseLogApp.scala:74-80).

    The reference routes unparseable records to a dirty side-output;
    ``drop_malformed=False`` keeps them (null struct) for a dirty branch.
    """
    out = df.withColumn(out_col, F.from_json(F.col(raw_col), schema, {"mode": "PERMISSIVE"}))
    if drop_malformed:
        # PERMISSIVE yields an all-null struct for malformed input; a row
        # counts as parsed iff at least one field materialized.
        any_field = None
        for f in schema.fields:
            c = F.col(f"{out_col}.{f.name}").isNotNull()
            any_field = c if any_field is None else (any_field | c)
        out = out.filter(F.col(out_col).isNotNull() & any_field)
    return out


def valid_cdc_filter(df: DataFrame, table_col: str = "table", data_col: str = "data") -> DataFrame:
    """P2: keep rows where table is set and the payload is non-trivial
    (len > 3) — OdsBaseDbApp.scala:69-72."""
    return df.filter(F.col(table_col).isNotNull() & (F.length(F.col(data_col).cast("string")) > 3))


def explode_displays(df: DataFrame, displays_col: str = "j.displays", page_id_col: str = "j.page.page_id") -> DataFrame:
    """R1's display branch: explode the displays array, stamping each
    element with the page_id (OdsBaseLogApp.scala:160-168)."""
    return df.withColumn("display", F.explode(F.col(displays_col))).withColumn(
        "display", F.col("display").withField("page_id", F.col(page_id_col))
    )


def project(df: DataFrame, mapping: Mapping[str, Column | str]) -> DataFrame:
    """P4: projection with aliases/casts (ProvinceStatsSqlApp.scala:70-78)."""
    cols = [(F.col(c) if isinstance(c, str) else c).alias(name) for name, c in mapping.items()]
    return df.select(*cols)


def prune_to_allowlist(df: DataFrame, allowed: Sequence[str]) -> DataFrame:
    """P7 static form: keep only allowlisted columns, in allowlist order
    (TableProcessFunction.filterColumn, :140-151)."""
    keep = [c for c in allowed if c in df.columns]
    return df.select(*keep)
