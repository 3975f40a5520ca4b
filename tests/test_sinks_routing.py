"""Sink idempotency (S6-S10/T6 emulation) and routing/projection units."""

from __future__ import annotations

import pyspark.sql.functions as F

from rt_bigdata_spark.operators.projections import parse_json, prune_to_allowlist, valid_cdc_filter
from rt_bigdata_spark.operators.routing import apply_column_allowlist, route_by_config, split_stream
from rt_bigdata_spark.streaming.sinks import dedup_last_wins, foreach_batch_upsert, read_upserted


def test_upsert_sink_idempotent_on_replay(spark, tmp_path):
    out_dir = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(1, "a", 100), (1, "a2", 200), (2, "b", 100)], ["id", "payload", "ts"]
    )
    fn = foreach_batch_upsert(out_dir, keys=["id"], version_col="ts")
    fn(df, 0)
    fn(df, 0)  # replayed micro-batch (at-least-once delivery)
    fn(df, 1)  # and a duplicate batch under a new id
    final = read_upserted(spark, out_dir, keys=["id"], version_col="ts")
    rows = {r.id: (r.payload, r.ts) for r in final.collect()}
    assert rows == {1: ("a2", 200), 2: ("b", 100)}  # last-wins, no dupes


def test_dedup_last_wins_tie_break_deterministic(spark):
    df = spark.createDataFrame([(1, "x", 100), (1, "y", 100)], ["id", "p", "ts"])
    out = [tuple(r) for r in dedup_last_wins(df, ["id"], "ts").collect()]
    assert len(out) == 1


def test_cdc_route_and_allowlist(spark):
    cdc = spark.createDataFrame(
        [
            ("order_info", "bootstrap-insert", {"id": "1", "amount": "9.5", "secret": "x"}),
            ("order_info", "delete", {"id": "2"}),
            ("unknown_tbl", "insert", {"id": "3"}),
        ],
        ["source_table", "operate_type", "data"],
    )
    config = spark.createDataFrame(
        [("order_info", "insert", "kafka", "dwd_order_info", "id,amount")],
        ["source_table", "operate_type", "sink_type", "sink_table", "sink_columns"],
    )
    routed = route_by_config(cdc, config)
    pruned = apply_column_allowlist(routed, "data")
    rows = pruned.collect()
    # bootstrap-insert normalized to insert and routed; delete/unknown dropped
    assert len(rows) == 1
    assert rows[0].sink_table == "dwd_order_info"
    assert set(rows[0].data.keys()) == {"id", "amount"}  # secret pruned


def test_valid_cdc_filter_and_parse_json(spark):
    from pyspark.sql.types import IntegerType, StructField, StructType

    raw = spark.createDataFrame(
        [("ok", '{"k": 5}'), ("short", "{}"), (None, '{"k": 6}'), ("bad", "not-json")],
        ["table", "data"],
    )
    kept = valid_cdc_filter(raw)
    assert {r.table for r in kept.collect()} == {"ok", "bad"}
    parsed = parse_json(kept, "data", StructType([StructField("k", IntegerType())]))
    vals = [r.j.k for r in parsed.collect()]
    assert vals == [5]  # malformed dropped


def test_split_stream_branches_disjoint_and_complete(spark, sf_dir):
    from rt_bigdata_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    branches = split_stream(
        ev,
        {
            "start": F.col("event_type") == "signup",
            "rest": F.col("event_type") != "signup",
        },
    )
    n = ev.count()
    assert branches["start"].count() + branches["rest"].count() == n


def test_prune_to_allowlist(spark):
    df = spark.createDataFrame([(1, "a", "b")], ["id", "x", "y"])
    assert prune_to_allowlist(df, ["y", "id", "nope"]).columns == ["y", "id"]
