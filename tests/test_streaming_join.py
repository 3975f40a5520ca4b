"""J1/J2 streaming path: the SAME interval_join used by the batch
order_wide/payment_wide queries runs as a watermarked stream-stream
join (reference semantics: keyed interval join over RocksDB state,
OrderWideAp.scala:112-138). Asserts the streaming output equals the
batch output of the identical operator on the identical data — the
batch-first, streaming-compatible contract (SURVEY.md §7.1)."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from rt_bigdata_spark.operators.joins import interval_join

import pytest

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow


ORDER_SCHEMA = StructType(
    [
        StructField("order_id", LongType()),
        StructField("status", StringType()),
        StructField("o_ts", LongType()),  # epoch ms
    ]
)
DETAIL_SCHEMA = StructType(
    [
        StructField("detail_id", LongType()),
        StructField("d_order_id", LongType()),
        StructField("d_ts", LongType()),
    ]
)

ORDERS = [
    {"order_id": 1, "status": "paid", "o_ts": 10_000},
    {"order_id": 2, "status": "paid", "o_ts": 40_000},
    {"order_id": 3, "status": "cart", "o_ts": 70_000},
]
DETAILS = [
    {"detail_id": 10, "d_order_id": 1, "d_ts": 12_000},  # +2 s → matches ±5 s
    {"detail_id": 11, "d_order_id": 1, "d_ts": 19_000},  # +9 s → outside ±5 s
    {"detail_id": 20, "d_order_id": 2, "d_ts": 36_000},  # −4 s → matches
    {"detail_id": 30, "d_order_id": 99, "d_ts": 41_000},  # no such order
]


def _write(dir_, name, rows):
    p = os.path.join(dir_, name)
    with open(p + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(p + ".tmp", p)
    time.sleep(0.05)


def _joined(orders_df, details_df):
    return interval_join(
        orders_df,
        details_df,
        left_key="order_id",
        right_key="d_order_id",
        left_ts="o_time",
        right_ts="d_time",
        lower_seconds=-5,
        upper_seconds=5,
    ).select("order_id", "detail_id", "status")


def _with_times(df):
    out = df
    if "o_ts" in df.columns:
        out = out.withColumn("o_time", F.timestamp_millis(F.col("o_ts")))
    if "d_ts" in df.columns:
        out = out.withColumn("d_time", F.timestamp_millis(F.col("d_ts")))
    return out


def test_interval_join_stream_equals_batch(spark, tmp_path):
    odir, ddir = tmp_path / "orders", tmp_path / "details"
    odir.mkdir(), ddir.mkdir()
    _write(str(odir), "o.json", ORDERS)
    _write(str(ddir), "d.json", DETAILS)

    o_stream = _with_times(spark.readStream.schema(ORDER_SCHEMA).json(str(odir))).withWatermark(
        "o_time", "10 seconds"
    )
    d_stream = _with_times(spark.readStream.schema(DETAIL_SCHEMA).json(str(ddir))).withWatermark(
        "d_time", "10 seconds"
    )
    q = (
        _joined(o_stream, d_stream)
        .writeStream.format("memory")
        .queryName("oj_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stream_rows = {tuple(r) for r in spark.table("oj_stream").collect()}
    batch_rows = {
        tuple(r)
        for r in _joined(
            _with_times(spark.createDataFrame(ORDERS, ORDER_SCHEMA)),
            _with_times(spark.createDataFrame(DETAILS, DETAIL_SCHEMA)),
        ).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows == {(1, 10, "paid"), (2, 20, "paid")}


def test_stream_static_dim_enrichment(spark, tmp_path):
    """J3 streaming path: the SAME enrich_dims broadcast join runs on a
    streaming fact against a static dim (the reference's async Phoenix
    lookup + Redis cache, collapsed into a stream-static join)."""
    from rt_bigdata_spark.operators.joins import enrich_dims

    odir = tmp_path / "orders"
    odir.mkdir()
    _write(str(odir), "o.json", ORDERS)

    dim = spark.createDataFrame(
        [("paid", "Paid Order"), ("cart", "In Cart")], "status string, status_name string"
    )
    stream = spark.readStream.schema(ORDER_SCHEMA).json(str(odir))
    enriched = enrich_dims(stream, [(dim, ["status"])])
    q = (
        enriched.writeStream.format("memory")
        .queryName("dim_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["order_id"], r["status_name"]) for r in spark.table("dim_stream").collect()}
    assert got == {(1, "Paid Order"), (2, "Paid Order"), (3, "In Cart")}


def test_interval_left_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Beyond-reference: the reference chose an INNER interval join
    because Flink's lacked left-join support (OrderWideAp.scala
    rationale comment). Spark's watermarked stream-stream LEFT join
    emits unmatched left rows with nulls once the watermark passes the
    join horizon — covered here: order 3 has no detail and must still
    appear after a later batch advances the watermark."""
    odir, ddir = tmp_path / "orders", tmp_path / "details"
    odir.mkdir(), ddir.mkdir()
    _write(str(odir), "o1.json", ORDERS)
    _write(str(ddir), "d1.json", DETAILS)
    # second files push event time (and thus the watermark) far past
    # order 3's join horizon so its unmatched row can be finalized
    _write(str(odir), "o2.json", [{"order_id": 900, "status": "late", "o_ts": 500_000}])
    _write(str(ddir), "d2.json", [{"detail_id": 901, "d_order_id": 900, "d_ts": 500_000}])

    o_stream = _with_times(
        spark.readStream.schema(ORDER_SCHEMA).option("maxFilesPerTrigger", "1").json(str(odir))
    ).withWatermark("o_time", "5 seconds")
    d_stream = _with_times(
        spark.readStream.schema(DETAIL_SCHEMA).option("maxFilesPerTrigger", "1").json(str(ddir))
    ).withWatermark("d_time", "5 seconds")

    from rt_bigdata_spark.operators.joins import interval_join

    joined = interval_join(
        o_stream,
        d_stream,
        left_key="order_id",
        right_key="d_order_id",
        left_ts="o_time",
        right_ts="d_time",
        lower_seconds=-5,
        upper_seconds=5,
        how="left",
    ).select("order_id", "detail_id", "status")
    q = (
        joined.writeStream.format("memory")
        .queryName("oj_left")
        .option("checkpointLocation", str(tmp_path / "ckpt_left"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {tuple(r) for r in spark.table("oj_left").collect()}
    assert (1, 10, "paid") in rows and (2, 20, "paid") in rows
    assert (3, None, "cart") in rows  # unmatched left row emitted with nulls
