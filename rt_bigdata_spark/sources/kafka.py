"""Kafka source/sink factories (SURVEY.md §2.1 S1-S5, S14).

Mirrors the reference's KafkaUtil (rt-flink …/utils/kafka/KafkaUtil.scala)
as thin factories over Structured Streaming's built-in Kafka connector.
No broker exists in the test container, so these are exercised by unit
tests only up to plan construction; the semantics they encode:

- S1/S4: string-value source with permissive JSON downstream
  (``json.ignore-parse-errors`` ≈ from_json PERMISSIVE).
- S2: fixed-topic sink.
- S3: per-record dynamic topic — the built-in sink honors a ``topic``
  column, replacing the reference's custom serialization schema
  (KafkaUtil.scala:32-38).
- S5: upsert-kafka ≈ aggregate in update mode + keyed foreachBatch
  last-write-wins (see streaming.sinks.write_upsert).
- Exactly-once: the reference uses Kafka transactions; Spark's Kafka
  sink is at-least-once per micro-batch, so end-to-end idempotency
  comes from deterministic keys + dedup-on-read (the reference also
  leans on ReplacingMergeTree dedup, …/sql/CreateTable.sql:18-20).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def kafka_source(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1: subscribe and expose the value as string (+ Kafka metadata).

    ``maxOffsetsPerTrigger`` is the Spark analog of the reference's
    consumer fetch tuning (common.properties:34-36).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("kafka_ts"),  # METADATA FROM 'timestamp' (FlinkKafkaSource_01.scala:66)
        "topic",
        "partition",
        "offset",
    )


def kafka_json_source(
    spark: SparkSession, topic: str, bootstrap_servers: str, schema: StructType, **kwargs
) -> DataFrame:
    """S4: JSON table over Kafka; malformed records → null struct rows
    dropped (ignore-parse-errors semantics)."""
    raw = kafka_source(spark, topic, bootstrap_servers, **kwargs)
    return (
        raw.withColumn("j", F.from_json("value", schema, {"mode": "PERMISSIVE"}))
        .filter(F.col("j").isNotNull())
        .select("j.*", "kafka_ts")
    )


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str | None = None,
    checkpoint_dir: str | None = None,
    query_name: str | None = None,
):
    """S2 (fixed topic) / S3 (dynamic: df carries a ``topic`` column).

    Returns the started StreamingQuery. The caller serializes payload
    into a ``value`` column (string/binary) first.
    """
    writer = df.writeStream.format("kafka").option("kafka.bootstrap.servers", bootstrap_servers)
    if topic is not None:
        writer = writer.option("topic", topic)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if query_name:
        writer = writer.queryName(query_name)  # T7 stable operator ids (.uid)
    return writer.start()
