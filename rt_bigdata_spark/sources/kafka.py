"""Kafka source/sink factories (SURVEY.md §2.1 S1-S5, S14).

Mirrors the reference's KafkaUtil (rt-flink …/utils/kafka/KafkaUtil.scala)
as thin factories over Structured Streaming's built-in Kafka connector.
No broker exists in the test container, so execution stops at plan
construction — but the OPTION TRANSLATION itself is a pure function
(``kafka_source_options`` / ``kafka_sink_options``) pinned by
tests/test_kafka_factories.py against the reference's property list,
and the permissive-JSON parse shape (``parse_json_value``) runs on
batch DataFrames, so ignore-parse-errors semantics are executed in
tests even broker-less. The semantics encoded:

- S1/S4: string-value source with permissive JSON downstream
  (``json.ignore-parse-errors`` ≈ from_json PERMISSIVE + null-drop;
  ``json.fail-on-missing-field=false`` ≈ PERMISSIVE's missing→null).
- S2: fixed-topic sink.
- S3: per-record dynamic topic — the built-in sink honors a ``topic``
  column, replacing the reference's custom serialization schema
  (KafkaUtil.scala:32-38); ``default_topic`` mirrors its
  DEFAULT_TOPIC fallback (KafkaUtil.scala:15).
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
from pyspark.sql.types import StringType, StructField, StructType

# KafkaUtil.scala:15 — rows without a routable topic land here rather
# than failing the producer.
DEFAULT_TOPIC = "DEFAULT_DATA"


def kafka_source_options(
    topic: str,
    bootstrap_servers: str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """S1: the reference's consumer property set translated to the
    Spark Kafka connector — one pure dict, pinned by the contract test.

    Translation table (KafkaUtil.scala getKafkaSource:18-23 +
    getKafkaDDL:41-56):

    - ``BOOTSTRAP_SERVERS_CONFIG`` → ``kafka.bootstrap.servers``
    - ``GROUP_ID_CONFIG``          → ``kafka.group.id`` (Spark manages
      its own offsets; the id is for quota/lag attribution only)
    - ``'scan.startup.mode' = 'latest-offset'`` → ``startingOffsets=latest``
      (the DDL's documented default here)
    - topic subscription            → ``subscribe`` (the list form;
      partition discovery is built-in, replacing
      ``scan.topic-partition-discovery.interval``)
    - ``failOnDataLoss=false``: the reference's consumer keeps running
      when offsets age out of retention (Flink consumers reset by
      policy); Spark's default would kill the query instead.
    - ``maxOffsetsPerTrigger`` is the Spark analog of the reference's
      consumer fetch tuning (common.properties:34-36).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str | None = None,
    checkpoint_dir: str | None = None,
) -> dict[str, str]:
    """S2/S3: producer options. A fixed ``topic`` pins every record
    (getKafkaSink:27-29); ``topic=None`` omits the option so the sink
    routes on each row's ``topic`` column — the dynamic-topic schema
    (getKafkaSinkBySchema:32-38) without custom serialization code."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic is not None:
        opts["topic"] = topic
    if checkpoint_dir:
        opts["checkpointLocation"] = checkpoint_dir
    return opts


def parse_json_value(df: DataFrame, schema: StructType) -> DataFrame:
    """S4's value decoding, batch/stream agnostic: permissive JSON over
    a string ``value`` column, malformed records DROPPED —
    ``'json.ignore-parse-errors' = 'true'`` (getKafkaDDL:53) — and
    missing fields null rather than fatal —
    ``'json.fail-on-missing-field' = 'false'`` (getKafkaDDL:52), which
    is PERMISSIVE mode's native behavior. Split from the reader so the
    parse semantics execute in broker-less tests on batch frames.

    Malformed detection uses the corrupt-record column, NOT a null
    check on the struct: PERMISSIVE ``from_json`` yields an all-null
    STRUCT for garbage input (only a null VALUE yields a null struct),
    so the naive ``j IS NOT NULL`` filter silently kept malformed rows
    as all-null records — caught by the contract test."""
    corrupt = "_corrupt_record"
    schema_c = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    return (
        df.withColumn(
            "j",
            F.from_json(
                "value", schema_c, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt}
            ),
        )
        .filter(F.col("j").isNotNull() & F.col(f"j.{corrupt}").isNull())
        .select(*[f"j.{f.name}" for f in schema.fields], *[c for c in df.columns if c == "kafka_ts"])
    )


def kafka_source(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1: subscribe and expose the value as string (+ Kafka metadata)."""
    opts = kafka_source_options(
        topic, bootstrap_servers, group_id, starting_offsets, max_offsets_per_trigger
    )
    raw = spark.readStream.format("kafka").options(**opts).load()
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
    return parse_json_value(kafka_source(spark, topic, bootstrap_servers, **kwargs), schema)


def apply_default_topic(df: DataFrame, topic: str | None, default_topic: str | None) -> DataFrame:
    """Dynamic-mode DEFAULT_TOPIC routing, factored out of kafka_sink so
    the expression is unit-testable without a broker. Fixed-topic mode
    (``topic`` set) and no-default mode pass through unchanged; in
    dynamic mode null topic cells coalesce to the default, and a frame
    with NO topic column gets the default on every row (KafkaUtil.scala:15
    applies DEFAULT_TOPIC regardless of whether a route was attached —
    advice-r12: previously such a frame fell through to a runtime
    producer error)."""
    if topic is None and default_topic is not None:
        if "topic" in df.columns:
            return df.withColumn("topic", F.coalesce(F.col("topic"), F.lit(default_topic)))
        return df.withColumn("topic", F.lit(default_topic))
    return df


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str | None = None,
    checkpoint_dir: str | None = None,
    query_name: str | None = None,
    default_topic: str | None = None,
):
    """S2 (fixed topic) / S3 (dynamic: df carries a ``topic`` column).

    Returns the started StreamingQuery. The caller serializes payload
    into a ``value`` column (string/binary) first. In dynamic mode,
    ``default_topic`` (DEFAULT_TOPIC to mirror KafkaUtil.scala:15)
    coalesces null topic cells so unroutable rows land in the fallback
    topic instead of failing the batch; the built-in sink has no such
    fallback of its own. When the frame carries NO ``topic`` column at
    all, the default applies to every row (the reference's
    DEFAULT_TOPIC holds whether or not a route was attached) — without
    this the batch would defer the mismatch to a runtime producer
    error.
    """
    df = apply_default_topic(df, topic, default_topic)
    opts = kafka_sink_options(bootstrap_servers, topic, checkpoint_dir)
    writer = df.writeStream.format("kafka").options(**opts)
    if query_name:
        writer = writer.queryName(query_name)  # T7 stable operator ids (.uid)
    return writer.start()
