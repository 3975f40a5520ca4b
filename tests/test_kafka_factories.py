"""Contract tests for the Kafka factories (r11 verdict item 4).

No broker exists in this container, so these pin the TRANSLATION: the
option dicts the factories hand to the Spark Kafka connector, asserted
against the reference's property list (KafkaUtil.scala:18-56 +
getKafkaDDL's json.* flags), and the permissive-JSON parse shape
executed on batch frames. If an option name, default, or the
parse-error convention drifts, these fail — the cheapest closure short
of a live round-trip.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from rt_bigdata_spark.sources.kafka import (
    DEFAULT_TOPIC,
    apply_default_topic,
    kafka_sink_options,
    kafka_source_options,
    parse_json_value,
)


def test_source_options_defaults_match_reference_ddl():
    """getKafkaDDL: latest-offset startup, permissive operation on data
    loss; getKafkaSource: bootstrap servers + subscription. The exact
    option names are the Spark connector's contract — a typo here is a
    silent no-op at runtime, which is why they're pinned."""
    opts = kafka_source_options("ods_base_log", "broker1:9092,broker2:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ods_base_log",
        "startingOffsets": "latest",  # 'scan.startup.mode' = 'latest-offset'
        "failOnDataLoss": "false",
    }


def test_source_options_group_id_and_throttle():
    """GROUP_ID_CONFIG → kafka.group.id (the kafka. prefix passes it to
    the client; unprefixed 'group.id' would be rejected), and the fetch
    throttle is stringly typed as the connector requires."""
    opts = kafka_source_options(
        "t", "b:9092", group_id="rt_group", max_offsets_per_trigger=50000
    )
    assert opts["kafka.group.id"] == "rt_group"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert "group.id" not in opts


def test_sink_options_fixed_vs_dynamic_topic():
    """S2: a fixed topic pins every record. S3: NO topic option — the
    connector then requires and routes on the per-row topic column,
    the reference's KafkaSerializationSchema behavior."""
    fixed = kafka_sink_options("b:9092", topic="dwd_page_log", checkpoint_dir="/ckpt/x")
    assert fixed == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "dwd_page_log",
        "checkpointLocation": "/ckpt/x",
    }
    dynamic = kafka_sink_options("b:9092")
    assert dynamic == {"kafka.bootstrap.servers": "b:9092"}
    assert "topic" not in dynamic


def test_default_topic_constant_matches_reference():
    assert DEFAULT_TOPIC == "DEFAULT_DATA"  # KafkaUtil.scala:15


_SCHEMA = StructType(
    [
        StructField("mid", StringType()),
        StructField("uid", LongType()),
        StructField("page", StringType()),
    ]
)


def test_parse_json_value_drops_malformed_keeps_missing_fields(spark):
    """json.ignore-parse-errors=true: malformed records vanish instead
    of failing the job. json.fail-on-missing-field=false: a record
    missing `page` still parses, with the field null. Executed on a
    batch frame — the parse expression is identical in the stream."""
    rows = [
        ('{"mid": "m1", "uid": 7, "page": "home"}',),
        ("{not json at all",),  # malformed → dropped
        ('{"mid": "m2", "uid": 9}',),  # missing field → null, kept
        (None,),  # null value → dropped
    ]
    df = spark.createDataFrame(rows, "value: string")
    out = {r.mid: (r.uid, r.page) for r in parse_json_value(df, _SCHEMA).collect()}
    assert out == {"m1": (7, "home"), "m2": (9, None)}


def test_parse_json_value_carries_kafka_ts_when_present(spark):
    """The S4 projection keeps the event-time metadata column the
    windowed consumers key on (FlinkKafkaSource_01.scala:66)."""
    df = spark.createDataFrame(
        [('{"mid": "m1", "uid": 1, "page": "p"}', "2024-01-01 00:00:00")],
        "value: string, kafka_ts: string",
    ).withColumn("kafka_ts", F.to_timestamp("kafka_ts"))
    row = parse_json_value(df, _SCHEMA).collect()[0]
    assert row.mid == "m1" and row.kafka_ts is not None


def test_dynamic_sink_coalesces_null_topic_to_default(spark):
    """The DEFAULT_TOPIC fallback is applied as a column coalesce before
    the writer — verify the expression (batch-side) rather than the
    writer (needs a broker): null topic cells route to DEFAULT_DATA,
    real ones pass through."""
    # the exact function kafka_sink applies in dynamic mode
    df = apply_default_topic(
        spark.createDataFrame(
            [("a", "dwd_start_log"), ("b", None)], "value: string, topic: string"
        ),
        topic=None,
        default_topic=DEFAULT_TOPIC,
    )
    out = dict(df.collect())
    assert out == {"a": "dwd_start_log", "b": DEFAULT_TOPIC}


def test_dynamic_sink_defaults_topic_when_column_absent(spark):
    """advice-r12: a dynamic-mode frame with NO topic column at all must
    still land every row in DEFAULT_TOPIC (KafkaUtil.scala:15 applies
    the default regardless of routing) instead of deferring to a
    runtime producer error."""
    df = apply_default_topic(
        spark.createDataFrame([("a",), ("b",)], "value: string"),
        topic=None,
        default_topic=DEFAULT_TOPIC,
    )
    assert "topic" in df.columns
    assert {r.topic for r in df.collect()} == {DEFAULT_TOPIC}
    # fixed-topic and no-default modes pass through untouched
    src = spark.createDataFrame([("a",)], "value: string")
    assert apply_default_topic(src, "fixed", DEFAULT_TOPIC).columns == ["value"]
    assert apply_default_topic(src, None, None).columns == ["value"]
