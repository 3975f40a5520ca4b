"""A1/T4/T5 streaming path: the same tumbling_window_agg used by batch
queries runs on a watermarked stream; late events beyond the watermark
are dropped (reference semantics: forBoundedOutOfOrderness + window,
VisitorStatsApp.scala:161-201)."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from rt_bigdata_spark.operators.aggregations import tumbling_window_agg

import pytest

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow


SCHEMA = StructType(
    [
        StructField("mid", StringType()),
        StructField("event_type", StringType()),
        StructField("ts", LongType()),  # epoch ms
    ]
)


def _write(dir_, name, rows):
    p = os.path.join(dir_, name)
    with open(p + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(p + ".tmp", p)
    time.sleep(0.05)


def test_windowed_agg_streaming_with_late_data(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # Window [0,10s): 2 events; window [10,20s): 1 event.
    _write(str(src), "b1.json", [
        {"mid": "a", "event_type": "pv", "ts": 1_000},
        {"mid": "b", "event_type": "pv", "ts": 2_000},
        {"mid": "a", "event_type": "pv", "ts": 12_000},
    ])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("eventTime", F.timestamp_millis(F.col("ts")))
        .withWatermark("eventTime", "2 seconds")
    )
    agg = tumbling_window_agg(
        stream,
        ts_col="eventTime",
        duration="10 seconds",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("pv_ct"), F.approx_count_distinct("mid").alias("uv_ct")],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_stats")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # Advance watermark far past both windows, and include one LATE
        # event for window [0,10s) that must be dropped.
        _write(str(src), "b2.json", [
            {"mid": "late", "event_type": "pv", "ts": 3_000},   # late beyond watermark → dropped
            {"mid": "c", "event_type": "pv", "ts": 60_000},
        ])
        q.processAllAvailable()
        _write(str(src), "b3.json", [{"mid": "d", "event_type": "pv", "ts": 90_000}])
        q.processAllAvailable()
        rows = {r.stt: (r.pv_ct, r.uv_ct) for r in spark.sql("select * from win_stats").collect()}
        # Window [0,10s) closed with exactly the 2 on-time events — the
        # late 'late' event did not reopen or recount it.
        assert rows["1970-01-01 00:00:00"] == (2, 2)
        assert rows["1970-01-01 00:00:10"] == (1, 1)
    finally:
        q.stop()


def test_session_window_streaming(spark, tmp_path):
    """T3-as-sessionization on a stream: sessions extend while events
    arrive within the gap, close once the watermark passes last+gap."""
    from rt_bigdata_spark.operators.aggregations import session_window_agg

    src = tmp_path / "src_sess"
    src.mkdir()
    # mid 'a': events at 0s and 5s (one session, 10s gap);
    # mid 'b': events at 0s and 20s (two sessions).
    _write(str(src), "b1.json", [
        {"mid": "a", "event_type": "pv", "ts": 0},
        {"mid": "a", "event_type": "pv", "ts": 5_000},
        {"mid": "b", "event_type": "pv", "ts": 0},
        {"mid": "b", "event_type": "pv", "ts": 20_000},
    ])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("eventTime", F.timestamp_millis(F.col("ts")))
        .withWatermark("eventTime", "2 seconds")
    )
    agg = session_window_agg(
        stream, "eventTime", "10 seconds", ["mid"], [F.count(F.lit(1)).alias("n_events")]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stats")
        .option("checkpointLocation", str(tmp_path / "chk_sess"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark far forward so all sessions close
        _write(str(src), "b2.json", [{"mid": "z", "event_type": "pv", "ts": 300_000}])
        q.processAllAvailable()
        rows = {
            (r.mid, r.session_start.isoformat()): r.n_events
            for r in spark.sql("select * from sess_stats").collect()
        }
        assert rows[("a", "1970-01-01T00:00:00")] == 2  # merged session
        assert rows[("b", "1970-01-01T00:00:00")] == 1
        assert rows[("b", "1970-01-01T00:00:20")] == 1  # quiet gap → new session
    finally:
        q.stop()


def test_session_window_gap_boundary_is_inclusive_merge(spark):
    """Version pin for the oracle convention the r11 sf1 sweep exposed:
    Spark's session_window MERGES an event arriving at EXACTLY
    lastTs + gap (split only when ts - lastTs > gap). The session_stats
    oracle mirrors this with a strict `>` — if a Spark upgrade flips
    the boundary, this fails here instead of as an sf-dependent driver
    hash mismatch."""
    import datetime

    import pyspark.sql.functions as F

    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime.datetime(2024, 1, 1, 10, 30, 0)),   # exactly gap later
        (1, datetime.datetime(2024, 1, 1, 12, 0, 0)),
        (1, datetime.datetime(2024, 1, 1, 12, 30, 1)),   # 1 s past gap
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp")
    out = sorted(
        (r["session_window"].start, r["count"])
        for r in df.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().collect()
    )
    assert [(s.hour, s.minute, c) for s, c in out] == [
        (10, 0, 2),   # exact-gap event merged
        (12, 0, 1),
        (12, 30, 1),  # past-gap event split
    ]
