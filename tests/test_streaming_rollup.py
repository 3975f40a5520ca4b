"""Streaming continuous-aggregate maintenance
(streaming/sinks.rollup_maintenance_sink): micro-batches fold into a
persisted mergeable rollup state; the result must equal the batch
rollup of all events, and replayed batches must not double-count.
"""

from __future__ import annotations

import json
import os

from rt_bigdata_spark.operators.aggregations import time_rollup
from rt_bigdata_spark.streaming.sinks import read_rollup, rollup_maintenance_sink

import pytest

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow


EVENT_SCHEMA = "event_id long, ts timestamp, event_type string, value double"

BATCH_1 = [
    {"event_id": 1, "ts": "2024-01-01 10:05:00", "event_type": "view", "value": 5.0},
    {"event_id": 2, "ts": "2024-01-01 10:20:00", "event_type": "view", "value": 1.5},
    {"event_id": 3, "ts": "2024-01-01 11:00:00", "event_type": "click", "value": 2.0},
]
BATCH_2 = [
    # extends an existing (view, 10:00) group AND adds a new one —
    # the merge must pick open from batch 1 (earlier key) and close
    # from batch 2
    {"event_id": 4, "ts": "2024-01-01 10:40:00", "event_type": "view", "value": 9.0},
    {"event_id": 5, "ts": "2024-01-01 12:00:00", "event_type": "view", "value": 3.25},
]


def _write_batch(dir_: str, name: str, rows: list[dict]) -> None:
    path = os.path.join(dir_, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def test_streaming_rollup_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(str(src), "b1.json", BATCH_1)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            rollup_maintenance_sink(state, ["event_type"])
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(str(src), "b2.json", BATCH_2)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r.event_type, r.bucket_ts): r for r in read_rollup(spark, state).collect()}
    full = spark.createDataFrame(
        [tuple(r.values()) for r in BATCH_1 + BATCH_2],
        "event_id: long, ts_s: string, event_type: string, value: double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    expected = {(r.event_type, r.bucket_ts): r
                for r in time_rollup(full, "ts", "value", ["event_type"]).collect()}
    assert set(streamed) == set(expected)
    for k, e in expected.items():
        s = streamed[k]
        assert (s.n_events, s.v_open, s.v_close, s.v_low, s.v_high, s.v_sum) == (
            e.n_events, e.v_open, e.v_close, e.v_low, e.v_high, e.v_sum), k


def test_streaming_rollup_replay_is_fenced(spark, tmp_path):
    """Counts/sums are not idempotent under re-merge — the version
    fence must skip a replayed batch id entirely."""
    state = str(tmp_path / "state")
    sink = rollup_maintenance_sink(state, ["event_type"])
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", "view", 5.0)],
        "event_id: long, ts_s: string, event_type: string, value: double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    sink(b1, 0)
    before = {(r.event_type, r.bucket_ts): (r.n_events, r.v_sum)
              for r in read_rollup(spark, state).collect()}
    sink(b1, 0)  # at-least-once redelivery of the same batch
    after = {(r.event_type, r.bucket_ts): (r.n_events, r.v_sum)
             for r in read_rollup(spark, state).collect()}
    assert before == after
    assert list(before.values()) == [(1, 5.0)]


def test_streaming_rollup_wiped_checkpoint_batch0_is_caught(spark, tmp_path):
    """ADVICE r5: with exactly one committed version (v_0), a wiped
    checkpoint restarts batch numbering at 0 and the old fence treated
    the NEW stream's first batch as a replay, silently dropping it.
    The _FENCE row-count fingerprint must reject that; a genuine
    redelivery (identical batch) still skips."""
    import pytest as _pt

    state = str(tmp_path / "state")
    sink = rollup_maintenance_sink(state, ["event_type"])
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", "view", 5.0)],
        "event_id: long, ts_s: string, event_type: string, value: double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    sink(b1, 0)
    # same id, same rows → replay → skip (covered above, re-assert here)
    sink(b1, 0)
    # wiped checkpoint: new stream, batch 0 again but DIFFERENT content
    b_new = spark.createDataFrame(
        [(7, "2024-01-02 09:00:00", "click", 1.0), (8, "2024-01-02 09:01:00", "click", 2.0)],
        "event_id: long, ts_s: string, event_type: string, value: double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    with _pt.raises(RuntimeError, match="not a replay"):
        sink(b_new, 0)
    # state unchanged by the rejected batch
    vals = [(r.n_events, r.v_sum) for r in read_rollup(spark, state).collect()]
    assert vals == [(1, 5.0)]


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """The sketch maintained across micro-batches must equal the batch
    sketch of all documents — mergeable-state algebra for CMS."""
    import json as _json

    from rt_bigdata_spark.operators.sketches import cms_build
    from rt_bigdata_spark.streaming.sinks import cms_maintenance_sink, read_cms_grid

    docs1 = [{"doc_id": 1, "text": "the cat sat on the mat"},
             {"doc_id": 2, "text": "the dog ran"}]
    docs2 = [{"doc_id": 3, "text": "the cat ran far away"},
             {"doc_id": 4, "text": "words words words"}]

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        # atomic tmp+rename like _write_batch above: the running file
        # source tracks FILENAMES, so a partially-flushed file would be
        # committed once with missing rows and never re-read
        import os as _os

        tmp = src / (name + ".tmp")
        tmp.write_text("\n".join(_json.dumps(r) for r in rows))
        _os.rename(tmp, src / name)

    write("b1.json", docs1)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(cms_maintenance_sink(state, depth=2, width=16))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2.json", docs2)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = read_cms_grid(spark, state, depth=2, width=16)
    full = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs1 + docs2], "doc_id: long, text: string"
    )
    assert streamed == cms_build(full, depth=2, width=16)


def test_fence_works_through_hadoop_fs_uri(spark, tmp_path):
    """r6 verdict item 5: the version fence must run on the Hadoop
    FileSystem API, not driver-local os.listdir — exercised here with
    an explicit ``file:/`` URI (a path os.listdir cannot list), which
    routes listing, _SUCCESS probing, _FENCE read/write and pruning
    through the same resolver an object-store URI would use. Fold,
    replay-skip, wiped-checkpoint rejection and version pruning all
    behave identically to the bare-path tests."""
    import os as _os

    import pytest as _pt

    state = (tmp_path / "state").as_uri().replace("file://", "file:")
    assert state.startswith("file:/") and not _os.path.isdir(state)
    sink = rollup_maintenance_sink(state, ["event_type"], keep_versions=1)
    b = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", "view", 5.0)],
        "event_id: long, ts_s: string, event_type: string, value: double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    sink(b, 0)
    sink(b, 0)  # replay skips (fingerprint matches through the URI)
    b2 = spark.createDataFrame(
        [(2, "2024-01-01 11:00:00", "view", 2.0), (3, "2024-01-01 11:01:00", "click", 1.0)],
        "event_id: long, ts_s: string, event_type: string, value: double",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    sink(b2, 1)
    got = {(r.event_type, r.bucket_ts.hour): (r.n_events, r.v_sum)
           for r in read_rollup(spark, state).collect()}
    assert got == {("view", 10): (1, 5.0), ("view", 11): (1, 2.0), ("click", 11): (1, 1.0)}
    # keep_versions=1 pruned v_0 through the FS API
    local = tmp_path / "state"
    assert sorted(d.name for d in local.iterdir() if d.name.startswith("v_")) == ["v_1"]
    # wiped checkpoint over the URI store still raises
    with _pt.raises(RuntimeError, match="not a replay"):
        sink(b, 1)


def test_streaming_histogram_equals_batch(spark, tmp_path):
    """histogram_maintenance_sink (the third versioned_state_sink
    monoid instance): two micro-batches fold into the persisted
    bucket-count state; the result must equal the batch value_histogram
    shape over the union of all events (same width_bucket under/
    overflow semantics), and a replayed batch must not double-count."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.streaming.sinks import (
        histogram_maintenance_sink,
        read_histogram,
    )

    state = str(tmp_path / "hstate")
    sink = histogram_maintenance_sink(state, lo=0.0, hi=100.0, nbuckets=10)

    rows1 = [
        {"event_id": 1, "event_type": "view", "value": 5.0},
        {"event_id": 2, "event_type": "view", "value": 55.0},
        {"event_id": 3, "event_type": "click", "value": -3.0},  # underflow -> 0
    ]
    rows2 = [
        {"event_id": 4, "event_type": "view", "value": 5.5},   # same bucket as ev 1
        {"event_id": 5, "event_type": "click", "value": 250.0},  # overflow -> 11
        {"event_id": 6, "event_type": "view", "value": 99.9},
    ]
    schema = "event_id long, event_type string, value double"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)

    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # replay: version fence must skip, not double-count

    got = {
        (r.event_type, r.bucket): r.ct for r in read_histogram(spark, state).collect()
    }
    bucket = F.width_bucket(F.col("value"), F.lit(0.0), F.lit(100.0), F.lit(10)).cast("long")
    expected = {
        (r.event_type, r.bucket): r.ct
        for r in b1.unionByName(b2)
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        .collect()
    }
    assert got == expected
    assert got[("click", 0)] == 1 and got[("click", 11)] == 1  # under/overflow buckets
    assert got[("view", 1)] == 2  # merged across micro-batches


def test_streaming_hll_dau_equals_batch(spark, tmp_path):
    """hll_maintenance_sink (fourth monoid instance): per-day HLL
    sketches folded across micro-batches must estimate exactly what
    one batch sketch over the union estimates (sketch union is
    deterministic for a fixed lg_config_k), users spanning both
    batches must not double-count, and a replayed batch is fenced."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.streaming.sinks import (
        hll_maintenance_sink,
        read_active_users_hll,
    )

    from datetime import datetime

    schema = "user_id long, ts timestamp"
    rows1 = [
        {"user_id": u, "ts": datetime(2024, 1, d, 10, 0, 0)}
        for d in (1, 2)
        for u in range(0, 40)
    ]
    rows2 = [
        {"user_id": u, "ts": datetime(2024, 1, d, 15, 0, 0)}
        for d in (2, 3)
        for u in range(20, 60)  # overlaps rows1's users on day 2
    ]
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)

    state = str(tmp_path / "hll")
    sink = hll_maintenance_sink(state)
    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # replay: fenced

    got = {
        str(r.day): int(r.dau_approx)
        for r in read_active_users_hll(spark, state).collect()
    }
    expected = {
        str(r.day): int(r.dau)
        for r in b1.unionByName(b2)
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("dau")
        )
        .collect()
    }
    assert got == expected and len(got) == 3
    # sketches are near-exact at these cardinalities: day 2 saw users
    # 0-59 across BOTH batches — union must not double-count overlap
    assert got["2024-01-02 00:00:00"] == 60


def test_streaming_dsir_equals_batch(spark, tmp_path):
    """r11 verdict item 5: the DSIR model maintained across
    micro-batches must equal the batch model over all documents
    (cell-wise monoid algebra), and scoring the full corpus against
    the MAINTAINED stats must reproduce dsir_importance's batch
    output exactly — streaming maintenance changes when the model is
    built, never what it says."""
    import json as _json

    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.text_analysis import (
        dsir_bucket_stats,
        dsir_doc_features,
        dsir_importance,
        dsir_score,
    )
    from rt_bigdata_spark.streaming.sinks import dsir_maintenance_sink, read_dsir_stats

    target = F.col("source") == "trusted"
    docs1 = [
        {"doc_id": 1, "text": "the cat sat on the mat", "source": "trusted"},
        {"doc_id": 2, "text": "the dog ran over the hill", "source": "crawl"},
    ]
    docs2 = [
        {"doc_id": 3, "text": "the cat ran far away today", "source": "crawl"},
        {"doc_id": 4, "text": "mat cat sat mat cat sat", "source": "trusted"},
    ]

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "dsir_state")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        import os as _os

        tmp = src / (name + ".tmp")
        tmp.write_text("\n".join(_json.dumps(r) for r in rows))
        _os.rename(tmp, src / name)

    write("b1.json", docs1)
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            dsir_maintenance_sink(state, target=target, num_buckets=64)
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2.json", docs2)
        q.processAllAvailable()
    finally:
        q.stop()

    full = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["source"]) for r in docs1 + docs2],
        "doc_id: long, text: string, source: string",
    )
    # 1) state algebra: maintained stats == batch stats, cell for cell
    maintained = {
        r.bucket: (r.c_raw, r.c_t) for r in read_dsir_stats(spark, state).collect()
    }
    batch_stats = {
        r.bucket: (r.c_raw, r.c_t)
        for r in dsir_bucket_stats(dsir_doc_features(full, target, 64)).collect()
    }
    assert maintained == batch_stats
    # 2) end to end: scores from the maintained model == batch operator
    feats = dsir_doc_features(full, target, 64)
    scored = {
        r.doc_id: (r.n_features, r.log_importance)
        for r in dsir_score(feats, read_dsir_stats(spark, state), num_buckets=64).collect()
    }
    batch = {
        r.doc_id: (r.n_features, r.log_importance)
        for r in dsir_importance(full, target, num_buckets=64).collect()
    }
    assert scored == batch


def test_streaming_activity_matrix_equals_batch(spark, tmp_path):
    """r14 verdict item 6 — the behavior family's streaming twin:
    micro-batches fold into the maintained (user_id, bucket, c)
    activity matrix (fixed-epoch bucketing, the mergeable form);
    the state must equal batch activity_buckets(..., bucket_ms=...)
    over ALL events, a replayed batch must not double-count, and
    similar_from_activity_matrix over the MAINTAINED matrix must equal
    the same scoring over the batch matrix — similarity served from
    maintained state instead of an events rescan."""
    from rt_bigdata_spark.operators.behavior import (
        activity_buckets,
        similar_from_activity_matrix,
    )
    from rt_bigdata_spark.streaming.sinks import (
        activity_matrix_maintenance_sink,
        read_activity_matrix,
    )

    hour = 3_600_000
    b1 = [
        {"user_id": 0, "ts": "2024-01-01 10:05:00"},
        {"user_id": 0, "ts": "2024-01-01 10:55:00"},
        {"user_id": 1, "ts": "2024-01-01 10:10:00"},
        {"user_id": 2, "ts": "2024-01-01 11:10:00"},
        {"user_id": 2, "ts": "2024-01-01 12:20:00"},
    ]
    b2 = [
        # extends an existing (0, 10:00) cell AND adds new cells/users
        {"user_id": 0, "ts": "2024-01-01 10:30:00"},
        {"user_id": 1, "ts": "2024-01-01 11:30:00"},
        {"user_id": 3, "ts": "2024-01-01 10:45:00"},
        {"user_id": 3, "ts": "2024-01-01 12:15:00"},
        {"user_id": 4, "ts": "2024-01-01 10:15:00"},
        {"user_id": 4, "ts": "2024-01-01 12:40:00"},
    ]
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    _write_batch(str(src), "b1.json", b1)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            activity_matrix_maintenance_sink(state, bucket_ms=hour)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(str(src), "b2.json", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    maintained = read_activity_matrix(spark, state)
    got = {(r.user_id, r.bucket): r.c for r in maintained.collect()}

    full = spark.createDataFrame(
        [(r["user_id"], r["ts"]) for r in b1 + b2], "user_id: long, ts_s: string"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    expected = {
        (r.user_id, r.bucket): r.c
        for r in activity_buckets(full, bucket_ms=hour).collect()
    }
    assert got == expected
    assert sum(got.values()) == len(b1 + b2)

    # replay fence: re-folding the latest committed batch is a no-op
    sink = activity_matrix_maintenance_sink(state, bucket_ms=hour)
    sink(spark.createDataFrame(
        [(r["user_id"], r["ts"]) for r in b2], "user_id: long, ts_s: string"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts"), 1)
    after = {(r.user_id, r.bucket): r.c for r in read_activity_matrix(spark, state).collect()}
    assert after == expected

    # similarity served FROM the maintained matrix == from the batch one
    n_series = 3  # bucket universe: 10:00/11:00/12:00
    s_state = {
        (r.query_id, r.neighbor_id): (r.sim, r.rk)
        for r in similar_from_activity_matrix(
            maintained, k=2, n_buckets=n_series, probe_ids_below=2
        ).collect()
    }
    s_batch = {
        (r.query_id, r.neighbor_id): (r.sim, r.rk)
        for r in similar_from_activity_matrix(
            activity_buckets(full, bucket_ms=hour), k=2, n_buckets=n_series, probe_ids_below=2
        ).collect()
    }
    assert s_state == s_batch and len(s_state) > 0


def test_streaming_bloom_equals_batch_filter(spark, tmp_path):
    """The Bloom filter maintained across probe micro-batches must
    equal the batch filter over all probes (distinct-union monoid),
    and decontaminating a corpus against the MAINTAINED bits must
    reproduce bloom_contamination's batch output exactly."""
    import json as _json
    import os as _os

    from rt_bigdata_spark.operators.curation_rules import (
        bloom_bits,
        bloom_contamination,
    )
    from rt_bigdata_spark.streaming.sinks import (
        bloom_maintenance_sink,
        read_bloom_bits,
    )

    probes1 = [{"probe_id": 1, "text": "one two three four five six seven eight"}]
    probes2 = [{"probe_id": 2, "text": "alpha beta gamma delta epsilon zeta eta theta"}]

    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "bloom_state")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        tmp = src / (name + ".tmp")
        tmp.write_text("\n".join(_json.dumps(r) for r in rows))
        _os.rename(tmp, src / name)

    write("b1.json", probes1)
    stream = (
        spark.readStream.schema("probe_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(bloom_maintenance_sink(state))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2.json", probes2)
        q.processAllAvailable()
    finally:
        q.stop()

    all_probes = spark.createDataFrame(
        [(r["probe_id"], r["text"]) for r in probes1 + probes2],
        "probe_id: long, text: string",
    )
    maintained = sorted(r.pos for r in read_bloom_bits(spark, state).collect())
    batch = sorted(r.pos for r in bloom_bits(all_probes).collect())
    assert maintained == batch and len(maintained) > 0

    docs = spark.createDataFrame(
        [
            (10, "one two three four five six seven eight plus a tail"),
            (11, "alpha beta gamma delta epsilon zeta eta theta and more"),
            (12, "no overlap with any probe text in this document at all"),
        ],
        "doc_id: long, text: string",
    )
    via_state = bloom_contamination(
        docs, all_probes, bits=read_bloom_bits(spark, state)
    )
    via_batch = bloom_contamination(docs, all_probes)
    assert sorted(map(tuple, via_state.collect())) == sorted(map(tuple, via_batch.collect()))
    got = {r.doc_id: r.bloom_hits for r in via_batch.collect()}
    assert got[10] >= 1 and got[11] >= 1
