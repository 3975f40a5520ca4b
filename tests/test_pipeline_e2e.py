"""End-to-end streaming warehouse DAG on one source, mirroring the
reference's layered pipeline (SURVEY.md §0): raw behavior-log JSON (ODS)
→ permissive parse + 3-way split with display explode (DWD,
OdsBaseLogApp) → tumbling-window visitor stats (DWS, VisitorStatsApp) —
three concurrent sinks fed by a single file-stream source, the
Spark-native equivalent of the reference's side-output topology.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.operators.aggregations import tumbling_window_agg
from rt_bigdata_spark.operators.projections import explode_displays, parse_json
from rt_bigdata_spark.operators.routing import split_stream
from rt_bigdata_spark.schemas import PAGE_LOG_SCHEMA


def _ev(mid, ts, page_id=None, last=None, entry=None, displays=None):
    e = {"common": {"mid": mid, "is_new": "0"}, "ts": ts}
    if entry:
        e["start"] = {"entry": entry}
    else:
        e["page"] = {"page_id": page_id, "last_page_id": last}
    if displays:
        e["displays"] = [{"item": d, "item_type": "sku_id"} for d in displays]
    return e


def _write(dir_, name, rows):
    p = os.path.join(dir_, name)
    with open(p + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(p + ".tmp", p)
    time.sleep(0.05)


@pytest.mark.slow
def test_ods_dwd_dws_pipeline(spark, tmp_path):
    src = tmp_path / "ods"
    src.mkdir()
    _write(str(src), "b1.json", [
        _ev("m1", 1_000, entry="icon"),
        _ev("m1", 2_000, page_id="home", displays=["sku1", "sku2"]),
        _ev("m2", 3_000, page_id="home", last="splash"),
        {"garbage": True},  # malformed for the page-log schema → dropped
    ])

    raw = (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", "1")
        .text(str(src))
        .withColumnRenamed("value", "raw")
    )
    parsed = parse_json(raw, "raw", PAGE_LOG_SCHEMA)

    # DWD: the reference's 3-way side-output split (OdsBaseLogApp R1)
    branches = split_stream(
        parsed,
        {
            "start": F.col("j.start").isNotNull(),
            "page": F.col("j.start").isNull() & F.col("j.page").isNotNull(),
        },
    )
    displays = explode_displays(branches["page"])

    # DWS: windowed visitor stats over the page branch (VisitorStatsApp A1)
    paged = (
        branches["page"]
        .withColumn("eventTime", F.timestamp_millis(F.col("j.ts")))
        .withWatermark("eventTime", "2 seconds")
        .select("eventTime", F.col("j.common.mid").alias("mid"))
    )
    stats = tumbling_window_agg(
        paged, "eventTime", "10 seconds", [], [F.count(F.lit(1)).alias("pv")]
    )

    queries = []
    try:
        for name, df, mode in [
            ("e2e_start", branches["start"].select(F.col("j.common.mid").alias("mid")), "append"),
            ("e2e_displays", displays.select("display.page_id", "display.item"), "append"),
            ("e2e_stats", stats, "append"),
        ]:
            queries.append(
                df.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
                .outputMode(mode)
                .start()
            )
        for q in queries:
            q.processAllAvailable()
        # close the window: an event far in the future advances the watermark
        _write(str(src), "b2.json", [_ev("m9", 120_000, page_id="home")])
        for q in queries:
            q.processAllAvailable()

        starts = [r.mid for r in spark.sql("select * from e2e_start").collect()]
        assert starts == ["m1"]

        disp = {(r.page_id, r.item) for r in spark.sql("select * from e2e_displays").collect()}
        assert disp == {("home", "sku1"), ("home", "sku2")}

        stats_rows = {r.stt: r.pv for r in spark.sql("select * from e2e_stats").collect()}
        # window [0,10s): m1@2s + m2@3s page views (start event excluded)
        assert stats_rows["1970-01-01 00:00:00"] == 2
    finally:
        for q in queries:
            q.stop()
