"""App-layer builders: each reference job's topology, wired from
operators, produces the expected rows on small fixtures. Batch
DataFrames here; every operator used is streaming-compatible and the
streaming paths are covered by tests/test_streaming*.py on the same
underlying operators."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from rt_bigdata_spark import apps
from rt_bigdata_spark.streaming.stateful import PAGE_EVENT_SCHEMA


def _raw_log(mid, ts, page_id=None, last=None, entry=None, item=None, displays=None, during=None):
    e = {"common": {"mid": mid, "vc": "v1", "ch": "app", "ar": "110", "is_new": "0"}, "ts": ts}
    if entry is not None:
        e["start"] = {"entry": entry}
    else:
        e["page"] = {"page_id": page_id, "last_page_id": last, "item": item, "during_time": during}
    if displays:
        e["displays"] = [{"item": d, "item_type": "sku_id"} for d in displays]
    return (json.dumps(e),)


def test_ods_base_log_app_split(spark):
    raw = spark.createDataFrame(
        [
            _raw_log("m1", 1000, entry="icon"),
            _raw_log("m1", 2000, page_id="home", displays=["s1", "s2"]),
            _raw_log("m2", 3000, page_id="good_list", last="home", item="apple pie"),
        ],
        ["value"],
    )
    out = apps.ods_base_log_app(raw)
    assert [r.mid for r in out["start"].collect()] == ["m1"]
    # two display rows from one page event, stamped with the page id
    disp = out["display"].collect()
    assert sorted(d.display.item for d in disp) == ["s1", "s2"]
    assert all(d.display.page_id == "home" for d in disp)
    page = out["page"].orderBy("ts").collect()
    assert [(r.mid, r.page_id) for r in page] == [("m1", "home"), ("m2", "good_list")]


def test_ods_base_db_app_routing(spark):
    raw = spark.createDataFrame(
        [
            ('{"table": "order_info", "type": "insert", "data": {"id": "1", "total": "9", "secret": "x"}}',),
            ('{"table": "user_info", "type": "bootstrap-insert", "data": {"id": "7", "name": "a"}}',),
            ('{"table": "ignored", "type": "insert", "data": {"id": "9"}}',),
            ('{"table": null, "type": "insert", "data": null}',),
        ],
        ["value"],
    )
    config = spark.createDataFrame(
        [
            ("order_info", "insert", "kafka", "dwd_order_info", "id,total"),
            ("user_info", "insert", "hbase", "dim_user_info", "id,name"),
        ],
        ["source_table", "operate_type", "sink_type", "sink_table", "sink_columns"],
    )
    out = apps.ods_base_db_app(raw, config)
    kafka = out["kafka"].collect()
    assert [(r.source_table, r.sink_table) for r in kafka] == [("order_info", "dwd_order_info")]
    assert kafka[0].data == {"id": "1", "total": "9"}  # allowlist pruned "secret"
    hbase = out["hbase"].collect()  # bootstrap-insert normalized to insert
    assert [(r.source_table, r.sink_table) for r in hbase] == [("user_info", "dim_user_info")]


def test_unique_visit_app_batch(spark):
    rows = [
        {"mid": "A", "page_id": "home", "last_page_id": None, "is_new": "1", "ts": 1_000},
        {"mid": "A", "page_id": "home", "last_page_id": None, "is_new": "1", "ts": 2_000},
        {"mid": "A", "page_id": "list", "last_page_id": "home", "is_new": "1", "ts": 3_000},
        {"mid": "A", "page_id": "home", "last_page_id": None, "is_new": "1", "ts": 90_000_000},
    ]
    df = spark.createDataFrame(rows, PAGE_EVENT_SCHEMA)
    got = sorted((r.mid, r.ts) for r in apps.unique_visit_app(df, streaming=False).collect())
    assert got == [("A", 1_000), ("A", 90_000_000)]


def test_order_and_payment_wide_apps(spark):
    orders = spark.createDataFrame(
        [(1, 100, "u1"), (2, 5000, "u2")], ["id", "o_ts", "user_id"]
    ).withColumn("o_ts", F.timestamp_millis(F.col("o_ts") * 1000))
    details = spark.createDataFrame(
        [(10, 1, 103, "sku1"), (11, 1, 97, "sku2"), (12, 2, 5100, "sku3")],
        ["d_id", "order_id", "d_ts", "sku_id"],
    ).withColumn("d_ts", F.timestamp_millis(F.col("d_ts") * 1000))
    dim = spark.createDataFrame([("u1", "alice")], ["user_id", "user_name"])

    wide = apps.order_wide_app(orders, details, dims=[(dim, ["user_id"])])
    rows = {(r.id, r.d_id): r.user_name for r in wide.collect()}
    # order 1 matches both details within ±5 s; order 2's detail is 100 s late
    assert set(rows) == {(1, 10), (1, 11)}
    assert rows[(1, 10)] == "alice"

    payments = spark.createDataFrame(
        [(50, 1, 1500), (51, 2, 99999)], ["pay_id", "order_id", "p_ts"]
    ).withColumn("p_ts", F.timestamp_millis(F.col("p_ts") * 1000))
    ow = orders.select(F.col("id"), F.col("o_ts"), F.col("user_id"))
    pw = apps.payment_wide_app(payments, ow)
    # payment 50 @1500 s: order 1 @100 s is within the 30-min lookback;
    # payment 51 @99999 s: order 2 @5000 s is 26 h earlier → dropped
    assert [(r.pay_id, r.id) for r in pw.collect()] == [(50, 1)]


def test_visitor_stats_app(spark):
    page = spark.createDataFrame(
        [
            ("v1", "app", "110", "1", None, 900, 1_000),
            ("v1", "app", "110", "1", "home", 500, 2_000),
            ("v1", "web", "110", "0", None, 100, 3_000),
        ],
        ["vc", "ch", "ar", "is_new", "last_page_id", "during_time", "ts"],
    )
    uv = spark.createDataFrame([("v1", "app", "110", "1", 1_000)], ["vc", "ch", "ar", "is_new", "ts"])
    uj = spark.createDataFrame([("v1", "app", "110", "1", 1_000)], ["vc", "ch", "ar", "is_new", "ts"])
    out = {
        (r.vc, r.ch, r.is_new): r
        for r in apps.visitor_stats_app(page, uv, uj, window="10 seconds").collect()
    }
    app_row = out[("v1", "app", "1")]
    assert (app_row.pv_ct, app_row.uv_ct, app_row.sv_ct, app_row.uj_ct, app_row.dur_sum) == (2, 1, 1, 1, 1400)
    web_row = out[("v1", "web", "0")]
    assert (web_row.pv_ct, web_row.uv_ct) == (1, 0)
    assert app_row.stt is not None and app_row.edt is not None


def test_product_stats_app_distinct_orders(spark):
    cols = (
        "sku_id long, ts long, click_ct long, cart_ct long, order_amount double, "
        "order_id long, paid_order_id long, refund_order_id long"
    )
    clicks = spark.createDataFrame([(7, 1_000, 1, 0, 0.0, None, None, None)], cols)
    orders = spark.createDataFrame(
        [
            (7, 2_000, 0, 0, 10.0, 100, None, None),
            (7, 3_000, 0, 0, 15.0, 100, None, None),  # same order, 2 lines
            (7, 4_000, 0, 0, 5.0, 101, None, None),
        ],
        cols,
    )
    streams = [
        df.withColumn("event_time", F.timestamp_millis(F.col("ts"))).drop("ts")
        for df in (clicks, orders)
    ]
    out = apps.product_stats_app(streams).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.sku_id, r.click_ct, r.order_ct, float(r.order_amount)) == (7, 1, 2, 30.0)


def test_ods_base_log_app_streaming(spark, tmp_path):
    """The same builder runs unchanged on a streaming source — the
    app layer's core claim. File-stream in, three memory sinks out of
    ONE source (the reference's side-output topology, R1)."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        _raw_log("m1", 1000, entry="icon")[0],
        _raw_log("m1", 2000, page_id="home", displays=["s1"])[0],
        _raw_log("m2", 3000, page_id="cart", last="home")[0],
    ]
    (src / "b1.txt").write_text("\n".join(rows) + "\n")
    stream = spark.readStream.format("text").load(str(src))
    out = apps.ods_base_log_app(stream)
    queries = []
    try:
        for name, df in out.items():
            queries.append(
                df.writeStream.format("memory")
                .queryName(f"app_{name}")
                .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
                .outputMode("append")
                .start()
            )
        for q in queries:
            q.processAllAvailable()
        assert [r.mid for r in spark.sql("select * from app_start").collect()] == ["m1"]
        assert [r.display.item for r in spark.sql("select * from app_display").collect()] == ["s1"]
        assert sorted(r.page_id for r in spark.sql("select * from app_page").collect()) == ["cart", "home"]
    finally:
        for q in queries:
            q.stop()


def test_keyword_stats_app(spark):
    page = spark.createDataFrame(
        [
            ("good_list", "apple pie recipe", 1_000),
            ("good_list", "apple watch", 2_000),
            ("home", "ignored", 3_000),
            ("good_list", None, 4_000),
        ],
        ["page_id", "item", "ts"],
    )
    out = {r.keyword: r.ct for r in apps.keyword_stats_app(page, window="1 hour").collect()}
    assert out["apple"] == 2 and out["pie"] == 1 and "ignored" not in out


def test_keyword_stats_4product_app_double_lateral(spark):
    """KeywordStats4ProductApp.scala:15-83: each product-stats row is
    exploded by BOTH laterals — tokenizer over spu_name × C2R unpivot
    over the three counts — zero counts skipped, carry columns (stt)
    preserved on every exploded row."""
    ps = spark.createDataFrame(
        [
            ("apple watch", 3, 1, 0, "2024-01-01 00:00:00"),
            ("apple", 0, 0, 2, "2024-01-01 00:00:00"),
            ("zero row", 0, 0, 0, "2024-01-01 00:00:00"),
        ],
        ["spu_name", "click_ct", "cart_ct", "order_ct", "stt"],
    )
    rows = apps.keyword_stats_4product_app(ps).collect()
    got = {(r.keyword, r.source): r.ct for r in rows}
    # row 1: 2 keywords x 2 non-zero sources = 4 rows
    assert got[("apple", "CLICK")] == 3 and got[("watch", "CLICK")] == 3
    assert got[("apple", "CART")] == 1 and got[("watch", "CART")] == 1
    # row 2: 1 keyword x 1 source; same (keyword, source) key as row 1
    # would COLLIDE in a dict, so assert via the raw rows
    assert ("apple", "ORDER") in got and got[("apple", "ORDER")] == 2
    # zero-count row contributes nothing (C2R skips zeros)
    assert all(r.keyword != "zero" and r.ct > 0 for r in rows)
    assert len(rows) == 5
    # carry column survives the double explode on every row
    assert all(r.stt == "2024-01-01 00:00:00" for r in rows)


def test_keyword_stats_4product_app_streaming(spark, tmp_path):
    """The double-lateral builder runs unchanged on a streaming source
    (it is a pure stateless projection, so append mode needs no
    watermark): file-stream of product-stats rows in, the exploded
    (keyword, ct, source) rows out, identical to the batch run on the
    same rows."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"spu_name": "apple watch", "click_ct": 3, "cart_ct": 0, "order_ct": 2},
        {"spu_name": "banana", "click_ct": 0, "cart_ct": 0, "order_ct": 0},
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    schema = "spu_name string, click_ct long, cart_ct long, order_ct long"
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        apps.keyword_stats_4product_app(stream)
        .writeStream.format("memory")
        .queryName("app_ks4p")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.keyword, r.source, r.ct)
            for r in spark.sql("select * from app_ks4p").collect()
        )
    finally:
        q.stop()
    batch = apps.keyword_stats_4product_app(
        spark.createDataFrame([tuple(r.values()) for r in rows], schema)
    )
    want = sorted((r.keyword, r.source, r.ct) for r in batch.collect())
    assert got == want
    assert got == [
        ("apple", "CLICK", 3), ("apple", "ORDER", 2),
        ("watch", "CLICK", 3), ("watch", "ORDER", 2),
    ]
