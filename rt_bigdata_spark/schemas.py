"""Schema registry (SURVEY.md §1.1-1.2).

Every record shape the reference defines as a Scala case class
(rt-flink …/bean/package.scala) or implicit JSON contract becomes a
fixed ``StructType`` here. Money is DecimalType(20,2) (ClickHouse
Decimal64(2), …/sql/CreateTable.sql:29,41); ids/counts/epoch-ms are
LongType; datetime strings stay StringType at the DWD edge and are
parsed with ``to_timestamp`` where event-time is needed.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_MONEY = DecimalType(20, 2)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- Behavior-log event (nested ODS page log) -------------------------------
# Shape per OdsBaseLogApp.scala:86-87,150,160-168: common/page/start
# objects + displays array + ts.
DISPLAY_SCHEMA = _s(
    _f("item", StringType()),
    _f("item_type", StringType()),
    _f("pos_id", StringType()),
    _f("order", StringType()),
)

PAGE_LOG_SCHEMA = _s(
    _f(
        "common",
        _s(
            _f("mid", StringType()),
            _f("uid", StringType()),
            _f("vc", StringType()),
            _f("ch", StringType()),
            _f("ar", StringType()),
            _f("ba", StringType()),
            _f("md", StringType()),
            _f("os", StringType()),
            _f("is_new", StringType()),
        ),
    ),
    _f(
        "page",
        _s(
            _f("page_id", StringType()),
            _f("last_page_id", StringType()),
            _f("item", StringType()),
            _f("item_type", StringType()),
            _f("during_time", LongType()),
            _f("source_type", StringType()),
        ),
    ),
    _f("start", _s(_f("entry", StringType()), _f("open_ad_id", StringType()), _f("loading_time", LongType()))),
    _f("displays", ArrayType(DISPLAY_SCHEMA)),
    _f("ts", LongType()),
)

# --- CDC envelope (ods_base_db_m) -------------------------------------------
# {table, type, data{…}} per OdsBaseDbApp.scala:69-72; data is
# map<string,string> because the payload schema varies by table.
CDC_ENVELOPE_SCHEMA = _s(
    _f("table", StringType()),
    _f("type", StringType()),
    _f("data", MapType(StringType(), StringType())),
)

# Routing config table_process (DDL comment OdsBaseDbApp.scala:78-91).
TABLE_PROCESS_SCHEMA = _s(
    _f("source_table", StringType()),
    _f("operate_type", StringType()),
    _f("sink_type", StringType()),
    _f("sink_table", StringType()),
    _f("sink_columns", StringType()),
    _f("sink_pk", StringType()),
    _f("sink_extend", StringType()),
)

# --- Fact beans (…/bean/package.scala) --------------------------------------
ORDER_INFO_SCHEMA = _s(  # package.scala:35-55
    _f("id", LongType()),
    _f("province_id", LongType()),
    _f("order_status", StringType()),
    _f("user_id", LongType()),
    _f("total_amount", _MONEY),
    _f("activity_reduce_amount", _MONEY),
    _f("coupon_reduce_amount", _MONEY),
    _f("original_total_amount", _MONEY),
    _f("feight_fee", _MONEY),
    _f("expire_time", StringType()),
    _f("create_time", StringType()),
    _f("operate_time", StringType()),
    _f("create_date", StringType()),
    _f("create_hour", StringType()),
    _f("create_ts", LongType()),
)

ORDER_DETAIL_SCHEMA = _s(  # package.scala:58-72
    _f("id", LongType()),
    _f("order_id", LongType()),
    _f("sku_id", LongType()),
    _f("order_price", _MONEY),
    _f("sku_num", LongType()),
    _f("sku_name", StringType()),
    _f("create_time", StringType()),
    _f("split_total_amount", _MONEY),
    _f("split_activity_amount", _MONEY),
    _f("split_coupon_amount", _MONEY),
    _f("create_ts", LongType()),
)

PAYMENT_INFO_SCHEMA = _s(  # package.scala:192-201
    _f("id", LongType()),
    _f("order_id", LongType()),
    _f("user_id", LongType()),
    _f("total_amount", _MONEY),
    _f("subject", StringType()),
    _f("payment_type", StringType()),
    _f("create_time", StringType()),
    _f("callback_time", StringType()),
)

# OrderWide = OrderInfo ⊕ OrderDetail ⊕ dim fields (package.scala:75-189).
ORDER_WIDE_SCHEMA = _s(
    *ORDER_INFO_SCHEMA.fields[:10],
    _f("detail_id", LongType()),
    _f("sku_id", LongType()),
    _f("order_price", _MONEY),
    _f("sku_num", LongType()),
    _f("sku_name", StringType()),
    _f("split_total_amount", _MONEY),
    _f("split_activity_amount", _MONEY),
    _f("split_coupon_amount", _MONEY),
    # dim enrichments (OrderWideAp.scala:143-236)
    _f("province_name", StringType()),
    _f("province_area_code", StringType()),
    _f("province_iso_code", StringType()),
    _f("province_3166_2_code", StringType()),
    _f("user_age", IntegerType()),
    _f("user_gender", StringType()),
    _f("spu_id", LongType()),
    _f("tm_id", LongType()),
    _f("category3_id", LongType()),
    _f("spu_name", StringType()),
    _f("tm_name", StringType()),
    _f("category3_name", StringType()),
)

# --- DWS result beans --------------------------------------------------------
VISITOR_STATS_SCHEMA = _s(  # package.scala:266-291; CreateTable.sql:1-16
    _f("stt", StringType()),
    _f("edt", StringType()),
    _f("vc", StringType()),
    _f("ch", StringType()),
    _f("ar", StringType()),
    _f("is_new", StringType()),
    _f("uv_ct", LongType()),
    _f("pv_ct", LongType()),
    _f("sv_ct", LongType()),
    _f("uj_ct", LongType()),
    _f("dur_sum", LongType()),
    _f("ts", LongType()),
)

PRODUCT_STATS_SCHEMA = _s(  # package.scala:299-336; CreateTable.sql:24-52
    _f("stt", StringType()),
    _f("edt", StringType()),
    _f("sku_id", LongType()),
    _f("sku_name", StringType()),
    _f("sku_price", _MONEY),
    _f("spu_id", LongType()),
    _f("spu_name", StringType()),
    _f("tm_id", LongType()),
    _f("tm_name", StringType()),
    _f("category3_id", LongType()),
    _f("category3_name", StringType()),
    _f("display_ct", LongType()),
    _f("click_ct", LongType()),
    _f("favor_ct", LongType()),
    _f("cart_ct", LongType()),
    _f("order_sku_num", LongType()),
    _f("order_amount", _MONEY),
    _f("order_ct", LongType()),
    _f("payment_amount", _MONEY),
    _f("paid_order_ct", LongType()),
    _f("refund_order_ct", LongType()),
    _f("refund_amount", _MONEY),
    _f("comment_ct", LongType()),
    _f("good_comment_ct", LongType()),
    _f("ts", LongType()),
)

PROVINCE_STATS_SCHEMA = _s(  # package.scala:339-365; CreateTable.sql:54-67
    _f("stt", StringType()),
    _f("edt", StringType()),
    _f("province_id", LongType()),
    _f("province_name", StringType()),
    _f("area_code", StringType()),
    _f("iso_code", StringType()),
    _f("iso_3166_2", StringType()),
    _f("order_amount", _MONEY),
    _f("order_count", LongType()),
    _f("ts", LongType()),
)

KEYWORD_STATS_SCHEMA = _s(  # package.scala:368-375; CreateTable.sql:69-78
    _f("keyword", StringType()),
    _f("ct", LongType()),
    _f("source", StringType()),
    _f("stt", StringType()),
    _f("edt", StringType()),
    _f("ts", LongType()),
)
