"""Domain constants.

Re-expresses the reference's constants modules
(rt-flink …/conf/GmallConstant.java:8-72 and …/conf/Constants.java) as a
plain Python module: status-code vocabularies used in query predicates,
keyword sources, and layer/topic names.
"""

from __future__ import annotations

# Order status vocabulary (GmallConstant.java:8-15)
ORDER_STATUS_UNPAID = "1001"
ORDER_STATUS_PAID = "1002"
ORDER_STATUS_CANCEL = "1003"
ORDER_STATUS_FINISH = "1004"
ORDER_STATUS_REFUND = "1005"
ORDER_STATUS_REFUND_DONE = "1006"

# Payment types (GmallConstant.java:17-19)
PAYMENT_ALIPAY = "1101"
PAYMENT_WECHAT = "1102"
PAYMENT_UNION = "1103"

# Appraise codes (GmallConstant.java:30-33); good comment threshold used by
# ProductStatsApp.scala:164-167.
APPRAISE_GOOD = "1201"
APPRAISE_MID = "1202"
APPRAISE_BAD = "1203"
APPRAISE_AUTO = "1204"

# Keyword sources (GmallConstant.java:69-72), consumed by the C2R unpivot
# UDTF (KeywordProductC2RUDTF.scala:12-34).
KEYWORD_SEARCH = "SEARCH"
KEYWORD_CLICK = "CLICK"
KEYWORD_CART = "CART"
KEYWORD_ORDER = "ORDER"

# Warehouse layer topic names (Constants.java) — used by the streaming DAG.
TOPIC_ODS_BASE_LOG = "ods_base_log"
TOPIC_ODS_BASE_DB = "ods_base_db_m"
TOPIC_DWD_PAGE_LOG = "dwd_page_log"
TOPIC_DWD_START_LOG = "dwd_start_log"
TOPIC_DWD_DISPLAY_LOG = "dwd_display_log"
TOPIC_DWM_UNIQUE_VISIT = "dwm_unique_visit"
TOPIC_DWM_USER_JUMP_DETAIL = "dwm_user_jump_detail"
TOPIC_DWM_ORDER_WIDE = "dwm_order_wide"
TOPIC_DWM_PAYMENT_WIDE = "dwm_payment_wide"
TOPIC_DWS_PRODUCT_STATS = "dws_product_stats"

# Test data table names (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"
