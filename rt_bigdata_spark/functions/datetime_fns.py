"""Date/time scalar functions (SURVEY.md §2.8 F4-F8, F12).

The reference hand-rolled these with SimpleDateFormat/Calendar
(rt-flink …/common/CommonTool.scala:67-150, …/utils/DateTimeUtil.scala:14-35);
every one maps to a built-in Spark column expression — no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_FMT = "yyyy-MM-dd HH:mm:ss"


def to_ymd_hms(ts: Column) -> Column:
    """F12 toYMDhms: timestamp → 'yyyy-MM-dd HH:mm:ss' (DateTimeUtil.scala:20-26)."""
    return F.date_format(ts, _FMT)


def to_epoch_ms(ts_string: Column) -> Column:
    """F12 toTs: 'yyyy-MM-dd HH:mm:ss' → epoch millis (DateTimeUtil.scala:28-35)."""
    return (F.unix_timestamp(ts_string, _FMT) * 1000).cast("long")


def ten_minute_bucket(ts: Column) -> Column:
    """F4 getTimeInterval: label 'HH:m0:00-HH:m9:59' (CommonTool.scala:67-74)."""
    start = F.date_format(F.date_trunc("minute", ts), "HH:mm")
    lo = F.concat(F.substring(start, 0, 4), F.lit("0:00"))
    hi = F.concat(F.substring(start, 0, 4), F.lit("9:59"))
    return F.concat(lo, F.lit("-"), hi)


def days_before(d: Column, n: int) -> Column:
    """F5 getDaysBefore (CommonTool.scala:82-94)."""
    return F.date_sub(d, n)


def seconds_between(a: Column, b: Column) -> Column:
    """F6 getDateBetweenTime: abs seconds between datetimes (CommonTool.scala:97-109)."""
    return F.abs(F.unix_timestamp(a) - F.unix_timestamp(b))


def month_last_day(d: Column) -> Column:
    """F7 getMonthLastday (CommonTool.scala:112-132)."""
    return F.last_day(d)


_WEEKDAYS_ZH = ["星期日", "星期一", "星期二", "星期三", "星期四", "星期五", "星期六"]


def weekday_zh(d: Column) -> Column:
    """F8 getDayWeek: Chinese weekday name (CommonTool.scala:135-150).

    ``dayofweek`` is 1=Sunday … 7=Saturday; map via an array literal
    (stays JVM-side — no UDF).
    """
    return F.array(*[F.lit(w) for w in _WEEKDAYS_ZH])[F.dayofweek(d) - 1]
