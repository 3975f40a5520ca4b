"""Business-rule scalar functions (SURVEY.md §2.8 F9-F11).

Re-expresses rt-flink …/common/BusinessRulesTool.scala as built-in
column expressions (no Python UDFs): F9 ``classify_keywords`` lives in
functions.text_fns; F10/F11 here.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column


def cancel_date(d: Column) -> Column:
    """F10 getCancelDate (BusinessRulesTool.scala:71-95): orders on or
    after the 16th normalize to the 15th of the NEXT month; earlier
    orders to the 15th of the current month (cross-month cancel
    window)."""
    month_start = F.date_trunc("month", d)
    next_month_15 = F.add_months(month_start, 1) + F.expr("INTERVAL 14 DAYS")
    this_month_15 = month_start + F.expr("INTERVAL 14 DAYS")
    return F.when(F.dayofmonth(d) >= 16, next_month_15).otherwise(this_month_15)


def product_filter(name: Column, include: Sequence[str], exclude: Sequence[str]) -> Column:
    """F11 filterData (BusinessRulesTool.scala:98-114): 1 if the name
    contains any include-substring and none of the exclude-substrings
    (the reference's non-food filter with negation terms), else 0."""
    inc = None
    for s in include:
        c = name.contains(F.lit(s))
        inc = c if inc is None else (inc | c)
    exc = F.lit(False)
    for s in exclude:
        exc = exc | name.contains(F.lit(s))
    return F.when(inc & ~exc, F.lit(1)).otherwise(F.lit(0)).cast("int")
