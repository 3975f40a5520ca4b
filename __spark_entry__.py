"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``rt_bigdata_spark.plans.registry``): every implemented operator from
SURVEY.md §2 is a QuerySpec pairing the Spark implementation with its
DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rt_bigdata_spark.plans.registry import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from rt_bigdata_spark.plans.warehouse import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracles()
