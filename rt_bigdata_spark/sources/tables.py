"""Batch table sources over the driver-generated parquet testdata.

Plays the role of the reference's source utilities (KafkaUtil /
PhoenixUtil / MySQLUtil — rt-flink …/utils/) for the batch/test path:
every engine query reads through here so the physical source (parquet
now; Kafka/JDBC in streaming deploys) is swapped in one place.

Scan hygiene: we return raw ``spark.read.parquet`` DataFrames and let
each query project/filter — Catalyst pushes the predicates and prunes
columns down to the parquet scan (verify with
``df.explain("formatted")`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from rt_bigdata_spark.config import TESTDATA_TABLES

# Columns stored as TIMESTAMP(NANOS) in the testdata parquet; Spark reads
# them as long (spark.sql.legacy.parquet.nanosAsLong) and we convert via
# integer ns→µs division (a double division would lose precision at
# ~1.7e18 ns epochs).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The testdata writes TIMESTAMP(NANOS) columns; without this conf any
    # externally-built session (e.g. the correctness driver's) fails with
    # PARQUET_TYPE_ILLEGAL before our ns→µs conversion can run. It is
    # runtime-settable, so pin it here rather than only at session build.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql plans)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
