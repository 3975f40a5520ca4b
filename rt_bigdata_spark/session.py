"""SparkSession factory.

Mirrors the reference's per-app environment setup (parallelism, state
backend, checkpointing — e.g. rt-flink OdsBaseLogApp.scala:38-57) as a
single session factory. Scale-oriented defaults:

- AQE on (runtime coalescing / skew-join handling replaces the
  reference's hand-tuned ``setParallelism(4)``),
- shuffle partitions sized for the local test harness but meant to be
  overridden (cluster deploys should set ``spark.sql.shuffle.partitions``
  ≈ 2-3× total cores; AQE coalesces down),
- Arrow enabled for the Pandas-UDF paths (the only Python hot paths we
  allow are Arrow-batched),
- UTC session timezone so window boundaries and date formatting are
  deterministic and match the DuckDB test oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones. This is the scale story for 100 TB — plans adapt to actual
    # partition sizes instead of a hand-set parallelism.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Local test default; cluster deploys override (AQE coalesces down).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Let AQE re-optimize CACHED plans too (off by default for output-
    # partitioning stability): the engine's documented caller-owned
    # persists (minhash signatures, sweep pair sets, shingle tables)
    # otherwise materialize at the raw shuffle-partition count and
    # every downstream stage over the cache schedules that many tasks
    # regardless of size — r15 measured 32-task stages over sub-MB
    # cached frames across the dedup family (guide §2.2: fewer, larger
    # partitions). Purely a physical-layout change; results and the
    # cached-plan keying are unaffected. Env-parameterised (r16) so the
    # cold-JVM effect can be A/B'd in paired subprocess runs — the r15
    # driver artifact showed the three cached-plan consumers
    # (dedup_threshold_sweep/minhash_lsh/dup_source_matrix) regressing
    # beyond the drift band COLD while warm UI metrics improved.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": os.environ.get(
        "SPARK_GRAFT_CACHED_PLAN_AQE", "true"
    ),
    # Split small-but-compute-heavy files (documents/embeddings at test
    # SF are single ~10 MB files → one task → one core without this).
    # At 100 TB the scan parallelism comes from file count anyway.
    "spark.sql.files.maxPartitionBytes": os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", str(8 * 1024 * 1024)),
    # Arrow for pandas_udf / applyInPandas / mapInPandas exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic window boundaries + date_format across engines.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: dims (region/nation/customer/part/supplier at
    # test SF; real dims up to ~100 MB) should broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off: permissive casts match the reference's lenient JSON-path
    # semantics (malformed → null, not error).
    "spark.sql.ansi.enabled": "false",
    # Runtime row-level join pruning: build a bloom filter from the
    # selective side of a shuffle join and push it into the other
    # side's scan — at 100 TB this skips reading fact rows whose keys
    # cannot match (complements the static pushdown the plans already
    # get). No effect on tiny test inputs (creation thresholds gate it)
    # but the session is the right place for the cluster default.
    # (semiJoinReduction stays OFF: enabling it alongside stalled the
    # local test harness — observed hang, no test completed in 12 min.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Testdata events.ts is TIMESTAMP(NANOS) parquet, which Spark refuses;
    # read as long and convert in sources.tables (integer ns→µs division).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}

# T6 parity: the reference keeps keyed state in RocksDB on HDFS
# (OdsBaseLogApp.scala:43-44). Spark's RocksDB state store provider is
# the same spill-to-disk story for Structured Streaming state; HDFS-backed
# checkpoint dirs carry the durability. Opt-in (per-query conf) because
# the default in-memory provider is faster for the small test states.
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession) -> None:
    """Switch streaming state to RocksDB for queries started after this
    call (runtime conf — applies per started query, not per session)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE)


def get_spark(app_name: str = "rt_bigdata_spark", extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Return the shared SparkSession, creating it if needed."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_hive_spark(
    warehouse_dir: str,
    app_name: str = "rt_bigdata_spark-hive",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """SparkSession with a persistent Hive catalog (S13 — the
    reference's HiveCatalog registration, rt-flink
    demo/$01_FlinkWithHive.scala:27-63).

    Uses the embedded Derby metastore rooted under ``warehouse_dir``:
    databases/tables created via ``spark.sql("CREATE TABLE ...")`` or
    ``df.write.saveAsTable`` survive process restarts (verified
    cross-process in tests/test_hive_catalog.py). In a cluster deploy
    point ``hive.metastore.uris`` at the shared metastore instead; the
    engine code is identical — only this factory changes.

    Note: one catalog implementation per JVM — call this from a fresh
    process, not after ``get_spark`` has already built an in-memory-
    catalog session.
    """
    conf = dict(_DEFAULTS)
    conf.update(
        {
            "spark.sql.warehouse.dir": os.path.join(warehouse_dir, "warehouse"),
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={os.path.join(warehouse_dir, 'derby')}",
        }
    )
    if extra_conf:
        conf.update(extra_conf)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.enableHiveSupport().getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
