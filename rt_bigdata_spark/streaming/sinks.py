"""Streaming sinks with idempotent-write semantics (SURVEY.md §2.1
S6-S10, §2.7 T6).

The reference achieves end-to-end exactly-once with Kafka transactions
plus ClickHouse ReplacingMergeTree(ts) dedup (…/sql/CreateTable.sql:
14-20). Spark-native equivalent: ``foreachBatch`` + deterministic keys
+ last-write-wins merge on a version column. Parquet stands in for
ClickHouse/Phoenix in tests; the write protocol is identical for JDBC
(swap ``_write_parquet_merged`` for ``df.write.jdbc`` with the same
dedup-before-write).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dedup_last_wins(df: DataFrame, keys: Sequence[str], version_col: str = "ts") -> DataFrame:
    """ReplacingMergeTree(ts) emulation: keep the max-version row per
    key (deterministic tie-break keeps plans reproducible)."""
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def drop_transient(df: DataFrame, transient_cols: Sequence[str]) -> DataFrame:
    """S9's @TransientSink column skip (…/bean/package.scala:294-296;
    ClickHouseUtil.scala:33-40): drop accumulator-only columns before
    the sink."""
    return df.drop(*[c for c in transient_cols if c in df.columns])


def foreach_batch_upsert(
    out_dir: str,
    keys: Sequence[str],
    version_col: str = "ts",
    transient_cols: Sequence[str] = (),
):
    """Build a foreachBatch function writing idempotent parquet upserts.

    Each micro-batch is deduped (last-wins per key) and appended with
    its batch id; readers dedup again on read via ``read_upserted`` —
    replayed batches (at-least-once delivery) therefore never produce
    duplicate final rows, which is the reference's ReplacingMergeTree
    contract.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        out = drop_transient(batch_df, transient_cols)
        out = dedup_last_wins(out, keys, version_col)
        out.withColumn("__batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    return fn


def read_upserted(spark, out_dir: str, keys: Sequence[str], version_col: str = "ts") -> DataFrame:
    """Read an upsert directory resolving last-wins (merge-on-read)."""
    if not os.path.exists(out_dir):
        raise FileNotFoundError(out_dir)
    return dedup_last_wins(spark.read.parquet(out_dir), keys, version_col).drop("__batch_id")


def jdbc_batch_sink(url: str, table: str, keys: Sequence[str], version_col: str = "ts", batchsize: int = 10_000, properties: dict | None = None):
    """S9/S10: ClickHouse/JDBC foreachBatch sink — dedup then batched
    JDBC append (the reference's manual 2-row batching,
    ClickHouseUtil.scala:49, becomes the connector's ``batchsize``)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        out = dedup_last_wins(batch_df, keys, version_col)
        out.write.mode("append").option("batchsize", str(batchsize)).jdbc(url, table, properties=properties or {})

    return fn


def _latest_rollup_version(state_dir: str) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    versions = [
        int(d.split("_", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v_") and d.split("_", 1)[1].isdigit()
    ]
    return max(versions) if versions else None


def rollup_maintenance_sink(
    state_dir: str,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
    id_col: str = "event_id",
    keep_versions: int = 2,
):
    """foreachBatch sink maintaining a CONTINUOUS AGGREGATE: each
    micro-batch folds into the persisted ``time_rollup_state`` via
    ``merge_time_rollups`` — the streaming half of the hypertable
    rollup. Raw events are read once and dropped; the state is
    O(groups), so maintenance cost is independent of stream history
    (per batch: one O(batch) rollup + one O(groups) merge).

    Exactly-once via the standard foreachBatch idempotency pattern:
    state versions are written to ``v_<batch_id>`` and a replayed
    batch (at-least-once delivery / restart) whose id is ≤ the newest
    version is SKIPPED — counts and sums are not idempotent under
    re-merge, so unlike the last-wins upsert sinks, dedup-on-read
    cannot absorb replays here; the version fence is the correctness
    mechanism, not an optimization. Old versions beyond
    ``keep_versions`` are pruned; readers use ``read_rollup``.
    """
    from rt_bigdata_spark.operators.aggregations import (
        merge_time_rollups,
        time_rollup_state,
    )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        cur = _latest_rollup_version(state_dir)
        if cur is not None and batch_id <= cur:
            return  # replayed batch: already folded into the state
        new_state = time_rollup_state(batch_df, ts_col, value_col, keys, unit, id_col)
        if cur is not None:
            old = batch_df.sparkSession.read.parquet(os.path.join(state_dir, f"v_{cur}"))
            new_state = merge_time_rollups([old, new_state], keys)
        new_state.write.mode("overwrite").parquet(os.path.join(state_dir, f"v_{batch_id}"))
        import shutil

        versions = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(state_dir)
            if d.startswith("v_") and d.split("_", 1)[1].isdigit()
        )
        for v in versions[:-keep_versions] if keep_versions else versions[:-1]:
            shutil.rmtree(os.path.join(state_dir, f"v_{v}"), ignore_errors=True)

    return fn


def read_rollup(spark, state_dir: str) -> DataFrame:
    """Read the newest continuous-aggregate state in display form."""
    from rt_bigdata_spark.operators.aggregations import finalize_time_rollup

    cur = _latest_rollup_version(state_dir)
    if cur is None:
        raise FileNotFoundError(f"no rollup state under {state_dir}")
    return finalize_time_rollup(spark.read.parquet(os.path.join(state_dir, f"v_{cur}")))
