"""S13 Hive catalog: persistent metastore-backed tables (the
reference's HiveCatalog registration, rt-flink
demo/$01_FlinkWithHive.scala:27-63).

The load-bearing property is PERSISTENCE ACROSS PROCESSES — a table
created by one engine run is visible to the next (what the reference
uses Hive for). One catalog implementation per JVM, and the test
session already owns this JVM's SparkContext, so each phase runs in
its own subprocess with its own JVM; the Derby metastore directory is
the shared state between them."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow



def _run(py: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(py)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )


def test_hive_tables_persist_across_processes(tmp_path):
    wh = str(tmp_path / "hive")

    write = _run(f"""
        import os
        os.environ["SPARK_GRAFT_CPUS"] = "2"
        from rt_bigdata_spark.session import get_hive_spark
        spark = get_hive_spark({wh!r})
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        spark.sql("CREATE DATABASE IF NOT EXISTS dims")
        spark.createDataFrame(
            [(1, "beijing"), (2, "shanghai")], "province_id: long, name: string"
        ).write.mode("overwrite").saveAsTable("dims.province")
        spark.stop()
        print("WROTE_OK")
    """)
    assert "WROTE_OK" in write.stdout, write.stderr[-2000:]

    read = _run(f"""
        import os
        os.environ["SPARK_GRAFT_CPUS"] = "2"
        from rt_bigdata_spark.session import get_hive_spark
        spark = get_hive_spark({wh!r})
        spark.sparkContext.setLogLevel("ERROR")
        rows = sorted((r.province_id, r.name) for r in spark.table("dims.province").collect())
        assert rows == [(1, "beijing"), (2, "shanghai")], rows
        assert "province" in [t.name for t in spark.catalog.listTables("dims")]
        # metastore-backed INSERT visible too
        spark.sql("INSERT INTO dims.province VALUES (3, 'shenzhen')")
        assert spark.table("dims.province").count() == 3
        spark.stop()
        print("READ_OK")
    """)
    assert "READ_OK" in read.stdout, read.stderr[-2000:]
