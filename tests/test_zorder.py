"""write_zordered: multi-column file pruning measured from parquet
row-group statistics. The property under test: a filter on the SECOND
clustering column prunes files under z-order layout but reads every
file under single-key layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.operators.scale import write_zordered, zorder_value

N_FILES = 32
BITS = 8


def _candidate_files(path: str, col: str, lo: float, hi: float) -> int:
    """Files whose [min, max] for ``col`` overlaps [lo, hi] — the files
    a stats-pruning scan must actually read."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = md.schema.names
        idx = names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) <= hi and max(maxs) >= lo:
            n += 1
    return n


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey", "l_quantity")
    # scale both keys into [0, 2^BITS) — min-max from one tiny agg
    lo1, hi1, lo2, hi2 = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).first()
    scaled = li.withColumn(
        "_s_order", ((F.col("l_orderkey") - lo1) * (2**BITS - 1) / (hi1 - lo1)).cast("long")
    ).withColumn("_s_part", ((F.col("l_partkey") - lo2) * (2**BITS - 1) / (hi2 - lo2)).cast("long"))

    zpath = str(tmp_path_factory.mktemp("zord") / "li_z")
    write_zordered(scaled, ["_s_order", "_s_part"], zpath, num_files=N_FILES, bits=BITS)

    kpath = str(tmp_path_factory.mktemp("zord") / "li_k")
    (
        scaled.repartitionByRange(N_FILES, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(kpath)
    )
    return zpath, kpath, (lo1, hi1), (lo2, hi2)


def test_second_column_filter_prunes_only_under_zorder(layouts):
    zpath, kpath, _, (lo2, hi2) = layouts
    width = (hi2 - lo2) * 0.1
    lo, hi = lo2 + (hi2 - lo2) * 0.45, lo2 + (hi2 - lo2) * 0.45 + width
    z_files = _candidate_files(zpath, "l_partkey", lo, hi)
    k_files = _candidate_files(kpath, "l_partkey", lo, hi)
    assert k_files == N_FILES  # single-key layout cannot prune the 2nd column
    assert z_files <= N_FILES // 2, (z_files, k_files)


def test_first_column_still_prunes_under_zorder(layouts):
    zpath, _, (lo1, hi1), _ = layouts
    # interleaving halves per-dimension resolution, so single-column
    # pruning is coarser than a dedicated sort (measured 19/32 vs 4/32
    # at sf0.01) — but a 10% range must still skip SOME files
    width = (hi1 - lo1) * 0.1
    lo, hi = lo1 + (hi1 - lo1) * 0.45, lo1 + (hi1 - lo1) * 0.45 + width
    z_files = _candidate_files(zpath, "l_orderkey", lo, hi)
    assert z_files < N_FILES, z_files


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(zorder_value([F.col("a"), F.col("b")], bits=3).alias("z")).first()["z"]
    # a bits (j=0) at even positions, b bits (j=1) at odd:
    # a=101 -> 1,0,1 at pos 0,2,4 ; b=011 -> 1,1,0 at pos 1,3,5
    assert z == (1 << 0) + (0 << 2) + (1 << 4) + (1 << 1) + (1 << 3) + (0 << 5)


def test_zorder_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    p = str(tmp_path / "z")
    write_zordered(
        li.withColumn("_a", F.col("l_orderkey") % 256).withColumn("_b", F.col("l_partkey") % 256),
        ["_a", "_b"],
        p,
        num_files=8,
        bits=8,
    )
    back = spark.read.parquet(p)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns + ["_a", "_b"])
