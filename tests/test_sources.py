"""load_table source hygiene: TIMESTAMP(NANOS) columns are detected
from the parquet footer (not an allowlist) and surfaced as proper
timestamps; micros columns pass through untouched."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from rt_bigdata_spark.sources.tables import _nanos_ts_cols, load_table


def _write_tbl(path: str, unit: str) -> None:
    if unit == "us":
        ts = pa.array([1_700_000_000_123_456, 1_700_000_111_000_000], type=pa.timestamp("us"))
    else:
        ts = pa.array(
            [1_700_000_000_123_456_789, 1_700_000_111_000_000_000], type=pa.timestamp("ns")
        )
    tbl = pa.table({"k": pa.array([1, 2], type=pa.int64()), "created_at": ts})
    pq.write_table(tbl, path, coerce_timestamps=None)


def test_nanos_column_outside_allowlist_roundtrips(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_tbl(os.path.join(sf_dir, "mytable.parquet"), "ns")
    assert _nanos_ts_cols(os.path.join(sf_dir, "mytable.parquet")) == ("created_at",)

    df = load_table(spark, sf_dir, "mytable")
    assert isinstance(df.schema["created_at"].dataType, TimestampType)
    rows = {r["k"]: r["created_at"] for r in df.collect()}
    # ns→µs integer division truncates sub-microsecond digits.
    assert rows[1] == dt.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert rows[2] == dt.datetime(2023, 11, 14, 22, 15, 11)


def test_micros_column_not_converted(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_tbl(os.path.join(sf_dir, "mtable.parquet"), "us")
    assert _nanos_ts_cols(os.path.join(sf_dir, "mtable.parquet")) == ()
    df = load_table(spark, sf_dir, "mtable")
    # Micros parquet reads natively (NTZ here: isAdjustedToUTC=false);
    # the point is it must NOT surface as a raw long.
    assert isinstance(df.schema["created_at"].dataType, (TimestampType, TimestampNTZType))
    assert not isinstance(df.schema["created_at"].dataType, LongType)


def test_directory_dataset_footer_detection(spark, tmp_path):
    d = tmp_path / "dtable.parquet"
    d.mkdir()
    _write_tbl(str(d / "part-000.parquet"), "ns")
    assert _nanos_ts_cols(str(d)) == ("created_at",)
    df = load_table(spark, str(tmp_path), "dtable")
    assert isinstance(df.schema["created_at"].dataType, TimestampType)


def test_struct_nested_nanos_column_converts(spark, tmp_path):
    """A TIMESTAMP(NANOS) field inside a plain struct is rewritten via
    withField (other struct fields preserved), same ns->us integer
    division as top-level columns."""
    inner = pa.array([1_700_000_000_123_456_789], type=pa.timestamp("ns"))
    other = pa.array(["x"], type=pa.string())
    tbl = pa.table(
        {
            "k": pa.array([1], type=pa.int64()),
            "meta": pa.StructArray.from_arrays([inner, other], names=["ts_ns", "tag"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "nested.parquet"))
    assert _nanos_ts_cols(str(tmp_path / "nested.parquet")) == ("meta.ts_ns",)

    df = load_table(spark, str(tmp_path), "nested")
    assert isinstance(df.schema["meta"].dataType["ts_ns"].dataType, TimestampType)
    row = df.collect()[0]
    assert row["meta"]["ts_ns"] == dt.datetime(2023, 11, 14, 22, 13, 20, 123456)
    assert row["meta"]["tag"] == "x"  # sibling field untouched


def test_array_nested_nanos_fails_loudly(tmp_path):
    """Inside an array the per-element rewrite can't reach the field —
    raise (confined to this table) instead of silently surfacing longs."""
    import pytest

    inner = pa.array([[1_700_000_000_123_456_789]], type=pa.list_(pa.timestamp("ns")))
    tbl = pa.table({"k": pa.array([1], type=pa.int64()), "ts_list": inner})
    path = str(tmp_path / "arr.parquet")
    pq.write_table(tbl, path)
    with pytest.raises(NotImplementedError, match="repeated"):
        _nanos_ts_cols(path)


def test_pre_epoch_nanos_floor_not_truncate(spark, tmp_path):
    """ns->us must FLOOR for negative (pre-1970) epochs: -1500 ns is
    1969-12-31T23:59:59.999998500, whose microsecond floor is ...999998
    — truncate-toward-zero would give ...999999."""
    ts = pa.array([-1_500, 1_500], type=pa.timestamp("ns"))
    tbl = pa.table({"k": pa.array([1, 2], type=pa.int64()), "t": ts})
    pq.write_table(tbl, str(tmp_path / "pre.parquet"))
    df = load_table(spark, str(tmp_path), "pre")
    rows = {r.k: r.t for r in df.collect()}
    assert rows[1] == dt.datetime(1969, 12, 31, 23, 59, 59, 999998)
    assert rows[2] == dt.datetime(1970, 1, 1, 0, 0, 0, 1)


def test_read_jsonl_permissive_splits_clean_and_corrupt(spark, tmp_path):
    from rt_bigdata_spark.sources.files import corrupt_records, read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "name": "b"}\n'
        '{"id": "not_an_int", "name": "c"}\n'
    )
    clean = read_jsonl(spark, str(p), "id BIGINT, name STRING").collect()
    assert sorted((r.id, r.name) for r in clean) == [(1, "a"), (2, "b")]
    bad = corrupt_records(
        read_jsonl(spark, str(p), "id BIGINT, name STRING", keep_corrupt=True)
    ).collect()
    assert len(bad) == 2  # the non-JSON line AND the type-mismatched one
    assert any("NOT JSON" in r.raw for r in bad)


def test_read_csv_permissive_splits_clean_and_corrupt(spark, tmp_path):
    from rt_bigdata_spark.sources.files import corrupt_records, read_csv

    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,a\nnot_an_int,b\n3,c\n")
    clean = read_csv(spark, str(p), "id BIGINT, name STRING").collect()
    assert sorted((r.id, r.name) for r in clean) == [(1, "a"), (3, "c")]
    bad = corrupt_records(
        read_csv(spark, str(p), "id BIGINT, name STRING", keep_corrupt=True)
    ).collect()
    assert [r.raw for r in bad] == ["not_an_int,b"]
