"""Oracle-parity harness: every registered QuerySpec with an oracle is
executed on Spark and on DuckDB over the same parquet and compared
order-insensitively (row count, column names, per-row value tuples) —
the same contract the driver's CORRECTNESS gate applies."""

from __future__ import annotations

import pytest

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded
from rt_bigdata_spark.testing import rowset as _rowset

_ensure_loaded()

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]




def _assert_pandas_representable(name: str, rows: list[tuple]) -> None:
    """The correctness driver hashes query results through pandas:
    any datetime outside datetime64[ns] range (1677-09-21..2262-04-11)
    raises OutOfBoundsDatetime in ITS pipeline even though Spark and
    DuckDB both computed it fine (the r4 dim_history failure — a
    9999-12-31 SCD sentinel). Guard every oracle-backed result here so
    the failure mode cannot recur silently."""
    import datetime

    # Strictly inside pd.Timestamp.min/max (1677-09-21..2262-04-11);
    # whole-day bounds avoid the nanosecond-discard warning of
    # Timestamp.to_pydatetime() and are conservative by < 1 day.
    lo, hi = datetime.datetime(1677, 9, 22), datetime.datetime(2262, 4, 11)
    lo_d, hi_d = lo.date(), hi.date()
    for row in rows:
        for v in row:
            if isinstance(v, datetime.datetime):
                assert lo <= v.replace(tzinfo=None) <= hi, (
                    f"{name}: timestamp {v} outside pandas datetime64[ns] range — "
                    "the driver's hash path will crash on this row"
                )
            elif isinstance(v, datetime.date):
                assert lo_d <= v <= hi_d, (
                    f"{name}: date {v} outside pandas datetime64[ns] range — "
                    "the driver's hash path will crash on this row"
                )


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, sf_dir, spec):
    sdf = spec.spark(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    _assert_pandas_representable(spec.name, s_rows)

    res = duck.execute(spec.oracle)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{spec.name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{spec.name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in d_set][:5]
        diff_d = [r for r in d_set if r not in s_set][:5]
        raise AssertionError(f"{spec.name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}")

    _assert_integer_dtypes_survive_pandas(spec, sdf, duck)


def _assert_integer_dtypes_survive_pandas(spec, sdf, duck) -> None:
    """The correctness driver hashes the DuckDB side through pandas
    (``.df()``), not ``fetchall()``. An uncast SUM of BIGINT is HUGEINT
    in DuckDB, which pandas materializes as float64 (223.0) while Spark
    emits int64 (223) — the values then hash differently even though the
    Python-tuple comparison above sees them as equal (the r5
    token_budget / paragraph_dedup failure, HUGEINT cousin of the r4
    datetime overflow). Every oracle must CAST integer aggregates so the
    pandas round-trip keeps an integer dtype. Null-bearing columns are
    exempt: pandas promotes them to float on BOTH sides, so they hash
    consistently."""
    import pandas as pd

    ddf = duck.execute(spec.oracle).df()
    int_spark = {
        f.name.lower()
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("long", "integer", "short", "byte")
    }
    for col in ddf.columns:
        if col.lower() not in int_spark or ddf[col].isna().any():
            continue
        assert pd.api.types.is_integer_dtype(ddf[col].dtype), (
            f"{spec.name}: oracle column {col!r} is {ddf[col].dtype} via the "
            "pandas path but Spark emits an integer type — wrap the SQL "
            "expression in CAST(... AS BIGINT) or the driver's value hash "
            "will mismatch (DuckDB HUGEINT→float64 promotion)"
        )


def test_every_spec_is_oracle_backed():
    """Since r6 the registry carries ZERO rows-only specs — every query
    is hash-checked against DuckDB. This invariant replaces the old
    parametrized rows-only smoke test, whose now-empty parameter set
    was the full suite's one lingering 'skipped' line (r6 verdict item
    3). A future genuinely-non-SQL-expressible registration should
    reinstate that execution check alongside relaxing this assertion."""
    assert ROWS_ONLY_SPECS == [], [s.name for s in ROWS_ONLY_SPECS]
