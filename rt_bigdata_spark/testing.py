"""Shared oracle-comparison contract: value normalization + rowset
canonicalization used identically by the CI parity tests
(tests/test_oracle_parity.py) and the driver simulation
(scripts/driver_sim.py). One implementation so the two checkers cannot
diverge — the point of both is to predict the SAME verdict the
correctness driver reaches."""

from __future__ import annotations

import datetime as dt
import decimal
import math


def norm_cell(v):
    """Normalize one cell so Spark and DuckDB values compare equal.
    Every value is wrapped in a tagged tuple so heterogeneous columns
    (and NULLs) sort without TypeError."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    return ("o", repr(v))


def rowset(cols, rows):
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by their normalized value tuples."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


# ---------------------------------------------------------------------------
# Pandas dtype-kind contract (r8 verdict item 2).
#
# The correctness driver does NOT compare Python tuples like rowset();
# it hashes both result frames THROUGH pandas. Values that compare
# equal tuple-wise can still hash differently when the two frames
# materialize different pandas dtypes — three shipped incidents:
# r4 (datetime outside datetime64[ns] range crashes the hash path),
# r5 (DuckDB HUGEINT → float64 vs Spark int64), r8 (Spark
# decimal(28,6) → object-Decimal vs DuckDB DECIMAL-sum → float64).
# norm_cell above intentionally normalizes these away (Decimal and
# float with equal values compare equal), so tuple parity CANNOT
# catch the class: dtype-kind parity must be asserted separately.
# These two classifiers define the contract; tests/test_oracle_parity
# applies it to every oracle-backed spec.
# ---------------------------------------------------------------------------

def spark_pandas_kind(field, has_nulls: bool) -> str:
    """Predict the pandas dtype-kind `sdf.toPandas()` (Arrow path,
    session.py enables it) produces for one Spark schema field —
    predicted from the schema instead of re-running the query, so the
    parity suite pays zero extra Spark executions. Verified against an
    empirical toPandas probe of every Spark output type this repo
    emits: decimal → object-Decimal regardless of nulls; integral →
    int64, EXCEPT null-bearing → float64 (pandas has no nullable int
    here); date → object of datetime.date; timestamp → datetime64."""
    t = field.dataType.typeName()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("long", "integer", "short", "byte"):
        return "float" if has_nulls else "int"
    if t in ("double", "float"):
        return "float"
    if t == "boolean":
        return "bool"
    if t in ("timestamp", "timestamp_ntz"):
        return "datetime"
    if t == "date":
        return "date"
    if t == "string":
        return "str"
    if t == "binary":
        return "bytes"
    return "object"  # array / map / struct → object of ndarray/dict/Row


def duckdb_pandas_kind(series) -> str:
    """Classify the pandas dtype-kind of one column of
    ``duck.execute(sql).df()`` — the exact frame the driver hashes.
    Empirically (duckdb in this container): DECIMAL(any precision) and
    HUGEINT and null-bearing BIGINT all land as float64; DATE lands as
    datetime64 (not datetime.date objects)."""
    import datetime as _dt
    import decimal as _decimal

    import pandas as pd

    if pd.api.types.is_bool_dtype(series.dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(series.dtype):
        return "int"
    if pd.api.types.is_float_dtype(series.dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(series.dtype):
        return "datetime"
    # object column: classify by the first non-null value
    for v in series:
        if v is None or (isinstance(v, float) and v != v):
            continue
        if isinstance(v, _decimal.Decimal):
            return "decimal"
        if isinstance(v, str):
            return "str"
        if isinstance(v, _dt.datetime):
            return "datetime"
        if isinstance(v, _dt.date):
            return "date"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, bool):
            return "bool"
        return "object"
    return "all-null"


#: (spark_kind, duckdb_kind) pairs that hash identically in the
#: driver despite different classifications — each entry is backed by
#: a driver-GREEN precedent, not speculation:
#:  - ("date", "datetime"): every date-emitting spec (scalar_datetime,
#:    dim_history, SCD suite) has green rows while Spark ships
#:    object-date and DuckDB ships datetime64.
KIND_EQUIVALENT: frozenset = frozenset({("date", "datetime")})


def kinds_hash_compatible(spark_kind: str, duck_kind: str) -> bool:
    if "all-null" in (spark_kind, duck_kind):
        return True  # nothing to hash differently
    return spark_kind == duck_kind or (spark_kind, duck_kind) in KIND_EQUIVALENT
