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
