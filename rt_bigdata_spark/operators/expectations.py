"""Declarative data-quality expectations (the Deequ / dbt-test /
Great-Expectations check suite, Spark-first): a set of named rules is
audited against a table and the result is ONE small report DataFrame
— the gate a 100 TB ingest runs before publishing a partition.

Companion to the referential-integrity audit (`integrity_audit`
query): that one checks FK edges ACROSS tables via anti-joins; this
one checks single-table invariants (nullability, ranges, domains,
uniqueness) and is deliberately one-scan.

Scale shape: every row-level rule compiles to a conditional partial
count inside ONE aggregation over ONE scan — adding a rule adds a
column to the agg buffer, not a pass over the data. Uniqueness rules
ride the same agg as exact COUNT(DISTINCT) expansions (each adds the
standard two-phase distinct; use few, or swap to
``approx_count_distinct`` where a tolerance is stated). The report is
rules-count rows, unpivoted driver-side-free via ``stack``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from rt_bigdata_spark.operators.scale import ensure_parallelism


@dataclass(frozen=True)
class Expectation:
    """One named row-level rule: ``violation`` is TRUE for rows that
    BREAK the expectation (NULL predicate results count as violations
    — an unevaluable rule must not silently pass)."""

    name: str
    violation: Column


def check_expectations(
    df: DataFrame,
    rules: Sequence[Expectation],
    unique: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Audit ``rules`` (+ ``unique`` key-uniqueness checks) in one
    scan. Returns ``(rule, n_rows, n_violations, passed)`` — one row
    per rule, ordered for stable output by rule name downstream.

    Uniqueness semantics: ``n_violations`` = surplus rows beyond the
    first per key, via exact COUNT(DISTINCT key-struct); a NULL key
    component is itself counted as a distinct value (struct equality),
    so all-NULL keys don't collapse the check.
    """
    unique = dict(unique or {})
    if not rules and not unique:
        raise ValueError("check_expectations needs at least one rule")
    for name in [r.name for r in rules] + list(unique):
        # names land in a SQL expression: the literal is quote-escaped
        # and the column reference backtick-quoted below, so the only
        # unrepresentable character is the backtick itself
        if "`" in name:
            raise ValueError(f"rule name may not contain a backtick: {name!r}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for r in rules:
        # COALESCE twice: a NULL predicate result is a violation (an
        # unevaluable rule must not silently pass), and the SUM over
        # an EMPTY table is NULL — which would make the report row
        # satisfy neither passed nor ~passed, vanishing from both
        # filter sets exactly when a gate checks an empty partition
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(r.violation, F.lit(True)), F.lit(1)).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias(f"_v_{r.name}")
        )
    for name, cols in unique.items():
        aggs.append(
            F.count_distinct(F.struct(*[F.col(c) for c in cols])).alias(f"_u_{name}")
        )
    row = df.agg(*aggs)

    def lit(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    pairs: list[str] = []
    for r in rules:
        pairs += [lit(r.name), f"`_v_{r.name}`"]
    for name in unique:
        pairs += [lit(name), f"_n - `_u_{name}`"]
    n_rules = len(rules) + len(unique)
    report = row.select(
        F.expr(f"stack({n_rules}, {', '.join(pairs)}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    )
    return report.select(
        "rule",
        "n_rows",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


# --- Population Stability Index (distribution drift) -----------------

# Fixed, corpus-independent n_chars bucket edges (11 edges → 10
# buckets, last unbounded). Literals so the bucketing needs no
# data-dependent pass and both engines agree bit-for-bit.
PSI_EDGES = (0, 50, 100, 150, 200, 300, 400, 600, 800, 1200)


def _psi_bucket(col):
    """Bucket index 0..9 for a length value under PSI_EDGES."""
    b = F.lit(len(PSI_EDGES) - 1)
    for i in range(len(PSI_EDGES) - 1, 0, -1):
        b = F.when(col < F.lit(PSI_EDGES[i]), F.lit(i - 1)).otherwise(b)
    return b


def source_length_psi(
    df: DataFrame,
    len_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Population Stability Index of each source's length distribution
    against the whole corpus — the standard drift monitor
    (PSI = Σ_b (p_b − q_b)·ln(p_b/q_b); rule-of-thumb: <0.1 stable,
    0.1-0.25 moderate shift, >0.25 action). A feed whose document-length
    profile diverges from the corpus (truncation bug, boilerplate
    injection, crawler change) surfaces here before it poisons a
    training mix.

    Determinism contract: per-source bucket counts land in 10 FIXED
    conditional-agg columns (one map-side-combinable HashAggregate);
    corpus totals are the same agg without keys (1-row broadcast); PSI
    is a LITERAL CHAIN of the 10 terms in fixed bucket order — never a
    SQL SUM over term rows, whose float association order is
    plan-dependent. Proportions are Laplace-smoothed
    ((c+1)/(n+10)) so ln never sees zero. Output
    ``(source, n_docs, psi)`` with psi rounded 9 dp.

    Scale shape: two aggregates over one scan shape (O(sources) and
    1-row outputs), a broadcast, and a map-side projection — nothing
    corpus-sized crosses the wire."""
    nb = len(PSI_EDGES)
    bkt = _psi_bucket(F.col(len_col))
    base = ensure_parallelism(df).select(F.col(group_col), bkt.alias("_b"))
    per_src = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum((F.col("_b") == i).cast("long")).cast("long").alias(f"c{i}")
            for i in range(nb)
        ],
    )
    tot = base.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        *[
            F.sum((F.col("_b") == i).cast("long")).cast("long").alias(f"t{i}")
            for i in range(nb)
        ],
    )
    j = per_src.crossJoin(F.broadcast(tot))
    psi = None
    for i in range(nb):
        p = (F.col(f"c{i}") + F.lit(1)).cast("double") / (F.col("n_docs") + F.lit(nb)).cast("double")
        q = (F.col(f"t{i}") + F.lit(1)).cast("double") / (F.col("n_tot") + F.lit(nb)).cast("double")
        term = (p - q) * F.log(p / q)
        psi = term if psi is None else psi + term
    return j.select(
        group_col,
        "n_docs",
        F.round(psi, 9).alias("psi"),
    )
