"""Corpus snapshot comparison (dataset versioning).

Beyond-reference operator: the delta between two corpus snapshots —
which documents were added, removed, changed, or untouched — the audit
step between pipeline runs (did the re-crawl really only touch the two
sources it claimed?) and the input to incremental recomputation (only
``added``/``changed`` rows need re-scoring; joins naturally with
``incremental_exact_dedup``'s persisted signature table).

Shape: content comparison by md5 of the compared columns (never the
raw text — the join carries a 32-char digest per row, not documents),
one full outer join on the id — a single co-partitioned shuffle on
both sides, no skew (ids are unique). Output is per-doc status rows;
aggregate downstream for counts.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rt_bigdata_spark.operators.scale import ensure_parallelism


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """``(id, status)`` per document across both snapshots, with
    status ∈ added | removed | changed | unchanged.

    Content equality is md5 over the ``compare_cols`` concatenated
    with a unit separator (0x1f — cannot collide with column-boundary
    shifts the way a bare concat would: ('ab','c') vs ('a','bc')).
    NULL columns hash as the empty string, deterministically.
    """
    sep = "\x1f"

    def digest(df: DataFrame, name: str) -> DataFrame:
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in compare_cols]
        return ensure_parallelism(df).select(
            F.col(id_col), F.md5(F.concat_ws(sep, *cols)).alias(name)
        )

    o = digest(old, "h_old")
    n = digest(new, "h_new")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col(id_col), status.alias("status"))
