"""Cross-engine parity on a corpus CONTAINING NULL and empty texts —
the input class the driver's testdata never exercises (r11 ADVICE found
`ngram_novelty` silently diverging on it; the r12 sweep found the same
latent break in winnow_fingerprint, substring_dedup and
doc_fingerprint, all via DuckDB's array_to_string(∅) = NULL vs Spark's
concat_ws(∅) = '').

Drives the REGISTERED specs (the exact Spark plan and the exact oracle
SQL the driver compares) over a 6-doc frame with a NULL text, an empty
text, a whitespace-only text, and a duplicated real text — so the
NULL-text convention (NULL ≡ '' ≡ no tokens; the doc PARTICIPATES as a
member of the empty clique unless the operator documents exclusion)
is enforced on both sides of every text-family query at once.
"""

from __future__ import annotations

import math

import pytest

from rt_bigdata_spark.plans.registry import REGISTRY, _ensure_loaded

pytestmark = pytest.mark.slow

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again", "en", "src0", 60),
    (2, None, "en", "src0", 0),
    (3, "", "en", "src1", 0),
    (4, "   \t  ", "en", "src1", 6),  # whitespace-only: tokenizes empty
    (5, "the quick brown fox jumps over the lazy dog again and again", "en", "src1", 60),
    (6, "completely different words about quantum topology and geometry", "en", "src0", 62),
]

# Every registered documents-only query whose tokenization feeds
# shingles/grams/fingerprints — the family the convention governs.
FAMILY = [
    "doc_fingerprint",
    "winnow_fingerprint",
    "winnow_pairs",
    "substring_dedup",
    "paragraph_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "ngram_novelty",
    "contamination",
    "dedup_exact",
    # tokenize-direct family (no shingle clamp — null/empty docs
    # simply contribute zero tokens; both engines must agree on
    # whether the DOC ROW survives)
    "token_stats",
    "language_id",
    "unigram_surprisal",
    "quality_gate",
    "corpus_profile",
    "ngram_novelty",
    "source_novelty",
    "doc_embedding",
    "quality_classifier",
    "doc_curation",
    "text_quality",
    # r15 second-session registrations: bloom probes the ''-shingle
    # convention (derived probe set is empty on this tiny fixture —
    # n_grams per doc still checked), the overlap chunker must drop
    # null/empty/whitespace docs identically, and script_profile's
    # NULL ≡ empty counts must agree
    "bloom_contamination",
    "doc_chunks_overlap",
    "script_profile",
]


@pytest.fixture(scope="module")
def null_corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldocs")
    spark.createDataFrame(
        DOCS, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _norm(rows, cols):
    out = set()
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 9)
            vals.append(v)
        out.add(tuple(vals))
    return out


@pytest.mark.parametrize("name", FAMILY)
def test_registered_spec_parity_on_null_and_empty_texts(spark, duck, name, null_corpus_dir):
    _ensure_loaded()
    spec = REGISTRY[name]
    sdf = spec.spark(spark, null_corpus_dir)
    cols = sdf.columns
    spark_rows = _norm([r.asDict() for r in sdf.collect()], cols)

    import duckdb

    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{null_corpus_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(spec.oracle)
    o_cols = [d[0] for d in res.description]
    assert sorted(o_cols) == sorted(cols), f"{name}: column sets differ"
    oracle_rows = _norm(
        [dict(zip(o_cols, row)) for row in res.fetchall()], o_cols
    )
    assert spark_rows == oracle_rows, (
        f"{name} diverges on NULL/empty texts:\n"
        f"  spark-only:  {sorted(spark_rows - oracle_rows)[:5]}\n"
        f"  oracle-only: {sorted(oracle_rows - spark_rows)[:5]}"
    )
