"""Property-based tests (hypothesis): engine column expressions must
agree with straightforward Python reference implementations on
arbitrary inputs — including unicode, empties, and whitespace runs the
fixture corpus doesn't cover.

Each example batch runs as ONE Spark job (rows = examples), keeping
runtime sane; max_examples stays small because every example is a JVM
round-trip.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from rt_bigdata_spark.operators.text_analysis import (
    _ROLLING_BASE,
    _ROLLING_PRIME,
    BPE_ISH_PATTERN,
    bpe_token_count,
    rolling_hash,
)

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00", max_codepoint=0xFFFF),
        max_size=80,
    ),
    min_size=1,
    max_size=30,
)


def py_rolling(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * _ROLLING_BASE + ord(ch)) % _ROLLING_PRIME
    return h


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_rolling_hash_matches_python_fold(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "t"])
    got = {r.id: r.rh for r in df.select("id", rolling_hash(F.col("t")).alias("rh")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_rolling(t), repr(t)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_bpe_token_count_matches_python_regex(spark, texts):
    pat = re.compile(BPE_ISH_PATTERN)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "t"])
    got = {r.id: r.n for r in df.select("id", bpe_token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(pat.findall(t.lower())), repr(t)


PII_TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab @.+-()0123456789x\n")),
        max_size=60,
    ),
    min_size=1,
    max_size=24,
)


@given(texts=PII_TEXTS)
@settings(max_examples=12, deadline=None)
def test_pii_counts_match_python_regex(spark, texts):
    """pii_scrub's counts (Java regex) must agree with Python re on
    adversarial digit/@/paren soup — a third dialect witness next to
    the DuckDB RE2 parity fixture."""
    from rt_bigdata_spark.operators.curation_rules import (
        PII_EMAIL,
        PII_PHONE,
        PII_SSN,
        pii_scrub,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: (r.email_ct, r.ssn_ct, r.phone_ct) for r in pii_scrub(df).collect()}
    for i, t in rows:
        exp = tuple(len(re.findall(p, t)) for p in (PII_EMAIL, PII_SSN, PII_PHONE))
        assert got[i] == exp, (t, got[i], exp)


CHUNK_TEXTS = st.lists(
    st.text(alphabet=st.sampled_from(list("abz 019 .,!-\u00e9\u4e2d\n\t")), max_size=60),
    min_size=1,
    max_size=16,
)


def _py_tokenize(t: str) -> list[str]:
    """Python reference for text_fns.tokenize: maximal runs of unicode
    letters/digits of the lowercased text (Java \\p{L}\\p{N})."""
    import unicodedata

    out, cur = [], []
    for ch in t.lower():
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


@given(texts=CHUNK_TEXTS)
@settings(max_examples=10, deadline=None)
def test_chunking_is_lossless_and_sized(spark, texts):
    """chunk_documents invariants on arbitrary text: chunk token counts
    are k except possibly the last, they sum to the doc's token count,
    and reassembly reproduces the token stream."""
    from rt_bigdata_spark.operators.packing import chunk_documents

    k = 5
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    chunks = {}
    for r in chunk_documents(df, chunk_tokens=k).collect():
        chunks.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk_text))
    for i, t in rows:
        toks = _py_tokenize(t)
        got = sorted(chunks.get(i, []))
        assert [c[0] for c in got] == list(range(len(got)))
        assert sum(c[1] for c in got) == len(toks)
        assert all(c[1] == k for c in got[:-1])
        if toks:
            assert " ".join(c[2] for c in got).split(" ") == toks


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_concat_pack_tiles_the_token_stream(spark, texts):
    """For arbitrary text: per-source spans tile the concatenated
    stream exactly — sum of n_tokens equals the stream length, spans
    are non-overlapping and ordered, and each span's endpoints obey
    the closed-form floor arithmetic."""
    from rt_bigdata_spark.operators.packing import concat_pack

    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)], "doc_id: long, source: string, text: string"
    )
    out = sorted(concat_pack(df, seq_len=8).collect(), key=lambda r: (r.first_seq, r.last_seq, r.doc_id))
    cum = 0
    for r in out:
        assert r.n_tokens > 0
        assert r.first_seq == cum // 8
        cum += r.n_tokens
        assert r.last_seq == (cum - 1) // 8


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=1, max_value=400), st.text(max_size=8))
def test_global_shuffle_is_contiguous_permutation(spark, n, seed):
    from rt_bigdata_spark.operators.sampling import global_shuffle

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = global_shuffle(df, seed=seed).collect()
    assert sorted(r.position for r in out) == list(range(1, n + 1))


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_paragraph_dedup_conserves_unique_units(spark, texts):
    """For arbitrary text: the number of surviving units equals the
    number of DISTINCT units in the corpus, and every doc's kept count
    is bounded by its total count."""
    from rt_bigdata_spark.operators.dedup import paragraph_dedup
    from rt_bigdata_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    chunks = chunk_documents(df, chunk_tokens=4)
    n_distinct = chunks.select("chunk_text").distinct().count()
    out = paragraph_dedup(df, chunk_tokens=4).collect()
    assert sum(r.n_chunks_kept for r in out) == n_distinct
    assert all(0 < r.n_chunks_kept <= r.n_chunks for r in out)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # key
            st.integers(min_value=0, max_value=50),  # day offset
            st.text(alphabet="ab", min_size=1, max_size=2),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=50),
)
def test_scd2_merge_equals_rebuild_for_arbitrary_histories(spark, rows, cutoff_day):
    """For arbitrary change histories split at an arbitrary ts cutoff:
    build(early) then merge(late) must equal build(all). (key, ts)
    pairs are deduped so the cross-batch collision rule — new wins —
    cannot differ from the rebuild's within-batch tiebreak."""
    import datetime as dt

    from rt_bigdata_spark.operators.scd import scd2_from_changes, scd2_merge

    base = dt.datetime(2021, 1, 1)
    seen: dict[tuple[int, int], tuple] = {}
    for i, (k, day, attr) in enumerate(rows):
        seen[(k, day)] = (k, base + dt.timedelta(days=day), i, attr)
    data = list(seen.values())
    cutoff = base + dt.timedelta(days=cutoff_day)
    schema = "k long, ts timestamp, seq long, attr string"
    kw = dict(keys=["k"], ts_col="ts", tiebreak="seq", attr_cols=["attr"])
    early = [r for r in data if r[1] < cutoff]
    late = [r for r in data if r[1] >= cutoff]
    full = scd2_from_changes(spark.createDataFrame(data, schema), **kw)
    if not early or not late:
        return  # degenerate split: nothing to merge
    built = scd2_from_changes(spark.createDataFrame(early, schema), **kw)
    merged = scd2_merge(built, spark.createDataFrame(late, schema), **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),          # doc_id (deduped below)
            st.sampled_from(["a", "b", None]),                   # group incl. NULL
            st.integers(min_value=0, max_value=50),              # value (token count)
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([1, 2, 7, 256]),                             # n_buckets incl. degenerate
    st.integers(min_value=1, max_value=20),                      # prune_rank
)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_bucketed_group_order_equals_naive_window(spark, rows, n_buckets, prune_rank):
    """The kernel's contract, property-tested directly: for arbitrary
    (id, group incl. NULL, value) rows and ANY bucket count (including
    the degenerate n_buckets=1, which collapses to the naive window),
    rank and running sum are bit-identical to Window.partitionBy, and
    prune_rank never changes the rank<=k answer (prefix property)."""
    from pyspark.sql import Window

    from rt_bigdata_spark.operators.scale import bucketed_group_order

    df = spark.createDataFrame(rows, "doc_id: long, grp: string, val: long").withColumn(
        "_pr", F.md5(F.col("doc_id").cast("string"))
    )
    out = bucketed_group_order(
        df, "_pr", "doc_id", group_col="grp", n_buckets=n_buckets,
        sum_col="val", rank_col="rnk", cumsum_col="cs",
    )
    got = {r.doc_id: (r.rnk, r.cs) for r in out.collect()}

    w = Window.partitionBy("grp").orderBy("_pr", "doc_id")
    naive = df.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("val").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cs"),
    )
    want = {r.doc_id: (r.rnk, r.cs) for r in naive.collect()}
    assert got == want

    pruned = bucketed_group_order(
        df, "_pr", "doc_id", group_col="grp", n_buckets=n_buckets,
        rank_col="rnk", prune_rank=prune_rank,
    )
    got_p = {r.doc_id for r in pruned.filter(F.col("rnk") <= prune_rank).collect()}
    want_p = {d for d, (rk, _) in want.items() if rk <= prune_rank}
    assert got_p == want_p


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=12), min_size=1, max_size=25
    ),
    st.integers(min_value=0, max_value=6),
)
def test_bpe_encode_tokens_matches_python_mirror(spark, words, n_merges):
    """bpe_encode_tokens over arbitrary small-alphabet corpora and
    trained merge tables must emit exactly the id sequence a pure-
    Python greedy BPE (classic id layout: code point / 255+step,
    lowest id on duplicate surface forms) produces — position by
    position, across chunk boundaries (chunk=2 forces slicing even at
    tiny n_merges)."""
    from rt_bigdata_spark.operators.text_analysis import bpe_encode_tokens, bpe_merges

    docs = [(i, " ".join(words[i::3])) for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    merges = [
        (r.left, r.right)
        for r in bpe_merges(df, n_merges=n_merges).orderBy("step").collect()
    ]

    sym_id: dict[str, int] = {}
    for s, (left, right) in enumerate(merges, 1):
        sym_id.setdefault(left + right, 255 + s)

    def enc(tok: str) -> list[int]:
        syms = list(tok)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return [sym_id.get(s2, ord(s2) if len(s2) == 1 else -1) for s2 in syms]

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.token_ids)
        for r in bpe_encode_tokens(df, merges, chunk=2).collect()
    }
    expected = {}
    for doc_id, text in docs:
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if toks:
            ids = [i for w in toks for i in enc(w)]
            assert -1 not in ids  # every multi-char symbol has a merge id
            expected[doc_id] = (len(toks), len(ids), " ".join(map(str, ids)))
    assert got == expected


def test_zscore_moments_portable_beyond_decimal64_envelope(spark):
    """r10 verdict item 7: the zscore moments now convert decimal sums
    to double through the chunked portable path on BOTH engines
    (aggregations.dec_to_double_portable / the oracle's HUGEINT
    mirror), so the old measured envelope (per-group Sv^2 unscaled must
    fit int64) is gone structurally. Exercise the region PAST that
    envelope: values ~3e7 make a single row's v^2 unscaled ~9e18 (at
    the int64 edge) and 200 rows push the group sum ~200x beyond it,
    where the retired guard's fast-path assumption is violated. The
    full zscore output must still match DuckDB bit-for-bit."""
    import duckdb

    from rt_bigdata_spark.operators.aggregations import zscore_outliers

    rows = [
        (i, "g%d" % (i % 2), 3.0e7 + 13.37 * i + (0.01 if i % 7 == 0 else 0.0))
        for i in range(200)
    ]
    # plus a degenerate single-member group (sigma NULL path) and a
    # negative-value group (sign handling through abs/trunc chunking)
    rows += [(200, "solo", 123.45)]
    rows += [(201 + i, "neg", -2.9e7 - 999.99 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id: long, event_type: string, value: double")

    got = {
        r.event_id: (repr(r.mu), repr(r.sigma), repr(r.zscore), r.is_outlier)
        for r in zscore_outliers(
            df, value_col="value", keys=["event_type"], id_col="event_id", z_threshold=2.5
        ).collect()
    }

    from rt_bigdata_spark.plans.warehouse import _ORACLE_EVENT_ANOMALIES

    con = duckdb.connect()
    con.register("events", __import__("pandas").DataFrame(
        rows, columns=["event_id", "event_type", "value"]
    ))
    want = {
        int(r[0]): (repr(r[3]), repr(r[4]), repr(r[5]), bool(r[6]))
        for r in con.sql(_ORACLE_EVENT_ANOMALIES).fetchall()
    }
    assert got == want


def test_dsir_importance_matches_python_reference(spark):
    """dsir_importance against an exact pure-Python reimplementation of
    the hashed-bigram DSIR formula (same md5-derived buckets, same
    add-k smoothing) on a small corpus with a designated target slice —
    pins the feature hashing, the count plumbing, and the log-ratio
    algebra independently of the DuckDB oracle."""
    import hashlib
    import math
    import re as _re
    from collections import Counter

    from rt_bigdata_spark.operators.text_analysis import dsir_importance

    K, B = 0.5, 64
    docs = [
        (0, "the quick brown fox jumps over the lazy dog", "target"),
        (1, "spark shuffles wide joins across the cluster", "raw"),
        (2, "the quick brown fox naps under the quiet tree", "raw"),
        (3, "gradient descent updates the model weights", "target"),
        (4, "one", "raw"),           # <2 tokens: no features, no row
        (5, None, "raw"),            # NULL text: no row
        (6, "the the the the", "raw"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string, source: string")
    got = {
        r.doc_id: (r.n_features, r.log_importance)
        for r in dsir_importance(
            df, target=F.col("source") == "target", k=K, num_buckets=B
        ).collect()
    }

    def bucket(bg: str) -> int:
        return int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) % B

    feat: dict[int, Counter] = {}
    for doc_id, text, _ in docs:
        toks = [t for t in _re.split(r"[^\w]+", (text or "").lower()) if t]
        if len(toks) >= 2:
            feat[doc_id] = Counter(
                bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])
            )
    c_raw: Counter = Counter()
    c_t: Counter = Counter()
    for doc_id, _, src in docs:
        for b, c in feat.get(doc_id, {}).items():
            c_raw[b] += c
            if src == "target":
                c_t[b] += c
    r_tot, t_tot = sum(c_raw.values()), sum(c_t.values())
    lr = {
        b: math.log((c_t[b] + K) / (t_tot + K * B))
        - math.log((c_raw[b] + K) / (r_tot + K * B))
        for b in c_raw
    }
    want = {
        doc_id: (
            sum(cs.values()),
            round(sum(c * lr[b] for b, c in cs.items()), 6),
        )
        for doc_id, cs in feat.items()
    }
    assert got == want


# --- r13: spanning-pair subset invariants on random corpora -----------------

# Word-ish texts with a dup-amplifying twist: a small base vocabulary of
# sentences, each repeated 1-4 times — random exact-dup cliques, the
# structure max_pairs_per_group exists for. Plain random text almost
# never collides; explicit repetition forces the collapse path.
_SENTENCES = st.lists(
    st.text(alphabet="abcdefg ", min_size=5, max_size=40),
    min_size=2,
    max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(sentences=_SENTENCES, reps=st.lists(st.integers(1, 4), min_size=2, max_size=6))
def test_minhash_spanning_subset_invariants_hold_on_random_corpora(
    spark, sentences, reps
):
    """For ANY corpus: capped output ⊆ full output with identical
    values; identical connected components when the cap covers every
    clique; per-clique within-pairs bounded by the cap."""
    from rt_bigdata_spark.operators.dedup import minhash_lsh_pairs

    rows = []
    did = 0
    for s, r in zip(sentences, reps):
        for _ in range(r):
            did += 1
            rows.append((did, s))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    kw = dict(num_hashes=16, bands=4, threshold=0.3)
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, **kw).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, max_pairs_per_group=100, **kw).collect()
    }
    for k, v in capped.items():
        assert k in full and full[k] == v, k

    def comps(pairs):
        parent = {n: n for n in range(1, did + 1)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        groups = {}
        for n in range(1, did + 1):
            groups.setdefault(find(n), set()).add(n)
        return {frozenset(g) for g in groups.values()}

    assert comps(set(capped)) == comps(set(full))
