"""Sequence-packing operators: fixed-token chunking and deterministic
per-source token budgeting."""

from __future__ import annotations

import pytest

from rt_bigdata_spark.operators.packing import chunk_documents, token_budget_sample


def test_chunk_documents_exact_split(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens → 4+4+2 at k=4
        (2, "a b c"),  # 3 tokens → one short chunk
        (3, ""),  # 0 tokens → no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, chunk_tokens=4).collect()
    )
    assert out == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w4 w5 w6 w7"),
        (1, 2, 2, "w8 w9"),
        (2, 0, 3, "a b c"),
    ]


def test_chunk_reassembly_is_lossless(spark, sf_dir):
    """Concatenating a doc's chunks in chunk_id order must reproduce
    its full token stream — packing cannot drop or duplicate tokens."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.functions.text_fns import tokenize
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    chunks = chunk_documents(docs, chunk_tokens=7)
    rebuilt = {
        r.doc_id: r.joined
        for r in chunks.groupBy("doc_id")
        .agg(F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))).getField("chunk_text")).alias("joined"))
        .collect()
    }
    expected = {
        r.doc_id: r.joined
        for r in docs.select("doc_id", F.concat_ws(" ", tokenize(F.col("text"))).alias("joined")).collect()
        if r.joined
    }
    assert rebuilt == expected


def test_token_budget_fill_and_nesting(spark):
    rows = [(i, "s", " ".join(f"t{i}w{j}" for j in range(10))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")

    out30 = {r.doc_id for r in token_budget_sample(df, 30, group_col="source").collect()}
    out60 = {r.doc_id for r in token_budget_sample(df, 60, group_col="source").collect()}
    assert len(out30) == 3  # 10 tokens/doc: exactly 3 docs fill a 30-token budget
    assert len(out60) == 6
    assert out30 <= out60  # nested-subset property of the content-keyed order

    full = token_budget_sample(df, 10_000, group_col="source").collect()
    assert {r.doc_id for r in full} == set(range(10))
    assert max(r.cum_tokens for r in full) == 100


def test_export_shards_roundtrip_and_determinism(spark, sf_dir, tmp_path):
    import hashlib


    from rt_bigdata_spark.operators.packing import export_shards
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_shards(docs, p1, n_shards=8)
    export_shards(docs.repartition(7), p2, n_shards=8)  # different layout, same corpus

    r1 = spark.read.parquet(p1)
    # lossless: every doc present exactly once, shard matches python md5
    rows = r1.select("doc_id", "text", "shard").collect()
    assert len(rows) == 100
    for r in rows:
        exp = int(hashlib.md5(r.text.encode()).hexdigest()[:8], 16) % 8
        assert r.shard == exp
    # determinism across physical layouts
    a = {(r.doc_id, r.shard) for r in rows}
    b = {(r.doc_id, r.shard) for r in spark.read.parquet(p2).select("doc_id", "shard").collect()}
    assert a == b
    # manifest agrees with the data and is invisible to the data read
    man = {r.shard: r.n_docs for r in spark.read.parquet(f"{p1}/_manifest").collect()}
    got = {r.shard: r["count"] for r in r1.groupBy("shard").count().collect()}
    assert man == got
    assert "n_tokens" not in r1.columns


def test_export_shards_null_key_and_file_layout(spark, tmp_path):
    import glob
    import hashlib

    from rt_bigdata_spark.operators.packing import export_shards

    rows = [(1, None), (2, "some real text here"), (3, "other content entirely")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    path = str(tmp_path / "shards")
    man = export_shards(df, path, n_shards=4)

    back = spark.read.parquet(path)
    got = {r.doc_id: r.shard for r in back.collect()}
    assert len(got) == 3  # null-text doc neither dropped nor in a null partition
    assert got[1] == int(hashlib.md5(b"").hexdigest()[:8], 16) % 4
    assert man.agg({"n_docs": "sum"}).first()[0] == 3

    # one data file per non-empty shard (repartition before partitionBy)
    for d in glob.glob(f"{path}/shard=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_token_budget_null_text_is_deterministic_zero_tokens(spark):
    """NULL text coalesces to '' before md5/tokenize: 0 tokens (never a
    NULL poisoning the running sum) and a deterministic priority — the
    Spark/oracle NULLS FIRST/LAST divergence cannot arise."""
    rows = [(1, "s", "a b c"), (2, "s", None), (3, "s", "d e f")]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    out = {r.doc_id: r for r in token_budget_sample(df, 100, group_col="source").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].n_tokens == 0
    assert all(r.cum_tokens is not None for r in out.values())


def test_export_shards_rejects_existing_shard_column(spark):
    import pytest as _pytest

    from rt_bigdata_spark.operators.packing import export_shards

    df = spark.createDataFrame([(1, "x", 0)], "doc_id: long, text: string, shard: int")
    with _pytest.raises(ValueError, match="shard"):
        export_shards(df, "/tmp/never_written")


def test_concat_pack_spans_are_contiguous_and_cover_the_stream(spark):
    """Per source: doc spans tile the concatenated token stream in
    order — each doc's first_seq starts at (or inside) the sequence the
    previous doc ended in, and total tokens equal the stream length."""
    from rt_bigdata_spark.operators.packing import concat_pack

    rows = [(i, "s", " ".join(f"w{i}x{j}" for j in range(7))) for i in range(20)]  # 7 tokens/doc
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    out = concat_pack(df, seq_len=16).collect()
    assert len(out) == 20
    # reconstruct the order used for packing (md5 priority) and check spans
    by_first = sorted(out, key=lambda r: (r.first_seq, r.last_seq))
    cum = 0
    for r in by_first:
        assert r.first_seq == cum // 16
        cum += r.n_tokens
        assert r.last_seq == (cum - 1) // 16
    assert cum == 140  # 20 docs x 7 tokens: nothing dropped or duplicated


def test_concat_pack_drops_zero_token_docs(spark):
    from rt_bigdata_spark.operators.packing import concat_pack

    rows = [(1, "s", "a b c"), (2, "s", ""), (3, "s", None)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    out = concat_pack(df, seq_len=2).collect()
    assert {r.doc_id for r in out} == {1}
    assert out[0].first_seq == 0 and out[0].last_seq == 1  # 3 tokens at L=2


def test_token_budget_threshold_matches_exact_form(spark, sf_dir):
    """The two-pass bucketized-prune form must be bit-identical to the
    exact window form on real data (the prefix property proof) — this is
    the subset-equivalence contract its shared oracle relies on."""
    from rt_bigdata_spark.operators.packing import token_budget_threshold
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {tuple(r) for r in token_budget_sample(docs, 2000).collect()}
    fast = {tuple(r) for r in token_budget_threshold(docs, 2000).collect()}
    assert fast == exact and len(exact) > 0


@pytest.mark.slow
def test_token_budget_threshold_boundary_buckets(spark):
    """Stress the bucket boundary: with n_buckets=2 most groups have a
    single surviving bucket whose docs straddle the budget, and with a
    budget larger than any group every doc must survive the prune."""
    from rt_bigdata_spark.operators.packing import token_budget_threshold

    rows = [(i, f"s{i % 3}", " ".join(f"t{i}w{j}" for j in range(1 + i % 7))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    for budget in (1, 10, 37, 10_000):
        exact = {tuple(r) for r in token_budget_sample(df, budget).collect()}
        for nb in (1, 2, 8, 1024):
            fast = {tuple(r) for r in token_budget_threshold(df, budget, n_buckets=nb).collect()}
            assert fast == exact, f"budget={budget} n_buckets={nb}"


@pytest.mark.slow
def test_token_budget_threshold_zero_token_docs(spark):
    """NULL/empty text docs (0 tokens) are kept while the budget is
    open and dropped after, identically in both forms."""
    from rt_bigdata_spark.operators.packing import token_budget_threshold

    rows = [(0, "s", None), (1, "s", ""), (2, "s", "a b c"), (3, "s", "d e f g")]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    for budget in (1, 4, 100):
        exact = {tuple(r) for r in token_budget_sample(df, budget).collect()}
        fast = {tuple(r) for r in token_budget_threshold(df, budget).collect()}
        assert fast == exact


@pytest.mark.slow
def test_token_budget_threshold_null_group_rows_survive(spark):
    """ADVICE r6: the bucket-prune join must be null-safe on the group
    key — NULL-group rows form their own budget pool in the exact form
    (Window.partitionBy keeps a NULL partition) and must do the same in
    the threshold form, not vanish in an inner equi-join."""
    from rt_bigdata_spark.operators.packing import token_budget_threshold

    rows = [
        (0, None, "a b c d"),
        (1, None, "e f g h i"),
        (2, "s", "j k l"),
        (3, None, None),
        (4, "s", "m n o p q r"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    for budget in (1, 5, 100):
        exact = {tuple(r) for r in token_budget_sample(df, budget).collect()}
        fast = {tuple(r) for r in token_budget_threshold(df, budget).collect()}
        assert fast == exact, f"budget={budget}"
        assert any(r[1] is None for r in exact)  # NULL pool genuinely exercised


def test_concat_pack_null_group_rows_survive(spark):
    """Same null-safety contract for the packing cumsum: NULL-source
    docs pack into their own stream."""
    from rt_bigdata_spark.operators.packing import concat_pack

    rows = [(0, None, "a b c"), (1, None, "d e f g"), (2, "s", "h i")]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    out = concat_pack(df, seq_len=4).collect()
    assert {r.doc_id for r in out} == {0, 1, 2}
    null_stream = sorted((r for r in out if r.source is None), key=lambda r: r.first_seq)
    assert sum(r.n_tokens for r in null_stream) == 7  # both NULL docs, one stream


def test_sequence_spans_row_bound_is_pinned(spark):
    """r8 verdict item 6: pack_token_sequences is the most expensive
    headline query, and its explode is the part a careless edit could
    silently quadratic (e.g. sequencing over token POSITIONS instead
    of sequence ids). Pin the documented bound on the isolated explode
    (packing._sequence_spans): per doc exactly
    floor((cum-1)/L) - floor((cum-n)/L) + 1 rows <= n/L + 1, so
    <= total_tokens/L + n_docs overall — exercised over adversarial
    sizes (1 token, L-1, L, L+1, multi-L, huge)."""
    import pyspark.sql.functions as F

    from rt_bigdata_spark.operators.packing import _sequence_spans

    L = 128
    sizes = [1, 2, 64, L - 1, L, L + 1, 5 * L, 37 * L + 13, 3, L]
    rows, cum = [], 0
    for i, n in enumerate(sizes):
        cum += n
        rows.append((list(range(n)), n, cum))
    ranked = spark.createDataFrame(rows, "ids: array<int>, n: long, _cum: long")
    spans = _sequence_spans(ranked, L)
    total = sum(sizes)
    got = spans.count()
    assert got <= total / L + len(sizes), (got, total / L + len(sizes))
    # exact closed form per doc, not just the bound
    expected = 0
    cum = 0
    for n in sizes:
        off = cum
        cum += n
        expected += (cum - 1) // L - off // L + 1
    assert got == expected
    # and the spans tile the token stream exactly: per seq_id the
    # piece lengths sum to L (last sequence partial)
    start = F.greatest(F.lit(0), F.col("seq_id") * L - F.col("_off"))
    end = F.least(F.col("n"), (F.col("seq_id") + 1) * L - F.col("_off"))
    per_seq = (
        spans.select("seq_id", (end - start).alias("plen"))
        .groupBy("seq_id")
        .agg(F.sum("plen").alias("tok"))
        .collect()
    )
    last = max(r.seq_id for r in per_seq)
    for r in per_seq:
        assert r.tok == (L if r.seq_id < last else total - last * L)


def test_chunk_overlap_exact_windows(spark):
    from rt_bigdata_spark.operators.packing import chunk_documents_overlap

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # k=4, s=2 → starts 0,2,4,6
        (2, "a b c"),  # fits one window
        (3, ""),  # 0 tokens → no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_documents_overlap(df, chunk_tokens=4, stride=2).collect()
    )
    assert out == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w2 w3 w4 w5"),
        (1, 2, 4, "w4 w5 w6 w7"),
        (1, 3, 4, "w6 w7 w8 w9"),
        (2, 0, 3, "a b c"),
    ]


def test_chunk_overlap_covers_every_token_and_shares_context(spark):
    """Every token position lands in >=1 chunk; consecutive chunks of a
    long doc share exactly chunk_tokens - stride tokens while the
    earlier chunk is full; stride == chunk degenerates to
    chunk_documents."""
    from rt_bigdata_spark.operators.packing import (
        chunk_documents,
        chunk_documents_overlap,
    )

    k, s = 8, 5
    for n_tok in (1, 7, 8, 9, 13, 20, 21, 40):
        toks = [f"t{i}" for i in range(n_tok)]
        df = spark.createDataFrame([(1, " ".join(toks))], "doc_id: long, text: string")
        rows = sorted(
            (r.chunk_id, r.chunk_text.split(" "))
            for r in chunk_documents_overlap(df, chunk_tokens=k, stride=s).collect()
        )
        covered = set()
        for cid, ctoks in rows:
            start = cid * s
            assert ctoks == toks[start : start + k]
            covered.update(range(start, start + len(ctoks)))
        assert covered == set(range(n_tok)), n_tok
        for (c1, t1), (c2, t2) in zip(rows, rows[1:]):
            if len(t1) == k:
                assert t1[s:] == t2[: k - s]
        # no chunk is a pure suffix duplicate: the last chunk extends
        # strictly past the previous chunk's end whenever it exists
        if len(rows) > 1:
            assert (len(rows) - 1) * s + len(rows[-1][1]) == n_tok

    same = chunk_documents_overlap(
        spark.createDataFrame([(1, " ".join(f"x{i}" for i in range(23)))], "doc_id: long, text: string"),
        chunk_tokens=6,
        stride=6,
    )
    base = chunk_documents(
        spark.createDataFrame([(1, " ".join(f"x{i}" for i in range(23)))], "doc_id: long, text: string"),
        chunk_tokens=6,
    )
    assert sorted(map(tuple, same.collect())) == sorted(map(tuple, base.collect()))


def test_chunk_overlap_rejects_bad_stride(spark):
    from rt_bigdata_spark.operators.packing import chunk_documents_overlap

    df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    for bad in (0, -1, 9):
        with pytest.raises(ValueError):
            chunk_documents_overlap(df, chunk_tokens=8, stride=bad)
