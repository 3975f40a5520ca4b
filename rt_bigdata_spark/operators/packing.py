"""Sequence packing operators for training-data pipelines: fixed-size
document chunking, deterministic per-source token budgeting, and the
sharded-export publish step.

Beyond-reference operators extending the SURVEY.md §7.2 step-9 layer.

- ``chunk_documents``: split each document into fixed-token-count
  chunks (the pre-tokenizer packing step every LM data pipeline runs).
  Pure map-side transform+explode — no shuffle, scales with the scan.
- ``token_budget_sample``: fill a per-source token budget with a
  DETERMINISTIC document order (md5 of content, doc_id tie-break), the
  "take the first N tokens of this source" mixing primitive. Content-
  keyed order means re-runs and budget raises produce nested subsets
  (same property as sampling.weighted_sample). One window per source:
  partition-by-source sort — the oracle-checkable reference semantics.
- ``token_budget_threshold``: the 100 TB form of the same operator —
  bucketized-priority prune (two passes) so the exact sort only ever
  sees ~budget tokens per source instead of the whole source; output
  is bit-identical to ``token_budget_sample`` (prefix property), so it
  shares the same oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rt_bigdata_spark.functions.text_fns import tokenize
from rt_bigdata_spark.operators.scale import ensure_parallelism


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per ``chunk_tokens``-token chunk: (doc_id, chunk_id,
    n_tokens, chunk_text). The final chunk carries the remainder;
    zero-token documents produce no chunks (nothing to pack)."""
    k = chunk_tokens
    df = ensure_parallelism(df)
    toked = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("t")).filter(F.size("t") > 0)
    n_chunks = F.floor((F.size("t") + F.lit(k - 1)) / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.least(F.lit(k), F.size("t") - i * k).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice("t", i * k + 1, k)).alias("chunk_text"),
        ),
    )
    return toked.select(id_col, F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_id", "c.n_tokens", "c.chunk_text"
    )


def chunk_documents_overlap(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping (strided) chunking — the RAG-ingest variant of
    ``chunk_documents``: windows start every ``stride`` tokens and span
    ``chunk_tokens``, so consecutive chunks share
    ``chunk_tokens − stride`` tokens of context and no retrieval-time
    sentence is ever split without a copy that keeps its neighborhood.

    Chunk count: ``J = 1`` when the doc fits in one window, else
    ``ceil((len − chunk_tokens) / stride) + 1`` — the last window
    starts at ``(J−1)·stride`` and carries the remainder (always > the
    overlap, by construction of the ceiling). Every token position is
    covered by ≥1 chunk (property-tested), and chunk j's first
    ``chunk_tokens − stride`` tokens equal chunk j−1's last ones
    whenever j−1 was full.

    Same scale shape as ``chunk_documents``: pure map-side
    transform+explode, no shuffle; the fan-out is len/stride rows per
    doc (chunk/stride ≈ 1.33× the tokens at the 64/48 default).
    ``stride`` must be in (0, chunk_tokens]; stride == chunk_tokens
    degenerates to the non-overlapping chunker."""
    if not 0 < stride <= chunk_tokens:
        raise ValueError(f"stride must be in (0, chunk_tokens]; got {stride}")
    k, s = chunk_tokens, stride
    df = ensure_parallelism(df)
    toked = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("t")).filter(F.size("t") > 0)
    L = F.size("t")
    n_chunks = (
        F.when(L <= F.lit(k), F.lit(1))
        .otherwise(F.floor((L - F.lit(k) + F.lit(s - 1)) / F.lit(s)).cast("int") + F.lit(1))
        .cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.struct(
            j.cast("long").alias("chunk_id"),
            F.least(F.lit(k), L - j * s).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice("t", j * s + 1, k)).alias("chunk_text"),
        ),
    )
    return toked.select(id_col, F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_id", "c.n_tokens", "c.chunk_text"
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    key_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Publish step: write the corpus as ``n_shards`` deterministic
    shards (parquet, ``partitionBy("shard")``) plus a manifest at
    ``<path>/_manifest`` (underscore prefix — invisible to a plain
    parquet read of the data, the same convention as ``_centroids``).

    Shard = first 8 hex digits of md5(content key) mod n_shards:
    content-keyed, so re-exports of the same corpus land every doc in
    the same shard regardless of partitioning/cluster layout (stable
    dataloader resume points), and the md5 uniformity keeps shards
    balanced without a sort or repartition-by-range pass. A null
    content key hashes as the empty string — deterministic, never
    dropped, never a null partition directory. The write repartitions
    on the shard key first, so each shard's rows land in one task and
    the export produces one file per shard (without it every input
    task opens a file per shard it sees — input_partitions × n_shards
    small files). Hash partitioning may co-locate two shard values in
    one task (task balance is approximate, the file-per-shard output
    is not affected); a corpus too large for a shard per task should
    raise ``n_shards``, which is the dataloader-facing granularity
    anyway. Raises if the input already has a ``shard`` column — the
    export owns that name, and silently overwriting a caller's column
    would corrupt their data.

    The manifest (docs + token counts per shard — what a dataloader
    reads to plan epochs) is computed FROM THE WRITTEN FILES, not by
    re-evaluating the input lineage: a nondeterministic upstream
    (limit/sample) could otherwise describe different rows than were
    written. Returns the manifest DataFrame (also persisted at
    ``<path>/_manifest``).
    """
    if "shard" in df.columns:
        raise ValueError(
            "export_shards: input already has a 'shard' column — rename it; "
            "the export writes its own shard key under that name"
        )
    shard = (
        F.conv(F.substring(F.md5(F.coalesce(F.col(key_col), F.lit(""))), 1, 8), 16, 10).cast(
            "long"
        )
        % n_shards
    ).cast("int")
    out = df.withColumn("shard", shard).repartition(n_shards, F.col("shard"))
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    written = df.sparkSession.read.parquet(path)
    manifest = (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(tokenize(F.coalesce(F.col(key_col), F.lit(""))))).cast("long").alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest


def concat_pack(
    df: DataFrame,
    seq_len: int = 256,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Causal-LM concatenation packing map: per group, documents are
    concatenated in deterministic md5-priority order into one token
    stream that is cut into fixed ``seq_len`` training sequences;
    each document's span is reported as the half-open sequence-index
    range it occupies: ``first_seq = floor((cum - n) / L)``,
    ``last_seq = floor((cum - 1) / L)`` where ``cum`` is the running
    token total through the document. This is the packing bookkeeping a
    dataloader needs to map sequences back to documents (attribution,
    contamination audits, resume points) without re-tokenizing.

    Zero-token documents occupy no tokens and emit no row (consistent
    with ``chunk_documents``). Closed-form (no sequential scan): the
    span indices are pure functions of the cumulative sum, so the
    whole operator is window + map-side arithmetic.

    Scale shape: the running token sum comes from the bucket-decomposed
    kernel (``scale.bucketed_group_order``) — per-(group, bucket)
    partial sums + broadcast offsets instead of one task sorting and
    summing a whole (possibly dominant) source. Bit-identical cumsums,
    unchanged oracle. Size ``n_buckets`` ≳ dominant-group rows /
    target-task rows (the default 256 caps per-group sort parallelism
    at 256 tasks; a 10^11-doc source wants 4096+).
    """
    from rt_bigdata_spark.operators.scale import bucketed_group_order

    df = ensure_parallelism(df)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokenize(txt)).cast("long").alias("n_tokens"),
        F.md5(txt).alias("_pr"),
    ).filter(F.col("n_tokens") > 0)
    packed = bucketed_group_order(
        scored, "_pr", id_col, group_col=group_col, n_buckets=n_buckets,
        sum_col="n_tokens", cumsum_col="_cum",
    )
    cum = F.col("_cum")
    return packed.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / seq_len).cast("long").alias("first_seq"),
        F.floor((cum - 1) / seq_len).cast("long").alias("last_seq"),
    )


def _sequence_spans(ranked: DataFrame, seq_len: int) -> DataFrame:
    """The pack explode, isolated so its ROW BOUND is testable: each
    ranked doc (ids, n, _cum) emits one row per training sequence it
    touches — ``floor((cum−1)/L) − floor((cum−n)/L) + 1 ≤ n/L + 1``
    rows — so the frame holds at most ``total_tokens/L + n_docs``
    rows overall, NEVER quadratic in anything
    (tests/test_packing.py pins the bound; a future edit that
    accidentally sequences over token positions instead of sequence
    ids would blow it immediately)."""
    off = F.col("_cum") - F.col("n")
    return ranked.select(
        "ids",
        "n",
        off.alias("_off"),
        F.explode(
            F.sequence(
                F.floor(off / seq_len), F.floor((F.col("_cum") - 1) / seq_len)
            )
        ).alias("seq_id"),
    )


def pack_token_sequences(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    seq_len: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "7",
    chunk: int = 64,
    n_buckets: int = 256,
    enc: "list[tuple[str, list[str]]] | None" = None,
) -> DataFrame:
    """The pipeline's terminal artifact, materialized: documents →
    BPE token ids (``text_analysis._bpe_token_ids``) → concatenated in
    deterministic md5(seed:id) order → cut into fixed-``seq_len``
    training sequences, each emitted as ``(seq_id, n_tokens,
    token_ids)`` with token_ids the space-joined id run. Where
    ``concat_pack`` reports the per-DOC bookkeeping (which sequence
    range a document occupies), this produces the SEQUENCES themselves
    — what export_shards would write for the dataloader. The final
    sequence is partial (n_tokens < seq_len); all others are exactly
    seq_len.

    Scale shape: document offsets come from the bucket-decomposed
    kernel (``scale.bucketed_group_order`` cumsum — never a global
    single-task sort); each document then explodes to one row per
    sequence it touches (a doc spans ceil(n/L)+1 sequences at most, so
    the explode is O(total_tokens / L) rows overall) carrying an
    F.slice of its id array; sequences reassemble with ONE groupBy on
    seq_id — max-cardinality key, and each group holds ≤ seq_len
    pieces, so the per-group sort is bounded by L regardless of corpus
    size. Deterministic end to end: same seed + merge table ⇒ the same
    byte-identical sequences on any cluster (the resumable-dataloader
    property ``global_shuffle`` documents, carried through to model
    input)."""
    from rt_bigdata_spark.operators.scale import bucketed_group_order
    from rt_bigdata_spark.operators.text_analysis import _bpe_token_ids

    ids_df = _bpe_token_ids(df, merges, text_col, id_col, chunk, enc).select(
        F.col(id_col),
        F.col("_all_ids").alias("ids"),
        F.size("_all_ids").cast("long").alias("n"),
    )
    pr = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    # Persist the per-doc (id, ids, n, _pr) frame: bucketed_group_order
    # consumes it TWICE (the bucket-count offsets aggregate and the
    # offsets join-back), and without the cache each branch re-plans
    # the WHOLE tokenize→encode→per-doc-agg pipeline — the r15 plan
    # dump shows the token-ids subtree duplicated (8 parquet scans for
    # a single-table query) and the r15 driver bench had this as the
    # 2nd-heaviest line (4.7 s) with 21 jobs. Caller-owned lifetime,
    # same CacheManager-bounded contract as minhash_lsh_pairs'
    # signature persist (one entry per canonical plan per session). At
    # warehouse scale this stage is the materialize-or-recompute
    # trade: the ids table is the job's own output-sized intermediate,
    # exactly what a real packing run writes to disk between passes.
    b = ids_df.filter(F.col("n") > 0).withColumn("_pr", pr).persist()
    ranked = bucketed_group_order(
        b, "_pr", id_col, n_buckets=n_buckets, sum_col="n", cumsum_col="_cum"
    )
    spans = _sequence_spans(ranked, seq_len)
    start = F.greatest(F.lit(0), F.col("seq_id") * seq_len - F.col("_off"))
    end = F.least(F.col("n"), (F.col("seq_id") + 1) * seq_len - F.col("_off"))
    piece = F.slice(F.col("ids"), (start + 1).cast("int"), (end - start).cast("int"))
    return (
        spans.select(F.col("seq_id").cast("long").alias("seq_id"), "_off", piece.alias("_piece"))
        .groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_off").alias("o"), F.col("_piece").alias("p")))
                    ),
                    lambda x: x.p,
                )
            ).alias("_ids")
        )
        .select(
            "seq_id",
            F.size("_ids").cast("long").alias("n_tokens"),
            F.array_join(F.transform("_ids", lambda x: x.cast("string")), " ").alias(
                "token_ids"
            ),
        )
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents per group, in deterministic md5-priority order,
    while the group's running token total has not yet reached
    ``budget_tokens``: a document is kept iff the tokens BEFORE it are
    under budget (so the budget may be exceeded by at most one
    document — the standard greedy fill). Output: (doc_id, group,
    n_tokens, cum_tokens)."""
    df = ensure_parallelism(df)
    # NULL text coalesces to '' BEFORE md5/tokenize: md5(NULL) is NULL,
    # and NULL priorities sort NULLS FIRST in Spark but NULLS LAST in
    # most SQL engines (divergent kept sets), while a NULL n_tokens
    # would poison the running sum. '' gives a deterministic priority
    # and 0 tokens on every engine.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokenize(txt)).cast("long").alias("n_tokens"),
        F.md5(txt).alias("pr"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("pr", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget_tokens)
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )


def token_budget_threshold(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """The 100 TB form of ``token_budget_sample`` — bit-identical output,
    O(budget) sort instead of an O(group) sort.

    ``token_budget_sample`` windows over EVERY document of a group: with
    one giant source that is a single-task total sort — the latent scale
    cliff documented in this module's header since r4. This variant
    exploits the fact that the kept set is a PREFIX of the per-group
    (md5-priority, doc_id) order (keep iff tokens-before < budget, and
    tokens-before is monotone along the order), so pruning can happen
    BEFORE the sort:

    1. Bucketize the priority: ``bucket = floor(u * n_buckets)`` where
       ``u`` is the first 15 hex digits of the md5 as a uniform [0,1)
       double. Lexicographic order of the full 32-hex md5 equals numeric
       order (fixed length, '0'-'9' < 'a'-'f' in ASCII), so the bucket
       is monotone along the sort order.
    2. Aggregate token sums per (group, bucket) — one hash agg,
       ≤ ``n_buckets`` rows per group — and compute each bucket's
       tokens-before via a window over that TINY table. A bucket can
       contain kept docs iff its tokens-before < budget; every later
       bucket is entirely past the budget, every earlier one is
       entirely kept.
    3. Broadcast-join the surviving-bucket verdicts back and run the
       EXACT window only over candidate docs: the candidate set holds
       ~budget tokens plus one bucket's width (~1/n_buckets of the
       group), so the sort is bounded by the budget, not the corpus.
       Because the kept set is a prefix, the running sum over the
       candidate subset equals the running sum over the full group for
       every emitted row — the outputs are identical, which is why this
       variant shares ``token_budget_sample``'s oracle verbatim.

    Zero-token docs (priority still defined via md5('')) ride along
    unchanged: they never advance the running sum and drop out once the
    budget is reached, exactly as in the exact form.

    The bucketize→offset→prune→exact-window mechanics live in
    ``scale.bucketed_group_order`` (``prune_sum=budget_tokens``), whose
    struct group key also keeps NULL-group rows flowing through the
    broadcast join exactly as ``token_budget_sample``'s
    ``Window.partitionBy`` keeps its NULL partition.
    """
    from rt_bigdata_spark.operators.scale import bucketed_group_order

    df = ensure_parallelism(df)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(tokenize(txt)).cast("long").alias("n_tokens"),
        F.md5(txt).alias("_pr"),
    )
    out = bucketed_group_order(
        scored,
        "_pr",
        id_col,
        group_col=group_col,
        n_buckets=n_buckets,
        sum_col="n_tokens",
        cumsum_col="cum_tokens",
        prune_sum=budget_tokens,
    )
    return (
        out.filter(F.col("cum_tokens") - F.col("n_tokens") < budget_tokens)
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )
