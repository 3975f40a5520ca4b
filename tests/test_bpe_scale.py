"""r7 verdict item 2: bpe_encode_counts must survive real merge-table
sizes. Before the fix the encoder built ONE nested F.replace per merge
— an expression tree len(merges) deep that hits Catalyst's
analysis/codegen cliff long before data is touched at a 32k-merge
vocab. The fix applies the chain to the distinct-token vocab frame in
chunk-sized slices with localCheckpoint between slices (bpe_merges'
own truncation pattern), capping expression depth at `chunk`.

Covered here:
- train -> encode round trip at n_merges=256 (32x the registered
  query's 8, the old practical ceiling), verified against a pure-
  Python greedy BPE mirror on every doc;
- slice-boundary invariance: chunked encoding is bit-identical across
  chunk sizes (greedy order preserved across slice cuts).
"""

import re

import pytest

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow



def _python_bpe_len(tok: str, merges: list[tuple[str, str]]) -> int:
    """Greedy non-overlapping left-to-right application, one pass per
    merge in training order — the semantics of the double-space
    literal-replace trick (scan resumes after each replacement)."""
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
    return len(syms)


def _toks(t: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]


def _synth_docs(n_docs: int = 60, words_per_doc: int = 6):
    """Deterministic pseudo-random corpus over a 5-letter alphabet:
    long words over few letters → rich evolving pair space, so 256
    merges are learnable. LCG, no RNG module (reproducible)."""
    alpha = "abcde"
    state = 1234567
    docs = []
    for d in range(n_docs):
        words = []
        for _ in range(words_per_doc):
            state = (state * 1103515245 + 12345) % (2**31)
            length = 8 + state % 7
            chars = []
            for _ in range(length):
                state = (state * 1103515245 + 12345) % (2**31)
                chars.append(alpha[state % len(alpha)])
            words.append("".join(chars))
        docs.append((d, " ".join(words)))
    return docs


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_synth_docs(), "doc_id: long, text: string")
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


def test_bpe_encode_256_merges_round_trip(spark, corpus):
    """Train 256 merges (32x the registered query's 8) and encode the
    corpus with the default chunking — the whole pipeline must run
    (depth cliff gone) and every doc's BPE token count must equal the
    pure-Python greedy mirror's."""
    from rt_bigdata_spark.operators.text_analysis import bpe_encode_counts, bpe_merges

    mt = bpe_merges(corpus, n_merges=256).orderBy("step").collect()
    assert len(mt) == 256  # the corpus is rich enough: no early dry-out
    merges = [(r.left, r.right) for r in mt]

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_counts(corpus, merges).collect()
    }
    expected = {}
    for doc_id, text in corpus.select("doc_id", "text").collect():
        ts = _toks(text)
        expected[doc_id] = (len(ts), sum(_python_bpe_len(t, merges) for t in ts))
    assert got == expected
    # merges actually compressed: far fewer symbols than characters
    n_chars = sum(len(t) for _, text in corpus.collect() for t in _toks(text))
    assert sum(v[1] for v in got.values()) < 0.8 * n_chars


def test_bpe_encode_chunk_boundary_invariance(spark, corpus):
    """Greedy application order must be preserved across slice cuts:
    encoding with chunk=5 (many slices, awkward boundaries), chunk=64
    (default) and one unchunked slice must be bit-identical."""
    from rt_bigdata_spark.operators.text_analysis import bpe_encode_counts, bpe_merges

    merges = [
        (r.left, r.right)
        for r in bpe_merges(corpus, n_merges=40).orderBy("step").collect()
    ]
    assert len(merges) == 40

    def run(chunk):
        return {
            tuple(r)
            for r in bpe_encode_counts(corpus, merges, chunk=chunk).collect()
        }

    base = run(10**9)  # single slice: the pre-fix unchunked shape
    assert run(5) == base
    assert run(64) == base


# ---------------------------------------------------------------------------
# r12 verdict item 2: EXTERNAL known-good fixture. Everything above
# validates the encoder against a python mirror of the SAME
# training-order semantics — self-consistent, so a merge-ORDER or
# tie-break divergence would pass both sides. This pins bpe_encode on
# a hand-written public-format (GPT-2 merges.txt layout) table with a
# precomputed expected tokenization, and cross-checks against an
# INDEPENDENT rank-priority reference encoder (the algorithm of the
# public gpt-2 encoder.py bpe(): repeatedly merge the lowest-rank
# bigram present) — equivalent to training-order application exactly
# on well-formed tables, which is what real merges.txt files are.
# ---------------------------------------------------------------------------

import os

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "gpt2_merges_small.txt")

# hand-verified against the 13-merge fixture: ids are codepoint for
# base chars, 255+step for merge products (lower=263, lowest=264,
# newer=268, wider=267, low=257, new=260, lo=256, er=258)
_EXPECTED = {
    1: (6, 6, "263 264 268 267 257 260"),   # every word fully merges
    2: (2, 5, "257 108 121 260 115"),       # partial: low+l+y, new+s
    3: (2, 5, "256 256 119 258 116"),       # greedy LTR: lolo -> lo lo
}
_DOCS = [
    (1, "lower lowest newer wider low new"),
    (2, "lowly news"),
    (3, "lolo wert"),
]


def _gpt2_rank_priority_bpe(tok: str, ranks: dict) -> list[str]:
    """Independent reference: the public GPT-2 encoder's bpe() loop —
    merge the lowest-rank bigram present, all its non-overlapping
    occurrences left-to-right, repeat until no table bigram remains."""
    word = list(tok)
    while len(word) > 1:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        bigram = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if bigram not in ranks:
            break
        first, second = bigram
        out, i = [], 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                out.append(first + second)
                i += 2
            else:
                out.append(word[i])
            i += 1 if out[-1] != first + second else 0
        word = out
    return word


def test_gpt2_merges_loader_parses_public_format():
    from rt_bigdata_spark.operators.text_analysis import load_gpt2_merges

    merges = load_gpt2_merges(_FIXTURE)
    assert len(merges) == 13
    assert merges[0] == ("l", "o")
    assert merges[7] == ("low", "er")
    assert merges[-1] == ("new", "er")


def test_bpe_encode_reproduces_external_fixture_byte_for_byte(spark):
    from rt_bigdata_spark.operators.text_analysis import (
        bpe_encode_tokens,
        load_gpt2_merges,
    )

    merges = load_gpt2_merges(_FIXTURE)
    df = spark.createDataFrame(_DOCS, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.token_ids)
        for r in bpe_encode_tokens(df, merges).collect()
    }
    assert got == _EXPECTED


def test_training_order_equals_rank_priority_on_wellformed_table(spark):
    """The class of bug this fixture exists to catch: the engine's
    training-order sequential application must agree with the GPT-2
    rank-priority algorithm on every token of the corpus (guaranteed
    for well-formed tables; a divergence means the engine's merge
    order or greedy scan drifted)."""
    from rt_bigdata_spark.operators.text_analysis import (
        bpe_encode_tokens,
        load_gpt2_merges,
    )

    merges = load_gpt2_merges(_FIXTURE)
    ranks = {pair: i for i, pair in enumerate(merges)}
    sym_id: dict[str, int] = {}
    for s, (left, right) in enumerate(merges, start=1):
        sym_id.setdefault(left + right, 255 + s)

    df = spark.createDataFrame(_DOCS, "doc_id: long, text: string")
    got = {r.doc_id: r.token_ids for r in bpe_encode_tokens(df, merges).collect()}
    for doc_id, text in _DOCS:
        expect_ids: list[int] = []
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            for sym in _gpt2_rank_priority_bpe(tok, ranks):
                expect_ids.append(sym_id.get(sym, ord(sym) if len(sym) == 1 else -1))
        assert got[doc_id] == " ".join(map(str, expect_ids)), doc_id


def test_tokenizer_fertility_on_external_fixture(spark):
    """Fertility audit semantics pinned on the hand-verified fixture:
    doc 1's words all merge to single tokens (fertility 1.0); 'lowly'
    (3 tokens / 1 word) and 'news' (2/1) give source-level ratios that
    are exact-integer arithmetic. chars_per_token counts token chars,
    so both engines agree without whitespace conventions."""
    from rt_bigdata_spark.operators.text_analysis import (
        load_gpt2_merges,
        tokenizer_fertility,
    )

    merges = load_gpt2_merges(_FIXTURE)
    df = spark.createDataFrame(
        [(1, "fully", "lower lowest newer wider low new"),
         (2, "partial", "lowly news")],
        "doc_id: long, source: string, text: string",
    )
    out = {r.source: r for r in tokenizer_fertility(df, merges).collect()}
    f = out["fully"]
    assert (f.n_words, f.n_bpe_tokens, f.n_chars) == (6, 6, 27)
    assert f.fertility == 1.0
    assert f.chars_per_token == 27 / 6
    p = out["partial"]
    # lowly -> low+l+y (3), news -> new+s (2)
    assert (p.n_words, p.n_bpe_tokens, p.n_chars) == (2, 5, 9)
    assert p.fertility == 2.5
    assert p.chars_per_token == 9 / 5


def test_incremental_trainer_equals_recount_form(spark):
    """The pair-count-delta trainer (bpe_merges_incremental — the
    SCALE.md r14 watch-item closure) must produce the IDENTICAL merge
    table as the re-count form: same argmax per step, same
    (cnt DESC, l, r) tie-break, same counts — on corpora exercising
    overlapping runs (aaa), repeated merges touching earlier outputs
    (ab+ab chains), multi-occurrence rows, and ties."""
    from rt_bigdata_spark.operators.text_analysis import (
        bpe_merges,
        bpe_merges_incremental,
    )

    corpora = [
        ["aaa aaab abab", "banana bandana", "aaa aaa"],
        ["xy xy xyz zyx", "mississippi", "abcabcabc"],
        ["tie atie btie", "tie tie", "eit eit eit"],  # tie-break pressure
    ]
    for texts in corpora:
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
        full = [tuple(r) for r in bpe_merges(df, n_merges=12).orderBy("step").collect()]
        inc = [tuple(r) for r in bpe_merges_incremental(df, n_merges=12).orderBy("step").collect()]
        assert inc == full, (texts, inc, full)


def test_driver_local_loop_equals_distributed_loop(spark, monkeypatch):
    """bpe_merges runs its merge loop DRIVER-LOCALLY when the vocab fits
    under _BPE_DRIVER_VOCAB_CAP (r15: the distributed loop cost ~2
    scheduled jobs per merge step over kilobytes). The two paths must
    be bit-identical: same pair counts, same (cnt DESC, l, r) tie-break
    (Python code-point order ≡ Spark UTF8 binary order), same greedy
    non-overlapping left-to-right replace (``aaa`` → ``aa a``,
    ``ab ab`` merges both). Forced onto the same corpora as the
    incremental-trainer equality test plus the overlap/tie cases."""
    from rt_bigdata_spark.operators import text_analysis as ta

    corpora = [
        ["aaa aaab abab", "banana bandana", "aaa aaa"],
        ["xy xy xyz zyx", "mississippi", "abcabcabc"],
        ["tie atie btie", "tie tie", "eit eit eit"],
        ["a", "", None, "bb ccc dddd"],  # degenerate rows
    ]
    for texts in corpora:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
        )
        monkeypatch.setattr(ta, "_BPE_DRIVER_VOCAB_CAP", 10**9)
        local = [tuple(r) for r in ta.bpe_merges(df, n_merges=12).orderBy("step").collect()]
        monkeypatch.setattr(ta, "_BPE_DRIVER_VOCAB_CAP", 0)
        dist = [tuple(r) for r in ta.bpe_merges(df, n_merges=12).orderBy("step").collect()]
        assert local == dist, (texts, local, dist)


def test_driver_local_loop_equals_distributed_on_real_docs(spark, monkeypatch):
    """Same equality on the public sf0.001 documents at the registered
    spec's n_merges=8 — the corpus whose merge table the driver
    hash-checks."""
    from rt_bigdata_spark.operators import text_analysis as ta
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    monkeypatch.setattr(ta, "_BPE_DRIVER_VOCAB_CAP", 10**9)
    local = [tuple(r) for r in ta.bpe_merges(docs, n_merges=8).orderBy("step").collect()]
    monkeypatch.setattr(ta, "_BPE_DRIVER_VOCAB_CAP", 0)
    dist = [tuple(r) for r in ta.bpe_merges(docs, n_merges=8).orderBy("step").collect()]
    assert local == dist


def test_incremental_trainer_equals_recount_on_real_docs(spark):
    """Same equality on the public sf0.001 documents at the registered
    spec's n_merges=8 — the corpus whose merge table the driver
    hash-checks."""
    from rt_bigdata_spark.operators.text_analysis import (
        bpe_merges,
        bpe_merges_incremental,
    )
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = [tuple(r) for r in bpe_merges(docs, n_merges=8).orderBy("step").collect()]
    inc = [tuple(r) for r in bpe_merges_incremental(docs, n_merges=8).orderBy("step").collect()]
    assert inc == full


def test_trained_encoder_equals_distributed_encode(spark):
    """r16: ``bpe_trained_encoder`` returns the full local model
    (merge list + per-token final symbol state); feeding its ``enc``
    into the encode family must be bit-identical to the distributed
    vocab-chain path with the same merges — same counts, same ids at
    every position, same packed sequences, same fertility ratios.
    The id mapping stays in Spark expressions (``F.ascii``) on both
    paths, so there is no Python/JVM divergence surface."""
    from rt_bigdata_spark.operators.packing import pack_token_sequences
    from rt_bigdata_spark.operators.text_analysis import (
        bpe_encode_counts,
        bpe_encode_tokens,
        bpe_trained_encoder,
        tokenizer_fertility,
    )

    corpora = [
        ["aaa aaab abab", "banana bandana", "aaa aaa"],
        ["tie atie btie", "tie tie", "eit eit eit"],
        ["a", "", None, "bb ccc dddd"],  # degenerate rows
    ]
    for texts in corpora:
        df = spark.createDataFrame(
            [(i, t, "s%d" % (i % 2)) for i, t in enumerate(texts)],
            "doc_id: long, text: string, source: string",
        )
        model = bpe_trained_encoder(df, n_merges=12)
        assert model is not None
        merges, enc = model

        def rows(out):
            return sorted(tuple(r) for r in out.collect())

        assert rows(bpe_encode_counts(df, merges, enc=enc)) == rows(
            bpe_encode_counts(df, merges)
        ), texts
        assert rows(bpe_encode_tokens(df, merges, enc=enc)) == rows(
            bpe_encode_tokens(df, merges)
        ), texts
        assert rows(pack_token_sequences(df, merges, seq_len=7, enc=enc)) == rows(
            pack_token_sequences(df, merges, seq_len=7)
        ), texts
        assert rows(tokenizer_fertility(df, merges, enc=enc)) == rows(
            tokenizer_fertility(df, merges)
        ), texts


def test_trained_encoder_merges_equal_bpe_merges_on_real_docs(spark):
    """``bpe_trained_encoder``'s merge list must equal ``bpe_merges``'s
    table on the public sf0.001 documents at the registered n_merges=8
    (both drive the same local loop; this pins the probe-collect vocab
    wiring), and its enc path must reproduce the registered encode
    output."""
    from rt_bigdata_spark.operators.text_analysis import (
        bpe_encode_counts,
        bpe_merges,
        bpe_trained_encoder,
    )
    from rt_bigdata_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    model = bpe_trained_encoder(docs, n_merges=8)
    assert model is not None
    merges, enc = model
    table = [
        (r["left"], r["right"])
        for r in bpe_merges(docs, n_merges=8).orderBy("step").collect()
    ]
    assert merges == table
    with_enc = sorted(
        tuple(r) for r in bpe_encode_counts(docs, merges, enc=enc).collect()
    )
    without = sorted(tuple(r) for r in bpe_encode_counts(docs, merges).collect())
    assert with_enc == without
