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
