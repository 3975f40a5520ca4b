"""Streaming IVF index maintenance (streaming/sinks.py): the
stream-built index must answer probes exactly like the batch-built
one, read only probed partitions, survive compaction, and refuse a
mismatched centroid model."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rt_bigdata_spark.operators.similarity import _ivf_centroids, ivf_topk
from rt_bigdata_spark.sources.tables import load_table
from rt_bigdata_spark.streaming.sinks import (
    compact_dedup_store,
    ivf_index_maintenance_sink,
    ivf_topk_streamed,
)
from tests.conftest import SF_DIR

# Heavy tier (r10 verdict item 6): excluded from the <5 min inner
# loop (`pytest -m "not slow"`); the full suite still runs once per
# round and in any timing-isolated window.
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_index_equals_batch_ivf(spark, corpus, tmp_path):
    """Two micro-batches into the sink ≡ one inline ivf_topk over the
    union corpus under the SAME centroid model (assignment is
    write-time but deterministic, so incremental build changes
    nothing)."""
    state = str(tmp_path / "ivf")
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16)
    sink = ivf_index_maintenance_sink(state, cents)
    sink(corpus.filter(F.col("vec_id") < 150), 0)
    sink(corpus.filter(F.col("vec_id") >= 150), 1)
    queries = corpus.filter(F.col("vec_id") < 3)
    got = ivf_topk_streamed(spark, state, queries, cents, k=7)
    want = ivf_topk(corpus, queries, k=7, centroids=cents)
    assert _rows(got) == _rows(want)

    # replayed batch id with identical rows: fenced skip, results stable
    sink(corpus.filter(F.col("vec_id") < 150), 0)
    assert _rows(ivf_topk_streamed(spark, state, queries, cents, k=7)) == _rows(want)

    # doc-level redelivery inside a NEW batch id: anti-joined, no dupes
    sink(corpus.filter(F.col("vec_id") < 10), 2)
    assert _rows(ivf_topk_streamed(spark, state, queries, cents, k=7)) == _rows(want)

    # compaction folds deltas into a base without changing answers
    res = compact_dedup_store(spark, state, keep_last=1)
    assert res is not None
    assert _rows(ivf_topk_streamed(spark, state, queries, cents, k=7)) == _rows(want)


def test_streamed_probe_prunes_partitions(spark, corpus, tmp_path):
    """The probe scan must carry PartitionFilters on pc — the store is
    read only at the probed cells, the property that keeps per-query
    cost ~n_probe/n_centroids of the corpus."""
    state = str(tmp_path / "ivf")
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16)
    ivf_index_maintenance_sink(state, cents)(corpus, 0)
    queries = corpus.filter(F.col("vec_id") < 2)
    plan = ivf_topk_streamed(spark, state, queries, cents, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pc filter must actually be inside PartitionFilters, not a
    # post-scan Filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "pc" in pf


def test_model_mismatch_raises_on_sink_and_probe(spark, corpus, tmp_path):
    state = str(tmp_path / "ivf")
    cents = _ivf_centroids(corpus, "vec_id", "embedding", 16)
    other = _ivf_centroids(corpus, "vec_id", "embedding", 8)
    ivf_index_maintenance_sink(state, cents)(corpus.filter(F.col("vec_id") < 50), 0)
    with pytest.raises(RuntimeError, match="parameters"):
        ivf_index_maintenance_sink(state, other)(corpus.filter(F.col("vec_id") >= 50), 1)
    queries = corpus.filter(F.col("vec_id") < 2)
    with pytest.raises(RuntimeError, match="model"):
        ivf_topk_streamed(spark, state, queries, other, k=5)
    # the original model keeps working
    assert ivf_topk_streamed(spark, state, queries, cents, k=5).count() > 0
