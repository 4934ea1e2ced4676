"""M3 gate: block-max WAND over compressed segments == brute == oracle."""

from __future__ import annotations

import pytest

from solr_indexing_spark.indexing.build import build_index
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.query.oracle import OracleIndex

from tests.test_bm25 import QUERIES, oracle  # noqa: F401
from tests.test_index_build import index_dir  # noqa: F401


@pytest.fixture(scope="session")
def small_block_index(spark, pages_df, tmp_path_factory):
    """block_size=16 → many blocks per term → real skip/block-max pruning."""
    out = str(tmp_path_factory.mktemp("index_sb") / "seg0")
    build_index(spark, pages_df, out, num_buckets=4, block_size=16)
    return out


@pytest.mark.parametrize("query", QUERIES)
def test_bmw_matches_oracle(spark, index_dir, oracle, query):  # noqa: F811
    want = oracle.topk(query, k=10)
    got = [(r["doc_id"], r["score"]) for r in topk(spark, index_dir, query, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch: {query!r}"
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


@pytest.mark.parametrize("query", QUERIES[:5])
@pytest.mark.parametrize("shard_range", [64, 100, 1 << 17])
def test_bmw_shard_invariance(spark, small_block_index, oracle, query, shard_range):  # noqa: F811
    """Results identical for any doc-range sharding (incl. straddling blocks)."""
    want = oracle.topk(query, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in topk(spark, small_block_index, query, k=10, shard_range=shard_range).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_bmw_k_variants(spark, index_dir, oracle):  # noqa: F811
    q = "corvim fulful rivarrexful"
    for k in (1, 3, 25, 100):
        want = oracle.topk(q, k=k)
        got = [(r["doc_id"], r["score"]) for r in topk(spark, index_dir, q, k=k).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], f"k={k}"


def test_query_session_term_cache(spark, index_dir, oracle):  # noqa: F811
    """QuerySession caches per-term stats driver-side (segments are
    immutable): a repeated query must not touch the dictionary at all,
    must rank identically to the one-shot path, and OOV terms get
    negative entries so they never re-query."""
    from solr_indexing_spark.query.bmw import QuerySession, topk

    q = "zanpelmek belhax nosuchterm"
    want = [(r["doc_id"], round(r["score"], 9))
            for r in topk(spark, index_dir, q, k=10).collect()]

    qs = QuerySession(spark, index_dir)
    first = [(r["doc_id"], round(r["score"], 9))
             for r in qs.topk(q, k=10).collect()]
    assert first == want
    assert qs._term_meta.get("nosuchterm", "absent") is None  # negative
    assert qs._term_meta["zanpelmek"] is not None

    # sever the dictionary: a cached repeat must never reach it
    qs.dictionary = None
    again = [(r["doc_id"], round(r["score"], 9))
             for r in qs.topk(q, k=10).collect()]
    assert again == want

    # an all-OOV cached query short-circuits to empty without the dict
    assert qs.topk("nosuchterm", k=5).collect() == []


def test_auto_shard_range_scales_with_doc_span(spark):
    """Default (auto) shard width: floor of 2^17 on small corpora, then
    grows with the doc-id SPAN so the block fan-out stays ~4 tasks/core —
    a 2^40-id corpus must not produce millions of doc-range shards."""
    from solr_indexing_spark.query.bmw import MIN_SHARD_RANGE, _auto_shard_range

    small = {"doc_id_base": 0, "doc_id_hi": 4_999, "n_docs": 5_000}
    assert _auto_shard_range(small, spark) == MIN_SHARD_RANGE

    big = {"doc_id_base": 0, "doc_id_hi": (1 << 40) - 1, "n_docs": 10**9}
    width = _auto_shard_range(big, spark)
    par = spark.sparkContext.defaultParallelism
    assert width >= (1 << 40) // (8 * par)   # ≲8 shard tasks per core
    assert width & (width - 1) == 0          # power of two
    # missing span fields (legacy manifest) fall back to n_docs
    legacy = {"n_docs": 1 << 30}
    assert _auto_shard_range(legacy, spark) >= (1 << 30) // (8 * par)
