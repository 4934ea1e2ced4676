"""Batched multi-query top-k (query/batch.py): rank-identical to the
per-query scorer, over single segments, tombstoned chains, and sessions."""

from __future__ import annotations

import pytest

from solr_indexing_spark.query.batch import topk_batch
from solr_indexing_spark.query.bmw import QuerySession, topk

from tests.test_bm25 import QUERIES, oracle  # noqa: F401
from tests.test_index_build import index_dir  # noqa: F401


def _rows(df):
    return [
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    ]


def _expected(spark, index_dir, queries, k):  # noqa: F811
    want = []
    for qid in sorted(queries):
        for r in topk(spark, index_dir, queries[qid], k=k).collect():
            want.append((qid, r["doc_id"], round(r["score"], 9)))
    return want


def test_batch_matches_per_query(spark, index_dir):  # noqa: F811
    """One batched job == Q independent topk calls, rows and order,
    including OOV-bearing and fully-OOV queries."""
    queries = {i: q for i, q in enumerate(QUERIES)}
    got = _rows(topk_batch(spark, index_dir, queries, k=10))
    assert got == _expected(spark, index_dir, queries, 10)


def test_batch_string_query_ids(spark, index_dir):  # noqa: F811
    queries = {"alpha": "zanpelmek", "beta": "belhax galcorsunrex"}
    got = topk_batch(spark, index_dir, queries, k=5)
    assert dict(got.dtypes)["query_id"] == "string"
    by_qid = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], []).append(r["doc_id"])
    for qid, q in queries.items():
        assert by_qid[qid] == [
            r["doc_id"] for r in topk(spark, index_dir, q, k=5).collect()
        ]


def test_batch_pre_expanded_term_lists(spark, index_dir):  # noqa: F811
    """Term-list inputs (the prefix/wildcard shape) bypass tokenization."""
    queries = {1: ["zanpelmek", "belhax"], 2: ["galcorsunrex"]}
    got = _rows(topk_batch(spark, index_dir, queries, k=3))
    want = _expected(spark, index_dir, queries, 3)
    assert got == want and len(got) > 0


def test_batch_all_oov_and_empty(spark, index_dir):  # noqa: F811
    assert topk_batch(spark, index_dir, {1: "nosuchtermatall", 2: ""}).collect() == []
    assert topk_batch(spark, index_dir, {}).collect() == []


def test_batch_shard_invariance(spark, index_dir):  # noqa: F811
    queries = {i: q for i, q in enumerate(QUERIES[:5])}
    want = _rows(topk_batch(spark, index_dir, queries, k=10))
    for rng in (64, 100, 1 << 17):
        assert _rows(topk_batch(spark, index_dir, queries, k=10, shard_range=rng)) == want


def test_session_batch_uses_term_cache(spark, index_dir):  # noqa: F811
    """Session batch shares the per-term cache with the single-query path:
    after one batched call, a repeat must not touch the dictionary."""
    qs = QuerySession(spark, index_dir)
    try:
        queries = {1: "zanpelmek nosuchterm", 2: "belhax galcorsunrex"}
        first = _rows(qs.topk_batch(queries, k=10))
        assert first == _expected(spark, index_dir, queries, 10)
        assert qs._term_meta.get("nosuchterm", "absent") is None
        qs.dictionary = None  # sever: cached repeats must never reach it
        assert _rows(qs.topk_batch(queries, k=10)) == first
        # and the single-query path reuses entries the batch populated
        single = [
            (r["doc_id"], round(r["score"], 9))
            for r in qs.topk("belhax galcorsunrex", k=10).collect()
        ]
        assert single == [(d, s) for (_, d, s) in first if _ == 2]
    finally:
        qs.dictionary = spark.read.parquet(f"{index_dir}/dictionary")
        qs.close()


def test_chain_batch_with_tombstones(spark, pages_df, tmp_path_factory):
    """Batched top-k over a base+delta chain skips tombstoned docs and
    matches per-query SegmentsSession results exactly."""
    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.indexing.incremental import (
        SegmentsSession,
        reindex_changed,
    )

    root = tmp_path_factory.mktemp("batch_chain")
    base = str(root / "seg0")
    delta = str(root / "seg1")
    build_index(spark, pages_df, base, num_buckets=4)

    changed = pages_df.limit(40).withColumn(
        "text",
        pages_df["text"].substr(1, 50),
    )
    reindex_changed(spark, base, changed, delta)

    ss = SegmentsSession(spark, [base, delta])
    try:
        queries = {i: q for i, q in enumerate(QUERIES[:6])}
        got = _rows(ss.topk_batch(queries, k=10))
        want = []
        for qid in sorted(queries):
            for r in ss.topk(queries[qid], k=10).collect():
                want.append((qid, r["doc_id"], round(r["score"], 9)))
        assert got == want and len(got) > 0
        # tombstoned base docs must not appear under their OLD doc ids:
        # every returned id must be live (delta ids start past the base)
        dead = set()
        tomb = spark.read.parquet(f"{base}/tombstones")
        dead = {r["doc_id"] for r in tomb.collect()}
        assert not any(d in dead for (_, d, _s) in got)
    finally:
        ss.close()


def test_chain_batch_large_churn_tombstoneframe(spark, pages_df, tmp_path_factory):
    """Force the TombstoneFrame (cogroup) path by lowering the broadcast
    threshold: batch results must match the frozenset path."""
    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.indexing.incremental import reindex_changed
    from solr_indexing_spark.query import bmw as bmw_mod
    from solr_indexing_spark.query.batch import _topk_batch_impl
    from solr_indexing_spark.query.bmw import load_tombstones

    root = tmp_path_factory.mktemp("batch_churn")
    base = str(root / "seg0")
    delta = str(root / "seg1")
    build_index(spark, pages_df, base, num_buckets=4)
    changed = pages_df.limit(60).withColumn(
        "text", pages_df["text"].substr(1, 40)
    )
    reindex_changed(spark, base, changed, delta)

    from solr_indexing_spark.indexing.build import read_manifest

    man = read_manifest(base)
    dictionary = spark.read.parquet(f"{base}/dictionary")
    postings = spark.read.parquet(f"{base}/postings")
    queries = {i: q for i, q in enumerate(QUERIES[:4])}

    small = load_tombstones(spark, base)
    assert isinstance(small, frozenset) and small
    want = _rows(
        _topk_batch_impl(
            spark, man, dictionary, postings, queries, 10, None, dead=small
        )
    )
    big = load_tombstones(spark, base, broadcast_threshold=1)
    assert isinstance(big, bmw_mod.TombstoneFrame)
    got = _rows(
        _topk_batch_impl(
            spark, man, dictionary, postings, queries, 10, None, dead=big
        )
    )
    assert got == want


def test_batch_boosted_matches_per_query(spark, index_dir):  # noqa: F811
    """topk_batch_boosted == Q independent topk_boosted calls (same
    over-fetch window, same additive prior, same tie-breaks)."""
    from pyspark.sql import functions as F

    from solr_indexing_spark.query.batch import topk_batch_boosted
    from solr_indexing_spark.query.bmw import topk_boosted

    docs = spark.read.parquet(f"{index_dir}/docs")
    boosts = docs.select(
        "doc_id", ((F.col("doc_id") % 7) * F.lit(0.4)).alias("boost")
    )
    queries = {i: q for i, q in enumerate(QUERIES[:5])}
    got = _rows(
        topk_batch_boosted(spark, index_dir, queries, boosts, k=10)
    )
    want = []
    for qid in sorted(queries):
        for r in topk_boosted(
            spark, index_dir, queries[qid], boosts, k=10
        ).collect():
            want.append((qid, r["doc_id"], round(r["score"], 9)))
    assert got == want and len(got) > 0


def test_batch_semi_join_term_pruning(spark, index_dir, monkeypatch):  # noqa: F811
    """Above TERM_ISIN_MAX distinct terms the postings/dictionary pruning
    switches from an IN-list to a broadcast semi-join — results must be
    identical on both paths."""
    from solr_indexing_spark.query import batch as batch_mod

    queries = {i: q for i, q in enumerate(QUERIES[:6])}
    want = _rows(topk_batch(spark, index_dir, queries, k=10))
    monkeypatch.setattr(batch_mod, "TERM_ISIN_MAX", 1)
    got = _rows(topk_batch(spark, index_dir, queries, k=10))
    assert got == want and len(got) > 0
