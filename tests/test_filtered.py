"""Filtered BM25 (the Solr/Lucene filter query ``fq``): exact top-k
restricted to an allow set, corpus-global statistics.

The reference's Solr serving side exposes fq on every request; here the
filter is applied inside the scoring kernels (a filtered-out doc never
occupies a heap slot), so a filter matching 10 docs out of the corpus
still returns all 10 scoring docs — no over-fetch window.
"""

from __future__ import annotations

import math
import shutil
from collections import defaultdict

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from solr_indexing_spark.query.bmw import (
    _INF,
    _TermCursor,
    AllowFrame,
    QuerySession,
    TombstoneFrame,
    bmw_shard_topk,
    make_allow,
    shard_topk_auto,
    taat_shard_topk,
    topk,
    topk_filtered,
)

from tests.test_bm25 import QUERIES, oracle  # noqa: F401
from tests.test_bmw_kernel import _blocks, _mk_corpus
from tests.test_index_build import index_dir  # noqa: F401


def _expected_filtered(oracle, query, allow, k=10):  # noqa: F811
    scores = oracle.score_all(query)
    return sorted(
        ((d, s) for d, s in scores.items() if d in allow),
        key=lambda kv: (-kv[1], kv[0]),
    )[:k]


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_rows_equal(got, want, tol=1e-6):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < tol


# ---------------------------------------------------------------------------
# kernel level: WAND, TAAT and the auto-switch all honor allow (+ dead)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_docs=st.integers(5, 300),
    vocab=st.integers(2, 20),
    block_size=st.sampled_from([4, 16, 128]),
    k=st.sampled_from([1, 5, 10]),
    allow_mod=st.sampled_from([1, 2, 3, 7]),
    n_dead=st.integers(0, 10),
)
@example(
    # exact score tie between two docs whose contributions arrive in
    # opposite term orders — pins the reduceat-vs-bincount float-order
    # divergence in the TAAT sort-merge path (fixed in bmw.py)
    seed=199, n_docs=199, vocab=8, block_size=4, k=5, allow_mod=3, n_dead=0,
)
def test_kernels_honor_allow(
    seed, n_docs, vocab, block_size, k, allow_mod, n_dead
):
    """All three kernels agree with the dict oracle on filtered top-k,
    with and without a dead set stacked on top."""
    rng = np.random.default_rng(seed)
    postings, doclen = _mk_corpus(rng, n_docs, vocab)
    avgdl = sum(doclen.values()) / n_docs
    q_terms = sorted(
        {f"t{int(rng.integers(0, vocab))}" for _ in range(3)}
    )
    allow = frozenset(d for d in range(n_docs) if d % allow_mod == 0)
    dead = frozenset(
        int(rng.integers(0, n_docs)) for _ in range(n_dead)
    )

    # oracle: full scores → drop dead → keep allowed → top-k
    scores: dict[int, float] = {}
    for t in q_terms:
        plist = postings.get(t)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for d, tf in plist.items():
            dl = doclen[d]
            scores[d] = scores.get(d, 0.0) + idf * tf * 2.2 / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
            )
    want = sorted(
        (
            (d, s)
            for d, s in scores.items()
            if d in allow and d not in dead
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:k]

    def mk_cursors():
        out = []
        for t in q_terms:
            plist = postings.get(t)
            if not plist:
                continue
            df = len(plist)
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            blks = _blocks(plist, doclen, avgdl, block_size)
            c = _TermCursor(
                idf, idf * max(b[6] for b in blks), blks, 0, _INF
            )
            if c.cur < _INF:
                out.append(c)
        return out

    got_wand = bmw_shard_topk(mk_cursors(), k, avgdl, dead=dead, allow=allow)
    # TAAT on both accumulation paths: bounded span → bincount,
    # unbounded → stable sort-merge
    got_taat = taat_shard_topk(
        mk_cursors(), k, avgdl, dead=dead, allow=allow, lo=0, hi=512
    )
    got_taat_sm = taat_shard_topk(mk_cursors(), k, avgdl, dead=dead, allow=allow)
    got_auto = shard_topk_auto(mk_cursors(), k, avgdl, dead=dead, allow=allow)
    for got in (got_wand, got_taat, got_taat_sm, got_auto):
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9


# ---------------------------------------------------------------------------
# end-to-end over a built segment
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("query", QUERIES[:6])
def test_topk_filtered_matches_oracle(spark, index_dir, oracle, query):  # noqa: F811
    allow = frozenset(range(0, 500, 2))
    want = _expected_filtered(oracle, query, allow)
    got = _rows(topk_filtered(spark, index_dir, query, allow, k=10))
    _assert_rows_equal(got, want)
    assert all(d % 2 == 0 for d, _ in got)


def test_topk_filtered_allow_dataframe(spark, index_dir, oracle):  # noqa: F811
    """A DataFrame allow set (the caller's metadata predicate) gives the
    same rows as the equivalent id set."""
    q = "corvim fulful rivarrexful"
    allow_ids = frozenset(range(0, 500, 3))
    allow_df = spark.createDataFrame(
        [(int(d),) for d in sorted(allow_ids)], "doc_id long"
    )
    _assert_rows_equal(
        _rows(topk_filtered(spark, index_dir, q, allow_df, k=10)),
        _expected_filtered(oracle, q, allow_ids),
    )


def test_topk_filtered_frame_path(spark, index_dir, oracle):  # noqa: F811
    """Past the broadcast threshold the allow set must stay executor-side
    (AllowFrame, cogrouped by shard) and produce identical rows."""
    q = "belhax galcorsunrex"
    allow_ids = frozenset(range(0, 500, 3))
    allow_df = spark.createDataFrame(
        [(int(d),) for d in sorted(allow_ids)], "doc_id long"
    )
    af = make_allow(spark, allow_df, broadcast_threshold=0)
    assert isinstance(af, AllowFrame)
    sess = QuerySession(spark, index_dir)
    try:
        got = _rows(sess.topk(q, k=10, allow=af))
    finally:
        sess.close()
    _assert_rows_equal(got, _expected_filtered(oracle, q, allow_ids))


def test_topk_filtered_with_tombstones(spark, index_dir, oracle, tmp_path):  # noqa: F811
    """fq composes with tombstones: a dead doc is excluded even when the
    filter allows it — on the closure path AND the dual-frame cogroup
    path (both sets forced executor-side)."""
    from solr_indexing_spark.indexing.incremental import append_tombstones
    from solr_indexing_spark.query.bmw import _topk_impl, read_manifest

    q = "corvim fulful rivarrexful"
    allow_ids = frozenset(range(0, 500))
    base = _rows(topk(spark, index_dir, q, k=10))
    assert base, "query must match something for this test to bite"
    kill = base[0][0]

    seg = str(tmp_path / "seg_tomb")
    shutil.copytree(index_dir, seg)
    docs = spark.read.parquet(f"{seg}/docs")
    append_tombstones(
        spark, seg, docs.filter(docs.doc_id == kill).select("doc_id", "doclen")
    )
    want = [
        (d, s)
        for d, s in _expected_filtered(oracle, q, allow_ids, k=11)
        if d != kill
    ][:10]

    got = _rows(topk_filtered(spark, seg, q, allow_ids, k=10))
    _assert_rows_equal(got, want)

    # dual-frame path: dead AND allow both as cogrouped frames
    man = read_manifest(seg)
    dead_f = TombstoneFrame(
        spark.read.parquet(f"{seg}/tombstones").select("doc_id").distinct()
    )
    allow_f = AllowFrame(
        spark.createDataFrame(
            [(int(d),) for d in sorted(allow_ids)], "doc_id long"
        )
    )
    got2 = _rows(
        _topk_impl(
            spark,
            man,
            spark.read.parquet(f"{seg}/dictionary"),
            spark.read.parquet(f"{seg}/postings"),
            q,
            10,
            None,
            dead=dead_f,
            allow=allow_f,
        )
    )
    _assert_rows_equal(got2, want)


def test_topk_filtered_empty_and_full_allow(spark, index_dir, oracle):  # noqa: F811
    q = "corvim fulful rivarrexful"
    assert topk_filtered(spark, index_dir, q, frozenset(), k=10).count() == 0
    # allow = everything ≡ unfiltered
    _assert_rows_equal(
        _rows(topk_filtered(spark, index_dir, q, frozenset(range(500)), k=10)),
        _rows(topk(spark, index_dir, q, k=10)),
    )


def test_batch_filtered_matches_per_query(spark, index_dir, oracle):  # noqa: F811
    """topk_batch(allow=...) reproduces per-query topk_filtered rows for
    every query — on the closure path and the AllowFrame path."""
    from solr_indexing_spark.query.batch import topk_batch

    qs = {1: "corvim fulful rivarrexful", 2: "belhax galcorsunrex", 3: "ta ri"}
    allow_ids = frozenset(range(0, 500, 2))
    allow_df = spark.createDataFrame(
        [(int(d),) for d in sorted(allow_ids)], "doc_id long"
    )

    def per_query():
        out = {}
        for qid, q in qs.items():
            out[qid] = _rows(topk_filtered(spark, index_dir, q, allow_ids, k=5))
        return out

    want = per_query()
    for allow_arg in (allow_ids, make_allow(spark, allow_df, broadcast_threshold=0)):
        rows = topk_batch(spark, index_dir, qs, k=5, allow=allow_arg).collect()
        got: dict = defaultdict(list)
        for r in rows:
            got[r["query_id"]].append((r["doc_id"], r["score"]))
        assert set(got) == {qid for qid in qs if want[qid]}
        for qid in got:
            _assert_rows_equal(got[qid], want[qid])
