"""M5 gate: hierarchical merge ≡ from-scratch build; crash-resume identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.indexing.build import build_index, read_manifest
from solr_indexing_spark.indexing.merge import hierarchical_merge, merge_segments
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.synth import gen_pages, write_pages_parquet


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    """One 600-doc corpus split into 3 disjoint page sets → 3 segments.

    Splitting by url-rank keeps each segment's docID range contiguous and
    disjoint (merge precondition).
    """
    root = tmp_path_factory.mktemp("merge")
    pdf = gen_pages(600, seed=11)
    ordered = pdf.sort_values("url").reset_index(drop=True)
    seg_dirs = []
    base = 0
    for i, lo in enumerate(range(0, 600, 200)):
        part = ordered.iloc[lo : lo + 200]
        ppath = str(root / f"pages{i}.parquet")
        from solr_indexing_spark.synth import write_pandas_pages

        write_pandas_pages(part, ppath)
        seg = str(root / f"seg{i}")
        build_index(
            spark,
            spark.read.parquet(ppath),
            seg,
            num_buckets=4,
            block_size=32,
            base_doc_id=base,
        )
        base += len(part)
        seg_dirs.append(seg)
    return str(root), pdf, seg_dirs


def _index_snapshot(spark, d: str):
    """Logical content of a segment, order-normalized."""
    posts = sorted(
        (
            (r["term"], r["block_id"], r["first_doc_id"], r["last_doc_id"],
             r["n_docs"], bytes(r["doc_gaps"]), bytes(r["tfs"]),
             bytes(r["doclens"]), round(r["block_max_tf_norm"], 12))
            for r in spark.read.parquet(f"{d}/postings").collect()
        )
    )
    stats = spark.read.parquet(f"{d}/stats").collect()[0].asDict()
    return posts, stats


def test_merge_equals_full_build(spark, split_corpus, tmp_path_factory):
    root, pdf, seg_dirs = split_corpus
    merged = str(tmp_path_factory.mktemp("m1") / "merged")
    merge_segments(spark, seg_dirs, merged)

    full = str(tmp_path_factory.mktemp("m2") / "full")
    ppath = f"{root}/pages_all.parquet"
    from solr_indexing_spark.synth import write_pandas_pages

    write_pandas_pages(pdf, ppath)
    build_index(spark, spark.read.parquet(ppath), full, num_buckets=4, block_size=32)

    m_posts, m_stats = _index_snapshot(spark, merged)
    f_posts, f_stats = _index_snapshot(spark, full)
    assert m_stats["n_docs"] == f_stats["n_docs"]
    assert abs(m_stats["avgdl"] - f_stats["avgdl"]) < 1e-9
    # posting content: per-term decoded lists must agree even if block
    # boundaries differ (merge re-blocks per doc-range shard)
    from collections import defaultdict

    from solr_indexing_spark.codec import delta_decode, vbyte_decode

    def flat(posts):
        acc = defaultdict(list)
        for term, _bid, first, _last, n, gaps, tfs, dls, _bm in posts:
            ids = delta_decode(first, gaps, n)
            tf = vbyte_decode(tfs)
            dl = vbyte_decode(dls)
            acc[term].extend(zip(map(int, ids), map(int, tf), map(int, dl)))
        return {t: sorted(v) for t, v in acc.items()}

    assert flat(m_posts) == flat(f_posts)


def test_merged_queries_match_oracle(spark, split_corpus, tmp_path_factory):
    root, pdf, seg_dirs = split_corpus
    merged = str(tmp_path_factory.mktemp("m3") / "merged")
    merge_segments(spark, seg_dirs, merged)
    oracle = OracleIndex(pdf)
    for q in ["zanpelmek", "belhax corvim", "salt0000123 fulful"]:
        want = oracle.topk(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in topk(spark, merged, q, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6


def test_hierarchical_merge_resume(spark, split_corpus, tmp_path_factory):
    """Crash between merges → re-run resumes and output is identical."""
    _root, _pdf, seg_dirs = split_corpus

    out_a = str(tmp_path_factory.mktemp("res") / "a")
    final_a = hierarchical_merge(spark, seg_dirs, out_a, fanout=2)

    out_b = str(tmp_path_factory.mktemp("res") / "b")
    with pytest.raises(RuntimeError, match="injected failure"):
        hierarchical_merge(spark, seg_dirs, out_b, fanout=2, fail_after=1)
    final_b = hierarchical_merge(spark, seg_dirs, out_b, fanout=2)

    a_posts, a_stats = _index_snapshot(spark, final_a)
    b_posts, b_stats = _index_snapshot(spark, final_b)
    assert a_posts == b_posts
    assert a_stats == b_stats
    # lineage rows present for all three stages
    lin = spark.read.parquet(f"{final_b}/lineage")
    assert {r["stage"] for r in lin.select("stage").distinct().collect()} == {
        "docs", "postings", "merge",
    }


def test_merge_rejects_mixed_positional(spark, tmp_path):
    """Merging a positional with a non-positional segment is rejected up
    front (manifest flags) instead of crashing deep in the reblocker."""
    from solr_indexing_spark.synth import gen_pages, write_pandas_pages

    pdf = gen_pages(80, seed=5)
    ordered = pdf.sort_values("url").reset_index(drop=True)
    a, b = ordered.iloc[:40], ordered.iloc[40:]
    write_pandas_pages(a, str(tmp_path / "a.parquet"))
    write_pandas_pages(b.reset_index(drop=True), str(tmp_path / "b.parquet"))
    build_index(
        spark, spark.read.parquet(str(tmp_path / "a.parquet")),
        str(tmp_path / "segpos"), num_buckets=2, store_positions=True,
    )
    build_index(
        spark, spark.read.parquet(str(tmp_path / "b.parquet")),
        str(tmp_path / "segnopos"), num_buckets=2, base_doc_id=40,
        store_positions=False,
    )
    with pytest.raises(ValueError, match="positional"):
        merge_segments(
            spark,
            [str(tmp_path / "segpos"), str(tmp_path / "segnopos")],
            str(tmp_path / "out"),
        )
