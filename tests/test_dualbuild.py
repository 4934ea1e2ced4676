"""Single-pass dual-analyzer build (build.py:build_index_dual) — the
reference posts every batch to BOTH IndexName and IndexNameStopword
(solrIndexCreation.ts:877-880); one job must produce two segments that
are INDISTINGUISHABLE from independently built twins.

The corpus here deliberately mixes Lucene stopwords into the text —
the synth corpus's fake vocabulary contains none, which would make the
stopword variant's assertions vacuous.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.indexing.build import (
    build_index,
    build_index_dual,
    read_manifest,
)
from solr_indexing_spark.query.bmw import topk

WORDS = [
    "the", "quick", "fox", "and", "a", "dog", "of", "war", "is", "here",
    "jumping", "over", "lazy", "rivers", "with", "that", "boat", "stone",
]


def _pages(spark, tmp, n=250, seed=3):
    rnd = random.Random(seed)
    rows = [
        (
            f"u{i:05d}",
            " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(5, 120))),
            "en",
        )
        for i in range(n)
    ]
    path = f"{tmp}/pages.parquet"
    spark.createDataFrame(
        rows, "url string, text string, lang string"
    ).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def dual_dirs(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("dual"))
    path = _pages(spark, tmp)
    kw = dict(num_buckets=4, salt_df_threshold=10**9, store_positions=True)
    man_a, man_b = build_index_dual(
        spark, spark.read.parquet(path), f"{tmp}/A", f"{tmp}/B", **kw
    )
    build_index(
        spark, spark.read.parquet(path), f"{tmp}/A1", analyzer="default",
        **kw,
    )
    build_index(
        spark, spark.read.parquet(path), f"{tmp}/B1", analyzer="stopword",
        **kw,
    )
    return tmp, man_a, man_b


def _rows(spark, d, sub, cols):
    return sorted(
        map(tuple, spark.read.parquet(f"{d}/{sub}").select(*cols).collect())
    )


@pytest.mark.parametrize("pair", [("A", "A1"), ("B", "B1")])
def test_segments_equal_independent_twins(spark, dual_dirs, pair):
    """docs / dictionary / postings (including positional payloads) of
    each dual output are byte-identical to a from-scratch
    ``build_index(analyzer=...)`` over the same pages."""
    tmp, _, _ = dual_dirs
    da, db = [
        _rows(spark, f"{tmp}/{x}", "docs", ["doc_id", "url", "doclen"])
        for x in pair
    ]
    assert da == db and len(da) == 250
    ka, kb = [
        _rows(
            spark, f"{tmp}/{x}", "dictionary",
            ["term", "bucket", "df", "cf", "n_blocks", "max_tf_norm"],
        )
        for x in pair
    ]
    assert ka == kb and ka
    pa_, pb_ = [
        _rows(
            spark, f"{tmp}/{x}", "postings",
            [
                "term", "block_id", "first_doc_id", "last_doc_id",
                "n_docs", "doc_gaps", "tfs", "doclens",
                "block_max_tf_norm", "positions", "pos_counts",
            ],
        )
        for x in pair
    ]
    assert pa_ == pb_ and pa_


def test_variants_actually_differ(spark, dual_dirs):
    """The stopword segment must really be the other analyzer: stop terms
    absent from its dictionary, avgdl strictly smaller."""
    tmp, man_a, man_b = dual_dirs
    terms_b = {
        r["term"]
        for r in spark.read.parquet(f"{tmp}/B/dictionary").collect()
    }
    assert "the" not in terms_b and "and" not in terms_b
    assert "fox" in terms_b
    assert man_b["avgdl"] < man_a["avgdl"]
    assert man_a["analyzer"] == "default"
    assert man_b["analyzer"] == "stopword"


def test_manifests_and_mirrored_quarantine(spark, dual_dirs):
    tmp, man_a, man_b = dual_dirs
    for d, man in ((f"{tmp}/A", man_a), (f"{tmp}/B", man_b)):
        assert read_manifest(d)["n_docs"] == man["n_docs"] == 250
        # errors table mirrored so each segment is self-contained
        assert spark.read.parquet(f"{d}/errors").count() == 0


@pytest.mark.parametrize("variant,twin", [("A", "A1"), ("B", "B1")])
def test_topk_matches_twin(spark, dual_dirs, variant, twin):
    """BM25 top-k through the real query path is identical on the dual
    segment and its independently built twin (scores to 1e-9)."""
    tmp, _, _ = dual_dirs
    for q in ("quick fox", "the lazy dog", "war and stone"):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk(spark, f"{tmp}/{variant}", q, k=10).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk(spark, f"{tmp}/{twin}", q, k=10).collect()
        ]
        assert got == want and got


def test_salted_dual_matches_unsalted(spark, tmp_path):
    """Head-term salting active in the dual build must not change either
    variant's dictionary (partitioning-invariance, as test_skew pins for
    the single build)."""
    tmp = str(tmp_path)
    path = _pages(spark, tmp, n=150, seed=9)
    build_index_dual(
        spark, spark.read.parquet(path), f"{tmp}/SA", f"{tmp}/SB",
        num_buckets=4, salt_df_threshold=20, salt_range=64,
    )
    build_index_dual(
        spark, spark.read.parquet(path), f"{tmp}/UA", f"{tmp}/UB",
        num_buckets=4, salt_df_threshold=10**9,
    )
    cols = ["term", "bucket", "df", "cf", "max_tf_norm"]
    assert _rows(spark, f"{tmp}/SA", "dictionary", cols) == _rows(
        spark, f"{tmp}/UA", "dictionary", cols
    )
    assert _rows(spark, f"{tmp}/SB", "dictionary", cols) == _rows(
        spark, f"{tmp}/UB", "dictionary", cols
    )


def test_shared_docs_dual_equals_self_contained(spark, tmp_path):
    """``shared_docs=True``: the doc text is stored ONCE (in the default
    segment, with both doclen columns); the stopword segment resolves docs
    via its manifest pointer and is otherwise indistinguishable from the
    self-contained build (docs rows, dictionary, stats, top-k); a merge
    re-materializes standalone docs."""
    import os

    from solr_indexing_spark.indexing.build import read_docs
    from solr_indexing_spark.indexing.merge import merge_segments

    tmp = str(tmp_path)
    path = _pages(spark, tmp, n=180, seed=5)
    kw = dict(num_buckets=4, salt_df_threshold=10**9)
    build_index_dual(
        spark, spark.read.parquet(path), f"{tmp}/A", f"{tmp}/B",
        shared_docs=True, **kw,
    )
    build_index_dual(
        spark, spark.read.parquet(path), f"{tmp}/CA", f"{tmp}/CB", **kw
    )

    # the stopword segment stores no docs parquet of its own
    assert not os.path.exists(f"{tmp}/B/docs")
    man_b = read_manifest(f"{tmp}/B")
    assert man_b["docs_ref"] and man_b["docs_doclen_col"] == "doclen_stop"

    cols = ["doc_id", "url", "doclen"]
    resolved = sorted(
        map(tuple, read_docs(spark, f"{tmp}/B").select(*cols).collect())
    )
    assert resolved == _rows(spark, f"{tmp}/CB", "docs", cols)
    assert _rows(spark, f"{tmp}/A", "docs", cols) == _rows(
        spark, f"{tmp}/CA", "docs", cols
    )

    dcols = ["term", "bucket", "df", "cf", "n_blocks", "max_tf_norm"]
    assert _rows(spark, f"{tmp}/B", "dictionary", dcols) == _rows(
        spark, f"{tmp}/CB", "dictionary", dcols
    )
    man_cb = read_manifest(f"{tmp}/CB")
    assert man_b["n_docs"] == man_cb["n_docs"]
    assert abs(man_b["avgdl"] - man_cb["avgdl"]) < 1e-9

    for q in ("quick fox", "war and stone", "the lazy dog"):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk(spark, f"{tmp}/B", q, k=10).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk(spark, f"{tmp}/CB", q, k=10).collect()
        ]
        assert got == want

    # merging the pointer-resolved segment yields a self-contained one
    merge_segments(spark, [f"{tmp}/B"], f"{tmp}/BM")
    assert os.path.exists(f"{tmp}/BM/docs")
    assert "docs_ref" not in read_manifest(f"{tmp}/BM")
    merged_docs = sorted(
        map(
            tuple,
            spark.read.parquet(f"{tmp}/BM/docs").select(*cols).collect(),
        )
    )
    assert merged_docs == resolved
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in topk(spark, f"{tmp}/BM", "quick fox", k=10).collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in topk(spark, f"{tmp}/CB", "quick fox", k=10).collect()
    ]
    assert got == want and got
