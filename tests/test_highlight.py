"""Snippet generation / hit highlighting (query/highlight.py) — the
Solr-highlighter analog: best-window fragment election, query terms
wrapped, stored text preserved byte-for-byte outside the tags."""

from __future__ import annotations

import re

import pytest

from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.query.highlight import (
    _best_window,
    _snippet_of,
    highlight,
    highlight_batch,
    highlight_segments,
)

from tests.test_index_build import index_dir  # noqa: F401

TAG_RE = re.compile(r"</?em>")


def _strip(s: str) -> str:
    return TAG_RE.sub("", s).strip("…")


# ---------------------------------------------------------------------------
# pure snippet logic
# ---------------------------------------------------------------------------


def test_best_window_prefers_distinct_terms():
    text = (
        "alpha filler filler filler filler filler filler filler filler "
        "filler filler filler filler filler filler filler filler filler "
        "alpha beta gamma end"
    )
    snip = _snippet_of(text, frozenset({"alpha", "beta"}), 4, "<em>", "</em>")
    # the 4-token window holding alpha AND beta wins over the lone alpha
    assert "<em>alpha</em> <em>beta</em>" in snip
    assert snip.startswith("…")


def test_snippet_preserves_original_casing_and_text():
    text = "The Quick BROWN fox jumps over the lazy dog"
    snip = _snippet_of(text, frozenset({"brown", "the"}), 9, "<em>", "</em>")
    assert "<em>BROWN</em>" in snip
    assert "<em>The</em>" in snip and "<em>the</em>" in snip
    assert _strip(snip) == text  # window covers everything; text unchanged


def test_snippet_no_match_returns_head_window():
    text = "one two three four five six"
    snip = _snippet_of(text, frozenset({"zzz"}), 3, "<em>", "</em>")
    assert snip == "one two three…"


def test_snippet_empty_text():
    assert _snippet_of("", frozenset({"x"}), 5, "<em>", "</em>") == ""


def test_best_window_clamps_to_doc():
    lo, hi = _best_window([9], [0], 10, 32)
    assert (lo, hi) == (0, 10)


# ---------------------------------------------------------------------------
# over a built segment
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hl_query():
    return "zanpelmek belhax"


def test_highlight_over_segment(spark, index_dir, hl_query):  # noqa: F811
    hits = topk(spark, index_dir, hl_query, k=5)
    rows = highlight(spark, index_dir, hits, hl_query, window=16).collect()
    want = [(r["doc_id"], r["score"]) for r in hits.collect()]
    assert [(r["doc_id"], r["score"]) for r in rows] == want
    docs_df = spark.read.parquet(f"{index_dir}/docs")
    docs = {
        r["doc_id"]: r["text"]
        for r in docs_df.filter(
            docs_df.doc_id.isin([d for d, _ in want])
        ).collect()
    }
    for r in rows:
        assert r["url"]
        snip = r["snippet"]
        # at least one query term highlighted (the doc scored, so a term
        # must be present)
        assert "<em>" in snip
        # outside the tags the snippet is a verbatim substring of the
        # stored extracted text
        assert _strip(snip) in docs[r["doc_id"]]


def test_highlight_deterministic(spark, index_dir, hl_query):  # noqa: F811
    hits = topk(spark, index_dir, hl_query, k=3)
    a = highlight(spark, index_dir, hits, hl_query).collect()
    b = highlight(spark, index_dir, hits, hl_query).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_highlight_batch_per_query_terms(spark, index_dir):  # noqa: F811
    from solr_indexing_spark.query.batch import topk_batch

    qs = {1: "zanpelmek", 2: "belhax"}
    hits = topk_batch(spark, index_dir, qs, k=3)
    rows = highlight_batch(spark, index_dir, hits, qs, window=16).collect()
    assert rows
    for r in rows:
        tagged = [m.lower() for m in re.findall(r"<em>(\w+)</em>", r["snippet"])]
        assert tagged, r
        want_term = qs[r["query_id"]]
        assert all(t == want_term for t in tagged)


def test_highlight_segments_chain(spark, index_dir, tmp_path):  # noqa: F811
    """A hit living in a delta segment highlights from the delta's docs."""
    from solr_indexing_spark.indexing.incremental import (
        reindex_changed,
        topk_segments,
    )

    changed = spark.createDataFrame(
        [("https://site0.example/chain-hl",
          "<html><body>graxnorp uniquole graxnorp story</body></html>")],
        "url string, html string",
    )
    delta = str(tmp_path / "delta_hl")
    base = str(tmp_path / "base_hl")
    import shutil

    shutil.copytree(index_dir, base)
    reindex_changed(spark, base, changed, delta)
    dirs = [base, delta]
    hits = topk_segments(spark, dirs, "graxnorp", k=3)
    rows = highlight_segments(spark, dirs, hits, "graxnorp").collect()
    assert len(rows) == 1
    assert rows[0]["snippet"].count("<em>graxnorp</em>") == 2
