"""More-Like-This (query/mlt.py) — Lucene MLT semantics: tf·idf-ranked
interesting terms, noise filters, disjunctive rescoring, source excluded."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from solr_indexing_spark.query.mlt import interesting_terms, more_like_this

from tests.test_bm25 import oracle  # noqa: F401
from tests.test_index_build import index_dir  # noqa: F401


def _expected_terms(oracle, doc_id, max_terms, min_df, max_df_frac):  # noqa: F811
    i = oracle.doc_ids.index(doc_id)
    tf = Counter(oracle.tokenizer(oracle._texts[i]))
    n = oracle.n_docs
    out = []
    for t in sorted(tf):
        df = len(oracle.postings.get(t, {}))
        if df < min_df or df > max_df_frac * n:
            continue
        out.append((t, tf[t] * math.log(1.0 + (n - df + 0.5) / (df + 0.5))))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:max_terms]


@pytest.mark.parametrize("doc_id", [0, 123, 499])
def test_interesting_terms_match_oracle(spark, index_dir, oracle, doc_id):  # noqa: F811
    got = interesting_terms(spark, index_dir, doc_id, max_terms=15)
    want = _expected_terms(oracle, doc_id, 15, 2, 0.25)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, gw), (_, ww) in zip(got, want):
        assert abs(gw - ww) < 1e-9


def test_interesting_terms_filters(spark, index_dir, oracle):  # noqa: F811
    """min_df drops the per-doc salt term; max_df_frac drops head terms."""
    terms = dict(interesting_terms(spark, index_dir, 7, max_terms=10_000))
    assert "salt0000007" not in terms  # df=1 < min_df=2
    n = oracle.n_docs
    for t in terms:
        df = len(oracle.postings[t])
        assert 2 <= df <= 0.25 * n


def test_more_like_this_matches_oracle_rescoring(spark, index_dir, oracle):  # noqa: F811
    doc_id = 42
    want_terms = [t for t, _ in _expected_terms(oracle, doc_id, 25, 2, 0.25)]
    scores = {}
    for t in sorted(want_terms):
        plist = oracle.postings.get(t, {})
        idf = oracle.idf(t)
        for d, tf in plist.items():
            dl = oracle.doclen[d]
            scores[d] = scores.get(d, 0.0) + idf * tf * 2.2 / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dl / oracle.avgdl)
            )
    scores.pop(doc_id, None)  # source excluded
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this(spark, index_dir, doc_id, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert doc_id not in {d for d, _ in got}
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_more_like_this_unknown_doc(spark, index_dir):  # noqa: F811
    with pytest.raises(ValueError, match="not in segment"):
        more_like_this(spark, index_dir, 10_000_000)
