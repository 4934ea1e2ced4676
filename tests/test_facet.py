"""Faceting over the match set (query/facet.py) — Solr facet.field:
per-metadata-value doc counts for the analyzed query's OR match set,
tombstones excluded, fq composable."""

from __future__ import annotations

from collections import Counter

import pytest

from solr_indexing_spark.query.facet import (
    facet_counts,
    match_count,
    matching_doc_ids,
)

from tests.test_bm25 import QUERIES, oracle  # noqa: F401
from tests.test_index_build import index_dir  # noqa: F401


@pytest.fixture(scope="module")
def lang_of(pages_pdf):
    ordered = pages_pdf.sort_values("url", kind="stable").reset_index(drop=True)
    return dict(enumerate(ordered["lang"]))


def _expected_match(oracle, query):  # noqa: F811
    terms = sorted(set(oracle.tokenizer(query)))
    out: set[int] = set()
    for t in terms:
        out |= set(oracle.postings.get(t, {}))
    return out


@pytest.mark.parametrize("query", QUERIES[:6])
def test_matching_doc_ids(spark, index_dir, oracle, query):  # noqa: F811
    want = _expected_match(oracle, query)
    got = {
        r["doc_id"] for r in matching_doc_ids(spark, index_dir, query).collect()
    }
    assert got == want
    assert match_count(spark, index_dir, query) == len(want)


def test_facet_counts(spark, index_dir, oracle, lang_of):  # noqa: F811
    q = "corvim fulful rivarrexful"
    match = _expected_match(oracle, q)
    want = Counter(lang_of[d] for d in match)
    rows = facet_counts(spark, index_dir, q, col="lang").collect()
    assert {r["facet"]: r["n"] for r in rows} == dict(want)
    # ordering contract: n desc, facet asc
    assert [(r["facet"], r["n"]) for r in rows] == sorted(
        want.items(), key=lambda kv: (-kv[1], kv[0])
    )


def test_facet_counts_with_fq_and_limit(spark, index_dir, oracle, lang_of):  # noqa: F811
    q = "corvim fulful rivarrexful"
    allow_ids = frozenset(range(0, 500, 2))
    match = _expected_match(oracle, q) & allow_ids
    want = sorted(
        Counter(lang_of[d] for d in match).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )
    allow_df = spark.createDataFrame(
        [(int(d),) for d in sorted(allow_ids)], "doc_id long"
    )
    rows = facet_counts(
        spark, index_dir, q, col="lang", allow=allow_df, max_values=2
    ).collect()
    assert [(r["facet"], r["n"]) for r in rows] == want[:2]
    assert match_count(spark, index_dir, q, allow=allow_df) == len(match)


def test_facet_excludes_tombstones_and_serves_chains(
    spark, index_dir, oracle, lang_of, tmp_path  # noqa: F811
):
    """A superseded doc leaves the facet counts; its replacement (in the
    delta) enters them — the chain posture."""
    import shutil

    from solr_indexing_spark.indexing.incremental import reindex_changed

    q = "corvim fulful rivarrexful"
    match = _expected_match(oracle, q)
    victim = min(match)
    victim_url = oracle.urls[victim]

    base = str(tmp_path / "base_facet")
    shutil.copytree(index_dir, base)
    changed = spark.createDataFrame(
        [(victim_url, "<html><body>replaced corvim text</body></html>")],
        "url string, html string",
    )
    delta = str(tmp_path / "delta_facet")
    reindex_changed(spark, base, changed, delta)

    # the replacement doc (new id, same url) matches 'corvim'; its lang is
    # NULL in the delta (html-only input) — Solr's facet.missing bucket
    want = Counter(lang_of[d] for d in match if d != victim)
    want[None] += 1
    rows = facet_counts(spark, [base, delta], q, col="lang").collect()
    assert {r["facet"]: r["n"] for r in rows} == dict(want)


def test_facet_empty_query(spark, index_dir):  # noqa: F811
    assert matching_doc_ids(spark, index_dir, "").count() == 0
    assert facet_counts(spark, index_dir, "nosuchtermatall").count() == 0
