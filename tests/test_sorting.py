"""Sort-by-field serving + deep paging (query/sorting.py) — Solr's
``sort=field asc|desc`` / ``start`` / ``rows``: the match set ordered by a
STORED field (the purpose of the reference's five precomputed citation
sort keys, solrIndexCreation.ts:1624-1942), BM25 playing no part; plus
the warm-session serving surface (facet / count / sorted / MLT on
SegmentsSession) and its no-tombstone-reread discipline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.query.sorting import sorted_topk

from tests.test_bm25 import oracle  # noqa: F401
from tests.test_facet import _expected_match, lang_of  # noqa: F401
from tests.test_index_build import index_dir  # noqa: F401

Q = "corvim fulful rivarrexful"


def _expected_order(match, lang_of, ascending=True):  # noqa: F811
    ids = sorted(match)  # doc_id asc tie-break
    # python sort is stable and reverse=True keeps tie order — exactly
    # (key desc, doc_id asc)
    ids.sort(key=lambda d: lang_of[d], reverse=not ascending)
    return ids


@pytest.mark.parametrize("ascending", [True, False])
def test_sorted_topk_full_ordering(spark, index_dir, oracle, lang_of, ascending):  # noqa: F811
    match = _expected_match(oracle, Q)
    want = _expected_order(match, lang_of, ascending)
    rows = sorted_topk(
        spark, index_dir, Q, sort_cols="lang", k=len(match),
        ascending=ascending,
    ).collect()
    assert [r["doc_id"] for r in rows] == want
    # the sort field rides along (a results page shows its sort key)
    assert all(r["lang"] == lang_of[r["doc_id"]] for r in rows)


def test_sorted_topk_pagination(spark, index_dir, oracle, lang_of):  # noqa: F811
    """start/rows deep paging: pages are disjoint, ordered, and
    concatenate to the prefix of the full ordering."""
    match = _expected_match(oracle, Q)
    want = _expected_order(match, lang_of, ascending=True)
    p0 = [r["doc_id"] for r in
          sorted_topk(spark, index_dir, Q, "lang", k=5, start=0).collect()]
    p1 = [r["doc_id"] for r in
          sorted_topk(spark, index_dir, Q, "lang", k=5, start=5).collect()]
    assert p0 == want[:5]
    assert p1 == want[5:10]
    assert not set(p0) & set(p1)


def test_sorted_topk_fq_and_external_keys(spark, index_dir, oracle, lang_of):  # noqa: F811
    match = _expected_match(oracle, Q)
    allow_ids = frozenset(range(0, 500, 2))
    want = _expected_order(match & allow_ids, lang_of, ascending=True)
    allow_df = spark.createDataFrame(
        [(int(d),) for d in sorted(allow_ids)], "doc_id long"
    )
    got = [
        r["doc_id"]
        for r in sorted_topk(
            spark, index_dir, Q, "lang", k=5, allow=allow_df
        ).collect()
    ]
    assert got == want[:5]
    # external keys table (a docprep-computed sort key not stored in the
    # segment — the citation-variant shape): sort by doc_id % 7, doc_id
    keys = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("k7")
    )
    want7 = sorted(match, key=lambda d: (d % 7, d))[:5]
    got7 = [
        r["doc_id"]
        for r in sorted_topk(
            spark, index_dir, Q, "k7", k=5, keys=keys
        ).collect()
    ]
    assert got7 == want7


def test_sorted_topk_excludes_tombstones_chain(
    spark, index_dir, oracle, lang_of, tmp_path  # noqa: F811
):
    """A superseded doc leaves the sorted ordering; its replacement (in
    the delta, lang NULL → sorts last) enters it."""
    import shutil

    from solr_indexing_spark.indexing.incremental import reindex_changed

    match = _expected_match(oracle, Q)
    victim = min(match)
    base = str(tmp_path / "base_sort")
    shutil.copytree(index_dir, base)
    changed = spark.createDataFrame(
        [(oracle.urls[victim],
          "<html><body>replaced corvim text</body></html>")],
        "url string, html string",
    )
    delta = str(tmp_path / "delta_sort")
    reindex_changed(spark, base, changed, delta)

    want = _expected_order(match - {victim}, lang_of, ascending=True)
    rows = sorted_topk(
        spark, [base, delta], Q, "lang", k=len(match) + 1
    ).collect()
    got = [r["doc_id"] for r in rows]
    # nulls_last: the replacement doc (lang NULL) is the final row
    assert got[:-1] == want
    assert got[-1] >= 500 and rows[-1]["lang"] is None
    assert victim not in got


def test_session_serving_surface_no_tombstone_reread(
    spark, index_dir, oracle, lang_of, tmp_path, monkeypatch  # noqa: F811
):
    """SegmentsSession.facet/count/sorted_topk/mlt reuse the session's
    per-generation chain state: results equal the one-shot paths and NO
    tombstone parquet is re-read per request (same discipline as
    sess.topk — test_incremental pins that one)."""
    import shutil

    from pyspark.sql.readwriter import DataFrameReader

    from solr_indexing_spark.indexing.incremental import (
        SegmentsSession,
        reindex_changed,
    )
    from solr_indexing_spark.query.facet import facet_counts, match_count

    base = str(tmp_path / "base_srv")
    shutil.copytree(index_dir, base)
    changed = spark.createDataFrame(
        [(oracle.urls[3], "<html><body>replaced corvim text</body></html>")],
        "url string, html string",
    )
    delta = str(tmp_path / "delta_srv")
    reindex_changed(spark, base, changed, delta)
    chain = [base, delta]

    want_facets = {
        (r["facet"], r["n"])
        for r in facet_counts(spark, chain, Q, col="lang").collect()
    }
    want_count = match_count(spark, chain, Q)
    match = _expected_match(oracle, Q) - {3}
    want_sorted = _expected_order(match, lang_of, ascending=True)[:5]

    sess = SegmentsSession(spark, chain)
    try:
        paths: list[str] = []
        orig = DataFrameReader.parquet

        def spy(self, *p, **kw):
            paths.extend(p)
            return orig(self, *p, **kw)

        monkeypatch.setattr(DataFrameReader, "parquet", spy)
        got_facets = {
            (r["facet"], r["n"]) for r in sess.facet(Q, col="lang").collect()
        }
        got_count = sess.count(Q)
        got_sorted = [
            r["doc_id"] for r in sess.sorted_topk(Q, "lang", k=5).collect()
        ]
        got_mlt = [
            r["doc_id"] for r in sess.mlt(7, k=5, max_terms=10).collect()
        ]
        monkeypatch.undo()
        assert got_facets == want_facets
        assert got_count == want_count
        assert got_sorted == want_sorted
        # chain MLT: source excluded (folded into the session dead set),
        # neighbors found via the chain-wide df/N stats
        assert got_mlt and 7 not in got_mlt
        tomb_reads = [p for p in paths if "tombstones" in p]
        assert not tomb_reads, (
            f"session serving re-read tombstones: {tomb_reads}"
        )
    finally:
        sess.close()


def test_query_cli_sort_facet_count(spark, index_dir):  # noqa: F811
    """One-shot CLI: --sort FIELD:desc --start, --facet COL, --count —
    each prints the documented JSON lines."""
    import json as _json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "query.py", "--index", index_dir, "--query", Q,
         "--sort", "lang:desc", "--start", "2", "--k", "3", "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.replace("\r", "\n").splitlines()
             if l.startswith("{")]
    assert len(lines) == 3
    hits = [_json.loads(l) for l in lines]
    assert all("lang" in h and "url" in h for h in hits)

    r2 = subprocess.run(
        [sys.executable, "query.py", "--index", index_dir, "--query", Q,
         "--count", "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = [l for l in r2.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")]
    assert _json.loads(out2[0])["numFound"] > 0


def test_session_prefix_over_chain(spark, index_dir, oracle, tmp_path):  # noqa: F811
    """Prefix queries on warm sessions + chains (round-5): single-segment
    session equals the one-shot topk_prefix; a delta-only term is
    expandable over a chain (union-dictionary expansion)."""
    import shutil

    from solr_indexing_spark.indexing.incremental import (
        SegmentsSession,
        reindex_changed,
    )
    from solr_indexing_spark.query.bmw import topk_prefix

    sess = SegmentsSession(spark, [index_dir])
    try:
        one = topk_prefix(spark, index_dir, "zan", k=10).collect()
        got = sess.topk_prefix("zan", k=10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
            (r["doc_id"], round(r["score"], 9)) for r in one
        ]
        assert got, "zan* must hit the fixture vocab"
    finally:
        sess.close()

    base = str(tmp_path / "base_pref")
    shutil.copytree(index_dir, base)
    changed = spark.createDataFrame(
        [(oracle.urls[3],
          "<html><body>replaced qqzuniqueterm text</body></html>")],
        "url string, html string",
    )
    delta = str(tmp_path / "delta_pref")
    reindex_changed(spark, base, changed, delta)
    sess2 = SegmentsSession(spark, [base, delta])
    try:
        hits = sess2.topk_prefix("qqzuniq", k=5).collect()
        assert len(hits) == 1 and hits[0]["doc_id"] >= 500
        # the superseded doc stays excluded on the prefix path too
        assert all(
            r["doc_id"] != 3 for r in sess2.topk_prefix("zan", k=50).collect()
        )
    finally:
        sess2.close()


def test_query_cli_score_paging(spark, index_dir):  # noqa: F811
    """--start on a plain (score-ranked) query: page == full[start:start+k]."""
    import json as _json
    import subprocess
    import sys

    def run(extra):
        r = subprocess.run(
            [sys.executable, "query.py", "--index", index_dir,
             "--query", "zanpelmek belhax", "--cores", "4"] + extra,
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return [_json.loads(l)
                for l in r.stdout.replace("\r", "\n").splitlines()
                if l.startswith("{")]

    full = run(["--k", "6"])
    page = run(["--k", "3", "--start", "2"])
    assert [h["doc_id"] for h in page] == [h["doc_id"] for h in full[2:5]]
