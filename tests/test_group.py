"""Match-set analytics (query/group.py): exact full-match BM25 scoring,
Solr field collapse, stats.field and facet.range — all checked against
the pure-python OracleIndex over the whole match set."""

from __future__ import annotations

from solr_indexing_spark.query.group import (
    collapse_topk,
    field_stats,
    range_facets,
    score_matches,
)
from solr_indexing_spark.query.oracle import OracleIndex

from tests.test_completion import small_index  # noqa: F401

Q = "tabel rilo mekvar"


def test_score_matches_full_match_set(spark, small_index):  # noqa: F811
    """Every matching doc gets its exact BM25 score — same values the
    top-k kernels produce, but for the WHOLE match set."""
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    exp = oracle.score_all(Q)
    got = {
        r["doc_id"]: r["score"]
        for r in score_matches(spark, idx, Q).collect()
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert abs(got[d] - s) < 1e-6
    assert score_matches(spark, idx, "zzzznope").collect() == []


def _lang_of(pdf):
    ordered = pdf.sort_values("url", kind="stable").reset_index(drop=True)
    return {i: ordered["lang"][i] for i in range(len(ordered))}


def test_collapse_matches_python_groupby(spark, small_index):  # noqa: F811
    """Collapse = best doc per field group, groups ranked by head score.
    Exact: a group whose head ranks far down the global list still
    surfaces."""
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    lang_of = _lang_of(pdf)
    scores = oracle.score_all(Q)
    heads: dict = {}
    for d, s in scores.items():
        g = lang_of[d]
        if g not in heads or (s, -d) > (heads[g][1], -heads[g][0]):
            heads[g] = (d, s)
    want = sorted(heads.values(), key=lambda t: (-t[1], t[0]))
    got = collapse_topk(spark, idx, Q, field="lang", k=len(heads)).collect()
    assert [(r["doc_id"]) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-6
    # every group appears exactly once
    assert len({r["lang"] for r in got}) == len(got)
    # k truncates by head score
    got2 = collapse_topk(spark, idx, Q, field="lang", k=2).collect()
    assert [r["doc_id"] for r in got2] == [d for d, _ in want[:2]]


def test_field_stats_and_range_facets(spark, small_index):  # noqa: F811
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    match = set(oracle.score_all(Q))
    lens = [oracle.doclen[d] for d in match]
    st = field_stats(spark, idx, Q, "doclen").collect()[0]
    assert st["count"] == len(lens)
    assert st["min"] == float(min(lens))
    assert st["max"] == float(max(lens))
    assert st["sum"] == float(sum(lens))
    assert abs(st["avg"] - sum(lens) / len(lens)) < 1e-9

    want_buckets: dict = {}
    for ln in lens:
        b = max(ln // 20, 0) * 20.0
        want_buckets[b] = want_buckets.get(b, 0) + 1
    got = {
        r["bucket"]: r["n"]
        for r in range_facets(spark, idx, Q, "doclen", 0.0, 20.0).collect()
    }
    assert got == want_buckets


def test_query_cli_collapse(spark, small_index):  # noqa: F811
    """--collapse FIELD returns group heads matching the library path;
    composes with a rewrite query."""
    import json as _json
    import subprocess
    import sys

    idx, _ = small_index
    r = subprocess.run(
        [sys.executable, "query.py", "--index", idx,
         "--query", "tab*", "--collapse", "lang", "--k", "4",
         "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    hits = [_json.loads(l)
            for l in r.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")]
    from solr_indexing_spark.query.bmw import expand_prefix

    terms = expand_prefix(spark, idx, "tab", max_terms=64)
    want = collapse_topk(spark, idx, terms, field="lang", k=4).collect()
    assert [h["doc_id"] for h in hits] == [r2["doc_id"] for r2 in want]
    assert hits and len({h["lang"] for h in hits}) == len(hits)


def test_session_collapse_equals_one_shot(spark, small_index):  # noqa: F811
    from solr_indexing_spark.indexing.incremental import SegmentsSession

    idx, _ = small_index
    sess = SegmentsSession(spark, [idx], cache_dictionary=False)
    try:
        one = collapse_topk(spark, idx, Q, field="lang", k=5).collect()
        got = sess.collapse(Q, field="lang", k=5).collect()
        assert [(r["lang"], r["doc_id"], r["score"]) for r in got] == [
            (r["lang"], r["doc_id"], r["score"]) for r in one
        ]
        # fq composes: restricting to even ids keeps only even heads
        allow = frozenset(range(0, 400, 2))
        filt = sess.collapse(Q, field="lang", k=5, allow=allow).collect()
        assert filt and all(r["doc_id"] % 2 == 0 for r in filt)
    finally:
        sess.close()
