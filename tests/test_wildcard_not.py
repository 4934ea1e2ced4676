"""Wildcard (``t?ble`` / ``ta*le``) and boolean MUST_NOT (``foo -bar``)
queries — the last two Lucene query types on the multi-term-rewrite /
membership machinery. Oracle: pure-python pattern match + the reference
BM25 scorer with candidate exclusion."""

from __future__ import annotations

import re

from solr_indexing_spark.query.bmw import (
    expand_wildcard,
    topk_not,
    topk_wildcard,
)
from solr_indexing_spark.query.oracle import OracleIndex

from tests.test_completion import small_index  # noqa: F401


def _py_wild(oracle, pattern):
    rx = re.compile(
        "^"
        + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern
        )
        + "$"
    )
    return {t for t in oracle.postings if rx.match(t)}


def test_expand_wildcard_matches_python(spark, small_index):  # noqa: F811
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    for pat in ["t?bel", "ta*", "*dor", "m?k*", "z?n*mek"]:
        got = set(expand_wildcard(spark, idx, pat, max_terms=10_000))
        assert got == _py_wild(oracle, pat), pat
    # at least one pattern above must be a real multi-term expansion
    assert len(_py_wild(oracle, "m?k*")) > 1
    assert expand_wildcard(spark, idx, "zzz?nope*") == []


def test_topk_wildcard_matches_oracle(spark, small_index):  # noqa: F811
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    terms = expand_wildcard(spark, idx, "m?k*", max_terms=10_000)
    exp = oracle.topk(" ".join(terms), 10)
    got = [
        (r["doc_id"], r["score"])
        for r in topk_wildcard(
            spark, idx, "m?k*", k=10, max_terms=10_000
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-6


def _pick_overlapping_terms(oracle):
    """Two high-df terms whose match sets overlap but differ — a query
    term and an exclusion that really changes the result."""
    by_df = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    q = by_df[0]
    for ex in by_df[1:]:
        qs, es = set(oracle.postings[q]), set(oracle.postings[ex])
        if qs & es and qs - es:
            return q, ex
    raise AssertionError("corpus has no overlapping term pair")


def test_topk_not_matches_oracle(spark, small_index):  # noqa: F811
    """MUST_NOT = drop excluded docs from candidates, stats untouched:
    surviving docs keep their full-query scores."""
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    excluded = set(oracle.postings[ex])
    scores = oracle.score_all(q)
    exp = sorted(
        ((d, s) for d, s in scores.items() if d not in excluded),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in topk_not(spark, idx, q, ex, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-6
    # the exclusion really bit: plain top-10 differs
    plain = [d for d, _ in oracle.topk(q, 10)]
    assert plain != [d for d, _ in got]
    # excluding an OOV term is a no-op, not an error
    noop = [
        (r["doc_id"], r["score"])
        for r in topk_not(spark, idx, q, "zzzznope", k=10).collect()
    ]
    assert [d for d, _ in noop] == plain


def test_topk_not_composes_with_fq(spark, small_index):  # noqa: F811
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    allow_ids = frozenset(range(0, 400, 2))
    excluded = set(oracle.postings[ex])
    scores = oracle.score_all(q)
    exp = sorted(
        (
            (d, s)
            for d, s in scores.items()
            if d not in excluded and d in allow_ids
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in topk_not(spark, idx, q, ex, k=10, allow=allow_ids).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_session_wildcard_and_not_equal_one_shot(spark, small_index):  # noqa: F811
    from solr_indexing_spark.indexing.incremental import SegmentsSession

    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    sess = SegmentsSession(spark, [idx], cache_dictionary=False)
    try:
        one_w = topk_wildcard(spark, idx, "m?k*", k=10).collect()
        got_w = sess.topk_wildcard("m?k*", k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in got_w] == [
            (r["doc_id"], r["score"]) for r in one_w
        ]
        one_n = topk_not(spark, idx, q, ex, k=10).collect()
        got_n = sess.topk_not(q, ex, k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in got_n] == [
            (r["doc_id"], r["score"]) for r in one_n
        ]
    finally:
        sess.close()


def test_query_cli_not(spark, small_index):  # noqa: F811
    """End-to-end CLI: `q -ex` routes through the prohibited-clause
    path and matches the library result."""
    import json as _json
    import subprocess
    import sys

    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    r = subprocess.run(
        [sys.executable, "query.py", "--index", idx,
         "--query", f"{q} -{ex}", "--k", "5", "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    hits = [_json.loads(l)
            for l in r.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")]
    want = topk_not(spark, idx, q, ex, k=5).collect()
    assert [h["doc_id"] for h in hits] == [r2["doc_id"] for r2 in want]
    assert hits


def test_query_cli_batch_rewrites(spark, small_index, tmp_path):  # noqa: F811
    """--batch lines may mix plain terms with Solr rewrites: each
    rewrite line expands against the dictionary, then ALL lines score in
    the one batched job. Labels keep the original lines; a no-match
    rewrite yields an empty hit list, not an error."""
    import json as _json
    import subprocess
    import sys

    from solr_indexing_spark.query.bmw import (
        expand_wildcard,
        topk_fuzzy,
        topk_wildcard,
    )

    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    lines = [
        "locorcor", "m?k*", "locorcar~2", "zzzznope*",
        f"{q} -{ex}",            # prohibited clause inside a batch line
        f"{q} m?k*",             # multi-token line with a rewrite token
    ]
    qfile = tmp_path / "queries.txt"
    qfile.write_text("".join(ln + "\n" for ln in lines))
    r = subprocess.run(
        [sys.executable, "query.py", "--index", idx,
         "--batch", str(qfile), "--k", "5", "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = [_json.loads(l)
           for l in r.stdout.replace("\r", "\n").splitlines()
           if l.startswith("{")]
    assert [o["query"] for o in out] == lines
    by_q = {o["query"]: [h["doc_id"] for h in o["hits"]] for o in out}
    from solr_indexing_spark.query.bmw import topk as _topk

    assert by_q["locorcor"] == [
        r2["doc_id"] for r2 in _topk(spark, idx, "locorcor", k=5).collect()
    ]
    assert by_q["m?k*"] == [
        r2["doc_id"] for r2 in topk_wildcard(spark, idx, "m?k*", k=5).collect()
    ]
    assert by_q["locorcar~2"] == [
        r2["doc_id"]
        for r2 in topk_fuzzy(spark, idx, "locorcar", k=5, max_edits=2).collect()
    ]
    assert by_q["zzzznope*"] == []
    assert by_q[f"{q} -{ex}"] == [
        r2["doc_id"] for r2 in topk_not(spark, idx, q, ex, k=5).collect()
    ]
    mixed = sorted(set([q] + expand_wildcard(spark, idx, "m?k*")))
    assert by_q[f"{q} m?k*"] == [
        r2["doc_id"] for r2 in _topk(spark, idx, mixed, k=5).collect()
    ]


def test_query_cli_count_with_rewrite(spark, small_index):  # noqa: F811
    """--count honors single-token rewrites: numFound of `m?k*` equals
    the distinct-doc count of the expansion's OR match set."""
    import json as _json
    import subprocess
    import sys

    from solr_indexing_spark.query.bmw import expand_wildcard
    from solr_indexing_spark.query.facet import matching_doc_ids

    idx, _ = small_index
    terms = expand_wildcard(spark, idx, "m?k*", max_terms=10_000)
    want = matching_doc_ids(spark, idx, terms).count()
    assert want > 0
    r = subprocess.run(
        [sys.executable, "query.py", "--index", idx,
         "--query", "m?k*", "--count", "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = [_json.loads(l)
           for l in r.stdout.replace("\r", "\n").splitlines()
           if l.startswith("{")]
    assert out[0]["numFound"] == want


def test_compile_query_composes_tokens(spark, small_index):  # noqa: F811
    """The Solr query language composes per token: plain terms analyze,
    rewrite tokens expand, -tokens (themselves rewritable) exclude."""
    from solr_indexing_spark.indexing.incremental import SegmentsSession
    from solr_indexing_spark.query.bmw import expand_wildcard

    from query import compile_query

    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    sess = SegmentsSession(spark, [idx], cache_dictionary=False)
    try:
        # plain queries stay on the analyzed-string path
        assert compile_query(spark, sess, f"{q} {ex}") is None
        assert compile_query(spark, sess, "-onlynegative") is None

        wild_terms = expand_wildcard(spark, idx, "m?k*", max_terms=64)
        pos, neg = compile_query(spark, sess, f"{q} m?k* -{ex}")
        assert pos == sorted(set([q] + wild_terms))
        assert neg == [ex]

        # a rewrite exclusion expands UNBOUNDED (constant-score)
        all_wild = expand_wildcard(spark, idx, "m?k*", max_terms=10_000)
        pos2, neg2 = compile_query(spark, sess, f"{q} -m?k*")
        assert pos2 == [q] and neg2 == sorted(set(all_wild))

        # end-to-end: the composed query equals the hand-built
        # topk_not over the same expansions
        got = sess.topk_not(pos, neg, k=10).collect()
        want = topk_not(spark, idx, pos, neg, k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]
        assert got  # non-trivial
    finally:
        sess.close()


def test_query_cli_mixed_rewrites(spark, small_index):  # noqa: F811
    """CLI one-shot with a composed query: plain + wildcard + exclusion
    in one string matches the library compile path."""
    import json as _json
    import subprocess
    import sys

    from solr_indexing_spark.indexing.incremental import SegmentsSession

    from query import compile_query

    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    q, ex = _pick_overlapping_terms(oracle)
    line = f"{q} m?k* -{ex}"
    r = subprocess.run(
        [sys.executable, "query.py", "--index", idx,
         "--query", line, "--k", "5", "--cores", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    hits = [_json.loads(l)
            for l in r.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")]
    sess = SegmentsSession(spark, [idx], cache_dictionary=False)
    try:
        pos, neg = compile_query(spark, sess, line)
        want = sess.topk_not(pos, neg, k=5).collect()
    finally:
        sess.close()
    assert [h["doc_id"] for h in hits] == [r2["doc_id"] for r2 in want]
    assert hits


def test_cli_routing_helpers():
    from query import classify_single, parse_not

    assert classify_single("pre*") == ("prefix", "pre")
    assert classify_single("t?ble") == ("wildcard", "t?ble")
    assert classify_single("ta*le") == ("wildcard", "ta*le")
    assert classify_single("pre*x*") == ("wildcard", "pre*x*")
    assert classify_single("*lead") == ("wildcard", "*lead")
    assert classify_single("spark~1") == ("fuzzy", ("spark", 1))
    assert classify_single("spark") is None
    assert classify_single("two words") is None
    # '?' is a wildcard, never part of a fuzzy term
    assert classify_single("t?m~1") == ("wildcard", "t?m~1")

    assert parse_not("foo bar -baz") == ("foo bar", "baz")
    assert parse_not("foo -bar -baz") == ("foo", "bar baz")
    assert parse_not("foo bar") is None
    assert parse_not("-foo") is None
    assert parse_not("foo -") is None
