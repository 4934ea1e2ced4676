"""Fuzzy (``term~N``) BM25 queries — Solr/Lucene FuzzyQuery re-expressed
as the multi-term rewrite: Levenshtein expansion against the dictionary
(query/bmw.py expand_fuzzy*) followed by the standard OR-query top-k.
Oracle: pure-python edit-distance over the OracleIndex vocabulary + the
reference BM25 scorer."""

from __future__ import annotations

from solr_indexing_spark.query.bmw import (
    expand_fuzzy,
    expand_fuzzy_df,
    topk_fuzzy,
)
from solr_indexing_spark.query.oracle import OracleIndex

from tests.test_completion import small_index  # noqa: F401


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_expand(oracle, term, max_edits, prefix_len):
    return {
        t
        for t in oracle.postings
        if t.startswith(term[:prefix_len]) and _lev(t, term) <= max_edits
    }


def test_expand_fuzzy_matches_python_levenshtein(spark, small_index):  # noqa: F811
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    for probe, d in [("locorcor", 1), ("locorcor", 2), ("mindor", 2)]:
        got = expand_fuzzy(spark, idx, probe, max_edits=d, max_terms=10_000)
        assert set(got) == _py_expand(oracle, probe, d, 1)
        assert len(got) > 1  # the probe has real neighbors — not a no-op
    # miss: nothing within distance
    assert expand_fuzzy(spark, idx, "zzzznope", max_edits=1) == []


def test_expand_fuzzy_ranking_and_budget(spark, small_index):  # noqa: F811
    """Candidates rank edit-distance-first then df-desc (Lucene's
    closest-then-commonest rewrite priority); max_terms keeps the
    closest candidates."""
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    probe = "locorcor"
    full = expand_fuzzy(spark, idx, probe, max_edits=2, max_terms=10_000)
    dfs = {t: len(p) for t, p in oracle.postings.items()}
    keys = [(_lev(t, probe), -dfs[t], t) for t in full]
    assert keys == sorted(keys)
    capped = expand_fuzzy(spark, idx, probe, max_edits=2, max_terms=3)
    assert capped == full[:3]


def test_expand_fuzzy_prefix_len_zero_full_scan(spark, small_index):  # noqa: F811
    """prefix_len=0 (Lucene's default) admits candidates whose FIRST
    character differs — the full-dictionary variant."""
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    probe = "locorcor"
    got = set(
        expand_fuzzy(
            spark, idx, probe, max_edits=2, prefix_len=0, max_terms=10_000
        )
    )
    assert got == _py_expand(oracle, probe, 2, 0)
    assert got - _py_expand(oracle, probe, 2, 1)  # strictly wider here


def test_topk_fuzzy_matches_oracle(spark, small_index):  # noqa: F811
    """Rank identity: the fuzzy top-k equals the reference scorer run
    over the expanded term set — same gate as prefix queries."""
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    terms = expand_fuzzy(spark, idx, "locorcor", max_edits=2, max_terms=10_000)
    exp = oracle.topk(" ".join(terms), 10)
    got = [
        (r["doc_id"], r["score"])
        for r in topk_fuzzy(
            spark, idx, "locorcor", k=10, max_edits=2, max_terms=10_000
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-6
    # a probe with an empty expansion returns an empty, well-typed frame
    empty = topk_fuzzy(spark, idx, "zzzznope", k=5)
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == ["doc_id", "score"]


def test_session_fuzzy_equals_one_shot(spark, small_index):  # noqa: F811
    """SegmentsSession.topk_fuzzy over a single-segment chain reproduces
    the one-shot path (expansion against the session's union
    dictionary)."""
    from solr_indexing_spark.indexing.incremental import SegmentsSession

    idx, _ = small_index
    sess = SegmentsSession(spark, [idx], cache_dictionary=False)
    try:
        one = topk_fuzzy(spark, idx, "locorcor", k=10, max_edits=2).collect()
        got = sess.topk_fuzzy("locorcor", k=10, max_edits=2).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in one
        ]
    finally:
        sess.close()


def test_query_cli_fuzzy(spark, small_index):  # noqa: F811
    """End-to-end CLI: `locorcar~2` (a typo'd probe) returns the same
    hits as the library fuzzy path over the same index."""
    import json as _json
    import subprocess
    import sys

    idx, _ = small_index
    r = subprocess.run(
        [sys.executable, "query.py", "--index", idx,
         "--query", "locorcar~2", "--k", "5", "--cores", "4",
         "--snippets"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    hits = [_json.loads(l)
            for l in r.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")]
    want = topk_fuzzy(spark, idx, "locorcar", k=5, max_edits=2).collect()
    assert [h["doc_id"] for h in hits] == [r2["doc_id"] for r2 in want]
    assert hits  # the typo'd probe really matched via expansion
    # snippets tag the EXPANDED terms (the raw pattern is not a term)
    assert all("<em>" in h["snippet"] for h in hits)


def test_cli_fuzzy_syntax():
    """query.py accepts Solr fuzzy syntax on single tokens only."""
    from query import parse_fuzzy

    assert parse_fuzzy("spark~1") == ("spark", 1)
    assert parse_fuzzy("spark~2") == ("spark", 2)
    assert parse_fuzzy("spark~") == ("spark", 2)  # Solr default edits
    assert parse_fuzzy("spark") is None
    assert parse_fuzzy("two words~1") is None
    assert parse_fuzzy("pre*~1") is None
    assert parse_fuzzy("spark~3") is None
