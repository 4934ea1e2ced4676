"""Positional postings + exact-phrase BM25 queries."""

from __future__ import annotations

import pytest

from solr_indexing_spark.indexing.build import build_index, read_manifest
from solr_indexing_spark.indexing.merge import hierarchical_merge
from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.query.phrase import phrase_topk
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.synth import gen_pages, write_pandas_pages
from solr_indexing_spark.textprep import tokenize_str


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("phrase")
    pdf = gen_pages(300, seed=21)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    build_index(
        spark, spark.read.parquet(str(root / "p.parquet")), str(root / "idx"),
        num_buckets=4, store_positions=True,
    )
    return str(root / "idx"), pdf


def _real_phrase(pdf, doc_i: int, start: int = 5, n: int = 3) -> str:
    return " ".join(tokenize_str(pdf.iloc[doc_i]["text"])[start : start + n])


def test_manifest_flag(spark, pos_index):
    idx, _ = pos_index
    assert read_manifest(idx)["positions"] is True


def test_phrase_matches_oracle(spark, pos_index):
    idx, pdf = pos_index
    oracle = OracleIndex(pdf)
    for doc_i in (0, 7, 123):
        phrase = _real_phrase(pdf, doc_i)
        exp = oracle.phrase_topk(phrase, 10)
        got = [
            (r["doc_id"], r["score"])
            for r in phrase_topk(spark, idx, phrase, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], phrase
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6
        # the source doc itself must be among matches (ids are url-ordered)
        src_id = oracle.doc_ids[oracle.urls.index(pdf.iloc[doc_i]["url"])]
        assert src_id in {d for d, _ in got} or len(got) == 10


def test_phrase_stricter_than_bag(spark, pos_index):
    """Reversed word order must not match as a phrase even though the
    disjunctive scorer finds the doc."""
    idx, pdf = pos_index
    phrase = _real_phrase(pdf, 3, start=10, n=3)
    toks = phrase.split()
    reverse = " ".join(reversed(toks))
    fwd = {r["doc_id"] for r in phrase_topk(spark, idx, phrase, k=50).collect()}
    oracle = OracleIndex(pdf)
    src_id = oracle.doc_ids[oracle.urls.index(pdf.iloc[3]["url"])]
    assert fwd == {d for d, _ in oracle.phrase_topk(phrase, 50)}
    assert src_id in {d for d, _ in oracle.phrase_topk(phrase, 10_000)}
    del src_id
    exp_rev = oracle.phrase_topk(reverse, 50)
    got_rev = {
        r["doc_id"] for r in phrase_topk(spark, idx, reverse, k=50).collect()
    }
    assert got_rev == {d for d, _ in exp_rev}
    # the disjunctive scorer returns a superset-or-different ranking — the
    # phrase constraint is what separates fwd from rev above; just sanity-
    # check the bag query runs over the same (positional) segment
    bag = {r["doc_id"] for r in topk(spark, idx, phrase, k=50).collect()}
    assert bag


def test_phrase_missing_term_empty(spark, pos_index):
    idx, _ = pos_index
    assert phrase_topk(spark, idx, "qqqzzz notinvocab", k=5).collect() == []
    assert phrase_topk(spark, idx, "", k=5).collect() == []


def test_phrase_requires_positions(spark, pages_df, tmp_path):
    out = str(tmp_path / "nopos")
    build_index(spark, pages_df.limit(50), out, num_buckets=2)
    with pytest.raises(ValueError, match="without positions"):
        phrase_topk(spark, out, "any phrase")


def test_phrase_stopword_gaps(spark, tmp_path):
    """Stopword-analyzer phrases spanning a stopword must match: the index
    stores gapped positions (india at p+2 in "president of india"), so the
    query side must keep the same gaps — a compressed 0..m-1 numbering
    would make this phrase unmatchable (round-1 ADVICE bug)."""
    rows = [
        ("u1", "the president of india spoke in delhi today", "en"),
        ("u2", "president india trade summit opens", "en"),
        ("u3", "completely unrelated text about gardens", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    out = str(tmp_path / "stopidx")
    build_index(
        spark, df, out, num_buckets=2, analyzer="stopword",
        store_positions=True,
    )
    id_of = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/docs").collect()
    }
    # spans the removed stopword "of": only u1 stores president@p, india@p+2
    got = {r["doc_id"] for r in phrase_topk(spark, out, "president of india", k=10).collect()}
    assert got == {id_of["u1"]}
    # adjacent query form: only u2 has india directly after president
    got_adj = {r["doc_id"] for r in phrase_topk(spark, out, "president india", k=10).collect()}
    assert got_adj == {id_of["u2"]}
    # a phrase that is PURELY stopwords tokenizes to nothing → empty result
    assert phrase_topk(spark, out, "of the", k=5).collect() == []


def test_phrase_survives_merge(spark, pos_index, tmp_path_factory):
    """Positions must round-trip the re-blocking merge (decode → permute →
    re-encode) and still answer phrases rank-identically."""
    root = tmp_path_factory.mktemp("pmerge")
    idx, pdf = pos_index
    pdf2 = gen_pages(360, seed=21).iloc[300:]
    write_pandas_pages(pdf2.reset_index(drop=True), str(root / "p2.parquet"))
    man = read_manifest(idx)
    build_index(
        spark, spark.read.parquet(str(root / "p2.parquet")), str(root / "seg2"),
        num_buckets=4, store_positions=True, base_doc_id=man["doc_id_hi"] + 1,
    )
    merged = hierarchical_merge(
        spark, [idx, str(root / "seg2")], str(root / "m")
    )
    assert read_manifest(merged)["positions"] is True

    import pandas as pd

    union_pdf = pd.concat([pdf, pdf2], ignore_index=True)
    oracle = OracleIndex(union_pdf)
    # phrases from both segments
    for doc_i in (7, 310):
        phrase = _real_phrase(union_pdf, doc_i)
        exp = oracle.phrase_topk(phrase, 10)
        got = [
            (r["doc_id"], r["score"])
            for r in phrase_topk(spark, merged, phrase, k=10).collect()
        ]
        # engine ids in merged segment == oracle ids? oracle sorts union by
        # url; seg2 docs got ids 300.. in their own url order — url ranges
        # interleave, so compare via url mapping
        docs_tbl = spark.read.parquet(f"{merged}/docs").select("doc_id", "url")
        id2url = {r["doc_id"]: r["url"] for r in docs_tbl.collect()}
        got_urls = [(id2url[d], round(s, 6)) for d, s in got]
        exp_urls = [
            (oracle.urls[oracle.doc_ids.index(d)], round(s, 6)) for d, s in exp
        ]
        assert sorted(got_urls) == sorted(exp_urls), phrase


def test_phrase_batch_matches_per_query(spark, pos_index):
    """phrase_topk_batch == P independent phrase_topk calls, including a
    dictionary-missing-term phrase (AND semantics: no rows)."""
    from solr_indexing_spark.query.phrase import phrase_topk_batch

    idx, pdf = pos_index
    phrases = {
        0: _real_phrase(pdf, 0),
        1: _real_phrase(pdf, 7),
        2: _real_phrase(pdf, 123),
        3: "zzqqmissing " + _real_phrase(pdf, 0, n=1),
        4: "",
    }
    got = {}
    for r in phrase_topk_batch(spark, idx, phrases, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid, ph in phrases.items():
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in phrase_topk(spark, idx, ph, k=10).collect()
        ]
        assert got.get(qid, []) == want, (qid, ph)
    assert 3 not in got and 4 not in got
    assert len(got[0]) > 0


def test_phrase_tombstoneframe_dead_path(spark, pos_index, tmp_path_factory):
    """phrase_topk over a segment whose tombstone set exceeds the
    broadcast threshold (TombstoneFrame) — previously crashed (`in` on a
    frame); must now match the frozenset path, batch included."""
    import shutil

    from solr_indexing_spark.query import bmw as bmw_mod
    from solr_indexing_spark.query.phrase import phrase_topk_batch

    idx, pdf = pos_index
    root = tmp_path_factory.mktemp("phrase_tomb")
    idx2 = str(root / "idx")
    shutil.copytree(idx, idx2)

    # tombstone the source doc of phrase 0 (plus a few others)
    from pyspark.sql import functions as F

    from solr_indexing_spark.indexing.incremental import append_tombstones

    phrase = _real_phrase(pdf, 0)
    docs = spark.read.parquet(f"{idx2}/docs")
    dead = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "doclen")
    append_tombstones(spark, idx2, dead)
    dead_ids = {r["doc_id"] for r in dead.collect()}

    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in phrase_topk(spark, idx2, phrase, k=10).collect()
    ]
    assert not any(d in dead_ids for d, _ in want)

    # force the TombstoneFrame (cogroup) path: rebind the phrase module's
    # load_tombstones to a threshold-1 wrapper (the default arg binds at
    # def time, so patching the constant would not reach it)
    from solr_indexing_spark.query import phrase as phrase_mod

    orig_load = phrase_mod.load_tombstones

    def tiny_threshold(spark_, index_dir_, **kw):
        kw["broadcast_threshold"] = 1
        return orig_load(spark_, index_dir_, **kw)

    phrase_mod.load_tombstones = tiny_threshold
    try:
        probe = tiny_threshold(spark, idx2)
        assert isinstance(probe, bmw_mod.TombstoneFrame)
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in phrase_topk(spark, idx2, phrase, k=10).collect()
        ]
        gotb = {}
        from solr_indexing_spark.query.phrase import phrase_topk_batch

        for r in phrase_topk_batch(spark, idx2, {1: phrase}, k=10).collect():
            gotb.setdefault(r["query_id"], []).append(
                (r["doc_id"], round(r["score"], 9))
            )
    finally:
        phrase_mod.load_tombstones = orig_load
    assert got == want
    assert gotb.get(1, []) == want


def test_phrase_topk_segments_chain(spark, tmp_path_factory):
    """Phrase serving over a base+delta chain: delta-only phrases found,
    superseded docs' phrases tombstoned out, positions required."""
    import pytest as _pytest

    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.indexing.incremental import reindex_changed
    from solr_indexing_spark.query.phrase import phrase_topk_segments

    root = tmp_path_factory.mktemp("phrase_chain")
    pdf = gen_pages(200, seed=23)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    pages = spark.read.parquet(str(root / "p.parquet"))
    base = str(root / "seg0")
    build_index(spark, pages, base, num_buckets=4, store_positions=True)

    # update doc 5: its old phrase disappears, a new unique phrase arrives
    old_phrase = _real_phrase(pdf, 5)
    upd = pdf.iloc[[5]].copy().reset_index(drop=True)
    upd["text"] = ["freshchain alpha beta gamma freshchain"]
    write_pandas_pages(upd, str(root / "u.parquet"))
    delta = str(root / "seg1")
    reindex_changed(
        spark, base, spark.read.parquet(str(root / "u.parquet")), delta
    )

    chain = [base, delta]
    hits = phrase_topk_segments(spark, chain, "alpha beta gamma", k=5).collect()
    assert len(hits) == 1  # the delta doc, under its NEW id
    from solr_indexing_spark.indexing.build import read_manifest

    assert hits[0]["doc_id"] >= read_manifest(delta)["doc_id_base"]
    # the superseded doc no longer matches its old phrase (other docs may)
    dead = {r["doc_id"] for r in
            spark.read.parquet(f"{base}/tombstones").collect()}
    got = phrase_topk_segments(spark, chain, old_phrase, k=10).collect()
    assert not any(r["doc_id"] in dead for r in got)
    # a phrase from an untouched doc still serves
    keep = _real_phrase(pdf, 17)
    assert len(phrase_topk_segments(spark, chain, keep, k=10).collect()) >= 1

    # positions are mandatory on every chain segment
    np_base = str(root / "np")
    build_index(spark, pages, np_base, num_buckets=4)
    with _pytest.raises(ValueError, match="store_positions"):
        phrase_topk_segments(spark, [np_base], "alpha beta", k=5)


def test_phrase_filtered_allow(spark, pos_index):
    """fq composes with phrase queries (Solr applies filter queries to
    every main-query type): phrase_topk(allow=...) must equal the full
    phrase ranking restricted to the allow set — on the closure
    (frozenset) path AND the DataFrame-backed AllowFrame (cogrouped)
    path, batch included."""
    from solr_indexing_spark.query.bmw import AllowFrame
    from solr_indexing_spark.query.phrase import phrase_topk_batch

    idx, pdf = pos_index
    # pick a phrase with several hits so the filter actually excludes some
    phrase, full = None, []
    for doc_i in (0, 7, 17, 123, 200):
        cand = _real_phrase(pdf, doc_i, n=2)
        rows = phrase_topk(spark, idx, cand, k=300).collect()
        if len(rows) >= 3:
            phrase, full = cand, rows
            break
    assert phrase is not None, "no multi-hit 2-term phrase in fixture"

    allow = frozenset(r["doc_id"] for r in full[1::2]) | {10**9}
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in full
        if r["doc_id"] in allow
    ][:10]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in phrase_topk(spark, idx, phrase, k=10, allow=allow).collect()
    ]
    assert got == want and got

    af = AllowFrame(
        spark.createDataFrame(
            [(int(d),) for d in sorted(allow)], "doc_id long"
        )
    )
    got_f = [
        (r["doc_id"], round(r["score"], 9))
        for r in phrase_topk(spark, idx, phrase, k=10, allow=af).collect()
    ]
    assert got_f == want

    for a in (allow, af):
        got_b = [
            (r["doc_id"], round(r["score"], 9))
            for r in phrase_topk_batch(
                spark, idx, {0: phrase}, k=10, allow=a
            ).collect()
        ]
        assert got_b == want


def test_phrase_batch_segments_matches_per_query(spark, tmp_path_factory):
    """phrase_topk_batch_segments == P independent phrase_topk_segments
    calls over a base+delta chain with tombstones — the ONE-job chain
    grid must be rank-identical to the per-phrase chain path, fq
    included."""
    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.indexing.incremental import reindex_changed
    from solr_indexing_spark.query.phrase import (
        phrase_topk_batch_segments,
        phrase_topk_segments,
    )

    root = tmp_path_factory.mktemp("phrase_chain_batch")
    pdf = gen_pages(200, seed=29)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    pages = spark.read.parquet(str(root / "p.parquet"))
    base = str(root / "seg0")
    build_index(spark, pages, base, num_buckets=4, store_positions=True)
    upd = pdf.iloc[[5]].copy().reset_index(drop=True)
    upd["text"] = ["chainbatch alpha beta gamma chainbatch"]
    write_pandas_pages(upd, str(root / "u.parquet"))
    delta = str(root / "seg1")
    reindex_changed(
        spark, base, spark.read.parquet(str(root / "u.parquet")), delta
    )
    chain = [base, delta]

    phrases = {
        0: _real_phrase(pdf, 0),
        1: "alpha beta gamma",      # delta-only
        2: _real_phrase(pdf, 5),    # superseded doc's old phrase
        3: _real_phrase(pdf, 17, n=2),
        4: "zzqqmissing term",
    }
    got = {}
    for r in phrase_topk_batch_segments(spark, chain, phrases, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid, ph in phrases.items():
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in phrase_topk_segments(spark, chain, ph, k=10).collect()
        ]
        assert got.get(qid, []) == want, (qid, ph)
    assert len(got.get(1, [])) == 1  # the delta doc serves

    # fq over the chain batch: even doc_ids only
    from solr_indexing_spark.indexing.build import read_docs

    even = frozenset(
        r["doc_id"]
        for d in chain
        for r in read_docs(spark, d).select("doc_id").collect()
        if r["doc_id"] % 2 == 0
    )
    got_f = {}
    for r in phrase_topk_batch_segments(
        spark, chain, phrases, k=10, allow=even
    ).collect():
        got_f.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9))
        )
    for qid, ph in phrases.items():
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in phrase_topk_segments(
                spark, chain, ph, k=10, allow=even
            ).collect()
        ]
        assert got_f.get(qid, []) == want, (qid, ph)


def test_segments_session_phrase(spark, tmp_path_factory):
    """SegmentsSession.phrase / .phrase_batch — warm chain phrase serving
    must equal the one-shot chain path; a non-positional chain errors."""
    import pytest as _pytest

    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.indexing.incremental import (
        SegmentsSession,
        reindex_changed,
    )
    from solr_indexing_spark.query.phrase import phrase_topk_segments

    root = tmp_path_factory.mktemp("sess_phrase")
    pdf = gen_pages(150, seed=31)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    pages = spark.read.parquet(str(root / "p.parquet"))
    base = str(root / "seg0")
    build_index(spark, pages, base, num_buckets=4, store_positions=True)
    upd = pdf.iloc[[3]].copy().reset_index(drop=True)
    upd["text"] = ["sessphrase delta doc body sessphrase"]
    write_pandas_pages(upd, str(root / "u.parquet"))
    delta = str(root / "seg1")
    reindex_changed(
        spark, base, spark.read.parquet(str(root / "u.parquet")), delta
    )
    chain = [base, delta]

    sess = SegmentsSession(spark, chain)
    try:
        for ph in (_real_phrase(pdf, 0), "sessphrase delta",
                   _real_phrase(pdf, 3)):
            want = [
                (r["doc_id"], round(r["score"], 9))
                for r in phrase_topk_segments(spark, chain, ph, k=10).collect()
            ]
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in sess.phrase(ph, k=10).collect()
            ]
            assert got == want, ph
        phs = {0: _real_phrase(pdf, 0), 1: "sessphrase delta"}
        got_b = {}
        for r in sess.phrase_batch(phs, k=10).collect():
            got_b.setdefault(r["query_id"], []).append(
                (r["doc_id"], round(r["score"], 9))
            )
        for qid, ph in phs.items():
            want = [
                (r["doc_id"], round(r["score"], 9))
                for r in phrase_topk_segments(spark, chain, ph, k=10).collect()
            ]
            assert got_b.get(qid, []) == want, (qid, ph)
    finally:
        sess.close()

    np_base = str(root / "np")
    build_index(spark, pages, np_base, num_buckets=4)
    sess_np = SegmentsSession(spark, [np_base])
    try:
        with _pytest.raises(ValueError, match="store_positions"):
            sess_np.phrase("alpha beta")
    finally:
        sess_np.close()
