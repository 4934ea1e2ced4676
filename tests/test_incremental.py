"""Partial re-index: delta segments, tombstones, merge compaction, and the
dual-analyzer (stopword) index variant."""

from __future__ import annotations

import pandas as pd
import pytest

from solr_indexing_spark.indexing.build import build_index, read_manifest
from solr_indexing_spark.indexing.incremental import reindex_changed, topk_segments
from solr_indexing_spark.indexing.merge import hierarchical_merge
from solr_indexing_spark.query.bmw import QuerySession, topk
from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.synth import gen_pages, write_pandas_pages
from solr_indexing_spark.textprep import STOPWORDS, tokenize_stop_str

QUERIES = ["zanpelmek belhax", "tabel rilo", "mekvar sunqua corbel"]


@pytest.fixture(scope="module")
def base(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    pdf = gen_pages(300, seed=3)
    write_pandas_pages(pdf, str(root / "base.parquet"))
    pages = spark.read.parquet(str(root / "base.parquet"))
    build_index(spark, pages, str(root / "seg0"), num_buckets=4)
    return root, pdf


def test_incremental_add_matches_union_oracle(spark, base):
    """Adding a delta of NEW urls: multi-segment query is rank-identical to
    the oracle over the union corpus (stats exact — no tombstones)."""
    root, base_pdf = base
    add_pdf = gen_pages(360, seed=3).iloc[300:]  # 60 new docs, disjoint urls
    assert not set(add_pdf["url"]) & set(base_pdf["url"])
    write_pandas_pages(add_pdf.reset_index(drop=True), str(root / "add.parquet"))

    delta_man = reindex_changed(
        spark, str(root / "seg0"), spark.read.parquet(str(root / "add.parquet")),
        str(root / "seg_add"),
    )
    base_man = read_manifest(str(root / "seg0"))
    assert delta_man["doc_id_base"] == base_man["doc_id_hi"] + 1

    union_pdf = pd.concat([base_pdf, add_pdf], ignore_index=True)
    # oracle ids = rank in url order over the union — map engine ids via url
    oracle = OracleIndex(union_pdf)
    url_score = {}
    segs = [str(root / "seg0"), str(root / "seg_add")]
    docs = spark.read.parquet(str(root / "seg0") + "/docs").unionByName(
        spark.read.parquet(str(root / "seg_add") + "/docs")
    ).select("doc_id", "url")
    id2url = {r["doc_id"]: r["url"] for r in docs.collect()}
    for q in QUERIES:
        got = [
            (id2url[r["doc_id"]], round(r["score"], 6))
            for r in topk_segments(spark, segs, q, k=10).collect()
        ]
        exp = [
            (oracle.urls[oracle.doc_ids.index(d)], round(s, 6))
            for d, s in oracle.topk(q, 10)
        ]
        assert got == exp, f"query {q!r}"


def test_reindex_changed_tombstones_and_delta(spark, base):
    root, base_pdf = base
    # change 20 docs' text (same urls): replant their salt term with new text
    changed = base_pdf.iloc[40:60].copy().reset_index(drop=True)
    changed["text"] = [
        f"updatedcontent{i:04d} fresh replacement body tabel rilo"
        for i in range(len(changed))
    ]
    write_pandas_pages(changed, str(root / "chg.parquet"))
    reindex_changed(
        spark, str(root / "seg0"), spark.read.parquet(str(root / "chg.parquet")),
        str(root / "seg_chg"),
    )
    segs = [str(root / "seg0"), str(root / "seg_chg")]
    base_docs = spark.read.parquet(str(root / "seg0") + "/docs")
    dead_ids = {
        r["doc_id"]
        for r in base_docs.filter(
            base_docs.url.isin(list(changed["url"]))
        ).collect()
    }

    # old content must be gone: the old per-doc salt term hits nothing live
    old_salt = base_pdf.iloc[41]["text"].split()[-1]  # saltNNNNNNN token
    hits = topk_segments(spark, segs, old_salt, k=5).collect()
    assert not hits, f"tombstoned doc still served: {hits}"

    # new content must be found, with a delta-range doc_id
    hits = topk_segments(spark, segs, "updatedcontent0001", k=5).collect()
    assert len(hits) == 1
    assert hits[0]["doc_id"] > read_manifest(str(root / "seg0"))["doc_id_hi"]
    assert hits[0]["doc_id"] not in dead_ids


def test_merge_compacts_tombstones(spark, base, tmp_path_factory):
    """After the incremental tests above, merging base+deltas must drop dead
    docs/postings entirely and be rank-identical to a from-scratch oracle
    over the final corpus."""
    root, base_pdf = base
    segs = [str(root / "seg0"), str(root / "seg_add"), str(root / "seg_chg")]
    merged = hierarchical_merge(
        spark, segs, str(root / "merged"), fanout=2
    )
    man = read_manifest(merged)
    assert man["n_docs"] == 360  # 300 base - 20 dead + 60 added + 20 changed
    import os

    assert not os.path.exists(f"{merged}/tombstones")

    # final corpus: base minus the 20 changed originals, plus adds + changes
    add_pdf = gen_pages(360, seed=3).iloc[300:]
    changed = base_pdf.iloc[40:60].copy()
    changed["text"] = [
        f"updatedcontent{i:04d} fresh replacement body tabel rilo"
        for i in range(len(changed))
    ]
    final_pdf = pd.concat(
        [base_pdf.drop(base_pdf.index[40:60]), add_pdf, changed],
        ignore_index=True,
    )
    oracle = OracleIndex(final_pdf)
    id2url = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(f"{merged}/docs").select("doc_id", "url").collect()
    }
    for q in QUERIES + ["updatedcontent0003"]:
        got = [
            (id2url[r["doc_id"]], round(r["score"], 6))
            for r in topk(spark, merged, q, k=10).collect()
        ]
        exp = [
            (oracle.urls[oracle.doc_ids.index(d)], round(s, 6))
            for d, s in oracle.topk(q, 10)
        ]
        # engine doc_ids and oracle doc_ids differ after a merge (updated
        # docs keep delta-range ids), so equal-score ties at the k-th rank
        # may legitimately select different members: compare score lists
        # exactly, and url sets above the boundary score
        assert len(got) == len(exp)
        assert [s for _, s in got] == [s for _, s in exp], f"query {q!r}"
        boundary = got[-1][1]
        assert {u for u, s in got if s > boundary} == {
            u for u, s in exp if s > boundary
        }, f"query {q!r}"


def test_segments_session_warm_serving(spark, base, monkeypatch):
    """SegmentsSession computes the dead set + tombstone stats once at
    open: queries through the session NEVER re-read tombstone parquet
    (previously segments × QPS Spark jobs), and results are identical to
    the one-shot topk_segments path."""
    from pyspark.sql.readwriter import DataFrameReader

    from solr_indexing_spark.indexing.incremental import SegmentsSession

    root, _ = base
    segs = [str(root / "seg0"), str(root / "seg_chg")]
    expected = {
        q: [(r["doc_id"], round(r["score"], 9))
            for r in topk_segments(spark, segs, q, k=10).collect()]
        for q in QUERIES
    }
    sess = SegmentsSession(spark, segs)
    try:
        paths: list[str] = []
        orig = DataFrameReader.parquet

        def spy(self, *p, **kw):
            paths.extend(p)
            return orig(self, *p, **kw)

        monkeypatch.setattr(DataFrameReader, "parquet", spy)
        got = {
            q: [(r["doc_id"], round(r["score"], 9))
                for r in sess.topk(q, k=10).collect()]
            for q in QUERIES
        }
        # warm repeat: term-meta cache hits, still identical
        got2 = {
            q: [(r["doc_id"], round(r["score"], 9))
                for r in sess.topk(q, k=10).collect()]
            for q in QUERIES
        }
        monkeypatch.undo()
        assert got == expected and got2 == expected
        tomb_reads = [p for p in paths if "tombstones" in p]
        assert not tomb_reads, (
            f"session queries re-read tombstones: {tomb_reads}"
        )
    finally:
        sess.close()


def test_failed_delta_build_never_tombstones(spark, tmp_path):
    """Crash ordering (round-3 ADVICE): the delta builds BEFORE tombstones
    are appended, so a failing delta build leaves the base fully serving —
    superseded docs are never dead without a committed replacement."""
    import os

    from solr_indexing_spark.synth import gen_pages, write_pandas_pages

    root = tmp_path
    pdf = gen_pages(50, seed=21)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    base_dir = str(root / "seg0")
    build_index(
        spark, spark.read.parquet(str(root / "p.parquet")), base_dir,
        num_buckets=4,
    )
    bad_pages = spark.createDataFrame(
        [(pdf["url"].iloc[0],)], "url string"
    )  # no text/html column: the delta build fails at plan time
    with pytest.raises(Exception):
        reindex_changed(spark, base_dir, bad_pages, str(root / "segd"))
    assert not os.path.exists(f"{base_dir}/tombstones")
    assert not os.path.exists(f"{root}/segd/_manifest.json")
    # base still serves the would-be-superseded doc
    salt = pdf["text"].iloc[0].split()[-1]
    assert topk(spark, base_dir, salt, k=3).collect()


def test_duplicate_tombstones_do_not_drift_stats(spark, tmp_path_factory):
    """A url updated twice (or a replayed batch) must not re-append the
    same tombstone and skew live-doc stats (round-1 ADVICE bug): scores
    stay rank-identical to a one-update run and to the oracle."""
    root = tmp_path_factory.mktemp("dupts")
    pdf = gen_pages(120, seed=17)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    build_index(
        spark, spark.read.parquet(str(root / "p.parquet")),
        str(root / "seg0"), num_buckets=4,
    )
    # update the SAME 10 urls twice, two delta segments
    for gen in (1, 2):
        chg = pdf.iloc[20:30].copy().reset_index(drop=True)
        chg["text"] = [
            f"gen{gen}word{i:03d} updated body text" for i in range(len(chg))
        ]
        write_pandas_pages(chg, str(root / f"chg{gen}.parquet"))
        prev_segs = [str(root / "seg0")] + [
            str(root / f"seg_chg{g}") for g in range(1, gen)
        ]
        # tombstone in every earlier segment (streaming-ingest pattern)
        from solr_indexing_spark.indexing.incremental import append_tombstones
        from pyspark.sql import functions as F

        chg_urls = spark.read.parquet(str(root / f"chg{gen}.parquet")).select("url").distinct()
        for seg in prev_segs:
            seg_docs = spark.read.parquet(f"{seg}/docs")
            dead = seg_docs.join(F.broadcast(chg_urls), "url", "left_semi").select(
                "doc_id", "doclen"
            )
            append_tombstones(spark, seg, dead)
        man0 = read_manifest(str(root / "seg0"))
        hi = max(
            [man0["doc_id_hi"]]
            + [read_manifest(s)["doc_id_hi"] for s in prev_segs[1:]]
        )
        build_index(
            spark, spark.read.parquet(str(root / f"chg{gen}.parquet")),
            str(root / f"seg_chg{gen}"), num_buckets=4, base_doc_id=hi + 1,
        )
    # seg0's tombstone file must hold each dead doc_id exactly once —
    # the second update's append_tombstones anti-joined them away
    tomb = spark.read.parquet(str(root / "seg0") + "/tombstones")
    assert tomb.count() == tomb.select("doc_id").distinct().count() == 10

    # stats defense-in-depth: a LEGACY tombstone file with raw duplicates
    # (pre-guard layout) must serve identical results — topk_segments
    # dedups by doc_id before subtracting from n_docs/avgdl
    segs = [str(root / "seg0"), str(root / "seg_chg1"), str(root / "seg_chg2")]
    before = {
        q: [(r["doc_id"], round(r["score"], 9))
            for r in topk_segments(spark, segs, q, k=10).collect()]
        for q in QUERIES
    }
    # triple-append the same dead rows, bypassing the guard
    for _ in range(3):
        tomb.write.mode("append").parquet(str(root / "seg0") + "/tombstones")
    tomb2 = spark.read.parquet(str(root / "seg0") + "/tombstones")
    assert tomb2.count() == 40  # duplicates really are on disk
    after = {
        q: [(r["doc_id"], round(r["score"], 9))
            for r in topk_segments(spark, segs, q, k=10).collect()]
        for q in QUERIES
    }
    assert before == after


def test_large_tombstone_frame_path(spark, base, monkeypatch):
    """Above the size threshold load_tombstones returns a TombstoneFrame —
    the dead rows are NEVER collected to the driver — and multi-segment
    query results are identical to the frozenset path."""
    from pyspark.sql import DataFrame

    from solr_indexing_spark.query import bmw as bmw_mod

    root, _ = base
    seg = str(root / "seg0")
    small = bmw_mod.load_tombstones(spark, seg)
    if not small:
        pytest.skip("no tombstones on seg0 yet (test ordering)")

    # collect spy: the large-churn load must not materialize rows
    calls = []
    orig_collect = DataFrame.collect
    monkeypatch.setattr(
        DataFrame, "collect",
        lambda self: calls.append(1) or orig_collect(self),
    )
    big = bmw_mod.load_tombstones(spark, seg, broadcast_threshold=0)
    assert isinstance(big, bmw_mod.TombstoneFrame)
    assert not calls, "load_tombstones collected O(churn) rows on the driver"
    monkeypatch.undo()
    assert big.df.count() == len(small)

    # a union across paths stays on the DataFrame path, preserves membership
    extra = max(small) + 1
    u = bmw_mod.union_dead(spark, [big, frozenset({extra})])
    assert isinstance(u, bmw_mod.TombstoneFrame)
    ids = {r["doc_id"] for r in u.df.collect()}
    assert small <= ids and extra in ids

    # end-to-end rank identity: frozenset path vs cogrouped-frame path
    segs = [str(root / "seg0"), str(root / "seg_chg")]
    for q in QUERIES:
        a = [(r["doc_id"], round(r["score"], 9))
             for r in topk_segments(spark, segs, q, k=10).collect()]
        dead_frame = bmw_mod.union_dead(
            spark,
            [bmw_mod.load_tombstones(spark, d, broadcast_threshold=0)
             for d in segs],
        )
        b = [(r["doc_id"], round(r["score"], 9))
             for r in topk_segments(spark, segs, q, k=10,
                                    dead=dead_frame).collect()]
        assert a == b, f"query {q!r}"


def test_merge_large_churn_cogroup_path(spark, base, tmp_path_factory, monkeypatch):
    """Merging with churn above the threshold routes through the cogrouped
    reblocker (no driver collect of dead ids) and produces a segment that
    serves results identical to the small-churn merge."""
    from pyspark.sql import DataFrame

    from solr_indexing_spark.indexing import merge as merge_mod

    root, _ = base
    segs = [str(root / "seg0"), str(root / "seg_chg")]
    out_small = str(tmp_path_factory.mktemp("mg") / "small")
    out_big = str(tmp_path_factory.mktemp("mg") / "big")
    merge_mod.merge_segments(spark, segs, out_small)

    calls = []
    orig_collect = DataFrame.collect
    monkeypatch.setattr(merge_mod, "TOMBSTONE_BROADCAST_THRESHOLD", 0)
    monkeypatch.setattr(
        DataFrame, "collect",
        lambda self: calls.append(1) or orig_collect(self),
    )
    try:
        merge_mod.merge_segments(spark, segs, out_big)
    finally:
        monkeypatch.undo()
    # the stats row + docs lineage are scalar/bounded collects; the dead-id
    # table itself must not be collected — bounded call count, not O(churn)
    assert len(calls) <= 3

    for q in QUERIES:
        a = [(r["doc_id"], round(r["score"], 9))
             for r in topk(spark, out_small, q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in topk(spark, out_big, q, k=10).collect()]
        assert a == b, f"query {q!r}"


def test_stopword_analyzer_variant(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stopidx")
    pdf = gen_pages(200, seed=9)
    # inject stopwords into some docs
    pdf.loc[:50, "text"] = pdf.loc[:50, "text"] + " the and of to in is that"
    write_pandas_pages(pdf, str(root / "p.parquet"))
    pages = spark.read.parquet(str(root / "p.parquet")).select("url", "text", "lang")
    build_index(spark, pages, str(root / "seg"), num_buckets=4, analyzer="stopword")
    man = read_manifest(str(root / "seg"))
    assert man["analyzer"] == "stopword"

    # stopwords never hit
    assert topk(spark, str(root / "seg"), "the and of", k=5).collect() == []
    # doclen excludes stopwords (oracle with the stop tokenizer agrees)
    oracle = OracleIndex(pdf, tokenizer=tokenize_stop_str)
    qs = QuerySession(spark, str(root / "seg"))
    for q in ["tabel rilo", "the mekvar and sunqua"]:
        got = [(r["doc_id"], round(r["score"], 6)) for r in qs.topk(q, k=10).collect()]
        exp = [(d, round(s, 6)) for d, s in oracle.topk(q, 10)]
        assert got == exp, f"query {q!r}"
    # sanity: the stop set itself didn't leak into the dictionary
    dict_terms = {
        r["term"]
        for r in spark.read.parquet(str(root / "seg") + "/dictionary")
        .select("term").collect()
    }
    assert not (dict_terms & STOPWORDS)
