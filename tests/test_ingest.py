"""End-to-end ingest (ingest.py): packed rows in → BM25 hits +
completions out, one job — the reference's ETL + BulkIndexing + suggester
push in a single pass (solrIndexCreation.ts per-doctype methods).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.docprep.pipelines import (
    CASE_LAWS_INPUT_COLUMNS,
    ensure_columns,
)
from solr_indexing_spark.ingest import PIPELINES, run_ingest, suggest_entries
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.query.completion import complete_dir


def _packed(spark, n=40):
    df = spark.range(n).select(
        F.concat(F.lit("M"), F.col("id").cast("string")).alias("id"),
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("mid"),
        F.lit("Case Laws").alias("documenttype"),
        F.concat(
            F.lit("<document><p>Unique token zq"),
            F.col("id").cast("string"),
            F.lit(" appears here</p></document>"),
        ).alias("fullcontent"),
        F.lit("20200101^01-01-2020").alias("documentdate"),
        F.concat(F.lit("Case "), F.col("id").cast("string")).alias("Heading"),
        # weight-16 suggest inputs (ts:2734-2751): "$"-separated "A|B"
        F.concat(
            F.lit("Topic "), F.col("id").cast("string"),
            F.lit("|Case "), F.col("id").cast("string"),
        ).alias("HeadingSubheading"),
        F.lit("Supreme Court").alias("court"),
    )
    return ensure_columns(df, CASE_LAWS_INPUT_COLUMNS)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ingest") / "job")
    job = run_ingest(
        spark, _packed(spark), "case_laws", out, dual=True, templateid="T"
    )
    return out, job


def test_job_shape_and_lineage(spark, ingested):
    """Packed rows in → committed segments + job manifest; the lineage
    table carries both build stages (the ix-style check)."""
    out, job = ingested
    assert job["n_docs"] == 40 and job["quarantined"] == 0
    assert set(job["manifests"]) == {"index", "index_stopword"}
    assert job["manifests"]["index"]["analyzer"] == "default"
    assert job["manifests"]["index_stopword"]["analyzer"] == "stopword"
    with open(f"{out}/_job_manifest.json") as fh:
        assert json.load(fh)["n_docs"] == 40
    stages = {
        r["stage"]
        for r in spark.read.parquet(f"{out}/index/lineage")
        .select("stage").distinct().collect()
    }
    assert stages == {"docs", "postings"}


def test_bm25_hits_out(spark, ingested):
    """A distinctive body token retrieves exactly its document through the
    real query path, on both analyzer variants."""
    out, _ = ingested
    for seg in ("index", "index_stopword"):
        rows = topk(spark, f"{out}/{seg}", "zq7 token", k=5).collect()
        assert rows
        urls = {
            r["doc_id"]: r["url"]
            for r in spark.read.parquet(f"{out}/{seg}/docs")
            .select("doc_id", "url").collect()
        }
        # composed id = packed mid (reference: indexDocument.id = dr["mid"])
        assert urls[rows[0]["doc_id"]] == "S7"


def test_completions_out(spark, ingested):
    """Suggest[] entries became a queryable completion table (the
    HeadingSubheading inputs arrive already lowercased by the grammar)."""
    out, job = ingested
    assert job["completion_entries"] > 0
    got = complete_dir(spark, f"{out}/completion", "case 1", k=20).collect()
    assert "case 1" in [r["input"] for r in got]
    assert all(r["weight"] == 16 for r in got)


def test_registry_covers_all_13_pipelines():
    assert len(PIPELINES) == 13


def test_suggest_entries_absent_is_none(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("id"))
    assert suggest_entries(df) is None


def test_single_segment_mode(spark, tmp_path):
    out = str(tmp_path / "single")
    job = run_ingest(spark, _packed(spark, 10), "case_laws", out)
    assert list(job["manifests"]) == ["index"]
    assert not os.path.exists(f"{out}/index_stopword")
    rows = topk(spark, f"{out}/index", "zq3", k=3).collect()
    assert rows
    urls = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(f"{out}/index/docs")
        .select("doc_id", "url").collect()
    }
    assert urls[rows[0]["doc_id"]] == "S3"


def test_resolve_index_routing(spark, ingested, tmp_path):
    """Query-time analyzer routing (IndexName vs IndexNameStopword,
    ts:877-880): a job dir resolves to the requested variant, an
    explicit analyzer is validated against segment manifests, and a
    plain segment without a flag passes through untouched."""
    import pytest

    from solr_indexing_spark.indexing.build import read_manifest
    from solr_indexing_spark.ingest import resolve_index

    out, _job = ingested
    assert resolve_index(out) == f"{out}/index"
    assert resolve_index(out, "default") == f"{out}/index"
    assert resolve_index(out, "stopword") == f"{out}/index_stopword"
    assert read_manifest(resolve_index(out, "stopword"))["analyzer"] == "stopword"

    seg = f"{out}/index"
    assert resolve_index(seg) == seg                  # no flag: pass-through
    assert resolve_index(seg, "default") == seg
    with pytest.raises(ValueError, match="built with analyzer"):
        resolve_index(seg, "stopword")                # mismatch is loud
    with pytest.raises(ValueError, match="no committed"):
        # a non-dual job dir has no stopword variant
        import json, os
        fake = str(tmp_path / "fakejob")
        os.makedirs(f"{fake}", exist_ok=True)
        with open(f"{fake}/_job_manifest.json", "w") as fh:
            json.dump({"doctype": "x", "dual": False}, fh)
        resolve_index(fake, "stopword")


def test_positional_ingest_serves_phrase_queries(spark, tmp_path):
    """--positions through the whole job: packed rows → composed docs →
    positional segment, then an exact-phrase query over the composed
    fullcontent (the adjacency 'appears here' exists, the reversed
    bigram does not)."""
    from solr_indexing_spark.query.phrase import phrase_topk

    out = str(tmp_path / "posjob")
    job = run_ingest(
        spark, _packed(spark, n=25), "case_laws", out,
        store_positions=True, templateid="T",
    )
    assert job["manifests"]["index"]["positions"] is True
    seg = f"{out}/index"
    hits = phrase_topk(spark, seg, "zq7 appears", k=5).collect()
    assert [h["doc_id"] for h in hits] and len(hits) == 1
    assert phrase_topk(spark, seg, "appears zq7", k=5).collect() == []


def _packed_update(spark, ids, tag, n=30):
    """Changed/new packed rows for a partial run: same urls (ids), new
    body carrying ``tag`` and a new HeadingSubheading suggest input."""
    base = _packed(spark, n=n)
    return base.filter(
        F.col("id").isin([f"M{i}" for i in ids])
    ).withColumn(
        "fullcontent",
        F.concat(
            F.lit(f"<document><p>{tag} updated body for "),
            F.col("id"),
            F.lit("</p></document>"),
        ),
    ).withColumn(
        # A-part unique per doc: "{tag} topic M<i>|M<i>" — compaction tests
        # need an entry that only the superseded version carried
        "HeadingSubheading",
        F.concat(
            F.lit(f"{tag} topic "), F.col("id"), F.lit("|"), F.col("id")
        ),
    )


def test_partial_ingest_updates_and_serves_chain(spark, tmp_path):
    """The reference's *PartialIndex path through the job layout
    (CaseLawsPartialIndex, ts:2957-3192): changed docs are tombstoned
    wherever they live (base OR an earlier delta), new versions land in
    fresh delta segments, topk_segments serves the chain, and
    completions merge additively."""
    from pyspark.sql import functions as F

    from solr_indexing_spark.indexing.incremental import topk_segments
    from solr_indexing_spark.ingest import job_segments, run_ingest_partial
    from solr_indexing_spark.query.completion import complete_dir

    out = str(tmp_path / "pjob")
    run_ingest(spark, _packed(spark, n=30), "case_laws", out, templateid="T")

    def packed_update(ids, tag):
        base = _packed(spark, n=30)
        upd = base.filter(
            F.col("id").isin([f"M{i}" for i in ids])
        ).withColumn(
            "fullcontent",
            F.concat(
                F.lit(f"<document><p>{tag} updated body for "),
                F.col("id"),
                F.lit("</p></document>"),
            ),
        ).withColumn(
            "HeadingSubheading",
            F.concat(F.lit(f"{tag} topic|"), F.col("id")),
        )
        return upd

    # partial 1: update docs 3 and 7
    job = run_ingest_partial(
        spark, packed_update([3, 7], "vtwo"), "case_laws", out,
        templateid="T",
    )
    segs = job_segments(out)
    assert [s.rsplit("/", 1)[-1] for s in segs] == ["index", "index_delta0001"]
    assert job["segments"] == ["index", "index_delta0001"]

    # the OLD content of doc 3 is gone, the new content serves
    assert topk_segments(spark, segs, "zq3", k=5).collect() == []
    hits = topk_segments(spark, segs, "vtwo", k=5).collect()
    assert len(hits) == 2
    # unchanged docs still serve
    assert len(topk_segments(spark, segs, "zq5", k=5).collect()) == 1

    # partial 2: update doc 3 AGAIN — its delta-1 doc must be tombstoned
    run_ingest_partial(
        spark, packed_update([3], "vthree"), "case_laws", out,
        templateid="T",
    )
    segs = job_segments(out)
    assert len(segs) == 3
    vt = topk_segments(spark, segs, "vthree", k=5).collect()
    assert len(vt) == 1
    # only doc 7's v2 remains for the vtwo token
    assert len(topk_segments(spark, segs, "vtwo", k=5).collect()) == 1

    # completions serve additively across base + delta tables (old and new
    # suggest entries coexist until compaction); the base table itself is
    # untouched by partial runs — deltas are their own small segments
    from solr_indexing_spark.ingest import complete_job, completion_tables

    assert complete_job(spark, out, "vtwo topic", k=5).count() > 0
    assert complete_job(spark, out, "topic 5", k=5).count() > 0
    tables = completion_tables(out)
    assert [t.rsplit("/", 1)[-1] for t in tables] == [
        "completion", "completion_delta0001", "completion_delta0002"
    ]
    assert complete_dir(spark, f"{out}/completion", "vtwo topic", k=5).count() == 0


def test_dual_partial_updates_both_variant_chains(spark, tmp_path):
    """Partial re-index of a DUAL job (the round-3 refusal, now the
    reference's per-variant shape, ts:3180-3184): one single-pass dual
    delta build updates BOTH chains; doc ids stay aligned across variants;
    each chain serves the new content and drops the old."""
    from solr_indexing_spark.indexing.incremental import topk_segments
    from solr_indexing_spark.ingest import job_segments, run_ingest_partial

    out = str(tmp_path / "djob")
    run_ingest(
        spark, _packed(spark, n=30), "case_laws", out, dual=True,
        templateid="T",
    )
    job = run_ingest_partial(
        spark, _packed_update(spark, [4, 11], "dvtwo"), "case_laws", out,
        templateid="T",
    )
    assert job["segments"] == ["index", "index_delta0001"]
    assert job["segments_stopword"] == [
        "index_stopword", "index_stopword_delta0001"
    ]

    per_variant_hits = {}
    for variant in ("index", "index_stopword"):
        segs = job_segments(out, variant)
        assert len(segs) == 2, variant
        assert topk_segments(spark, segs, "zq4", k=5).collect() == [], variant
        hits = topk_segments(spark, segs, "dvtwo", k=5).collect()
        assert len(hits) == 2, variant
        assert len(topk_segments(spark, segs, "zq5", k=5).collect()) == 1
        per_variant_hits[variant] = sorted(r["doc_id"] for r in hits)
    # single-pass dual delta: the variants assign identical doc ids
    assert per_variant_hits["index"] == per_variant_hits["index_stopword"]
    # analyzer semantics hold on the updated stopword chain
    segs_stop = job_segments(out, "index_stopword")
    assert topk_segments(spark, segs_stop, "the and of", k=5).collect() == []


def test_partial_inherits_positions_and_compacts(spark, tmp_path):
    """ADVICE fix: a partial over a --positions job builds a positional
    delta (phrase queries see updated docs; the chain stays mergeable),
    and --compact folds the chain back to one positional segment."""
    from solr_indexing_spark.indexing.build import read_manifest
    from solr_indexing_spark.ingest import run_ingest_compact, run_ingest_partial
    from solr_indexing_spark.query.phrase import phrase_topk

    out = str(tmp_path / "pposjob")
    run_ingest(
        spark, _packed(spark, n=15), "case_laws", out,
        store_positions=True, templateid="T",
    )
    run_ingest_partial(
        spark, _packed_update(spark, [2], "pvtwo", n=15), "case_laws", out,
        templateid="T",
    )
    delta = f"{out}/index_delta0001"
    assert read_manifest(delta)["positions"] is True
    hits = phrase_topk(spark, delta, "pvtwo updated", k=5).collect()
    assert len(hits) == 1
    assert phrase_topk(spark, delta, "updated pvtwo", k=5).collect() == []

    job = run_ingest_compact(spark, out)
    assert job["segments"] == ["index"]
    man = read_manifest(f"{out}/index")
    assert man["positions"] is True and man["n_docs"] == 15
    hits = phrase_topk(spark, f"{out}/index", "pvtwo updated", k=5).collect()
    assert len(hits) == 1


def test_compact_equals_fresh_build(spark, tmp_path):
    """ingest → partial ×2 → compact ≡ a fresh full build of the final
    corpus: identical top-k (by url, 1e-6 scores) and an identical
    completion table — superseded documents' stale suggest entries are
    gone after compaction (the additive pre-compaction drift is repaired)."""
    import glob

    from solr_indexing_spark.ingest import (
        complete_job,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "cjob")
    run_ingest(spark, _packed(spark, n=30), "case_laws", out, templateid="T")
    run_ingest_partial(
        spark, _packed_update(spark, [3, 7], "cvtwo"), "case_laws", out,
        templateid="T",
    )
    run_ingest_partial(
        spark, _packed_update(spark, [3, 9], "cvthree"), "case_laws", out,
        templateid="T",
    )
    # pre-compaction: doc 3's SUPERSEDED suggest entry still serves
    assert complete_job(spark, out, "cvtwo topic", k=20).count() > 0

    job = run_ingest_compact(spark, out)
    assert job["segments"] == ["index"] and job["n_docs"] == 30
    assert not glob.glob(f"{out}/index_delta*")
    assert not glob.glob(f"{out}/completion_delta*")
    assert not os.path.exists(f"{out}/index/tombstones")

    # fresh build over the final corpus (3 → cvthree, 7 → cvtwo, 9 → cvthree)
    fresh = str(tmp_path / "fresh")
    final = (
        _packed(spark, n=30)
        .filter(~F.col("id").isin(["M3", "M7", "M9"]))
        .unionByName(_packed_update(spark, [7], "cvtwo"))
        .unionByName(_packed_update(spark, [3, 9], "cvthree"))
    )
    run_ingest(spark, final, "case_laws", fresh, templateid="T")

    def topk_urls(job_dir, q):
        seg = f"{job_dir}/index"
        urls = {
            r["doc_id"]: r["url"]
            for r in spark.read.parquet(f"{seg}/docs")
            .select("doc_id", "url").collect()
        }
        return sorted(
            (urls[r["doc_id"]], round(r["score"], 6))
            for r in topk(spark, seg, q, k=10).collect()
        )

    for q in ("zq5", "cvtwo", "cvthree", "token", "updated body"):
        assert topk_urls(out, q) == topk_urls(fresh, q), f"query {q!r}"

    def comp_rows(job_dir):
        return sorted(
            (r["input"], r["weight"], r["display"])
            for r in spark.read.parquet(f"{job_dir}/completion")
            .select("input", "weight", "display").collect()
        )

    assert comp_rows(out) == comp_rows(fresh)
    # the stale pre-compaction entry is gone; doc 3's live entry remains
    assert complete_job(spark, out, "cvtwo topic m3", k=20).count() == 0
    assert complete_job(spark, out, "cvthree topic m3", k=20).count() > 0
    # doc 7's live cvtwo entry survives compaction
    assert complete_job(spark, out, "cvtwo topic m7", k=20).count() > 0


def test_partial_never_touches_base_completion(spark, tmp_path, monkeypatch):
    """Delta completion segments: a partial run neither reads nor rewrites
    the accumulated base completion table — its wall is independent of
    completion-table size (the round-3 O(total-completions) rebuild is
    gone)."""
    from pyspark.sql.readwriter import DataFrameReader

    from solr_indexing_spark.ingest import complete_job, run_ingest_partial

    out = str(tmp_path / "bigcomp")
    run_ingest(spark, _packed(spark, n=20), "case_laws", out, templateid="T")
    comp = f"{out}/completion"
    # inflate the base table 10×+ (appended rows: same schema, inert keys)
    spark.range(5000).select(
        F.concat(F.lit("zzzfill"), F.col("id").cast("string")).alias("input"),
        F.lit(1).alias("weight"),
        F.concat(F.lit("zzzfill"), F.col("id").cast("string")).alias("display"),
    ).write.mode("append").parquet(comp)
    files_before = sorted(os.listdir(comp))

    paths: list[str] = []
    orig = DataFrameReader.parquet

    def spy(self, *p, **kw):
        paths.extend(p)
        return orig(self, *p, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    run_ingest_partial(
        spark, _packed_update(spark, [2], "bvtwo", n=20), "case_laws", out,
        templateid="T",
    )
    monkeypatch.undo()

    assert sorted(os.listdir(comp)) == files_before, "base table rewritten"
    base_reads = [p for p in paths if p.rstrip("/").endswith("/completion")]
    assert not base_reads, f"partial read the base completion table: {base_reads}"
    # serving still unions base + delta
    assert complete_job(spark, out, "bvtwo topic", k=5).count() > 0
    assert complete_job(spark, out, "topic 5", k=5).count() > 0


def test_shared_docs_dual_job_partial_and_compact(spark, tmp_path):
    """A --dual --shared-docs job end-to-end: the stopword base resolves
    its docs through the manifest pointer, a dual partial tombstones both
    chains (pointer-resolved docs included), and compaction produces two
    self-contained segments that serve correctly."""
    from solr_indexing_spark.indexing.build import read_manifest
    from solr_indexing_spark.indexing.incremental import topk_segments
    from solr_indexing_spark.ingest import (
        job_segments,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "sdjob")
    run_ingest(
        spark, _packed(spark, n=24), "case_laws", out, dual=True,
        shared_docs=True, templateid="T",
    )
    assert not os.path.exists(f"{out}/index_stopword/docs")
    assert read_manifest(f"{out}/index_stopword")["docs_ref"]

    run_ingest_partial(
        spark, _packed_update(spark, [5], "sdvtwo", n=24), "case_laws", out,
        templateid="T",
    )
    for variant in ("index", "index_stopword"):
        segs = job_segments(out, variant)
        assert len(segs) == 2, variant
        assert topk_segments(spark, segs, "zq5", k=5).collect() == [], variant
        assert len(
            topk_segments(spark, segs, "sdvtwo", k=5).collect()
        ) == 1, variant

    job = run_ingest_compact(spark, out)
    assert job["n_docs"] == 24
    for variant in ("index", "index_stopword"):
        seg = f"{out}/{variant}"
        assert os.path.exists(f"{seg}/docs"), "merge must re-materialize docs"
        assert "docs_ref" not in read_manifest(seg)
        assert topk(spark, seg, "zq5", k=5).collect() == []
        assert len(topk(spark, seg, "sdvtwo", k=5).collect()) == 1
        assert len(topk(spark, seg, "zq9", k=5).collect()) == 1


def test_job_session_serves_chain_and_completions(spark, tmp_path):
    """JobSession == the one-shot paths, warm: topk matches topk_segments
    over the same chain, complete matches complete_job, and re-opening
    after a compaction serves the compacted job identically."""
    from solr_indexing_spark.indexing.incremental import topk_segments
    from solr_indexing_spark.ingest import (
        JobSession,
        complete_job,
        job_segments,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "jsjob")
    run_ingest(spark, _packed(spark, n=20), "case_laws", out, templateid="T")
    run_ingest_partial(
        spark, _packed_update(spark, [2, 9], "jsvtwo", n=20), "case_laws",
        out, templateid="T",
    )

    js = JobSession(spark, out)
    try:
        for q in ("jsvtwo", "zq2", "zq5"):
            warm = [(r["doc_id"], r["score"])
                    for r in js.topk(q, k=5).collect()]
            oneshot = [
                (r["doc_id"], r["score"])
                for r in topk_segments(
                    spark, job_segments(out), q, k=5
                ).collect()
            ]
            assert warm == oneshot, q
        got = [(r["input"], r["weight"]) for r in
               js.complete("jsvtwo topic", k=5).collect()]
        want = [(r["input"], r["weight"]) for r in
                complete_job(spark, out, "jsvtwo topic", k=5).collect()]
        assert got == want and got
    finally:
        js.close()

    run_ingest_compact(spark, out)
    js2 = JobSession(spark, out)
    try:
        assert js2.seg_dirs == [f"{out}/index"]
        assert js2.topk("zq2", k=5).collect() == []
        assert len(js2.topk("jsvtwo", k=5).collect()) == 2
        # superseded docs' stale suggest entries are gone post-compaction
        assert js2.complete("topic 2", k=5).count() == 0
    finally:
        js2.close()

    with pytest.raises(ValueError, match="no committed 'stopword'"):
        JobSession(spark, out, analyzer="stopword")


def test_query_cli_serve_loop(spark, tmp_path):
    """query.py --serve answers stdin requests from one warm session:
    BM25 lines and 'complete ' lines, one JSON object per line."""
    import json as _json
    import subprocess
    import sys

    out = str(tmp_path / "srvjob")
    run_ingest(spark, _packed(spark, n=15), "case_laws", out, templateid="T")

    reqs = (
        "zq3 appears\ncomplete topic 4\nqqzzoov\n"
        "count zq3 appears\nfacet lang zq3 appears\n"
        "sort url:asc 0 zq3 appears\nmlt 0\n"
        "fq url = 'S3' :: appears\nzq* appears\n"
        "collapse url appears\n"
    )
    r = subprocess.run(
        [sys.executable, "query.py", "--index", out, "--serve",
         "--k", "5", "--cores", "4"],
        input=reqs, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.replace("\r", "\n").splitlines()
             if l.startswith("{")]
    assert len(lines) == 10, r.stdout
    q1, c1, q2, cnt, fac, srt, mlt, fq, rw, col = (
        _json.loads(l) for l in lines
    )
    assert q1["query"] == "zq3 appears" and len(q1["hits"]) >= 1
    assert q1["hits"][0]["url"] == "S3"
    assert c1["complete"] == "topic 4" and c1["hits"]
    assert q2["hits"] == []
    assert cnt["numFound"] >= 1
    # composed case_laws docs carry no lang column — facet.missing bucket
    assert fac["facet"] == "lang" and sum(c["n"] for c in fac["counts"]) >= 1
    assert srt["hits"] and srt["hits"][0]["url"] <= srt["hits"][-1]["url"]
    assert "error" not in mlt and mlt["mlt"] == 0
    # per-request fq: every doc matches 'appears', the predicate keeps S3
    assert [h["url"] for h in fq["hits"]] == ["S3"]
    # composed rewrite line: zq* expands to every per-doc zqN salt → the
    # OR set spans all docs; plain 'appears' rides along
    assert len(rw["hits"]) == 5 and "error" not in rw
    # collapse by url: every doc its own group → k best docs, one group
    # value each, score-ordered
    assert col["collapse"] == "url" and col["hits"]
    assert len({h["url"] for h in col["hits"]}) == len(col["hits"])
    scores = [h["score"] for h in col["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_partial_after_compact_serves_new_docs(spark, tmp_path):
    """Review finding (silent data loss): a compaction deletes absorbed
    delta DIRS but their names stay excluded via merged_from — the next
    partial must not reuse a merged-away delta name, or its docs vanish
    from serving while the versions they supersede are tombstoned."""
    from solr_indexing_spark.indexing.incremental import topk_segments
    from solr_indexing_spark.ingest import (
        job_segments,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "pacjob")
    run_ingest(spark, _packed(spark, n=12), "case_laws", out, templateid="T")
    run_ingest_partial(
        spark, _packed_update(spark, [4], "pacvtwo", n=12), "case_laws",
        out, templateid="T",
    )
    run_ingest_compact(spark, out)

    job = run_ingest_partial(
        spark, _packed_update(spark, [6], "pacvthree", n=12), "case_laws",
        out, templateid="T",
    )
    segs = job_segments(out)
    # the fresh delta must be IN the chain (not excluded via merged_from)
    assert len(segs) == 2, segs
    assert segs[1].rsplit("/", 1)[-1] not in {"index_delta0001"}, (
        "compacted-away delta name was reused"
    )
    assert job["segments"] == [s.rsplit("/", 1)[-1] for s in segs]
    assert len(topk_segments(spark, segs, "pacvthree", k=5).collect()) == 1
    assert topk_segments(spark, segs, "zq6", k=5).collect() == []
    assert len(topk_segments(spark, segs, "zq3", k=5).collect()) == 1


def test_compact_drops_suggests_removed_by_update(spark, tmp_path):
    """Review finding: an update that REMOVES a document's suggest entries
    must still bump the url's generation (marker rows), so compaction
    drops the superseded entries instead of electing them as latest."""
    from solr_indexing_spark.ingest import (
        complete_job,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "nsjob")
    run_ingest(spark, _packed(spark, n=10), "case_laws", out, templateid="T")
    assert complete_job(spark, out, "topic 4", k=5).count() > 0

    # update doc 4 with NO HeadingSubheading → no suggest entries at gen 1
    upd = _packed_update(spark, [4], "nsv", n=10).withColumn(
        "HeadingSubheading", F.lit(None).cast("string")
    )
    run_ingest_partial(spark, upd, "case_laws", out, templateid="T")
    run_ingest_compact(spark, out)
    assert complete_job(spark, out, "topic 4", k=5).count() == 0
    # untouched docs' entries survive
    assert complete_job(spark, out, "topic 5", k=5).count() > 0


def test_interrupted_swap_recovers(spark, tmp_path):
    """Review finding: the rename-old → rename-new window can crash with
    dest absent; readers and the retried compaction roll the old tree
    back via _recover_swap."""
    import shutil

    from solr_indexing_spark.indexing.incremental import topk_segments
    from solr_indexing_spark.ingest import (
        job_segments,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "isjob")
    run_ingest(spark, _packed(spark, n=10), "case_laws", out, templateid="T")
    run_ingest_partial(
        spark, _packed_update(spark, [2], "isv", n=10), "case_laws", out,
        templateid="T",
    )
    # simulate a compaction crash mid-swap: base renamed away, new not yet in
    os.rename(f"{out}/index", f"{out}/index.old")
    segs = job_segments(out)  # must roll back, not return a missing base
    assert os.path.exists(f"{out}/index") and segs[0] == f"{out}/index"
    assert len(topk_segments(spark, segs, "isv", k=5).collect()) == 1

    # same crash state again, recovered by the retried compaction itself
    os.rename(f"{out}/index", f"{out}/index.old")
    job = run_ingest_compact(spark, out)
    assert job["segments"] == ["index"]
    assert len(topk_segments(spark, [f"{out}/index"], "isv", k=5).collect()) == 1
    assert not os.path.exists(f"{out}/index.old")
    shutil.rmtree(out)


def test_serve_loop_error_handling(spark, tmp_path, monkeypatch, capsys):
    """serve() answers a failing request with an error line and keeps the
    loop alive; 'complete' on a plain segment dir errors instead of
    BM25-scoring the literal words."""
    import io
    import json as _json
    from types import SimpleNamespace

    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.synth import write_pages_parquet

    import query as query_cli

    pages = str(tmp_path / "pages.parquet")
    write_pages_parquet(pages, 200, seed=3)
    idx = str(tmp_path / "idx")
    build_index(spark, spark.read.parquet(pages), idx, num_buckets=4)

    monkeypatch.setattr(
        "sys.stdin", io.StringIO("complete foo\nsalt0000007\n")
    )
    args = SimpleNamespace(index=idx, analyzer=None, k=5, serve=True)
    query_cli.serve(spark, args)
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 2
    err, ok = _json.loads(lines[0]), _json.loads(lines[1])
    assert "error" in err and err["request"] == "complete foo"
    assert len(ok["hits"]) == 1 and "00000007" in ok["hits"][0]["url"]


def test_job_session_staleness_and_reopen(spark, tmp_path):
    """A warm JobSession detects a partial re-index / compaction under it
    (file metadata only) and reopen() serves the new generation."""
    from solr_indexing_spark.ingest import (
        JobSession,
        run_ingest_compact,
        run_ingest_partial,
    )

    out = str(tmp_path / "stalejob")
    run_ingest(spark, _packed(spark, n=20), "case_laws", out, templateid="T")
    js = JobSession(spark, out)
    try:
        assert not js.stale()
        assert len(js.topk("zq4", k=5).collect()) == 1
        assert js.stale() is False  # queries don't flip it

        run_ingest_partial(
            spark, _packed_update(spark, [4], "stalefour", n=20),
            "case_laws", out, templateid="T",
        )
        assert js.stale() is True
        js = js.reopen()
        assert not js.stale()
        # the OLD doc 4 is gone, the new version serves
        assert js.topk("zq4", k=5).collect() == []
        assert len(js.topk("stalefour", k=5).collect()) == 1

        run_ingest_compact(spark, out)
        assert js.stale() is True
        js = js.reopen()
        assert js.seg_dirs == [f"{out}/index"]
        assert len(js.topk("stalefour", k=5).collect()) == 1
    finally:
        js.close()


def test_swap_dir_atomic_exchange(tmp_path):
    """On exchange-capable filesystems _swap_dir commits via ONE atomic
    renameat2(RENAME_EXCHANGE): dest is never absent, so a concurrent
    reader's _recover_swap can never roll back a live swap. Also pins the
    recover race-tolerance: a loser's os.replace OSError is swallowed."""
    from solr_indexing_spark.ingest import (
        _exchange_dirs,
        _recover_swap,
        _swap_dir,
    )

    a, b = str(tmp_path / "dest"), str(tmp_path / "staged")
    os.makedirs(a)
    os.makedirs(b)
    open(f"{a}/x", "w").write("old")
    open(f"{b}/x", "w").write("new")
    assert _exchange_dirs(a, b) is True  # Linux tmp fs supports it
    # exchange swapped contents; swap back via the full protocol
    _swap_dir(a, b)  # b now holds "old" staged → dest... reset cleanly
    # rebuild a clean scenario
    for d in (a, b):
        if os.path.exists(d):
            import shutil

            shutil.rmtree(d)
    os.makedirs(a)
    os.makedirs(b)
    open(f"{a}/x", "w").write("old")
    open(f"{b}/x", "w").write("new")
    _swap_dir(b, a)
    assert open(f"{a}/x").read() == "new"
    assert not os.path.exists(b) and not os.path.exists(f"{a}.old")

    # recover race-tolerance: dest present + .old present → no-op; and a
    # vanished .old mid-recover must not raise
    os.makedirs(f"{a}.old")
    _recover_swap(a)
    assert open(f"{a}/x").read() == "new"
