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

    # completions merged additively: old and new suggest entries coexist
    assert complete_dir(spark, f"{out}/completion", "vtwo topic", k=5).count() > 0
    assert complete_dir(spark, f"{out}/completion", "topic 5", k=5).count() > 0
