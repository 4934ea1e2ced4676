"""Index build: stable doc_ids, postings/dictionary/stats/lineage integrity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.codec import delta_decode, vbyte_decode
from solr_indexing_spark.indexing.build import build_index, read_manifest
from solr_indexing_spark.query.oracle import OracleIndex


@pytest.fixture(scope="session")
def index_dir(spark, pages_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "seg0")
    build_index(spark, pages_df, out, num_buckets=8, verify_extraction=True)
    return out


def test_manifest(index_dir):
    m = read_manifest(index_dir)
    assert m["n_docs"] == 500
    assert m["num_buckets"] == 8
    assert m["avgdl"] > 0


def test_doc_ids_match_oracle(spark, index_dir, pages_pdf):
    """doc_id == rank in ascending url order (oracle's assignment)."""
    docs = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "url").collect()
    got = {r["url"]: r["doc_id"] for r in docs}
    oracle = OracleIndex(pages_pdf)
    want = dict(zip(oracle.urls, oracle.doc_ids))
    assert got == want


def test_postings_decode_match_oracle(spark, index_dir, pages_pdf):
    """Decode every block; (doc_id, tf) lists must equal the dict oracle."""
    oracle = OracleIndex(pages_pdf)
    blocks = spark.read.parquet(f"{index_dir}/postings").collect()
    got: dict[str, dict[int, int]] = {}
    for r in sorted(blocks, key=lambda r: (r["term"], r["block_id"])):
        ids = delta_decode(r["first_doc_id"], bytes(r["doc_gaps"]), r["n_docs"])
        tfs = vbyte_decode(bytes(r["tfs"]))
        dls = vbyte_decode(bytes(r["doclens"]))
        assert r["last_doc_id"] == int(ids[-1])
        assert len(tfs) == r["n_docs"] == len(dls)
        for d, dl in zip(ids, dls):
            assert oracle.doclen[int(d)] == int(dl)
        plist = got.setdefault(r["term"], {})
        for d, tf in zip(ids, tfs):
            assert int(d) not in plist, "doc repeated across blocks"
            plist[int(d)] = int(tf)
    assert got == oracle.postings


def test_dictionary_and_stats(spark, index_dir, pages_pdf):
    oracle = OracleIndex(pages_pdf)
    d = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(f"{index_dir}/dictionary").collect()
    }
    assert len(d) == len(oracle.postings)
    for term, plist in oracle.postings.items():
        assert d[term] == (len(plist), sum(plist.values()))
    stats = spark.read.parquet(f"{index_dir}/stats").collect()[0]
    assert stats["n_docs"] == oracle.n_docs
    assert abs(stats["avgdl"] - oracle.avgdl) < 1e-9


def test_lineage_rows(spark, index_dir):
    lin = spark.read.parquet(f"{index_dir}/lineage")
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert stages == {"docs", "postings"}
    docs_rows = lin.filter(F.col("stage") == "docs")
    assert docs_rows.agg(F.sum("n_docs")).collect()[0][0] == 500
    assert lin.filter(F.col("bytes") <= 0).count() == 0
    assert lin.filter(F.col("wall_ms") < 0).count() == 0


def test_doc_ids_stable_across_partitioning(spark, pages_df, tmp_path_factory):
    """Same ids regardless of parallelism/partition count (determinism)."""
    from solr_indexing_spark.indexing.build import build_docs

    a = {
        r["url"]: r["doc_id"]
        for r in build_docs(pages_df, num_partitions=2).select("url", "doc_id").collect()
    }
    b = {
        r["url"]: r["doc_id"]
        for r in build_docs(pages_df, num_partitions=7).select("url", "doc_id").collect()
    }
    assert a == b


def test_verify_path_releases_docids_cache(spark, pages_df, tmp_path_factory):
    """verify_extraction=True takes the .drop("_ext") branch, which returns
    a fresh DataFrame without the monkey-patched _docids_cache attribute —
    the capture must happen BEFORE that drop, or the range-shuffle cache
    leaks (and the offset-count invariant leg silently no-ops)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = str(tmp_path_factory.mktemp("vrel") / "seg")
    build_index(spark, pages_df, out, num_buckets=4, verify_extraction=True)
    after = jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"persistent RDDs grew {before} -> {after}: docids cache leaked"
    )


def test_dictionary_term_range_layout_prunes_prefix_scans(
    spark, pages_df, tmp_path_factory
):
    """The dictionary is written term-range-partitioned (AQE advisory-
    sized) + term-sorted, so parquet min/max stats let a prefix query
    (expand_prefix's startswith) skip the row groups outside the prefix's
    range — without this layout a pre* query scans the whole dictionary,
    which at 10^12 docs is itself big. The fixture shrinks the advisory
    partition size so the tiny test dictionary splits into several range
    files the way a corpus-scale one does at 64 MB."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("dict_prune") / "seg")
    confs = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16kb",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1kb",
    }
    olds = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        build_index(spark, pages_df, out, num_buckets=8)
    finally:
        for k, v in olds.items():
            spark.conf.set(k, v)
    files = sorted(glob.glob(f"{out}/dictionary/*.parquet"))
    assert len(files) >= 3, files
    # files are term-sorted with disjoint contiguous ranges
    ranges = []
    for f in files:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms)
        if terms:
            ranges.append((terms[0], terms[-1]))
    flat = [t for r in sorted(ranges) for t in r]
    assert flat == sorted(flat), ranges

    d = spark.read.parquet(f"{out}/dictionary")
    total = d.count()
    q = d.filter(F.col("term").startswith("zan"))
    rows = q.collect()
    assert rows, "fixture vocab has zan* terms"
    qe = q._jdf.queryExecution()
    plan_str = qe.executedPlan().toString()
    assert "StringStartsWith(term,zan)" in plan_str, plan_str
    scan = qe.executedPlan().collectLeaves().apply(0)
    out_rows = int(scan.metrics().apply("numOutputRows").value())
    # the zan* range lives in 1-2 of the range files: row-group pruning
    # must skip most of the dictionary
    assert out_rows < total * 0.6, (out_rows, total)
