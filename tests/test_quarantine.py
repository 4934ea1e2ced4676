"""Dead-letter quarantine: one bad row must never kill the build
(reference: per-row try/catch → LogErrorId, common.ts:304-326)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from solr_indexing_spark.indexing.build import build_index, read_manifest
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.synth import gen_pages


def _write_pages_no_text(pdf: pd.DataFrame, path: str) -> None:
    schema = pa.schema(
        [("url", pa.string()), ("html", pa.binary()), ("lang", pa.string())]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf[["url", "html", "lang"]], schema=schema,
                             preserve_index=False),
        path,
    )


def test_bad_rows_quarantined_not_fatal(spark, tmp_path):
    pdf = gen_pages(60, seed=5)
    # row 10: html with no extractable text; row 20: null url; row 30: null html
    pdf.at[10, "html"] = b"<html><head><title>only skip content</title></head></html>"
    pdf.at[20, "url"] = None
    pdf.at[30, "html"] = None
    path = str(tmp_path / "pages.parquet")
    _write_pages_no_text(pdf, path)

    pages = spark.read.parquet(path)  # no text column → extraction path
    out = str(tmp_path / "idx")
    man = build_index(spark, pages, out, num_buckets=4)

    errors = spark.read.parquet(f"{out}/errors").collect()
    reasons = {r["url"]: r["reason"] for r in errors}
    assert man["quarantined"] == len(errors) >= 2
    assert pdf.at[10, "url"] in reasons
    assert any(r == "null-url" for r in reasons.values())
    assert {r["stage"] for r in errors} == {"docprep"}

    # quarantined rows are not in docs and not searchable
    docs = spark.read.parquet(f"{out}/docs")
    assert docs.filter(docs.url == pdf.at[10, "url"]).count() == 0
    assert man["n_docs"] == 60 - len(errors)

    # the rest of the corpus indexed and queries fine
    salt5 = pdf.at[5, "text"].split()[-1]
    hits = topk(spark, out, salt5, k=3).collect()
    assert len(hits) == 1


def test_clean_corpus_has_empty_errors_table(spark, pages_df, tmp_path):
    out = str(tmp_path / "idx2")
    man = build_index(spark, pages_df.limit(40), out, num_buckets=4)
    assert man["quarantined"] == 0
    assert spark.read.parquet(f"{out}/errors").count() == 0


def test_extraction_cache_released_and_single_pass(spark, tmp_path):
    """The html-only path persists extraction once; after a successful
    build no persistent RDD (neither the extraction cache nor the docids
    range cache) may outlive the call."""
    pdf = gen_pages(50, seed=11)
    path = str(tmp_path / "pages.parquet")
    _write_pages_no_text(pdf, path)
    pages = spark.read.parquet(path)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    build_index(spark, pages, str(tmp_path / "idx3"), num_buckets=4)
    after = jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"persistent RDDs grew {before} -> {after}: extraction/docids cache leaked"
    )


def test_verify_extraction_reaches_html_only_path(spark, tmp_path):
    """verify_extraction must still gate html-only inputs: quarantine
    drops the html column, so the cross-check (raw extract_text vs the
    dead-letter-safe extractor) rides the cached scan as _ext."""
    from pyspark.sql import functions as F

    from solr_indexing_spark.indexing.build import _quarantine_pages

    pdf = gen_pages(20, seed=13)
    path = str(tmp_path / "pages.parquet")
    _write_pages_no_text(pdf, path)
    pages = spark.read.parquet(path)

    clean, n_q, cache = _quarantine_pages(
        spark, pages, str(tmp_path / "q"), verify=True
    )
    try:
        assert "_ext" in clean.columns, "verify flag must surface _ext"
        # both extractors agree on clean rows (the invariant build_index
        # enforces before committing the segment)
        assert clean.filter(F.col("_ext") != F.col("text")).count() == 0
    finally:
        if cache is not None:
            cache.unpersist()

    # end-to-end: the verify build must succeed and leak nothing
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    man = build_index(
        spark, pages, str(tmp_path / "idx4"), num_buckets=4,
        verify_extraction=True,
    )
    assert man["n_docs"] == 20
    assert jsc.getPersistentRDDs().size() <= before


def test_failed_build_releases_caches(spark, pages_df, tmp_path):
    """A build that dies mid-flight (byte-identity violation) must not
    leave the docids/extraction caches persisted — streaming ingest
    calls build_index per micro-batch in one long-lived session."""
    import pytest
    from pyspark.sql import functions as F

    corrupted = pages_df.limit(30).withColumn(
        "text",
        F.when(F.col("url").contains("00000003"), F.lit("WRONG"))
        .otherwise(F.col("text")),
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(ValueError, match="byte-identity"):
        build_index(
            spark, corrupted, str(tmp_path / "idx5"), num_buckets=4,
            verify_extraction=True,
        )
    after = jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"persistent RDDs grew {before} -> {after}: cache leaked on failure"
    )


def test_verify_extraction_sampled_posture(spark, pages_df, tmp_path):
    """verify_extraction=FRACTION (the corpus-scale default posture):
    verifies a DETERMINISTIC url-hash sample — a corruption on a sampled
    url fails the build; one outside the sample is (by design) not paid
    for. Also: fraction over a clean corpus builds fine."""
    import pytest
    from pyspark.sql import functions as F

    from solr_indexing_spark.indexing.build import build_index

    frac = 0.3
    pages = pages_df.limit(60)
    # which urls fall in the 30% sample (same predicate the builder uses)
    sampled = [
        r["url"]
        for r in pages.filter(
            F.pmod(F.crc32(F.col("url")), F.lit(1_000_000))
            < int(frac * 1_000_000)
        ).collect()
    ]
    assert sampled and len(sampled) < 60
    # clean corpus, sampled verify: builds
    man = build_index(
        spark, pages, str(tmp_path / "idx_s0"), num_buckets=4,
        verify_extraction=frac,
    )
    assert man["n_docs"] == 60
    # corrupt one SAMPLED url: the sampled gate catches it
    bad_in = pages.withColumn(
        "text",
        F.when(F.col("url") == sampled[0], F.lit("WRONG"))
        .otherwise(F.col("text")),
    )
    with pytest.raises(ValueError, match="byte-identity"):
        build_index(
            spark, bad_in, str(tmp_path / "idx_s1"), num_buckets=4,
            verify_extraction=frac,
        )
