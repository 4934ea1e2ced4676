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
