"""Structured-Streaming ingestion → delta segments → serving → compaction."""

from __future__ import annotations

import os

import pytest

from solr_indexing_spark.indexing.incremental import topk_segments
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.streaming.ingest import (
    compact,
    ingest_batch,
    live_segments,
    read_registry,
    start_ingest,
)
from solr_indexing_spark.synth import gen_pages, write_pandas_pages
from solr_indexing_spark.textprep import tokenize_str


def _salt(pdf, i):
    return tokenize_str(pdf.iloc[i]["text"])[-1]


def test_stream_ingest_and_serve(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    root = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    pdf_all = gen_pages(240, seed=31)
    write_pandas_pages(pdf_all.iloc[:100].reset_index(drop=True), str(inbox / "f1.parquet"))
    write_pandas_pages(pdf_all.iloc[100:200].reset_index(drop=True), str(inbox / "f2.parquet"))

    q = start_ingest(spark, str(inbox), root, ckpt, num_buckets=4)
    q.awaitTermination(300)

    reg = read_registry(root)
    assert len(reg["segments"]) == 2  # one micro-batch per file
    segs = live_segments(root)
    # every doc searchable across segments by its unique salt term
    for i in (3, 150):
        hits = topk_segments(spark, segs, _salt(pdf_all, i), k=3).collect()
        assert len(hits) == 1, i

    # --- more files arrive, stream restarts from checkpoint --------------
    upd = pdf_all.iloc[:20].copy().reset_index(drop=True)
    upd["text"] = [f"refreshedbody{i:04d} tabel rilo" for i in range(20)]
    write_pandas_pages(upd, str(inbox / "f3.parquet"))
    q2 = start_ingest(spark, str(inbox), root, ckpt, num_buckets=4)
    q2.awaitTermination(300)

    segs = live_segments(root)
    assert len(segs) == 3
    # old version tombstoned, new version served
    assert topk_segments(spark, segs, _salt(pdf_all, 5), k=3).collect() == []
    hits = topk_segments(spark, segs, "refreshedbody0005", k=3).collect()
    assert len(hits) == 1

    # --- compaction: one merged segment, same answers --------------------
    merged = compact(spark, root)
    assert read_registry(root)["segments"] == ["seg_merged"]
    assert topk(spark, merged, _salt(pdf_all, 5), k=3).collect() == []
    assert len(topk(spark, merged, "refreshedbody0005", k=3).collect()) == 1
    assert len(topk(spark, merged, _salt(pdf_all, 150), k=3).collect()) == 1


def test_ingest_batch_idempotent(spark, tmp_path):
    root = str(tmp_path / "idx")
    pdf = gen_pages(60, seed=33)
    p = str(tmp_path / "b.parquet")
    write_pandas_pages(pdf, p)
    df = spark.read.parquet(p)
    m1 = ingest_batch(spark, df, root, batch_id=0, num_buckets=2)
    m2 = ingest_batch(spark, df, root, batch_id=0, num_buckets=2)  # replay
    assert m1["n_docs"] == m2["n_docs"] == 60
    assert read_registry(root)["segments"] == ["seg_b000000"]
    # replay did NOT tombstone its own docs
    assert not os.path.exists(f"{root}/seg_b000000/tombstones")


def test_stream_ingest_dual(spark, tmp_path):
    """Dual-analyzer streaming: every micro-batch builds BOTH variant
    segments (one single-pass dual build), re-crawls tombstone both
    chains, serving routes per variant, compaction merges per variant."""
    root = str(tmp_path / "idx_dual")
    pdf = gen_pages(80, seed=35)
    salts = {i: _salt(pdf, i) for i in (3, 60)}
    pdf.loc[:, "text"] = pdf["text"] + " the of stopcarrier"
    p1 = str(tmp_path / "d1.parquet")
    write_pandas_pages(pdf.iloc[:50].reset_index(drop=True), p1)
    p2 = str(tmp_path / "d2.parquet")
    write_pandas_pages(pdf.iloc[50:].reset_index(drop=True), p2)

    m1 = ingest_batch(
        spark, spark.read.parquet(p1), root, batch_id=0, dual=True,
        num_buckets=4,
    )
    m2 = ingest_batch(
        spark, spark.read.parquet(p2), root, batch_id=1, dual=True,
        num_buckets=4,
    )
    assert m1["n_docs"] == 50 and m2["n_docs"] == 30
    reg = read_registry(root)
    assert reg["dual"] is True
    assert reg["segments"] == ["seg_b000000", "seg_b000001"]
    assert reg["segments_stopword"] == [
        "seg_b000000_stopword", "seg_b000001_stopword",
    ]

    segs_d = live_segments(root)
    segs_s = live_segments(root, "stopword")
    # default chain serves stop terms; stopword chain drops them
    assert len(topk_segments(spark, segs_d, "the", k=5).collect()) == 5
    assert topk_segments(spark, segs_s, "the of", k=5).collect() == []
    # both chains serve a per-doc salt (doc 60 lives in batch 1)
    for segs in (segs_d, segs_s):
        assert len(topk_segments(spark, segs, salts[60], k=3).collect()) == 1

    # --- re-crawl: update doc 3 → tombstoned in BOTH chains --------------
    upd = pdf.iloc[[3]].copy().reset_index(drop=True)
    upd["text"] = ["freshdual0003 tabel rilo"]
    p3 = str(tmp_path / "d3.parquet")
    write_pandas_pages(upd, p3)
    ingest_batch(
        spark, spark.read.parquet(p3), root, batch_id=2, dual=True,
        num_buckets=4,
    )
    segs_d = live_segments(root)
    segs_s = live_segments(root, "stopword")
    for segs in (segs_d, segs_s):
        assert topk_segments(spark, segs, salts[3], k=3).collect() == []
        assert len(
            topk_segments(spark, segs, "freshdual0003", k=3).collect()
        ) == 1

    # --- compact: one merged segment per variant -------------------------
    merged = compact(spark, root)
    reg = read_registry(root)
    assert reg["segments"] == ["seg_merged"]
    assert reg["segments_stopword"] == ["seg_merged_stopword"]
    assert len(topk(spark, merged, "freshdual0003", k=3).collect()) == 1
    merged_stop = live_segments(root, "stopword")[0]
    assert topk(spark, merged_stop, "the of", k=5).collect() == []
    assert len(topk(spark, merged_stop, "freshdual0003", k=3).collect()) == 1
    assert topk(spark, merged_stop, salts[3], k=3).collect() == []
