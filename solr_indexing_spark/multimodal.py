"""Multimodal (image/audio/video) column plumbing.

Beyond-reference operators: a 100 TB training-data pipeline carries media as
opaque ``binary`` columns with typed metadata, and runs decode / feature
extraction / resize / frame sampling as Arrow-batched Python stages. The
Spark-side plumbing here — schemas, mapInPandas signatures, batch shapes,
partition sizing — is real and tested; the *codec* step is stubbed behind
``MEDIA_DECODERS`` because the image/audio libraries are not in this
container. ``deterministic_fake_decode`` stands in so every downstream
operator (feature vectors, resize metadata, frame sampling) is exercised
end-to-end with reproducible outputs.

Design notes for scale:
- media rows are large and variable — ``repartition_for_media`` targets
  bytes-per-partition, not rows, so one 4 GB video doesn't starve a task
  while 10k thumbnails share another;
- all stages are ``mapInPandas`` (streamed Arrow batches), never
  ``collect``-then-process, and never per-row Python UDFs;
- decoded features are fixed-width ``array<float>`` so the output of the
  media path feeds directly into the similarity/dedup operators
  (``similarity.cosine_topk``, ``dedup.embedding_near_dups``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def real_decode(content: bytes, kind: str, mime: str | None) -> np.ndarray:
    """Decode media bytes to a pixel/sample array.

    STUB: requires Pillow / libav / soundfile, none of which are in this
    container. The Spark plumbing around it is real; swap this function for
    the library call in a real deployment.
    """
    raise NotImplementedError(
        "media codecs (Pillow/libav/soundfile) are not installed in this "
        "environment; use deterministic_fake_decode for plumbing tests"
    )


def deterministic_fake_decode(content: bytes, kind: str, mime: str | None) -> np.ndarray:
    """Deterministic stand-in decoder: a 256-bin byte histogram reshaped to
    the feature width. Same bytes → same 'pixels', so tests and oracles
    are stable."""
    hist = np.bincount(np.frombuffer(content, dtype=np.uint8), minlength=256)
    return hist.astype(np.float64)


MEDIA_DECODERS = {"real": real_decode, "fake": deterministic_fake_decode}


def _feature_from_decoded(arr: np.ndarray) -> np.ndarray:
    """Fold a decoded array into a FEATURE_DIM float vector (L2-normalized)."""
    folded = arr[: (arr.size // FEATURE_DIM) * FEATURE_DIM].reshape(
        -1, FEATURE_DIM
    ).sum(axis=0) if arr.size >= FEATURE_DIM else np.resize(arr, FEATURE_DIM)
    norm = float(np.sqrt((folded**2).sum())) or 1.0
    return (folded / norm).astype(np.float32)


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """media → (media_id, kind, n_bytes, feature: array<float>).

    mapInPandas: each Arrow batch is decoded vectorized-per-batch; output
    feeds the vector operators directly.
    """
    decode = MEDIA_DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _feature_from_decoded(
                    decode(bytes(c), k, m)
                ).tolist()
                for c, k, m in zip(pdf["content"], pdf["kind"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """video rows → one row per sampled frame (media_id, frame_idx,
    frame_ms, frame: binary).

    Frame extraction itself is the stubbed codec; the fake path slices the
    content deterministically so downstream cardinality/partitioning is
    exercised. Non-video rows are dropped (filter pushed to the scan).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_ms": [], "frame": []
            }
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                duration = (meta or {}).get("duration_ms") or 0
                n = min(max_frames, max(1, duration // every_ms))
                blob = bytes(content)
                step = max(1, len(blob) // max(n, 1))
                for i in range(int(n)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame"].append(blob[i * step : i * step + step])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAMES_SCHEMA)


def resize_meta(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Pure-Catalyst resize bookkeeping: scale factors + letterbox paddings
    for a target box (the math stage of a resize; the pixel resample lives
    behind the codec stub)."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(target_w) / w, F.lit(target_h) / h)
    return media.withColumn("resize_scale", F.round(scale, 6)).withColumn(
        "resized_w", F.round(w * scale).cast("int")
    ).withColumn("resized_h", F.round(h * scale).cast("int")).withColumn(
        "pad_x", ((F.lit(target_w) - F.col("resized_w")) / 2).cast("int")
    ).withColumn(
        "pad_y", ((F.lit(target_h) - F.col("resized_h")) / 2).cast("int")
    )


def repartition_for_media(
    media: DataFrame,
    target_bytes: int = 128 << 20,
    coarse_groups: int | None = None,
) -> DataFrame:
    """Repartition so each task sees ~target_bytes of media payload —
    row-count partitioning is wrong when row sizes span 4 orders of
    magnitude.

    Two-phase byte prefix sums, fully distributed (a single global
    ``Window.orderBy`` would sort the whole corpus into ONE task — at
    100 TB of media that task is exactly the bottleneck this function
    exists to remove):

    1. rows get a deterministic coarse group ``pmod(xxhash64(media_id), G)``
       (content-independent, so the two passes below agree without
       persisting the binary column);
    2. one aggregation ships O(G) per-group byte totals to the driver,
       which turns them into cumulative group offsets;
    3. each row's bin = (group offset + within-group exclusive prefix sum)
       / target_bytes — the prefix-sum window is partitioned BY GROUP, so
       the sort is G-way parallel and no task ever sees more than one
       group's rows.

    Routing is exact, not hash-and-hope: ``repartition(n, col)`` sends a
    bin to ``pmod(murmur3(col), n)``, and balls-in-bins collisions would
    stack several target-size bins in one task. Instead a small label
    table (one row per bin, built with Spark's own ``F.hash`` so the
    function can never drift from the shuffle's) relabels bin ``b`` to an
    integer that murmur3-routes to partition ``b`` — broadcast-joined, so
    the mapping never lives in the plan as an O(n_bins) literal. Boundary
    rows straddle by at most one row (any prefix-sum binning); a row
    larger than ``target_bytes`` still lands alone in its own bin."""
    spark = media.sparkSession
    g = coarse_groups or max(8 * spark.sparkContext.defaultParallelism, 64)
    sized = media.withColumn(
        "_sz", F.length("content").cast("long")
    ).withColumn(
        "_grp", F.pmod(F.xxhash64(F.col("media_id")), F.lit(g)).cast("int")
    )
    totals = {
        int(r["_grp"]): int(r["tot"])
        for r in sized.groupBy("_grp")
        .agg(F.sum("_sz").alias("tot"))
        .collect()
    }
    if not totals:
        return media
    offsets: dict[int, int] = {}
    acc = 0
    for grp in sorted(totals):
        offsets[grp] = acc
        acc += totals[grp]
    n_bins = int(acc // target_bytes) + 1
    off_map = F.create_map(
        *[F.lit(int(x)) for kv in sorted(offsets.items()) for x in kv]
    )
    w = (
        Window.partitionBy("_grp")
        .orderBy("media_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_bin = sized.withColumn(
        "_bin",
        (
            (off_map[F.col("_grp")] + F.sum("_sz").over(w) - F.col("_sz"))
            / F.lit(target_bytes)
        ).cast("int"),
    )
    # exact bin→partition routing: for each residue b pick the smallest
    # int whose Spark hash lands on partition b (64× oversampling makes a
    # missing residue astronomically unlikely; a miss would only merge
    # that one bin into the null-label partition, never a global funnel)
    labels = (
        spark.range(0, 64 * n_bins)
        .select(
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_bins)).alias(
                "_bin"
            ),
            F.col("id").cast("int").alias("_route"),
        )
        .groupBy("_bin")
        .agg(F.min("_route").alias("_route"))
    )
    return (
        with_bin.join(F.broadcast(labels), "_bin", "left")
        .repartition(n_bins, "_route")
        .drop("_sz", "_grp", "_bin", "_route")
    )


def gen_media(n: int, seed: int = 7) -> pd.DataFrame:
    """Deterministic synthetic media table (no external data): content bytes
    from a seeded hash chain; kinds cycle image/audio/video with plausible
    metadata."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        size = 200 + (i * 37) % 1800
        chunk = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        content = (chunk * (size // len(chunk) + 1))[:size]
        meta = {
            "width": 64 + (i % 8) * 16 if kind != "audio" else None,
            "height": 48 + (i % 5) * 16 if kind != "audio" else None,
            "duration_ms": 1000 + (i % 10) * 700 if kind != "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, content, mimes[kind], meta))
    return pd.DataFrame(
        rows, columns=["media_id", "kind", "content", "mime", "meta"]
    )
