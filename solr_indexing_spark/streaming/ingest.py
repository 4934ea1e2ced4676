"""Continuous ingestion: Structured Streaming micro-batches → delta segments.

The reference is a batch ETL with a partial re-index path
(``CaseLawsPartialIndex``); operationally that path is run on a schedule.
Here the same semantics run as a stream: a file-source ``readStream`` over
arriving pages feeds ``foreachBatch``, and every micro-batch becomes one
delta segment via the incremental machinery (new doc_ids continuing past
the registry's high id; re-crawled urls tombstone their old docs in every
earlier segment). Query-time serving is ``incremental.topk_segments`` over
the registry; a periodic ``hierarchical_merge`` compacts.

Exactly-once-per-batch: Structured Streaming's checkpoint guarantees each
batch id is delivered at least once; segment commit is idempotent per
batch — the segment directory is named by batch id and committed by the
atomic ``_manifest.json`` rename, so a replayed batch overwrites its own
(uncommitted or committed-identical) segment, never a neighbor's. The
registry file is rewritten by atomic rename after the segment commits.

No watermarks/event-time state: indexing is append/upsert keyed by url,
not a windowed aggregation — late pages are just upserts (the same doc-id
discipline the batch path uses). ``applyInPandasWithState`` is therefore
not needed; statefulness lives in the segment registry, which also makes
the stream restartable from its checkpoint AND from the registry alone.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _registry_path(index_root: str) -> str:
    return os.path.join(index_root, "_registry.json")


def read_registry(index_root: str) -> dict:
    p = _registry_path(index_root)
    if not os.path.exists(p):
        return {"segments": [], "doc_id_hi": -1}
    with open(p) as fh:
        return json.load(fh)


def _write_registry(index_root: str, reg: dict) -> None:
    tmp = _registry_path(index_root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(reg, fh, indent=1)
    os.replace(tmp, _registry_path(index_root))


def live_segments(index_root: str, variant: str = "default") -> list[str]:
    """Live segment chain for one analyzer variant (``default`` /
    ``stopword`` — the reference's IndexName / IndexNameStopword)."""
    reg = read_registry(index_root)
    key = "segments_stopword" if variant == "stopword" else "segments"
    return [os.path.join(index_root, s) for s in reg.get(key, [])]


def _tombstone_chain(
    spark: SparkSession, index_root: str, names: list[str], urls
) -> None:
    from pyspark.sql import functions as F

    from ..indexing.build import read_docs
    from ..indexing.incremental import append_tombstones

    for prev in names:
        prev_docs = read_docs(spark, os.path.join(index_root, prev))
        dead = prev_docs.join(F.broadcast(urls), "url", "left_semi").select(
            "doc_id", "doclen"
        )
        # dedup-guarded append: a replayed batch (at-least-once delivery)
        # must not re-tombstone the same doc_ids and skew live-doc stats
        append_tombstones(spark, os.path.join(index_root, prev), dead)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_root: str,
    batch_id: int,
    dual: bool = False,
    **build_kwargs,
) -> dict | None:
    """Index one (micro-)batch of pages as a delta segment — both analyzer
    variants when ``dual`` (one single-pass dual build per batch, the
    reference's IndexName + IndexNameStopword posture). Idempotent per
    batch_id. Returns the (default-variant) segment manifest, or None for
    an empty batch."""
    from ..indexing.build import build_index, build_index_dual, read_manifest

    if batch_df.isEmpty():
        return None
    os.makedirs(index_root, exist_ok=True)
    reg = read_registry(index_root)
    seg_name = f"seg_b{batch_id:06d}"
    seg_dir = os.path.join(index_root, seg_name)
    seg_name_stop = f"{seg_name}_stopword"
    seg_dir_stop = os.path.join(index_root, seg_name_stop)
    committed = seg_name in reg["segments"] and os.path.exists(
        os.path.join(seg_dir, "_manifest.json")
    )
    if dual:
        committed = (
            committed
            and seg_name_stop in reg.get("segments_stopword", [])
            and os.path.exists(os.path.join(seg_dir_stop, "_manifest.json"))
        )
    if committed:
        return read_manifest(seg_dir)  # replayed batch: already committed

    # tombstone re-crawled urls in every earlier segment, per variant
    # chain (a dual registry's chains hold the same urls under different
    # doc stats — each chain's own docs decide its dead doc_ids)
    urls = batch_df.select("url").distinct()
    _tombstone_chain(spark, index_root, reg["segments"], urls)
    if dual:
        _tombstone_chain(
            spark, index_root, reg.get("segments_stopword", []), urls
        )

    if dual:
        man, man_stop = build_index_dual(
            spark,
            batch_df,
            seg_dir,
            seg_dir_stop,
            base_doc_id=reg["doc_id_hi"] + 1,
            **build_kwargs,
        )
        reg["segments_stopword"] = sorted(
            set(reg.get("segments_stopword", [])) | {seg_name_stop}
        )
        reg["dual"] = True
        hi = max(man["doc_id_hi"], man_stop["doc_id_hi"])
    else:
        man = build_index(
            spark,
            batch_df,
            seg_dir,
            base_doc_id=reg["doc_id_hi"] + 1,
            **build_kwargs,
        )
        hi = man["doc_id_hi"]
    reg["segments"] = sorted(set(reg["segments"]) | {seg_name})
    reg["doc_id_hi"] = hi
    _write_registry(index_root, reg)
    return man


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **build_kwargs,
):
    """readStream(parquet files under input_dir) → foreachBatch(ingest_batch).

    ``available_now=True`` drains everything currently present then stops
    (the batch-refresh operating mode); False runs continuously. Returns
    the StreamingQuery.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, index_root, batch_id, **build_kwargs)

    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file ≈ one micro-batch
        .parquet(input_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(
    spark: SparkSession, index_root: str, out_name: str = "seg_merged",
    **merge_kwargs,
) -> str:
    """Hierarchically merge all live segments (compacting tombstones) and
    swap the registry to the single merged segment — per analyzer variant
    on a dual registry. Returns the merged default-variant path."""
    import shutil

    from ..indexing.merge import hierarchical_merge

    reg = read_registry(index_root)
    variants = [("default", "segments", out_name)]
    if reg.get("dual"):
        variants.append(
            ("stopword", "segments_stopword", f"{out_name}_stopword")
        )
    finals: dict[str, str] = {}
    for variant, key, name in variants:
        segs = live_segments(index_root, variant)
        if len(segs) <= 1:
            finals[variant] = segs[0] if segs else ""
            continue
        merged = hierarchical_merge(
            spark, segs, os.path.join(index_root, f"_merge_{variant}"),
            **merge_kwargs,
        )
        final = os.path.join(index_root, name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(merged, final)
        reg = read_registry(index_root)
        reg[key] = [name]
        _write_registry(index_root, reg)
        finals[variant] = final
    return finals["default"]
