"""Stable, scalable dense docID assignment.

The reference implicitly keys documents by their source-row ids (``dr["mid"]``
/ ``dr["id"]``, solrIndexCreation.ts:918-921). Our engine needs *dense int64*
docIDs for gap compression, assigned deterministically so top-k tie-breaks are
reproducible across runs and cluster sizes (SURVEY.md §4.2-3).

Algorithm (two-phase, no global sort bottleneck, no Python in the path):
 1. ``repartitionByRange(P, order_col)`` + ``sortWithinPartitions`` — a range
    shuffle; partition p holds the p-th slice of the global order.
 2. per-partition counts → driver prefix sums (P integers — tiny).
 3. ``doc_id = offset[_pid] + row-in-partition`` entirely JVM-side:
    ``monotonically_increasing_id()`` is ``pid·2^33 + row-counter`` with the
    counter following partition row order, so the row index is
    ``mid & (2^33−1)`` — no Arrow round-trip of the (large) page payloads
    just to add an id column, which profiling showed dominating the docs
    stage at 240k pages.

The resulting ids equal rank-in-global-``order_col``-order regardless of where
the range sampler placed partition boundaries, so they match the pure-Python
oracle, which just sorts urls. Scales: step 2 moves O(P) values to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MID_ROW_MASK = (1 << 33) - 1


def assign_doc_ids(
    df: DataFrame,
    order_col: str = "url",
    num_partitions: int | None = None,
    base_doc_id: int = 0,
) -> DataFrame:
    """Return df + ``doc_id`` (long) + ``_pid``/``_wall_ms`` lineage columns.

    ``doc_id`` = base_doc_id + rank of the row in ascending ``order_col``
    order (ties impossible for unique urls; for non-unique keys order within
    the tie is partition-stable but unspecified).

    Correctness depends on the ``.persist()`` below: the collected
    per-partition counts are only valid for THE SAME materialization of the
    range shuffle (a recompute would re-sample range boundaries). The
    persisted plan is stashed on the returned DataFrame as
    ``._docids_cache`` — the caller must unpersist it once ids are
    materialized downstream, and should verify the
    ``max(doc_id)+1-base == count`` invariant before committing (build.py
    does both). Assumes < 2^33 rows per partition (the
    monotonically_increasing_id row-counter width).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    ).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = base_doc_id
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # offset lookup as a literal map expression (P entries — tiny plan)
    map_args = []
    for pid, off in offsets.items():
        map_args.append(F.lit(pid))
        map_args.append(F.lit(off))
    offset_of_pid = F.element_at(F.create_map(*map_args), F.col("_pid"))

    mid = F.monotonically_increasing_id()
    row_in_part = mid.bitwiseAND(F.lit(_MID_ROW_MASK))
    out = ranged.withColumn(
        "doc_id", (offset_of_pid + row_in_part).cast("long")
    ).withColumn("_wall_ms", F.lit(0.0))
    out._docids_cache = ranged  # caller unpersists after materialization
    out._docids_expected = acc - base_doc_id
    return out
