"""Stable, scalable dense docID assignment.

The reference implicitly keys documents by their source-row ids (``dr["mid"]``
/ ``dr["id"]``, solrIndexCreation.ts:918-921). Our engine needs *dense int64*
docIDs for gap compression, assigned deterministically so top-k tie-breaks are
reproducible across runs and cluster sizes (SURVEY.md §4.2-3).

Algorithm (two-phase, no global sort bottleneck, no RDD zipWithIndex):
 1. ``repartitionByRange(P, order_col)`` + ``sortWithinPartitions`` — a range
    shuffle; partition p holds the p-th slice of the global order.
 2. per-partition counts → driver prefix sums (P integers — tiny) → broadcast.
 3. ``mapInPandas`` adds ``offset[pid] + running_index`` per partition.

The resulting ids equal rank-in-global-``order_col``-order regardless of where
the range sampler placed partition boundaries, so they match the pure-Python
oracle, which just sorts urls. Scales: step 2 moves O(P) values to the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = base_doc_id
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        list(ranged.schema.fields)
        + [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("_wall_ms", T.DoubleType(), False),
        ]
    )

    def add_ids(batches):
        import time

        t0 = time.monotonic()
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = b_offsets.value[pid] + seen
            seen += len(pdf)
            pdf = pdf.assign(
                doc_id=np.arange(start, start + len(pdf), dtype=np.int64),
                _wall_ms=(time.monotonic() - t0) * 1000.0,
            )
            yield pdf

    return ranged.mapInPandas(add_ids, out_schema)
