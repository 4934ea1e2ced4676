"""One worker of the bulk-query scaling run (tools/scaling_query.py):
hold a QuerySession over a PRE-BUILT index, evaluate one topk_batch of
n_queries, print one JSON line with the epoch query window (the parent
unions concurrent windows, session boot + warm-up excluded — cluster
executors are long-running).

Usage: python tools/scaling_query_worker.py <cores> <idx> <n_queries> <offset> [start_at_epoch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, idx = int(sys.argv[1]), sys.argv[2]
    n_queries, offset = int(sys.argv[3]), int(sys.argv[4])
    start_at = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

    from pyspark.sql import functions as F

    from solr_indexing_spark.query.bmw import QuerySession
    from solr_indexing_spark.session import get_spark

    spark = get_spark(
        f"qscale{cores}_{offset}", cores=cores, shuffle_partitions=16
    )
    # query vocabulary from the index's own dictionary — a deterministic
    # mix of head terms (dense → TAAT kernel) and mid-df terms
    # (selective → WAND): both kernels participate in the measurement
    d = spark.read.parquet(f"{idx}/dictionary")
    head = [
        r["term"] for r in d.orderBy(F.desc("df"), "term").limit(24).collect()
    ]
    mid = [
        r["term"]
        for r in d.filter((F.col("df") >= 8) & (F.col("df") <= 64))
        .orderBy("term")
        .limit(24)
        .collect()
    ]
    terms = head + mid
    M = len(terms)
    queries = {
        offset + i: (
            f"{terms[(offset + i) % M]} {terms[(3 * (offset + i) + 1) % M]} "
            f"{terms[(7 * (offset + i) + 2) % M]} "
            f"{terms[((offset + i) // M) % M]}"
        )
        for i in range(n_queries)
    }
    qs = QuerySession(spark, idx, cache_postings=True)
    qs.topk_batch({-1 - offset: f"{terms[0]} {terms[1]}"}, k=10).collect()

    # barrier: all workers of a leg start their measured window together
    # (warm sessions idle until the parent's start_at), so the union
    # window measures concurrent serving, not boot-time misalignment
    if start_at:
        delay = start_at - time.time()
        if delay > 0:
            time.sleep(delay)

    w0 = time.time()
    t0 = time.monotonic()
    n_rows = len(qs.topk_batch(queries, k=10).collect())
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "offset": offset,
                "n_queries": n_queries,
                "wall_s": round(wall, 3),
                "qps": round(n_queries / wall, 1),
                "n_rows": n_rows,
                "w0": w0,
                "w1": w0 + wall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
