"""One leg of the two-parallelism scaling run: build the index at a given
core count, print one JSON line {cores, n, build_s, docs_per_sec}.

Usage: python tools/scaling_worker.py <cores> <pages_parquet[,more]> <out_dir>
                                      [base_doc_id]
Shuffle partitions are pinned (64) so only executor-slot count varies
between legs (SURVEY.md §4.3). `pages_parquet` may be a comma-separated
path list (shard slices for the executor-emulation harness,
tools/scaling_cluster.py); `base_doc_id` offsets the shard's doc ids so
concurrent workers emit disjoint ranges.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, pages_path, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    base_doc_id = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.session import get_spark

    spark = get_spark(f"scale{cores}", cores=cores, shuffle_partitions=64)
    pages = spark.read.parquet(*pages_path.split(","))
    n = pages.count()  # warms the session + file index before timing

    w0 = time.time()  # epoch: lets the parent union concurrent windows
    t0 = time.monotonic()
    build_index(spark, pages, out_dir, num_buckets=16,
                base_doc_id=base_doc_id)
    build_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "n": n,
                "build_s": round(build_s, 2),
                "build_start": w0,
                "build_end": w0 + build_s,
                "docs_per_sec": round(n / build_s, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
