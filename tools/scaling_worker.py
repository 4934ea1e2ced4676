"""One leg of the two-parallelism scaling run: build the index at a given
core count, print one JSON line {cores, n, build_s, docs_per_sec}.

Usage: python tools/scaling_worker.py <cores> <pages_parquet> <out_dir>
Shuffle partitions are pinned (64) so only executor-slot count varies
between legs (SURVEY.md §4.3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, pages_path, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.session import get_spark

    spark = get_spark(f"scale{cores}", cores=cores, shuffle_partitions=64)
    pages = spark.read.parquet(pages_path)
    n = pages.count()  # warms the session + file index before timing

    t0 = time.monotonic()
    build_index(spark, pages, out_dir, num_buckets=16)
    build_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "n": n,
                "build_s": round(build_s, 2),
                "docs_per_sec": round(n / build_s, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
