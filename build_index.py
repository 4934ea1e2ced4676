#!/usr/bin/env python
"""spark-submit entry: build an index segment from a pages table.

    spark-submit --py-files engine.zip build_index.py \
        --pages /path/to/pages.parquet --out /path/to/index \
        [--buckets 256] [--block-size 128] [--salt-threshold 1000000] \
        [--base-doc-id 0] [--verify-extraction]

At cluster scale, run one invocation per pages partition-range with
disjoint --base-doc-id ranges, then `merge_index.py` hierarchically.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--salt-threshold", type=int, default=1_000_000)
    ap.add_argument("--salt-range", type=int, default=1 << 16)
    ap.add_argument("--base-doc-id", type=int, default=0)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--verify-extraction", action="store_true")
    ap.add_argument(
        "--analyzer", choices=["default", "stopword"], default="default",
        help="tokenizer variant (the reference's IndexName vs IndexNameStopword)",
    )
    ap.add_argument("--cores", default=None, help="local[N] override for non-cluster runs")
    args = ap.parse_args()

    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.session import get_spark

    if args.cores:
        spark = get_spark("build_index", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("build_index").getOrCreate()

    pages = spark.read.parquet(args.pages)
    manifest = build_index(
        spark,
        pages,
        args.out,
        num_buckets=args.buckets,
        block_size=args.block_size,
        salt_df_threshold=args.salt_threshold,
        salt_range=args.salt_range,
        num_partitions=args.partitions,
        base_doc_id=args.base_doc_id,
        verify_extraction=args.verify_extraction,
        analyzer=args.analyzer,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
