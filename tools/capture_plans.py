"""Capture .explain('formatted') of the headline plans into BENCH/PLANS.md.

Run: python tools/capture_plans.py   (writes BENCH/PLANS.md)
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from solr_indexing_spark.docprep.dedup import minhash_near_dups
    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.query.bmw import topk
    from solr_indexing_spark.session import get_spark
    from solr_indexing_spark.synth import write_pages_parquet
    from solr_indexing_spark.textprep import tokenize_tf

    spark = get_spark("plans", cores=8)
    work = tempfile.mkdtemp(prefix="plans_")

    sections: list[tuple[str, str, str]] = []

    # --- index build: the one wide exchange ------------------------------
    write_pages_parquet(f"{work}/pages.parquet", 2000, seed=7)
    pages = spark.read.parquet(f"{work}/pages.parquet")
    build_index(spark, pages, f"{work}/idx", num_buckets=8)
    docs_r = spark.read.parquet(f"{work}/idx/docs")
    exploded = (
        docs_r.select(
            "doc_id", "doclen", F.explode(tokenize_tf(F.col("text"))).alias("e")
        )
        .select("doc_id", "doclen", F.col("e.term").alias("term"),
                F.col("e.tf").alias("tf"))
        .withColumn("salt", F.lit(0))
        .repartition("term", "salt")
        .sortWithinPartitions("term", "salt", "doc_id")
    )
    sections.append((
        "Index build — posting path (tokenize_tf → explode → ONE hash "
        "exchange → in-partition sort)",
        plan_of(exploded),
        "What to check: a single `Exchange hashpartitioning(term, salt)` "
        "feeding a `Sort [term, salt, doc_id], false` (in-partition, not "
        "global) — the block builder (mapInPandas) consumes this directly. "
        "`ReadSchema` on the docs scan carries only doc_id/doclen/text "
        "(column pruning past the ArrowEvalPython node).",
    ))

    # --- BMW query: bucket-pruned postings scan ---------------------------
    q = topk(spark, f"{work}/idx", "zanpelmek belhax", k=10)
    sections.append((
        "BM25 block-max WAND query (bucket-pruned postings scan → "
        "doc-range shards → per-shard UDF → k-row global merge)",
        plan_of(q),
        "What to check: the postings `Scan parquet` shows "
        "`PartitionFilters: [bucket IN (…)]` — only the query terms' bucket "
        "directories are read (partition pruning on the term-hash layout); "
        "`PushedFilters` carries the term IN-list to parquet row groups. "
        "`TakeOrderedAndProject(limit=10)` merges at most k rows per shard "
        "— no global sort of candidates.",
    ))

    # --- brute BM25: single-job scorer -----------------------------------
    b = entry._bm25_brute(spark, SF, ["spark", "query", "data"], 10)
    sections.append((
        "Brute-force BM25 (oracle/AB path): one job, df via window over "
        "filtered rows",
        plan_of(b),
        "What to check: ONE scan of documents; the term filter sits "
        "directly on the exploded stream (`Filter term IN (…)` under the "
        "Generate); df comes from a `Window [count] partitionBy term` over "
        "the already-filtered tf rows instead of a second corpus scan; "
        "doclen joins in from the cached per-corpus table as a "
        "BroadcastHashJoin.",
    ))

    # --- MinHash LSH near-dup ---------------------------------------------
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = minhash_near_dups(docs, threshold=0.5)
    sections.append((
        "MinHash-LSH near-duplicates (signatures → band join → verify "
        "candidates only)",
        plan_of(m),
        "What to check: the expensive shingle work happens once per doc "
        "(project + groupBy id with 8 min-aggregates — partial+final hash "
        "agg); the band self-join joins on a single 60-bit `band_key`; the "
        "final verify joins candidate PAIRS back to per-doc shingle arrays "
        "(two broadcast-able joins) and intersects in-row — no all-pairs "
        "shingle equi-join anywhere in the plan.",
    ))

    # --- TPC-H-ish pricing agg -------------------------------------------
    p = entry._dp_agg_pricing(spark, SF)
    sections.append((
        "Pricing aggregate (TPC-H Q1 shape — the hash-agg workhorse)",
        plan_of(p),
        "What to check: `PushedFilters: [LessThanOrEqual(l_shipdate,…)]` "
        "reaches the parquet scan; `ReadSchema` lists only the 7 needed "
        "columns of lineitem; partial_… aggregate functions before the "
        "exchange (map-side combine) and one `Exchange "
        "hashpartitioning(l_returnflag, l_linestatus)`; the whole pipeline "
        "sits inside WholeStageCodegen spans.",
    ))

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "PLANS.md",
    )
    with open(out_path, "w") as fh:
        fh.write(
            "# BENCH/PLANS — physical plans of the headline operators\n\n"
            "Captured by `python tools/capture_plans.py` (PySpark "
            f"{spark.version}, AQE on). Each section: the plan, then what "
            "property of it matters at 100 TB.\n"
        )
        for title, plan, note in sections:
            fh.write(f"\n## {title}\n\n{note}\n\n```\n{plan}```\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
