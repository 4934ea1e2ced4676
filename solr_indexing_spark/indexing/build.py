"""Index build: pages → docs / postings / dictionary / stats / lineage.

This is the from-scratch half (BASELINE.json north_star): the reference hands
documents to Solr for inverted-index construction (commented BulkIndexing,
solrIndexCreation.ts:876-882); here the segments ARE the sink.

Dataflow (one term-hash shuffle, everything else narrow):

    pages ──extract/verify──▶ docs (stable doc_id, doclen)          [range shuffle]
      └─ tokenize (Arrow UDF) ─ posexplode ─ groupBy(term,doc) tf   [partial+final hash agg]
         └─ salt head terms (df > threshold → contiguous doc-range shards)
            └─ applyInPandas build_blocks per (term,salt)           [term-hash shuffle]
               └─ postings parquet partitioned by bucket (pruning at query time)
    dictionary = blocks.groupBy(term) agg ; stats = docs.agg ; lineage per partition

Skew handling (SURVEY.md §4.2-1): Zipf head terms would hot-spot single
reducers inside the groupBy — AQE cannot split a groupBy key — so terms whose
df exceeds ``salt_df_threshold`` are salted by *contiguous docID range*
(salt = doc_id // salt_range). Contiguous ranges keep each shard's postings
globally ordered, so shard outputs concatenate into a valid posting list with
no re-merge pass; only the boundary blocks are underfull.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import BLOCK_SIZE, K1, B as B_PARAM
from ..codec import vbyte_encode
from ..textprep import (
    EXTRACTOR_VERSION,
    TOKENIZER_VERSION,
    extract_text,
    tokenize,
)
from .docids import assign_doc_ids

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        # per-posting doclens (VByte) — Lucene-norms-style: scoring stays
        # local at query time, no join against the docs table
        T.StructField("doclens", T.BinaryType(), False),
        T.StructField("block_max_tf_norm", T.DoubleType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("build_us", T.LongType(), False),
    ]
)


def tf_norm(tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 term-frequency saturation (idf-independent part)."""
    tf = tf.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B_PARAM + B_PARAM * doclen / avgdl))


def _make_block_builder(avgdl: float, num_buckets: int, block_size: int):
    def build_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic_ns()
        term = pdf["term"].iloc[0]
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        doclens = pdf["doclen"].to_numpy()[order].astype(np.float64)
        norms = tf_norm(tfs, doclens, avgdl)
        bucket = _term_bucket_py(term, num_buckets)
        salt = int(pdf["salt"].iloc[0])
        n = len(doc_ids)
        rows = []
        # block ids: globally ordered across salt shards because salting is by
        # contiguous doc range — shard s covers ids < shard s+1 entirely.
        base_block = salt << 20  # up to 1M blocks per shard
        for b, lo in enumerate(range(0, n, block_size)):
            hi = min(lo + block_size, n)
            ids = doc_ids[lo:hi]
            gaps = vbyte_encode(np.diff(ids).astype(np.uint64))
            tf_bytes = vbyte_encode(tfs[lo:hi].astype(np.uint64))
            dl_bytes = vbyte_encode(doclens[lo:hi].astype(np.uint64))
            rows.append(
                (
                    term,
                    bucket,
                    base_block + b,
                    int(ids[0]),
                    int(ids[-1]),
                    int(hi - lo),
                    gaps,
                    tf_bytes,
                    dl_bytes,
                    float(norms[lo:hi].max()),
                    int(tfs[lo:hi].sum()),
                    (time.monotonic_ns() - t0) // 1000,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[f.name for f in POSTINGS_SCHEMA.fields],
        )

    return build_blocks


def _term_bucket_py(term: str, num_buckets: int) -> int:
    """Stable term→bucket hash, identical on driver and executors.

    Not Python's randomized hash(); crc32 of utf-8 bytes, same as the
    query side uses for partition pruning.
    """
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets


def term_bucket_col(term_col, num_buckets: int):
    """Catalyst expression equal to _term_bucket_py (crc32 % buckets)."""
    return F.pmod(F.crc32(F.col(term_col) if isinstance(term_col, str) else term_col), F.lit(num_buckets)).cast("int")


def build_docs(
    pages: DataFrame,
    num_partitions: int | None = None,
    base_doc_id: int = 0,
    verify_extraction: bool = False,
) -> DataFrame:
    """pages → docs(doc_id, url, text, lang, doclen, toks, _pid, _wall_ms).

    If the ``text`` column is absent it is produced by ``extract_text(html)``;
    if present and ``verify_extraction``, rows where extraction disagrees with
    the provided text raise at action time (the byte-identity invariant).
    """
    cols = set(pages.columns)
    if "text" not in cols:
        pages = pages.withColumn("text", extract_text(F.col("html")))
    elif verify_extraction and "html" in cols:
        pages = pages.withColumn("_ext", extract_text(F.col("html")))
    docs = assign_doc_ids(pages, order_col="url", num_partitions=num_partitions, base_doc_id=base_doc_id)
    docs = docs.withColumn("toks", tokenize(F.col("text"))).withColumn(
        "doclen", F.size("toks")
    )
    keep = ["doc_id", "url", "text", "lang", "doclen", "toks", "_pid", "_wall_ms"]
    if "_ext" in docs.columns:
        keep.append("_ext")
    return docs.select(*[c for c in keep if c in docs.columns])


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    num_buckets: int = 16,
    block_size: int = BLOCK_SIZE,
    salt_df_threshold: int = 100_000,
    salt_range: int = 1 << 16,
    num_partitions: int | None = None,
    base_doc_id: int = 0,
    verify_extraction: bool = False,
    analyzer: str = "default",
) -> dict:
    """Build one index segment under ``out_dir``. Returns manifest dict.

    Layout: docs/ postings/ (partitioned by bucket) dictionary/ stats/
    lineage/ _manifest.json. Commit is atomic at the manifest write: readers
    (query side, merge) treat a segment without _manifest.json as absent.
    """
    t_start = time.monotonic()
    os.makedirs(out_dir, exist_ok=True)

    docs = build_docs(
        pages, num_partitions=num_partitions, base_doc_id=base_doc_id,
        verify_extraction=verify_extraction,
    ).persist()

    if "_ext" in docs.columns:
        n_bad = docs.filter(F.col("_ext") != F.col("text")).count()
        if n_bad:
            raise ValueError(
                f"extract_text(html) != text for {n_bad} rows — "
                "byte-identity invariant violated"
            )

    # ---- stats (N, avgdl) — one tiny agg -------------------------------
    stats_row = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total_tokens"),
    ).collect()[0]
    n_docs_total = stats_row["n_docs"]
    avgdl = float(stats_row["avgdl"] or 1.0)

    # ---- docs table + docs-stage lineage -------------------------------
    docs_wall = time.monotonic() - t_start
    docs.select("doc_id", "url", "text", "lang", "doclen").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/docs")
    docs_lineage = docs.groupBy(F.col("_pid").alias("partition_id")).agg(
        F.min("doc_id").alias("doc_lo"),
        F.max("doc_id").alias("doc_hi"),
        F.count("*").alias("n_docs"),
        F.sum("doclen").alias("token_count"),
        F.sum(F.length("text")).alias("bytes"),
        F.max("_wall_ms").alias("wall_ms"),
    ).withColumn("stage", F.lit("docs"))

    # ---- term frequencies: tokenize → posexplode → hash agg ------------
    # doclen rides along (functionally dependent on doc_id) to avoid a
    # docs-side join when computing block-max norms.
    tok_col = "toks"
    tf = (
        docs.select("doc_id", "doclen", F.explode(tok_col).alias("term"))
        .groupBy("term", "doc_id", "doclen")
        .agg(F.count("*").alias("tf"))
    ).persist()

    # ---- head-term salting (contiguous doc ranges) ---------------------
    # df <= n_docs, so when the threshold can't be exceeded skip the extra
    # job entirely (saves a full pass at small scale; free at large scale).
    if salt_df_threshold >= n_docs_total:
        head_terms = []
    else:
        df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
        head_terms = [
            r["term"]
            for r in df_per_term.filter(F.col("df") > salt_df_threshold).collect()
        ]
    if head_terms:
        head_set = set(head_terms)
        tf = tf.withColumn(
            "salt",
            F.when(
                F.col("term").isin(list(head_set)),
                (F.col("doc_id") / F.lit(salt_range)).cast("int"),
            ).otherwise(F.lit(0)),
        )
    else:
        tf = tf.withColumn("salt", F.lit(0).cast("int"))

    # ---- the one big shuffle: group by (term, salt) → block build ------
    builder = _make_block_builder(avgdl, num_buckets, block_size)
    blocks = tf.groupBy("term", "salt").applyInPandas(builder, POSTINGS_SCHEMA)
    blocks.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{out_dir}/postings"
    )
    blocks_r = spark.read.parquet(f"{out_dir}/postings")

    # ---- dictionary + postings lineage ---------------------------------
    dictionary = blocks_r.groupBy("term", "bucket").agg(
        F.sum("n_docs").alias("df"),
        F.sum("sum_tf").alias("cf"),
        F.count("*").alias("n_blocks"),
        F.max("block_max_tf_norm").alias("max_tf_norm"),
    )
    dictionary.write.mode("overwrite").parquet(f"{out_dir}/dictionary")

    post_lineage = blocks_r.groupBy(F.col("bucket").alias("partition_id")).agg(
        F.min("first_doc_id").alias("doc_lo"),
        F.max("last_doc_id").alias("doc_hi"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_tf").alias("token_count"),
        F.sum(
            F.length("doc_gaps") + F.length("tfs") + F.length("doclens")
        ).alias("bytes"),
        (F.sum("build_us") / 1000.0).alias("wall_ms"),
    ).withColumn("stage", F.lit("postings"))

    lineage_cols = ["stage", "partition_id", "doc_lo", "doc_hi", "n_docs",
                    "token_count", "bytes", "wall_ms"]
    docs_lineage.select(*lineage_cols).unionByName(
        post_lineage.select(*lineage_cols)
    ).write.mode("overwrite").parquet(f"{out_dir}/lineage")

    spark.createDataFrame(
        [(int(n_docs_total), float(avgdl), int(stats_row["total_tokens"] or 0))],
        T.StructType(
            [
                T.StructField("n_docs", T.LongType(), False),
                T.StructField("avgdl", T.DoubleType(), False),
                T.StructField("total_tokens", T.LongType(), False),
            ]
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/stats")

    docs.unpersist()
    tf.unpersist()

    manifest = {
        "format_version": 1,
        "analyzer": analyzer,
        "tokenizer": TOKENIZER_VERSION,
        "extractor": EXTRACTOR_VERSION,
        "num_buckets": num_buckets,
        "block_size": block_size,
        "n_docs": int(n_docs_total),
        "doc_id_base": base_doc_id,
        "doc_id_hi": base_doc_id + int(n_docs_total) - 1,
        "avgdl": avgdl,
        "salt_df_threshold": salt_df_threshold,
        "salt_range": salt_range,
        "head_terms_salted": len(head_terms),
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "docs_stage_wall_s": round(docs_wall, 3),
    }
    tmp = f"{out_dir}/_manifest.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, f"{out_dir}/_manifest.json")
    return manifest


def read_manifest(index_dir: str) -> dict:
    with open(f"{index_dir}/_manifest.json") as fh:
        return json.load(fh)
