"""Partial re-index — the reference's update path re-expressed.

The reference's ``CaseLawsPartialIndex`` (solrIndexCreation.ts:2957-3192)
re-indexes only changed documents, with Solr absorbing the upsert. Here the
index is ours, so updates follow the standard segmented-index protocol:

- a changed/new page gets a fresh doc_id in a NEW delta segment
  (``reindex_changed``: base_doc_id continues past the base segment's
  high id — disjoint ranges are the merge invariant);
- the superseded doc_ids are tombstoned in the base segment
  (``tombstones/`` parquet — the Lucene liveDocs analog). Queries skip
  tombstoned docs at evaluation time (query/bmw.py); corpus stats stay
  slightly stale until a merge, exactly as in Lucene;
- the next ``merge_segments``/``hierarchical_merge`` compacts: dead
  postings dropped during re-blocking, stats recomputed from live docs,
  tombstones gone. A merged segment is bit-for-bit a normal segment.

``topk_segments`` queries several segments BEFORE a merge with combined
statistics (union dictionary, doc-weighted avgdl, union tombstones) — the
serving path while deltas accumulate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query.bmw import _topk_impl, load_tombstones, union_dead
from .build import build_index, read_manifest


def append_tombstones(
    spark: SparkSession, seg_dir: str, dead: DataFrame
) -> int:
    """Append tombstone rows (doc_id, doclen) to ``seg_dir``, skipping
    doc_ids already tombstoned there.

    Duplicate tombstones are harmless at query time (dead-set membership)
    but poisonous to statistics: ``topk_segments`` subtracts tombstone
    counts from n_docs/avgdl, and a url updated twice (or a replayed
    streaming batch) would otherwise append the same doc_id again, drifting
    idf and — under heavy churn — driving live-doc counts negative.
    Returns the number of rows actually appended.
    """
    import os

    dead = dead.select("doc_id", "doclen").dropDuplicates(["doc_id"])
    tomb_dir = f"{seg_dir}/tombstones"
    if os.path.exists(tomb_dir):
        existing = spark.read.parquet(tomb_dir).select("doc_id")
        dead = dead.join(existing, "doc_id", "left_anti")
    # persist so the dedup + anti-join plan runs ONCE: the count decides
    # (and reports) whether anything new exists, the write re-reads the
    # cached rows instead of re-evaluating the upstream scan/join
    dead = dead.persist()
    try:
        n = dead.count()
        if n:
            dead.write.mode("append").parquet(tomb_dir)
    finally:
        dead.unpersist()
    return n


def reindex_changed(
    spark: SparkSession,
    base_dir: str,
    changed_pages: DataFrame,
    delta_dir: str,
    **build_kwargs,
) -> dict:
    """Tombstone superseded docs in ``base_dir`` and build a delta segment
    for ``changed_pages`` (changed AND brand-new urls) at ``delta_dir``.

    Returns the delta manifest. The base segment is modified only by
    appending tombstone rows (idempotent at the query level — duplicate
    tombstones are harmless).
    """
    man = read_manifest(base_dir)
    base_docs = spark.read.parquet(f"{base_dir}/docs")
    changed_urls = changed_pages.select("url").distinct()
    dead = base_docs.join(F.broadcast(changed_urls), "url", "left_semi").select(
        "doc_id", "doclen"
    )
    append_tombstones(spark, base_dir, dead)

    build_kwargs.setdefault("num_buckets", man["num_buckets"])
    build_kwargs.setdefault("block_size", man.get("block_size", 128))
    build_kwargs.setdefault("analyzer", man.get("analyzer", "default"))
    return build_index(
        spark,
        changed_pages,
        delta_dir,
        base_doc_id=man["doc_id_hi"] + 1,
        **build_kwargs,
    )


def reindex_changed_multi(
    spark: SparkSession,
    seg_dirs: list[str],
    changed_pages: DataFrame,
    delta_dir: str,
    **build_kwargs,
) -> dict:
    """``reindex_changed`` over a segment CHAIN (base + earlier deltas):
    a url updated twice must tombstone its doc in whichever segment
    currently holds it — including a previous delta — or the old version
    keeps serving next to the new one. The new delta's doc ids continue
    past the chain's maximum (disjoint ranges are the merge invariant).
    """
    mans = [read_manifest(d) for d in seg_dirs]
    if len({m["num_buckets"] for m in mans}) != 1 or len(
        {m.get("analyzer", "default") for m in mans}
    ) != 1:
        raise ValueError("segments disagree on num_buckets/analyzer")
    changed_urls = changed_pages.select("url").distinct()
    for d in seg_dirs:
        dead = (
            spark.read.parquet(f"{d}/docs")
            .join(F.broadcast(changed_urls), "url", "left_semi")
            .select("doc_id", "doclen")
        )
        append_tombstones(spark, d, dead)

    build_kwargs.setdefault("num_buckets", mans[0]["num_buckets"])
    build_kwargs.setdefault("block_size", mans[0].get("block_size", 128))
    build_kwargs.setdefault("analyzer", mans[0].get("analyzer", "default"))
    return build_index(
        spark,
        changed_pages,
        delta_dir,
        base_doc_id=max(m["doc_id_hi"] for m in mans) + 1,
        **build_kwargs,
    )


def topk_segments(
    spark: SparkSession,
    seg_dirs: list[str],
    query: str,
    k: int = 10,
    shard_range: int = 1 << 17,
    dead=None,
) -> DataFrame:
    """BM25 top-k across several segments (pre-merge serving path).

    Statistics are combined across segments: N and avgdl from live docs,
    df summed from the union dictionary. Tombstoned docs are excluded from
    results; their residual contribution to df (until the next merge
    compacts them) matches standard segmented-index behavior.

    ``dead``: optional precomputed dead set (the return of
    ``union_dead(spark, [load_tombstones(spark, d) for d in seg_dirs])``).
    High-QPS pre-merge serving should compute it once per segment
    generation and pass it in — per-query recomputation re-reads the
    tombstone parquet and, on the large-churn path, re-creates Spark
    resources each call that are only reclaimed by the ContextCleaner.
    """
    mans = [read_manifest(d) for d in seg_dirs]
    num_buckets = {m["num_buckets"] for m in mans}
    analyzers = {m.get("analyzer", "default") for m in mans}
    if len(num_buckets) != 1 or len(analyzers) != 1:
        raise ValueError("segments disagree on num_buckets/analyzer")

    if dead is None:
        dead = union_dead(
            spark, [load_tombstones(spark, d) for d in seg_dirs]
        )
    # live-doc stats: tombstones carry doclen, so the correction is exact
    n_total = sum(m["n_docs"] for m in mans)
    tok_total = sum(m["n_docs"] * m["avgdl"] for m in mans)
    dead_tok = 0
    for d in seg_dirs:
        import os

        if os.path.exists(f"{d}/tombstones"):
            # distinct by doc_id: append_tombstones already dedups, but
            # stats must stay correct even against pre-guard tombstone
            # files (duplicates would drift idf / go negative under churn)
            row = (
                spark.read.parquet(f"{d}/tombstones")
                .dropDuplicates(["doc_id"])
                .agg(F.count("*").alias("n"), F.sum("doclen").alias("tok"))
                .collect()[0]
            )
            n_total -= int(row["n"] or 0)
            dead_tok += int(row["tok"] or 0)
    n_total = max(n_total, 0)
    avgdl = (tok_total - dead_tok) / n_total if n_total > 0 else 1.0

    man = {
        "num_buckets": num_buckets.pop(),
        "n_docs": n_total,
        "avgdl": avgdl,
        "analyzer": analyzers.pop(),
    }

    def _union(frames):
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    dictionary = _union(
        [spark.read.parquet(f"{d}/dictionary") for d in seg_dirs]
    ).groupBy("term", "bucket").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.sum("n_blocks").alias("n_blocks"),
        F.max("max_tf_norm").alias("max_tf_norm"),
    )
    postings = _union([spark.read.parquet(f"{d}/postings") for d in seg_dirs])
    return _topk_impl(
        spark, man, dictionary, postings, query, k, shard_range, dead=dead
    )
