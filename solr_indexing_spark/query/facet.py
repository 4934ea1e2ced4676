"""Facet counts over the matching set — Solr faceting (facet.field on the
search handler), the navigation surface of every Solr deployment like the
reference's (court / year / doctype counts next to legal search results).

Semantics match Solr: for the docs matching the analyzed query (disjunctive
— any term; Lucene's default OR), count documents per value of a stored
metadata column, tombstoned docs excluded, optionally intersected with a
filter query (fq) — counts are over the match set, BM25 scores play no
part.

Plan shape (all distributed, no driver materialization):

    postings (bucket + term pruned scan) ──mapInPandas decode──▶ doc_id
    rows ──distinct──▶ anti-join tombstones [──semi-join fq──] ──join docs
    (metadata cols only, column-pruned scan)──▶ groupBy(col).count()

The decode UDF emits one int64 column from the delta-compressed gap
buffers; volume is the query terms' posting count, partitioned by the
pruned scan. The distinct and the docs join are ordinary shuffles on
doc_id — the same keys the engine shuffles everywhere else.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import delta_decode
from ..indexing.build import _term_bucket_py, read_docs, read_manifest
from ..textprep import ANALYZERS


def _decode_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        chunks = [
            delta_decode(int(r.first_doc_id), bytes(r.doc_gaps), int(r.n_docs))
            for r in pdf.itertuples()
        ]
        yield pd.DataFrame(
            {"doc_id": np.concatenate(chunks).astype(np.int64)}
        )


def _dead_anti_join(spark: SparkSession, ids: DataFrame, dead) -> DataFrame:
    """Remove a precomputed dead set (any of the serving dead-set shapes:
    frozenset / BroadcastDeadSet / TombstoneFrame / None) from a doc_id
    frame — the session paths hold one of these, computed once per
    segment generation, instead of re-reading tombstone parquet."""
    from .bmw import BroadcastDeadSet, TombstoneFrame

    if not dead:
        return ids
    if isinstance(dead, TombstoneFrame):
        return ids.join(dead.df.select("doc_id"), "doc_id", "left_anti")
    if isinstance(dead, BroadcastDeadSet):
        rows = [(int(d),) for d in dead.to_array()]
    else:
        rows = [(int(d),) for d in sorted(dead)]
    return ids.join(
        spark.createDataFrame(rows, "doc_id long"), "doc_id", "left_anti"
    )


def _match_ids_impl(
    spark: SparkSession,
    man: dict,
    postings: DataFrame,
    query,
    dead=None,
) -> DataFrame:
    """Core OR-match-set assembly over an already-assembled postings plan
    + dead set — shared by the one-shot path and the warm sessions (which
    pass their per-generation union postings and precomputed dead set, so
    a facet/count/sorted request never re-reads tombstone parquet)."""
    if isinstance(query, (list, tuple, set, frozenset)):
        terms = sorted({str(t).lower() for t in query})
    else:
        tokenizer = ANALYZERS.get(
            man.get("analyzer", "default"), ANALYZERS["default"]
        )[2]
        terms = sorted(set(tokenizer(query)))
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    buckets = sorted(
        {_term_bucket_py(t, man["num_buckets"]) for t in terms}
    )
    from .batch import filter_terms

    ids = (
        filter_terms(postings.filter(F.col("bucket").isin(buckets)), terms)
        .select("first_doc_id", "n_docs", "doc_gaps")
        .mapInPandas(_decode_ids, "doc_id long")
        .distinct()
    )
    return _dead_anti_join(spark, ids, dead)


def matching_doc_ids(
    spark: SparkSession,
    index_dir: str | list[str],
    query,
) -> DataFrame:
    """Distinct live doc_ids matching ANY analyzed query term (the Lucene
    OR match set) across a segment or chain — the input to faceting,
    match counting, sorted serving and export jobs. Lazy; one pruned
    postings scan."""
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    mans = [read_manifest(d) for d in dirs]
    # same gate every other chain entry point enforces (_chain_state):
    # a mixed chain would bucket-prune with dirs[0]'s num_buckets and
    # silently drop the other segments' matches — error, don't undercount
    if (
        len({m["num_buckets"] for m in mans}) != 1
        or len({m.get("analyzer", "default") for m in mans}) != 1
    ):
        raise ValueError("segments disagree on num_buckets/analyzer")
    post = spark.read.parquet(f"{dirs[0]}/postings")
    for d in dirs[1:]:
        post = post.unionByName(spark.read.parquet(f"{d}/postings"))
    ids = _match_ids_impl(spark, mans[0], post, query, dead=None)
    for d in dirs:
        if os.path.exists(f"{d}/tombstones"):
            ids = ids.join(
                spark.read.parquet(f"{d}/tombstones").select("doc_id"),
                "doc_id",
                "left_anti",
            )
    return ids


def docs_meta_union(
    spark: SparkSession,
    dirs: list[str],
    mans: list[dict],
    cols: list[str],
) -> DataFrame:
    """Union of the chain segments' docs tables restricted to (doc_id,
    *cols); a segment lacking a column contributes NULLs for it (the
    facet.missing bucket / a sort key that sorts last)."""

    def _meta(d, m):
        t = read_docs(spark, d, m)
        sel = [F.col("doc_id")]
        for c in cols:
            if c in t.columns:
                sel.append(F.col(c))
            else:
                sel.append(F.lit(None).cast("string").alias(c))
        return t.select(*sel)

    docs = _meta(dirs[0], mans[0])
    for d, m in zip(dirs[1:], mans[1:]):
        docs = docs.unionByName(_meta(d, m))
    return docs


def _facet_impl(
    ids: DataFrame,
    docs: DataFrame,
    col: str,
    max_values: int | None = None,
) -> DataFrame:
    out = (
        ids.join(docs, "doc_id")
        .groupBy(F.col(col).alias("facet"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("facet"))
    )
    return out.limit(max_values) if max_values else out


def facet_counts(
    spark: SparkSession,
    index_dir: str | list[str],
    query,
    col: str = "lang",
    allow: DataFrame | None = None,
    max_values: int | None = None,
) -> DataFrame:
    """(facet, n) — live matching-doc count per value of stored metadata
    column ``col``, ordered by (n desc, facet asc); ``max_values`` caps the
    output like Solr's facet.limit. ``allow``: optional fq doc set
    (DataFrame of doc_id) intersected with the match set. Null column
    values group as NULL, matching Solr's facet.missing bucket."""
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    ids = matching_doc_ids(spark, dirs, query)
    if allow is not None:
        ids = ids.join(
            allow.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    mans = [read_manifest(d) for d in dirs]
    docs = docs_meta_union(spark, dirs, mans, [col])
    return _facet_impl(ids, docs, col, max_values)


def match_count(
    spark: SparkSession, index_dir: str | list[str], query, allow=None
) -> int:
    """numFound — live docs matching any analyzed query term (with an
    optional fq set), without scoring. One Spark job."""
    ids = matching_doc_ids(spark, index_dir, query)
    if allow is not None:
        ids = ids.join(
            allow.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    return ids.count()
