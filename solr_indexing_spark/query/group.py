"""Match-set analytics: result collapsing (Solr's CollapsingQParser /
field collapse), stats.field, and range facets — all EXACT, computed
over the FULL OR match set through the index.

The substrate is :func:`score_matches`: unlike the top-k kernels (which
keep ≤k rows per shard), grouping needs a score for every matching doc,
so the pruned postings blocks are Arrow-decoded to (term, doc_id, tf,
doclen) rows and BM25 is applied as Catalyst expressions — one scan,
one per-doc aggregation, output bounded by the query terms' Σdf (the
match set), never the corpus. No over-fetch window: a group whose best
doc ranks 10^6th globally still surfaces, matching Lucene's collapse
semantics (reference context: the Solr serving side the repo's ETL
feeds, solrIndexCreation.ts builds the collapse/sort fields these
queries group on).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import B, K1
from ..codec import delta_decode, vbyte_decode
from ..indexing.merge import read_manifest
from ..textprep import ANALYZERS
from .batch import _resolve_term_meta, filter_terms
from .bmw import _term_bucket_py, load_tombstones
from .facet import _dead_anti_join


def _decode_scored(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(term, block) rows → (term, doc_id, tf, doclen) rows."""
    for pdf in batches:
        if not len(pdf):
            continue
        terms, ids, tfs, dls = [], [], [], []
        for r in pdf.itertuples():
            n = int(r.n_docs)
            ids.append(
                delta_decode(int(r.first_doc_id), bytes(r.doc_gaps), n)
            )
            tfs.append(vbyte_decode(bytes(r.tfs)))
            dls.append(vbyte_decode(bytes(r.doclens)))
            terms.append(np.full(n, r.term, dtype=object))
        yield pd.DataFrame(
            {
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(ids).astype(np.int64),
                "tf": np.concatenate(tfs).astype(np.int32),
                "doclen": np.concatenate(dls).astype(np.int32),
            }
        )


def _score_matches_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    postings: DataFrame,
    query,
    dead=None,
    meta_cache: dict | None = None,
) -> DataFrame:
    """(doc_id, score) for EVERY live doc matching any analyzed query
    term — shared by one-shot and warm-session callers (which pass their
    union plans + precomputed dead set)."""
    if isinstance(query, (list, tuple, set, frozenset)):
        terms = sorted({str(t).lower() for t in query})
    else:
        tokenizer = ANALYZERS.get(
            man.get("analyzer", "default"), ANALYZERS["default"]
        )[2]
        terms = sorted(set(tokenizer(query)))
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty
    term_meta = _resolve_term_meta(man, dictionary, terms, meta_cache)
    if not term_meta:
        return empty
    buckets = sorted(
        {_term_bucket_py(t, man["num_buckets"]) for t in term_meta}
    )
    decoded = (
        filter_terms(postings.filter(F.col("bucket").isin(buckets)),
                     list(term_meta))
        .select("term", "first_doc_id", "n_docs", "doc_gaps", "tfs",
                "doclens")
        .mapInPandas(
            _decode_scored, "term string, doc_id long, tf int, doclen int"
        )
    )
    idf = spark.createDataFrame(
        [(t, float(m[0])) for t, m in term_meta.items()],
        "term string, idf double",
    )
    avgdl = float(man["avgdl"])
    w = (
        F.col("idf")
        * F.col("tf") * (K1 + 1.0)
        / (
            F.col("tf")
            + K1 * (1.0 - B + B * F.col("doclen") / F.lit(avgdl))
        )
    )
    scored = (
        decoded.join(F.broadcast(idf), "term")
        .withColumn("w", w)
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return _dead_anti_join(spark, scored, dead)


def score_matches(
    spark: SparkSession, index_dir: str, query, dead=None
) -> DataFrame:
    """One-shot :func:`_score_matches_impl` over a built segment."""
    man = read_manifest(index_dir)
    if dead is None:
        dead = load_tombstones(spark, index_dir)
    return _score_matches_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        query,
        dead=dead,
    )


def _collapse_heads(scored: DataFrame, docs_meta: DataFrame,
                    field: str, k: int) -> DataFrame:
    """Best-scoring doc per ``field`` group, top-k groups by head score
    — (field, doc_id, score). Null group values collapse into one
    bucket, like Solr's nullPolicy=collapse."""
    w = Window.partitionBy(field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.join(docs_meta, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select(field, "doc_id", "score")
    )


def collapse_topk(
    spark: SparkSession,
    index_dir: str,
    query,
    field: str = "lang",
    k: int = 10,
) -> DataFrame:
    """Solr field collapse: the top-k GROUP HEADS (best doc per distinct
    ``field`` value) of the query's match set, ranked by BM25. Exact —
    built on the full-match scorer, not an over-fetch window."""
    from ..indexing.build import read_docs

    scored = score_matches(spark, index_dir, query)
    docs_meta = read_docs(spark, index_dir).select("doc_id", field)
    return _collapse_heads(scored, docs_meta, field, k)


def field_stats(
    spark: SparkSession, index_dir: str, query, col: str = "doclen"
) -> DataFrame:
    """Solr stats.field over the match set: one row
    (count, min, max, sum, avg) of ``col`` across every matching live
    doc."""
    from .facet import matching_doc_ids
    from ..indexing.build import read_docs

    ids = matching_doc_ids(spark, index_dir, query)
    vals = ids.join(
        read_docs(spark, index_dir).select("doc_id", col), "doc_id"
    )
    return vals.agg(
        F.count(col).cast("long").alias("count"),
        F.min(col).cast("double").alias("min"),
        F.max(col).cast("double").alias("max"),
        F.sum(col).cast("double").alias("sum"),
        F.avg(col).alias("avg"),
    )


def range_facets(
    spark: SparkSession,
    index_dir: str,
    query,
    col: str = "doclen",
    start: float = 0.0,
    gap: float = 10.0,
) -> DataFrame:
    """Solr facet.range over the match set: counts per [start + i*gap)
    bucket of ``col``. Buckets with no docs are absent (facet.mincount=1
    semantics); values below ``start`` are clamped into the first
    bucket."""
    from .facet import matching_doc_ids
    from ..indexing.build import read_docs

    ids = matching_doc_ids(spark, index_dir, query)
    vals = ids.join(
        read_docs(spark, index_dir).select("doc_id", col), "doc_id"
    )
    bucket = (
        F.greatest(
            F.floor((F.col(col) - F.lit(start)) / F.lit(gap)), F.lit(0)
        )
        * F.lit(gap)
        + F.lit(start)
    )
    return (
        vals.withColumn("bucket", bucket.cast("double"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("bucket")
    )
