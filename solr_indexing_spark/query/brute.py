"""Brute-force BM25 as pure DataFrame operations (M1 path / internal A-B oracle).

Recomputes scores from the docs table (tokenize → explode → filter → score
expression → top-k window), independent of the compressed segment format —
used to cross-check the block-max WAND path and as the SQL-expressible shape
for the driver's DuckDB oracle. Every step is Catalyst-optimizable: the term
filter prunes the exploded stream immediately, the agg is partial+final hash,
top-k is sort+limit of an already-small candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B, K1
from ..textprep import tokenize, tokenize_str


def bm25_scores(
    docs: DataFrame,
    query: str,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """docs(doc_id, text|toks, doclen?) → (doc_id, score) for the query.

    Stats (N, avgdl) computed over ``docs`` unless provided — at scale
    pass the precomputed values from the stats table.
    """
    if "toks" not in docs.columns:
        docs = docs.withColumn("toks", tokenize(F.col("text")))
    if "doclen" not in docs.columns:
        docs = docs.withColumn("doclen", F.size("toks"))
    if n_docs is None or avgdl is None:
        row = docs.agg(
            F.count("*").alias("n"), F.avg("doclen").alias("avgdl")
        ).collect()[0]
        n_docs, avgdl = row["n"], float(row["avgdl"] or 1.0)

    terms = sorted(set(tokenize_str(query)))
    if not terms:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")

    tf = (
        docs.select("doc_id", "doclen", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term", "doc_id", "doclen")
        .agg(F.count("*").alias("tf"))
    )
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_per_term), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            * (K1 + 1.0)
            / (
                F.col("tf")
                + K1 * (1.0 - B + B * F.col("doclen") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Top-k by (score desc, doc_id asc) — deterministic tie-break."""
    return (
        bm25_scores(docs, query, n_docs=n_docs, avgdl=avgdl)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
