"""More-Like-This — Solr's MLT handler (/mlt, mlt=true on search), the
"similar documents" feature every reference deployment exposes next to a
result (similar cases / similar acts).

Lucene MLT semantics: take the source document's terms, score each by
tf·idf, drop noise terms (df below ``min_df``, above ``max_df_frac``·N),
keep the ``max_terms`` most interesting, and run them as a disjunctive
query — here through the same block-max WAND/TAAT path every other query
uses, with the source document excluded via the dead-set mechanism (it
can never displace a real neighbor from the top-k).

Driver-side work is one stored-doc fetch (a doc_id-pruned docs scan
returning ONE row) plus the dictionary df lookup the interactive scorer
already pays — nothing O(corpus) leaves the executors.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexing.build import _term_bucket_py, read_docs, read_manifest
from ..textprep import ANALYZERS
from .batch import filter_terms
from .bmw import _topk_impl, load_tombstones, union_dead


def _interesting_terms_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    docs: DataFrame,
    doc_id: int,
    max_terms: int = 25,
    min_df: int = 2,
    max_df_frac: float = 0.25,
) -> list[tuple[str, float]]:
    """Core interesting-terms ranking over an already-assembled docs
    plan + (possibly union) dictionary — shared by the one-shot path and
    the warm sessions (which pass their per-generation union dictionary
    and combined live-doc manifest, so a chain MLT uses exactly the
    chain-wide df and N every other chain query uses)."""
    rows = (
        docs.filter(F.col("doc_id") == int(doc_id)).select("text").collect()
    )
    if not rows:
        raise ValueError(f"doc_id {doc_id} not in segment/chain")
    tokenizer = ANALYZERS.get(
        man.get("analyzer", "default"), ANALYZERS["default"]
    )[2]
    tf = Counter(tokenizer(rows[0]["text"] or ""))
    if not tf:
        return []
    terms = sorted(tf)
    buckets = sorted(
        {_term_bucket_py(t, man["num_buckets"]) for t in terms}
    )
    d = filter_terms(
        dictionary.filter(F.col("bucket").isin(buckets)), terms
    )
    df_of = {r["term"]: int(r["df"]) for r in d.select("term", "df").collect()}
    n = man["n_docs"]
    out = []
    for t in terms:
        df = df_of.get(t, 0)
        if df < min_df or df > max_df_frac * n:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        out.append((t, tf[t] * idf))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:max_terms]


def interesting_terms(
    spark: SparkSession,
    index_dir: str,
    doc_id: int,
    max_terms: int = 25,
    min_df: int = 2,
    max_df_frac: float = 0.25,
) -> list[tuple[str, float]]:
    """The source doc's terms ranked by tf·idf (Lucene MLT's
    interestingTerms), noise-filtered: df ≥ ``min_df`` (drop typos /
    uniques) and df ≤ ``max_df_frac``·N (drop stop-like terms). Ties
    break by ascending term. Deterministic given the segment."""
    man = read_manifest(index_dir)
    return _interesting_terms_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        read_docs(spark, index_dir, man),
        doc_id,
        max_terms=max_terms,
        min_df=min_df,
        max_df_frac=max_df_frac,
    )


def _mlt_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    postings: DataFrame,
    docs: DataFrame,
    doc_id: int,
    k: int = 10,
    max_terms: int = 25,
    min_df: int = 2,
    max_df_frac: float = 0.25,
    shard_range: int | None = None,
    dead=frozenset(),
    meta_cache: dict | None = None,
) -> DataFrame:
    """Shared MLT core: interesting terms → disjunctive BM25 with the
    source doc folded into the dead set. ``dead`` is the caller's
    (chain) dead set — a session passes its precomputed one, so MLT
    never re-reads tombstone parquet."""
    terms = [
        t
        for t, _ in _interesting_terms_impl(
            spark, man, dictionary, docs, doc_id,
            max_terms=max_terms, min_df=min_df, max_df_frac=max_df_frac,
        )
    ]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    dead = union_dead(spark, [dead, frozenset({int(doc_id)})])
    return _topk_impl(
        spark,
        man,
        dictionary,
        postings,
        terms,
        k,
        shard_range,
        dead=dead,
        meta_cache=meta_cache,
    )


def more_like_this(
    spark: SparkSession,
    index_dir: str,
    doc_id: int,
    k: int = 10,
    max_terms: int = 25,
    min_df: int = 2,
    max_df_frac: float = 0.25,
    shard_range: int | None = None,
) -> DataFrame:
    """Top-k documents most similar to ``doc_id``: interesting-terms
    extraction → the standard BM25 disjunctive scorer, source doc
    excluded. Empty when every source term is noise-filtered."""
    man = read_manifest(index_dir)
    return _mlt_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        read_docs(spark, index_dir, man),
        doc_id,
        k=k,
        max_terms=max_terms,
        min_df=min_df,
        max_df_frac=max_df_frac,
        shard_range=shard_range,
        dead=load_tombstones(spark, index_dir),
    )
