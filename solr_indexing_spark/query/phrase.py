"""Exact-phrase BM25 top-k over positional segments.

Solr/Lucene phrase-query semantics, Spark-side: candidate docs are the
conjunction (AND) of the phrase's terms; a candidate matches when some
start position p has term_i at p+i for every i (duplicate terms in the
phrase constrain independently — "a b a" needs a at p AND p+2). Matching
docs are scored with standard BM25 over the phrase's distinct terms — the
same scoring surface the disjunctive scorer uses, so phrase results are
comparable with keyword results.

Plan shape mirrors query/bmw.py: dictionary lookup → bucket+term-pruned
positional postings scan → doc-range shards → per-shard pandas UDF
(decode + intersect + adjacency check + heap) → ≤k rows per shard →
global orderBy limit k.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1
from ..codec import delta_decode, vbyte_decode
from ..indexing.build import _term_bucket_py, read_manifest
from ..textprep import QUERY_OFFSET_TOKENIZERS, tokenize_offsets_str
from .bmw import load_tombstones

_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _decode_shard_postings(g: pd.DataFrame, lo: int, hi: int):
    """One term's blocks within a shard → {doc_id: (tf, dl, positions)}."""
    out: dict[int, tuple[int, int, np.ndarray]] = {}
    for r in g.sort_values("first_doc_id", kind="stable").itertuples():
        ids = delta_decode(r.first_doc_id, bytes(r.doc_gaps), r.n_docs)
        sel = (ids >= lo) & (ids < hi)
        if not sel.any():
            continue
        tfs = vbyte_decode(bytes(r.tfs)).astype(np.int64)
        dls = vbyte_decode(bytes(r.doclens)).astype(np.int64)
        cnts = vbyte_decode(bytes(r.pos_counts)).astype(np.int64)
        flat = vbyte_decode(bytes(r.positions)).astype(np.int64)
        if len(flat):
            c = np.cumsum(flat)
            starts = np.cumsum(cnts) - cnts
            base = c[starts] - flat[starts]
            flat = c - np.repeat(base, cnts)
        pos_lists = np.split(flat, np.cumsum(cnts)[:-1])
        for i in np.flatnonzero(sel):
            out[int(ids[i])] = (int(tfs[i]), int(dls[i]), pos_lists[i])
    return out


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    shard_range: int | None = None,
) -> DataFrame:
    man = read_manifest(index_dir)
    if not man.get("positions"):
        raise ValueError(
            f"segment {index_dir} was built without positions "
            "(build_index(store_positions=True))"
        )
    if shard_range is None:
        from .bmw import _auto_shard_range

        shard_range = _auto_shard_range(man, spark)
    num_buckets = man["num_buckets"]
    n_docs, avgdl = man["n_docs"], man["avgdl"]
    # Gapped (position, term) pairs: under the stopword analyzer the kept
    # terms retain their original token positions (Lucene position
    # increments), matching what tokenize_tf_pos_stop stored in the index.
    offtok = QUERY_OFFSET_TOKENIZERS.get(
        man.get("analyzer", "default"), tokenize_offsets_str
    )
    pairs = offtok(phrase)  # ORDER, DUPLICATES, AND GAPS MATTER
    empty = spark.createDataFrame([], _OUT)
    if not pairs:
        return empty
    base_off = pairs[0][0]  # normalize so the first kept term is offset 0
    terms = [t for _, t in pairs]
    uniq = sorted(set(terms))
    dead = load_tombstones(spark, index_dir)

    buckets = sorted({_term_bucket_py(t, num_buckets) for t in uniq})
    dict_rows = (
        spark.read.parquet(f"{index_dir}/dictionary")
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
        .collect()
    )
    found = {r["term"] for r in dict_rows}
    if found != set(uniq):  # AND semantics: any missing term → no results
        return empty
    idf = {
        r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in dict_rows
    }

    blocks = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
        .select(
            "term", "first_doc_id", "last_doc_id", "n_docs",
            "doc_gaps", "tfs", "doclens", "positions", "pos_counts",
        )
        .withColumn(
            "shard",
            F.explode(
                F.sequence(
                    (F.col("first_doc_id") / shard_range).cast("long"),
                    (F.col("last_doc_id") / shard_range).cast("long"),
                )
            ),
        )
    )

    offsets = {
        t: [off - base_off for off, q in pairs if q == t] for t in uniq
    }
    kk, rr, avg = k, shard_range, avgdl
    idf_b, dead_b, uniq_b, offs_b = idf, dead, uniq, offsets

    def run_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        lo, hi = shard * rr, (shard + 1) * rr
        per_term = {}
        for term, g in pdf.groupby("term", sort=True):
            per_term[term] = _decode_shard_postings(g, lo, hi)
        if set(per_term) != set(uniq_b):
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        # conjunction: iterate the smallest term's docs
        smallest = min(per_term.values(), key=len)
        results = []
        for doc, (tf0, dl, _) in smallest.items():
            if doc in dead_b:
                continue
            entries = {}
            ok = True
            for t in uniq_b:
                e = per_term[t].get(doc)
                if e is None:
                    ok = False
                    break
                entries[t] = e
            if not ok:
                continue
            # adjacency: starts = positions of terms[0] at offset 0; a start
            # p matches iff every term t has p+off for each of t's offsets
            first_t = None
            for t, offs in offs_b.items():
                if 0 in offs:
                    first_t = t
                    break
            starts = entries[first_t][2]
            possets = {t: entries[t][2] for t in uniq_b}
            matched = False
            for p in starts:
                if all(
                    np.any(possets[t] == p + off)
                    for t, offs in offs_b.items()
                    for off in offs
                ):
                    matched = True
                    break
            if not matched:
                continue
            score = math.fsum(
                idf_b[t]
                * entries[t][0]
                * (K1 + 1.0)
                / (entries[t][0] + K1 * (1.0 - B + B * entries[t][1] / avg))
                for t in uniq_b
            )
            results.append((doc, score))
        results.sort(key=lambda x: (-x[1], x[0]))
        return pd.DataFrame(results[:kk], columns=["doc_id", "score"]).astype(
            {"doc_id": "int64", "score": "float64"}
        )

    candidates = blocks.groupBy("shard").applyInPandas(run_shard, _OUT)
    return candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
