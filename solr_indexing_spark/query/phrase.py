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
    allow=None,
) -> DataFrame:
    """``allow``: optional fq doc set (DataFrame of doc_id / iterable of
    ids) — Solr applies filter queries to phrase queries like any other
    main query; so do we."""
    from .bmw import make_allow

    man = read_manifest(index_dir)
    if not man.get("positions"):
        raise ValueError(
            f"segment {index_dir} was built without positions "
            "(build_index(store_positions=True))"
        )
    return _phrase_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        phrase,
        k,
        shard_range,
        dead=load_tombstones(spark, index_dir),
        allow=make_allow(spark, allow),
    )


def phrase_topk_segments(
    spark: SparkSession,
    seg_dirs: list[str],
    phrase: str,
    k: int = 10,
    shard_range: int | None = None,
    allow=None,
) -> DataFrame:
    """Exact-phrase top-k across a segment CHAIN (base + deltas) — the
    pre-merge serving path for positional jobs, mirroring
    ``incremental.topk_segments``: combined live statistics (df summed in
    the union dictionary, doc-weighted avgdl corrected by tombstones),
    union positional postings, union dead set. ``allow``: optional fq
    doc set."""
    from ..indexing.incremental import _chain_state
    from .bmw import make_allow

    mans = [read_manifest(d) for d in seg_dirs]
    if not all(m.get("positions") for m in mans):
        raise ValueError(
            "phrase_topk_segments requires every chain segment built with "
            "store_positions=True"
        )
    man, dictionary, postings, dead = _chain_state(spark, seg_dirs, mans)
    return _phrase_impl(
        spark, man, dictionary, postings, phrase, k, shard_range, dead=dead,
        allow=make_allow(spark, allow),
    )


def _phrase_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    postings: DataFrame,
    phrase: str,
    k: int,
    shard_range: int | None,
    dead=frozenset(),
    allow=None,
) -> DataFrame:
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

    buckets = sorted({_term_bucket_py(t, num_buckets) for t in uniq})
    dict_rows = (
        dictionary
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
        postings
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
    idf_b, uniq_b, offs_b = idf, uniq, offsets

    def run_shard(pdf: pd.DataFrame, dead_local, allow_local) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        lo, hi = shard * rr, (shard + 1) * rr
        per_term = {}
        for term, g in pdf.groupby("term", sort=True):
            per_term[term] = _decode_shard_postings(g, lo, hi)
        results = _phrase_shard_kernel(
            per_term, uniq_b, offs_b, idf_b, kk, avg, dead_local,
            allow=allow_local,
        )
        return pd.DataFrame(results, columns=["doc_id", "score"]).astype(
            {"doc_id": "int64", "score": "float64"}
        )

    from .bmw import TombstoneFrame

    dead_is_frame = isinstance(dead, TombstoneFrame)
    allow_is_frame = isinstance(allow, TombstoneFrame)  # incl. AllowFrame
    if dead_is_frame or allow_is_frame:
        # large-churn / large-filter path: the doc-id sets stay DataFrames,
        # shuffled ONCE (unioned, an is_dead flag telling tombstones from
        # fq rows) by the same shard key the blocks use, then cogrouped —
        # the exact shape bmw/batch use, so the paths can't diverge
        sides = []
        if dead_is_frame:
            sides.append(
                dead.df.select("doc_id", F.lit(True).alias("is_dead"))
            )
        if allow_is_frame:
            sides.append(
                allow.df.select("doc_id", F.lit(False).alias("is_dead"))
            )
        right_rows = sides[0] if len(sides) == 1 else sides[0].unionByName(
            sides[1]
        )
        right_by_shard = right_rows.select(
            (F.col("doc_id") / F.lit(shard_range)).cast("long").alias("shard"),
            "doc_id",
            "is_dead",
        )
        closure_dead = frozenset() if dead_is_frame else dead
        closure_allow = None if allow_is_frame else allow
        has_dead_frame, has_allow_frame = dead_is_frame, allow_is_frame

        def run_cg(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            if has_dead_frame:
                dead_local = frozenset(
                    int(x) for x in right.loc[right["is_dead"], "doc_id"]
                )
            else:
                dead_local = closure_dead
            if has_allow_frame:
                # an fq shard with no allow rows admits nothing — correct
                allow_local = frozenset(
                    int(x) for x in right.loc[~right["is_dead"], "doc_id"]
                )
            else:
                allow_local = closure_allow
            return run_shard(left, dead_local, allow_local)

        candidates = (
            blocks.groupBy("shard")
            .cogroup(right_by_shard.groupBy("shard"))
            .applyInPandas(run_cg, _OUT)
        )
    else:
        dead_b, allow_b = dead, allow

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return run_shard(pdf, dead_b, allow_b)

        candidates = blocks.groupBy("shard").applyInPandas(run, _OUT)
    return candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _phrase_shard_kernel(
    per_term: dict,
    uniq: list[str],
    offsets: dict,
    idf: dict,
    k: int,
    avgdl: float,
    dead,
    allow=None,
) -> list[tuple[int, float]]:
    """Conjunction + adjacency + BM25 within one shard's decoded postings
    (``per_term``: {term: {doc: (tf, dl, positions)}}). Shared by the
    single-phrase and batched paths so semantics can never diverge.
    ``allow``: optional fq membership — docs outside it are skipped,
    same contract as the disjunctive kernels."""
    if any(t not in per_term for t in uniq):
        return []  # AND semantics: a term absent from the shard → no doc
    # conjunction: iterate the smallest term's docs
    smallest = min((per_term[t] for t in uniq), key=len)
    # starts come from a term that sits at offset 0 of the phrase
    first_t = None
    for t in uniq:
        if 0 in offsets[t]:
            first_t = t
            break
    results = []
    for doc in smallest:
        if doc in dead:
            continue
        if allow is not None and doc not in allow:
            continue
        entries = {}
        ok = True
        for t in uniq:
            e = per_term[t].get(doc)
            if e is None:
                ok = False
                break
            entries[t] = e
        if not ok:
            continue
        # adjacency: a start p matches iff every term t has p+off for
        # each of t's phrase offsets
        starts = entries[first_t][2]
        possets = {t: entries[t][2] for t in uniq}
        matched = False
        for p in starts:
            if all(
                np.any(possets[t] == p + off)
                for t in uniq
                for off in offsets[t]
            ):
                matched = True
                break
        if not matched:
            continue
        score = math.fsum(
            idf[t]
            * entries[t][0]
            * (K1 + 1.0)
            / (entries[t][0] + K1 * (1.0 - B + B * entries[t][1] / avgdl))
            for t in uniq
        )
        results.append((doc, score))
    results.sort(key=lambda x: (-x[1], x[0]))
    return results[:k]


def phrase_topk_batch(
    spark: SparkSession,
    index_dir: str,
    phrases: dict,
    k: int = 10,
    shard_range: int | None = None,
    allow=None,
) -> DataFrame:
    """Batched exact-phrase top-k — P phrases in ONE Spark job, the
    phrase twin of ``query/batch.topk_batch`` (same grid: union-of-terms
    pruned positional scan → (query-group × doc-range-shard) tasks →
    per-phrase kernels over the shard's SHARED decoded postings →
    window top-k per phrase). Rank-identical to P independent
    ``phrase_topk`` calls.

    ``phrases``: {query_id: phrase string}. Output (query_id, doc_id,
    score); phrases with any dictionary-missing term yield no rows (AND
    semantics). query_id is long when every id is an int, else string.
    ``allow``: optional fq doc set applied to every phrase in the batch.
    """
    from .bmw import make_allow

    man = read_manifest(index_dir)
    if not man.get("positions"):
        raise ValueError(
            f"segment {index_dir} was built without positions "
            "(build_index(store_positions=True))"
        )
    return _phrase_batch_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        phrases,
        k,
        shard_range,
        dead=load_tombstones(spark, index_dir),
        allow=make_allow(spark, allow),
    )


def phrase_topk_batch_segments(
    spark: SparkSession,
    seg_dirs: list[str],
    phrases: dict,
    k: int = 10,
    shard_range: int | None = None,
    allow=None,
) -> DataFrame:
    """Batched exact-phrase top-k across a segment CHAIN — P phrases in
    ONE Spark job over base + deltas (union dictionary with df summed,
    tombstone-corrected live stats, union positional postings, union
    dead set), rank-identical to P independent ``phrase_topk_segments``
    calls. The pre-merge bulk-evaluation path for positional jobs."""
    from ..indexing.incremental import _chain_state
    from .bmw import make_allow

    mans = [read_manifest(d) for d in seg_dirs]
    if not all(m.get("positions") for m in mans):
        raise ValueError(
            "phrase_topk_batch_segments requires every chain segment "
            "built with store_positions=True"
        )
    man, dictionary, postings, dead = _chain_state(spark, seg_dirs, mans)
    return _phrase_batch_impl(
        spark, man, dictionary, postings, phrases, k, shard_range,
        dead=dead, allow=make_allow(spark, allow),
    )


def _phrase_batch_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    postings: DataFrame,
    phrases: dict,
    k: int,
    shard_range: int | None,
    dead=frozenset(),
    allow=None,
) -> DataFrame:
    from .batch import (
        BATCH_MIN_SHARD_RANGE,
        WORK_PER_QUERY_SHARD,
        filter_terms,
    )
    from .bmw import TombstoneFrame

    num_buckets = man["num_buckets"]
    n_docs, avgdl = man["n_docs"], man["avgdl"]
    span = int(man.get("doc_id_hi", -1)) - int(man.get("doc_id_base", 0)) + 1
    if span <= 0:
        span = max(int(man.get("n_docs", 0)), 1)
    par = max(spark.sparkContext.defaultParallelism, 1)

    int_ids = all(isinstance(q, int) for q in phrases)
    qid_type = T.LongType() if int_ids else T.StringType()
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("query_id", qid_type, False),
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("score", T.DoubleType(), False),
            ]
        ),
    )

    offtok = QUERY_OFFSET_TOKENIZERS.get(
        man.get("analyzer", "default"), tokenize_offsets_str
    )
    per_q: dict = {}  # qid -> (uniq terms, offsets)
    for qid, phrase in phrases.items():
        key = qid if int_ids else str(qid)
        pairs = offtok(phrase)
        if not pairs:
            continue
        base_off = pairs[0][0]
        terms = [t for _, t in pairs]
        uniq = sorted(set(terms))
        offs = {
            t: [off - base_off for off, q in pairs if q == t] for t in uniq
        }
        per_q[key] = (uniq, offs)
    if not per_q:
        return empty

    all_terms = sorted({t for uniq, _ in per_q.values() for t in uniq})
    buckets = sorted({_term_bucket_py(t, num_buckets) for t in all_terms})
    d = filter_terms(
        dictionary.filter(F.col("bucket").isin(buckets)), all_terms
    )
    dict_rows = d.collect()
    idf = {
        r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in dict_rows
    }
    # AND semantics per phrase: any dictionary-missing term → drop it
    per_q = {
        qid: (uniq, offs)
        for qid, (uniq, offs) in per_q.items()
        if all(t in idf for t in uniq)
    }
    if not per_q:
        return empty
    live_terms = sorted({t for uniq, _ in per_q.values() for t in uniq})
    buckets = sorted({_term_bucket_py(t, num_buckets) for t in live_terms})

    # work-based grid sizing, same policy as batch.py: subdivide the doc
    # range in proportion to the batch's MEASURED work (Σ df of each
    # phrase's terms, known from the dictionary rows just collected), not
    # the raw doc span — a phrase touching 5k postings wants one shard,
    # one touching 10^8 wants many. Same WORK_PER_QUERY_SHARD constant:
    # phrase kernels do more per-posting work (positional decode +
    # adjacency), so if anything the fixed setup amortizes sooner.
    if shard_range is None:
        df_of = {r["term"]: int(r["df"]) for r in dict_rows}
        w_avg = (
            sum(df_of[t] for uniq, _ in per_q.values() for t in uniq)
            / len(per_q)
        )
        n_target = max(min(int(w_avg // WORK_PER_QUERY_SHARD), 2 * par), 1)
        want = -(-span // n_target)
        shard_range = BATCH_MIN_SHARD_RANGE
        while shard_range < want:
            shard_range <<= 1

    n_shards = max(-(-span // shard_range), 1)
    n_groups = max(min(-(-2 * par // n_shards), len(per_q)), 1)
    qids_sorted = sorted(per_q)
    q_group = {qid: i % n_groups for i, qid in enumerate(qids_sorted)}
    group_qids: dict = {}
    for qid in qids_sorted:
        group_qids.setdefault(q_group[qid], []).append(qid)

    pruned = filter_terms(
        postings.filter(F.col("bucket").isin(buckets)), live_terms
    )
    blocks = (
        pruned.select(
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
    if n_groups > 1:
        term_group_rows = sorted(
            {
                (t, q_group[qid])
                for qid, (uniq, _) in per_q.items()
                for t in uniq
            }
        )
        blocks = blocks.join(
            F.broadcast(
                spark.createDataFrame(
                    term_group_rows, "term string, qgroup int"
                )
            ),
            "term",
        )
    else:
        blocks = blocks.withColumn("qgroup", F.lit(0))
    n_parts = max(min(n_groups * n_shards, 4 * par), 1)
    blocks = blocks.repartition(n_parts, "qgroup", "shard")

    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )
    kk, rr, avg = k, shard_range, avgdl
    qid_dtype = "int64" if int_ids else "object"

    def shard_batch(
        pdf: pd.DataFrame, dead_local, allow_local
    ) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        group = int(pdf["qgroup"].iloc[0])
        lo, hi = shard * rr, (shard + 1) * rr
        # positional decode ONCE per (group, shard); every phrase in the
        # group shares it — the expensive half of phrase evaluation
        per_term = {}
        for term, g in pdf.groupby("term", sort=True):
            per_term[term] = _decode_shard_postings(g, lo, hi)
        out_q, out_d, out_s = [], [], []
        for qid in group_qids.get(group, ()):
            uniq, offs = per_q[qid]
            for doc, score in _phrase_shard_kernel(
                per_term, uniq, offs, idf, kk, avg, dead_local,
                allow=allow_local,
            ):
                out_q.append(qid)
                out_d.append(doc)
                out_s.append(score)
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype=qid_dtype),
                "doc_id": pd.Series(out_d, dtype="int64"),
                "score": pd.Series(out_s, dtype="float64"),
            }
        )

    dead_is_frame = isinstance(dead, TombstoneFrame)
    allow_is_frame = isinstance(allow, TombstoneFrame)  # incl. AllowFrame
    if dead_is_frame or allow_is_frame:
        # DataFrame-backed sets: union (is_dead flag), shard + explode to
        # every query group, cogroup — same shape as batch.py's grid
        sides = []
        if dead_is_frame:
            sides.append(
                dead.df.select("doc_id", F.lit(True).alias("is_dead"))
            )
        if allow_is_frame:
            sides.append(
                allow.df.select("doc_id", F.lit(False).alias("is_dead"))
            )
        right_rows = sides[0] if len(sides) == 1 else sides[0].unionByName(
            sides[1]
        )
        right_by_shard = right_rows.select(
            (F.col("doc_id") / F.lit(shard_range)).cast("long").alias("shard"),
            "doc_id",
            "is_dead",
        ).withColumn(
            "qgroup",
            F.explode(F.lit(list(range(n_groups))).cast("array<int>")),
        )
        closure_dead = frozenset() if dead_is_frame else dead
        closure_allow = None if allow_is_frame else allow
        has_dead_frame, has_allow_frame = dead_is_frame, allow_is_frame

        def run_cg(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype=qid_dtype),
                        "doc_id": pd.Series(dtype="int64"),
                        "score": pd.Series(dtype="float64"),
                    }
                )
            if has_dead_frame:
                dead_local = frozenset(
                    int(x) for x in right.loc[right["is_dead"], "doc_id"]
                )
            else:
                dead_local = closure_dead
            if has_allow_frame:
                allow_local = frozenset(
                    int(x) for x in right.loc[~right["is_dead"], "doc_id"]
                )
            else:
                allow_local = closure_allow
            return shard_batch(left, dead_local, allow_local)

        candidates = (
            blocks.groupBy("qgroup", "shard")
            .cogroup(right_by_shard.groupBy("qgroup", "shard"))
            .applyInPandas(run_cg, out_schema)
        )
    else:
        dead_b, allow_b = dead, allow

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_batch(pdf, dead_b, allow_b)

        candidates = blocks.groupBy("qgroup", "shard").applyInPandas(
            run, out_schema
        )

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
