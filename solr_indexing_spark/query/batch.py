"""Batched multi-query BM25 top-k — Q queries in ONE Spark job.

The per-query scorer (query/bmw.py ``topk``) pays one Spark job per query —
the right shape for interactive serving, the wrong one for bulk evaluation:
relevance sets over a query log, offline ranking eval, BM25-labelled
training-data generation. There a cluster should amortize the postings scan
and the shard shuffle across the whole batch, not pay Q job launches.

``topk_batch`` evaluates every query in one plan:

    union of the queries' terms → ONE dictionary lookup → ONE pruned
    postings scan (bucket + term pushdown) → doc-range shard explode →
    per-shard BMW kernels, one per query, over the shard's SHARED block
    set (a hot term's blocks are shipped once per shard, not once per
    query) → ≤ k rows per (query, shard) → window top-k per query.

Scores are identical to the per-query scorer — same ``_TermCursor`` /
``bmw_shard_topk`` kernel, same statistics, same tie-breaks — so batch
results are rank-identical to Q independent ``topk`` calls (pinned by
tests/test_batch.py and the ``ft_bm25_multi`` driver oracle's ``batch``
mode). At 100 TB the batch is the throughput path: one wide scan whose cost
is shared by every query that touches the same terms, with per-shard
fan-out bounded by Q·k rows.

Reference parity: the reference has no bulk query path (its query side is a
Solr HTTP request per query, solrIndexCreation.ts:876-882); this is
engine-native machinery the Spark-first posture adds.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..indexing.build import _term_bucket_py, read_manifest
from ..textprep import ANALYZERS
from .bmw import (
    _INF,
    _TermCursor,
    TERM_META_CACHE_CAP,
    TombstoneFrame,
    load_tombstones,
    shard_topk_auto,
)

#: shard-width floor for the batch path (the single-query path keeps its
#: 2^17 floor in bmw.MIN_SHARD_RANGE — there one task per query is fine
#: because job launch dominates; a batch runs Q kernels per shard, so it
#: subdivides doc ranges down to this width to parallelize them).
BATCH_MIN_SHARD_RANGE = 1 << 10

#: a (query, shard) kernel invocation below this many postings is
#: dominated by its fixed setup (cursor init, per-term scan, bincount
#: alloc), so the doc-range subdivision targets at least this much work
#: per query per shard.
WORK_PER_QUERY_SHARD = 1 << 15

#: above this many distinct terms the postings pruning switches from a
#: literal IN-list (parquet row-group pushdown, right for interactive
#: term counts) to a broadcast semi-join (a 40k-literal IN-list from a
#: 10k-query batch bloats analysis and the task binary; at that scale
#: the IN-set covers most row groups anyway, so pushdown buys little).
TERM_ISIN_MAX = 256


def filter_terms(df: DataFrame, terms) -> DataFrame:
    """Prune a postings/dictionary frame to an exact term set — the ONE
    implementation of the isin-vs-semi-join policy every term-pruned query
    path shares (single/batch BMW, phrase, MLT, facets): a literal IN-list
    (parquet row-group pushdown) for small sets, a broadcast semi-join
    past ``TERM_ISIN_MAX`` (a many-thousand-literal IN bloats analysis
    and the task binary without buying extra pruning)."""
    terms = list(terms)
    if len(terms) <= TERM_ISIN_MAX:
        return df.filter(F.col("term").isin(terms))
    return df.join(
        F.broadcast(
            df.sparkSession.createDataFrame(
                [(t,) for t in terms], "term string"
            )
        ),
        "term",
        "left_semi",
    )


def _resolve_term_meta(
    man: dict,
    dictionary: DataFrame,
    terms: list[str],
    meta_cache: dict | None = None,
) -> dict:
    """(idf, upper-bound) per known term, via the segment dictionary.

    Same lookup + driver-cache discipline as ``bmw._topk_impl``: cache hits
    (including negative entries for OOV terms) skip the dictionary job;
    misses run one bucket-pruned filtered scan, collected (≤ |terms| tiny
    rows). Segments are immutable, so cached entries are valid for the
    owning session's lifetime.
    """
    num_buckets, n_docs = man["num_buckets"], man["n_docs"]
    term_meta: dict = {}
    misses = list(terms)
    if meta_cache is not None:
        misses = [t for t in terms if t not in meta_cache]
        term_meta = {
            t: meta_cache[t]
            for t in terms
            if meta_cache.get(t) is not None
        }
    if misses:
        buckets = sorted({_term_bucket_py(t, num_buckets) for t in misses})
        d = filter_terms(
            dictionary.filter(F.col("bucket").isin(buckets)), misses
        )
        dict_rows = d.collect()
        found = {}
        for r in dict_rows:
            idf = math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
            found[r["term"]] = (idf, idf * r["max_tf_norm"], int(r["df"]))
        if meta_cache is not None:
            if len(meta_cache) + len(misses) > TERM_META_CACHE_CAP:
                meta_cache.clear()
            for t in misses:
                meta_cache[t] = found.get(t)  # None = negative entry
        term_meta.update(found)
    return term_meta


def _topk_batch_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    postings: DataFrame,
    queries: dict,
    k: int,
    shard_range: int | None,
    dead=frozenset(),
    meta_cache: dict | None = None,
    allow=None,
) -> DataFrame:
    """One-job batched top-k. ``queries``: {query_id: text or term list}.

    Output: (query_id, doc_id, score), ≤ k rows per query, ordered within
    each query by (score desc, doc_id asc) — exactly ``topk``'s contract
    per query. Queries whose terms are all OOV yield no rows. ``query_id``
    is a long column when every id is an int, else a string column.
    """
    num_buckets = man["num_buckets"]
    avgdl = man["avgdl"]
    span = int(man.get("doc_id_hi", -1)) - int(man.get("doc_id_base", 0)) + 1
    if span <= 0:
        span = max(int(man.get("n_docs", 0)), 1)
    par = max(spark.sparkContext.defaultParallelism, 1)

    int_ids = all(isinstance(q, int) for q in queries)
    qid_type = T.LongType() if int_ids else T.StringType()

    tokenizer = ANALYZERS.get(
        man.get("analyzer", "default"), ANALYZERS["default"]
    )[2]
    per_q: dict = {}
    for qid, q in queries.items():
        key = qid if int_ids else str(qid)
        if isinstance(q, (list, tuple, set, frozenset)):
            per_q[key] = sorted(set(q))
        else:
            per_q[key] = sorted(set(tokenizer(q)))

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
    all_terms = sorted({t for ts in per_q.values() for t in ts})
    if not all_terms:
        return empty

    meta = _resolve_term_meta(man, dictionary, all_terms, meta_cache)
    # per-query known-term lists; all-OOV queries drop out here
    q_terms = {
        qid: [t for t in ts if t in meta] for qid, ts in per_q.items()
    }
    q_terms = {qid: ts for qid, ts in q_terms.items() if ts}
    if not q_terms:
        return empty
    live_terms = sorted({t for ts in q_terms.values() for t in ts})
    buckets = sorted({_term_bucket_py(t, num_buckets) for t in live_terms})

    # ---- parallelism: (query group × doc-range shard) ------------------
    # Doc-range subdivision splits per-query kernel work WITHOUT
    # replicating blocks (a block lands only on the shards it overlaps),
    # but each (query, shard) pays a fixed setup cost — so the number of
    # subdivisions scales with the batch's MEASURED work (Σ df of each
    # query's terms, known from the dictionary lookup), not the raw doc
    # span: a query merging 12k postings wants ONE shard (measured 291
    # vs 87 qps over-subdivided at sf0.1), one merging 10^8 wants many.
    # The query-group axis then fills remaining parallelism by splitting
    # queries — it replicates shared terms' blocks per group, so it is
    # the second choice at high per-term block volume.
    if shard_range is None:
        w_avg = (
            sum(meta[t][2] for ts in q_terms.values() for t in ts)
            / len(q_terms)
        )
        n_target = max(min(int(w_avg // WORK_PER_QUERY_SHARD), 2 * par), 1)
        want = -(-span // n_target)
        shard_range = BATCH_MIN_SHARD_RANGE
        while shard_range < want:
            shard_range <<= 1
    n_shards = max(-(-span // shard_range), 1)
    n_groups = max(min(-(-2 * par // n_shards), len(q_terms)), 1)
    qids_sorted = sorted(q_terms)
    q_group = {qid: i % n_groups for i, qid in enumerate(qids_sorted)}

    pruned = filter_terms(
        postings.filter(F.col("bucket").isin(buckets)), live_terms
    )
    blocks = (
        pruned
        .select(
            "term", "block_id", "first_doc_id", "last_doc_id", "n_docs",
            "doc_gaps", "tfs", "doclens", "block_max_tf_norm",
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
                for qid, ts in q_terms.items()
                for t in ts
            }
        )
        tg = spark.createDataFrame(
            term_group_rows, "term string, qgroup int"
        )
        blocks = blocks.join(F.broadcast(tg), "term")
    else:
        blocks = blocks.withColumn("qgroup", F.lit(0))
    # explicit exchange: the batch's shuffle payload (pruned blocks) is
    # tiny, so AQE would coalesce it to ONE partition and run every
    # kernel serially — the kernels (~100 ms each on dense terms) are the
    # batch's real cost, and their parallelism must survive. An explicit
    # repartition on the grouping keys is respected by AQE, and because
    # it hash-partitions on exactly the applyInPandas grouping columns,
    # EnsureRequirements inserts no second exchange.
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

    group_qids: dict = {}
    for qid in qids_sorted:
        group_qids.setdefault(q_group[qid], []).append(qid)

    def shard_topk_batch(
        pdf: pd.DataFrame, dead_local, allow_local
    ) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        group = int(pdf["qgroup"].iloc[0])
        lo, hi = shard * rr, (shard + 1) * rr
        # decode-independent block lists, built ONCE per (group, shard)
        # and shared by every query in the group that references the term
        # (doc-range order — block ids restart per segment in a chain)
        by_term: dict = {}
        for term, g in pdf.groupby("term", sort=True):
            g = g.sort_values("first_doc_id", kind="stable")
            by_term[term] = [
                (
                    int(r.first_doc_id),
                    int(r.last_doc_id),
                    int(r.n_docs),
                    bytes(r.doc_gaps),
                    bytes(r.tfs),
                    bytes(r.doclens),
                    float(r.block_max_tf_norm),
                )
                for r in g.itertuples()
            ]
        out_q, out_d, out_s = [], [], []
        # shared across this task's queries: a hot term's blocks decode
        # once, not once per query that references it
        decode_cache: dict = {}
        for qid in group_qids.get(group, ()):
            cursors = []
            for t in q_terms[qid]:
                blist = by_term.get(t)
                if blist is None:
                    continue
                idf, ub = meta[t][0], meta[t][1]
                c = _TermCursor(idf, ub, blist, lo, hi)
                if c.cur < _INF:
                    cursors.append(c)
            if not cursors:
                continue
            for d, s in shard_topk_auto(
                cursors, kk, avg, dead=dead_local, lo=lo, hi=hi,
                decode_cache=decode_cache, allow=allow_local,
            ):
                out_q.append(qid)
                out_d.append(d)
                out_s.append(s)
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
        # large-churn / large-filter path: shuffle the doc-id sets ONCE
        # (unioned, is_dead flag) by the same (group, shard) key and
        # cogroup — per-task volume is set/n_shards (× the group fan-out),
        # and the whole batch shares that one shuffle (see bmw._topk_impl)
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
            return shard_topk_batch(left, dead_local, allow_local)

        candidates = (
            blocks.groupBy("qgroup", "shard")
            .cogroup(right_by_shard.groupBy("qgroup", "shard"))
            .applyInPandas(run_cg, out_schema)
        )
    else:
        dead_b, allow_b = dead, allow

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_topk_batch(pdf, dead_b, allow_b)

        candidates = blocks.groupBy("qgroup", "shard").applyInPandas(
            run, out_schema
        )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )


def topk_batch(
    spark: SparkSession,
    index_dir: str,
    queries: dict,
    k: int = 10,
    shard_range: int | None = None,
    allow=None,
) -> DataFrame:
    """Batched BM25 top-k over one built segment (one-shot convenience —
    a server holds a session and calls its ``topk_batch`` instead).
    ``allow``: optional filter-query doc set (``bmw.topk_filtered``
    semantics) applied to every query in the batch."""
    from .bmw import make_allow

    man = read_manifest(index_dir)
    return _topk_batch_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        queries,
        k,
        shard_range,
        dead=load_tombstones(spark, index_dir),
        allow=make_allow(spark, allow),
    )


def topk_batch_boosted(
    spark: SparkSession,
    index_dir: str,
    queries: dict,
    boosts,
    k: int = 10,
    boost_weight: float = 1.0,
    shard_range: int | None = None,
) -> DataFrame:
    """Batched boosted mode — ``bmw.topk_boosted``'s two-stage rescoring
    (over-fetched pure-BM25 window + additive per-doc static prior,
    SURVEY §7.4) for a whole query set in ONE job: the over-fetch rides
    the batch plan, the boost joins once (broadcast), the re-rank is the
    same per-query window top-k. Rank-identical to Q independent
    ``topk_boosted`` calls."""
    base = topk_batch(
        spark, index_dir, queries, k=max(k * 10, 100),
        shard_range=shard_range,
    )
    boosts = boosts.select(
        F.col("doc_id"), F.col("boost").cast("double").alias("boost")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        base.join(F.broadcast(boosts), "doc_id", "left")
        .withColumn(
            "score",
            F.col("score")
            + F.lit(float(boost_weight)) * F.coalesce("boost", F.lit(0.0)),
        )
        .select("query_id", "doc_id", "score")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
