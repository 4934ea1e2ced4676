"""Block-Max WAND top-k over compressed segments (M3 — the production scorer).

Public-literature semantics: WAND pivoting (Broder et al., CIKM 2003) with
per-block score caps (Ding & Suel, SIGIR 2011). The reference outsources this
entirely to Solr (solrIndexCreation.ts:876-882); parameters per SURVEY.md §7.4.

Distribution model: the index is term-partitioned on disk (bucket dirs →
partition pruning), but WAND needs all query terms' postings for a doc in one
place, so query-time blocks are re-sharded by *docID range*: shard s covers
docs [s·R, (s+1)·R). A block overlapping several shards is replicated to each
(cheap — blocks are ≤128 postings, R ≫ 128) and scoring inside the pandas UDF
is clipped to the shard's range, so every doc's full score is computed in
exactly one shard and per-shard top-k merge is exact. The global merge sees
≤ k rows per shard.

Determinism / rank-identity: per-doc scores accumulate over terms in sorted
term order; pruning uses *strict* θ comparisons so exact score ties are never
skipped; heap ordering and the final sort break ties by ascending doc_id.
"""

from __future__ import annotations

import heapq
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1, TOMBSTONE_BROADCAST_THRESHOLD
from ..codec import delta_decode, vbyte_decode
from ..indexing.build import read_manifest, _term_bucket_py
from ..textprep import ANALYZERS, tokenize_str  # noqa: F401 (tokenize_str re-exported)

_INF = (1 << 62)


class _TermCursor:
    """Posting iterator over one term's blocks within a doc-range shard."""

    __slots__ = (
        "idf", "ub", "blocks", "bi", "pos", "ids", "tfs", "dls", "hi",
    )

    def __init__(self, idf: float, ub: float, blocks: list, lo: int, hi: int):
        # blocks: list of (first, last, n, gaps, tfs, doclens, bmax) sorted
        self.idf = idf
        self.ub = ub  # global upper bound: idf * max_tf_norm
        self.blocks = blocks
        self.bi = 0
        self.pos = 0
        self.ids = None
        self.hi = hi
        self.next_geq(lo)

    def _decode(self) -> None:
        first, last, n, gaps, tf_buf, dl_buf, _ = self.blocks[self.bi]
        self.ids = delta_decode(first, gaps, n)
        self.tfs = vbyte_decode(tf_buf).astype(np.float64)
        self.dls = vbyte_decode(dl_buf).astype(np.float64)

    @property
    def cur(self) -> int:
        if self.bi >= len(self.blocks):
            return _INF
        d = int(self.ids[self.pos])
        return d if d < self.hi else _INF

    def next_geq(self, target: int) -> None:
        """Skip-pointer advance: jump blocks by last_doc_id, then binary
        search inside the one block that must contain the target."""
        while self.bi < len(self.blocks) and self.blocks[self.bi][1] < target:
            self.bi += 1
            self.ids = None
        if self.bi >= len(self.blocks):
            return
        if self.ids is None:
            self._decode()
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # defensive; last >= target implies not
            self.bi += 1
            self.ids = None
            if self.bi < len(self.blocks):
                self._decode()
                self.pos = 0

    def block_max_for(self, d: int) -> float:
        """UB of this term's contribution to doc d (0 if d not coverable)."""
        bi = self.bi
        while bi < len(self.blocks) and self.blocks[bi][1] < d:
            bi += 1
        if bi >= len(self.blocks) or self.blocks[bi][0] > d:
            return 0.0
        return self.idf * self.blocks[bi][6]

    def block_last(self) -> int:
        return self.blocks[self.bi][1] if self.bi < len(self.blocks) else _INF

    def score_cur(self, avgdl: float) -> float:
        tf = self.tfs[self.pos]
        dl = self.dls[self.pos]
        return self.idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bmw_shard_topk(
    cursors: list[_TermCursor],
    k: int,
    avgdl: float,
    dead: frozenset = frozenset(),
    allow=None,
) -> list[tuple[int, float]]:
    """Exact top-k within one shard via block-max WAND.

    ``dead``: tombstoned doc_ids (partial re-index, Lucene-liveDocs style)
    — skipped at evaluation time so they can never displace a live doc
    from the shard's local top-k.

    ``allow``: optional membership restricting results to a doc set (the
    Solr/Lucene filter-query ``fq``) — ``None`` admits every doc. Applied
    at evaluation time like ``dead``, so the filtered top-k is exact (a
    filtered-out doc never occupies a heap slot); BM25 statistics remain
    corpus-global, matching Lucene's fq semantics (filters restrict
    candidates, not scoring)."""
    cursors = [c for c in cursors if c.cur < _INF]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    while cursors:
        cursors.sort(key=lambda c: c.cur)
        while cursors and cursors[-1].cur >= _INF:
            cursors.pop()
        if not cursors:
            break
        theta = heap[0][0] if len(heap) >= k else -math.inf
        prefix = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            prefix += c.ub
            if prefix >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # total UB below threshold — done
        pivot_doc = cursors[pivot].cur
        if pivot_doc >= _INF:
            break
        # extend the pivot across cursors tied at pivot_doc — their upper
        # bounds must count in the block-max check, and a skip must advance
        # them too, else the doc is later scored with partial contributions
        while pivot + 1 < len(cursors) and cursors[pivot + 1].cur == pivot_doc:
            pivot += 1
        # block-max refinement (strict <: exact ties always evaluated)
        bub = sum(c.block_max_for(pivot_doc) for c in cursors[: pivot + 1])
        if bub < theta:
            boundary = min(c.block_last() for c in cursors[: pivot + 1]) + 1
            nxt = cursors[pivot + 1].cur if pivot + 1 < len(cursors) else _INF
            target = max(min(boundary, nxt), pivot_doc + 1)
            for c in cursors[: pivot + 1]:
                if c.cur < target:
                    c.next_geq(target)
            continue
        if cursors[0].cur == pivot_doc:
            # all terms ≤ pivot aligned: full evaluation; fsum makes the
            # accumulation order-insensitive (exact summation)
            contributors = [c for c in cursors if c.cur == pivot_doc]
            if pivot_doc not in dead and (allow is None or pivot_doc in allow):
                score = math.fsum(c.score_cur(avgdl) for c in contributors)
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            for c in contributors:
                c.next_geq(pivot_doc + 1)
        else:
            # advance the highest-UB unaligned cursor to the pivot
            adv = max(
                (c for c in cursors[:pivot] if c.cur < pivot_doc),
                key=lambda c: c.ub,
                default=cursors[0],
            )
            adv.next_geq(pivot_doc)
    return sorted(((-nd, s) for s, nd in heap), key=lambda t: (-t[1], t[0]))[:k]


#: kernel auto-switch thresholds (shard_topk_auto): WAND skipping only
#: pays when some term is selective enough to pivot past most postings.
#: When every term's in-shard postings count is ≥ DENSE_MIN_POSTINGS and
#: the total is ≥ DENSE_TOTAL_POSTINGS, the pivot walk degenerates to an
#: O(total) Python loop (~100 ms per query at 12k postings) and the
#: vectorized term-at-a-time scorer (~50M postings/s) wins by ~100×.
DENSE_MIN_POSTINGS = 256
DENSE_TOTAL_POSTINGS = 4096

#: widest shard span the TAAT kernel accumulates into a dense per-doc
#: array (np.bincount): 2^22 doubles = 32 MB per in-flight query — above
#: this the kernel falls back to the sort-merge accumulation. The auto
#: shard width (span / 4·parallelism) crosses this only on corpora past
#: ~10^9 docs per 4·parallelism, where per-term in-shard postings are
#: large enough that the sort-merge is the right tool anyway.
DENSE_ACCUM_SPAN_MAX = 1 << 22


def _blocks_in_range(cursor: _TermCursor, lo: int, hi: int):
    for blk in cursor.blocks:
        if blk[1] < lo or blk[0] >= hi:
            continue
        yield blk


def _decode_term_range(
    blocks: list, avgdl: float, lo: int, hi: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, idf-independent base scores) for one term's postings in
    [lo, hi) — the per-term constant the TAAT kernel multiplies by idf.
    Cacheable per (term blocks, shard): queries sharing a term in a batch
    reuse the decode instead of re-running it per query."""
    ids_list, sc_list = [], []
    for first, last, n, gaps, tf_buf, dl_buf, _bmax in blocks:
        if last < lo or first >= hi:
            continue
        ids = delta_decode(first, gaps, n).astype(np.int64)
        tfs = vbyte_decode(tf_buf).astype(np.float64)
        dls = vbyte_decode(dl_buf).astype(np.float64)
        sc = tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
        if first < lo or last >= hi:
            m = (ids >= lo) & (ids < hi)
            ids, sc = ids[m], sc[m]
        if len(ids):
            ids_list.append(ids)
            sc_list.append(sc)
    if not ids_list:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float64),
        )
    return np.concatenate(ids_list), np.concatenate(sc_list)


def taat_shard_topk(
    cursors: list[_TermCursor],
    k: int,
    avgdl: float,
    dead=frozenset(),
    lo: int = 0,
    hi: int = _INF,
    decode_cache: dict | None = None,
    allow=None,
) -> list[tuple[int, float]]:
    """Exact top-k within one shard via vectorized term-at-a-time scoring —
    the dense-query complement to :func:`bmw_shard_topk`.

    Semantics are identical to the WAND kernel (every candidate's full
    BM25 score, ties broken by ascending doc_id, dead docs skipped); only
    the execution strategy differs: decode every in-range block, score all
    postings in numpy, accumulate per doc with a stable sort + reduceat
    (summation order = sorted-term order, matching the WAND kernel's
    contributor order), then lexsort the top-k out. No skipping — which is
    exactly right when no term is selective enough to skip.

    ``decode_cache``: optional dict shared across a batch's queries within
    one shard task — terms common to several queries decode once (the
    cached (ids, base-score) pair is idf-independent)."""
    ids_list, sc_list = [], []
    for c in cursors:
        if decode_cache is not None:
            key = id(c.blocks)
            pair = decode_cache.get(key)
            if pair is None:
                pair = _decode_term_range(c.blocks, avgdl, lo, hi)
                decode_cache[key] = pair
            t_ids, t_base = pair
        else:
            t_ids, t_base = _decode_term_range(c.blocks, avgdl, lo, hi)
        if len(t_ids):
            ids_list.append(t_ids)
            sc_list.append(c.idf * t_base)
    if not ids_list:
        return []
    ids = np.concatenate(ids_list)
    sc = np.concatenate(sc_list)
    span = hi - lo
    if 0 < span <= DENSE_ACCUM_SPAN_MAX:
        # bounded shard span: accumulate into a dense per-doc array
        # (bincount is a C loop — ~10-50× cheaper and far less DRAM
        # traffic than the sort-merge below; BM25 scores are strictly
        # positive, so nonzero ⇔ has ≥1 posting). Summation order per doc
        # is posting order = sorted-term concatenation order, same as the
        # sort-merge path.
        dense = np.bincount(ids - lo, weights=sc, minlength=span)
        nz = np.nonzero(dense)[0]
        uids = nz + lo
        totals = dense[nz]
    else:
        # unbounded/huge spans (auto shard width grows with corpus doc
        # span): stable sort-merge of the pre-sorted per-term runs.
        # Accumulate with bincount over run indices, NOT add.reduceat:
        # reduceat's pairwise grouping is a different float-addition
        # order than the sequential loops of bincount / the WAND kernel,
        # and a doc whose contributions arrive in a different term order
        # than a tied rival can land one ulp away and flip an exact-tie
        # rank between kernels.
        order = np.argsort(ids, kind="stable")
        ids, sc = ids[order], sc[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(ids))[0] + 1))
        uids = ids[starts]
        run = np.zeros(len(ids), dtype=np.int64)
        run[starts[1:]] = 1
        totals = np.bincount(np.cumsum(run), weights=sc)
    if dead:
        if isinstance(dead, BroadcastDeadSet):
            darr = dead.to_array()
            pos = np.searchsorted(darr, uids)
            pos = np.minimum(pos, max(len(darr) - 1, 0))
            alive = darr[pos] != uids
        else:
            alive = np.fromiter(
                (d not in dead for d in uids.tolist()),
                dtype=bool,
                count=len(uids),
            )
        uids, totals = uids[alive], totals[alive]
    if allow is not None:
        # vectorized fq membership — same shapes as the dead filter above
        if isinstance(allow, BroadcastDeadSet):
            arr = allow.to_array()
            if not len(arr):
                return []
            pos = np.searchsorted(arr, uids)
            pos = np.minimum(pos, len(arr) - 1)
            keep = arr[pos] == uids
        else:
            keep = np.fromiter(
                (d in allow for d in uids.tolist()),
                dtype=bool,
                count=len(uids),
            )
        uids, totals = uids[keep], totals[keep]
    if not len(uids):
        return []
    sel = np.lexsort((uids, -totals))[: min(k, len(uids))]
    return [(int(uids[i]), float(totals[i])) for i in sel]


def shard_topk_auto(
    cursors: list[_TermCursor],
    k: int,
    avgdl: float,
    dead=frozenset(),
    lo: int = 0,
    hi: int = _INF,
    decode_cache: dict | None = None,
    allow=None,
) -> list[tuple[int, float]]:
    """Cost-based kernel choice per (query, shard) — MaxScore-style
    reasoning, deterministic from block statistics so repeated runs pick
    identically: WAND's pivot walk evaluates ≳ the SMALLEST term's
    in-shard postings count, so it only beats the vectorized scorer when
    some term is selective (rare term anchors the pivot). All-dense
    queries go term-at-a-time."""
    if not cursors:
        return []
    per_term = [
        sum(blk[2] for blk in _blocks_in_range(c, lo, hi)) for c in cursors
    ]
    if (
        min(per_term) >= DENSE_MIN_POSTINGS
        and sum(per_term) >= DENSE_TOTAL_POSTINGS
    ):
        return taat_shard_topk(
            cursors, k, avgdl, dead=dead, lo=lo, hi=hi,
            decode_cache=decode_cache, allow=allow,
        )
    return bmw_shard_topk(cursors, k, avgdl, dead=dead, allow=allow)


# (TOMBSTONE_BROADCAST_THRESHOLD lives in the package root — shared with
# indexing.merge so both paths flip to the broadcast form together.)


class BroadcastDeadSet:
    """Tombstone membership over a Spark-broadcast sorted int64 array —
    the large-churn path. Supports the same ``doc_id in dead`` / ``bool``
    protocol the scorers use on the frozenset path; probes are
    O(log n) searchsorted on a compact numpy array."""

    def __init__(self, bc) -> None:
        self._bc = bc

    def __contains__(self, doc_id: int) -> bool:
        a = self._bc.value
        i = int(np.searchsorted(a, doc_id))
        return i < len(a) and int(a[i]) == int(doc_id)

    def __len__(self) -> int:
        return len(self._bc.value)

    def __bool__(self) -> bool:
        return len(self._bc.value) > 0

    def to_array(self) -> np.ndarray:
        return self._bc.value

    def release(self) -> None:
        """Free the broadcast on driver + executors. Only call once no
        DataFrame that captured this set can still execute. (Unreleased
        sets are eventually reclaimed by Spark's ContextCleaner when the
        Python reference is garbage-collected — release() just makes the
        lifetime explicit for long-lived holders like QuerySession.)"""
        try:
            self._bc.destroy()
        except Exception:  # noqa: BLE001 — already destroyed / ctx gone
            pass


class TombstoneFrame:
    """Large-churn dead set kept as a DataFrame of ``doc_id`` rows — never
    materialized on the driver (the O(churn) ``collect`` is exactly the
    driver-memory cliff this type exists to avoid). ``_topk_impl`` cogroups
    it into the per-shard BMW kernel by doc-range shard, so each task sees
    only its own shard's dead ids; ``merge`` anti-joins / cogroups it the
    same way. Truthy by construction (only built for non-empty sets above
    the closure threshold)."""

    def __init__(self, df: DataFrame) -> None:
        self.df = df

    def __bool__(self) -> bool:
        return True


class AllowFrame(TombstoneFrame):
    """Large allow set (filter query) kept as a DataFrame of ``doc_id``
    rows — the fq twin of :class:`TombstoneFrame`: never driver-
    materialized; ``_topk_impl`` cogroups it into the kernels by doc-range
    shard alongside any tombstone frame (one unioned shuffle, an
    ``is_dead`` flag telling the two sets apart)."""


def make_allow(
    spark: SparkSession,
    allow,
    broadcast_threshold: int = TOMBSTONE_BROADCAST_THRESHOLD,
):
    """Normalize a filter-query doc set for the scorers: ``None`` (no
    filter) passes through; a DataFrame with a ``doc_id`` column becomes a
    frozenset when small (ships in task closures) or an :class:`AllowFrame`
    past ``broadcast_threshold`` (stays executor-side, cogrouped by shard
    — a non-selective filter over 10^12 docs must never be collected); any
    other iterable of ids becomes a frozenset."""
    if allow is None or isinstance(
        allow, (frozenset, BroadcastDeadSet, TombstoneFrame)
    ):
        return allow
    if isinstance(allow, DataFrame):
        df = allow.select("doc_id").distinct()
        # one bounded job resolves both the size check and the rows
        # (count()-then-collect() would evaluate the frame twice per
        # request on the session fq path)
        rows = df.limit(broadcast_threshold + 1).collect()
        if len(rows) <= broadcast_threshold:
            return frozenset(int(r["doc_id"]) for r in rows)
        return AllowFrame(df)
    return frozenset(int(d) for d in allow)


def union_dead(spark: SparkSession, sets: list):
    """Union per-segment dead sets (frozensets, BroadcastDeadSets and/or
    TombstoneFrames) into one membership object. Any DataFrame-backed
    input keeps the result on the no-driver-materialization path."""
    small = frozenset().union(
        *[s for s in sets if isinstance(s, frozenset)]
    )
    frames = [s.df for s in sets if isinstance(s, TombstoneFrame)]
    big = [s for s in sets if isinstance(s, BroadcastDeadSet)]
    if frames:
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        extra = sorted(small)
        for b in big:
            extra.extend(int(x) for x in b.to_array())
        if extra:
            out = out.unionByName(
                spark.createDataFrame(
                    [(int(d),) for d in sorted(set(extra))], "doc_id long"
                )
            )
        # segment doc ranges are disjoint so cross-segment dups can't
        # occur, but unioned inputs may overlap with the extras — distinct
        # keeps per-shard dead lists minimal
        return TombstoneFrame(out.distinct())
    if not big:
        return small
    arrs = [s.to_array() for s in big]
    if small:
        arrs.append(np.fromiter(small, dtype=np.int64, count=len(small)))
    merged = np.unique(np.concatenate(arrs))
    return BroadcastDeadSet(spark.sparkContext.broadcast(merged))


def load_tombstones(
    spark: SparkSession,
    index_dir: str,
    broadcast_threshold: int = TOMBSTONE_BROADCAST_THRESHOLD,
    with_stats: bool = False,
    membership: bool = True,
):
    """Tombstoned doc_ids of a segment (empty frozenset if none); with
    ``with_stats`` a ``(membership, n_dead, dead_tokens)`` triple from the
    same single read — chain serving needs the statistics correction
    (SegmentsSession computes it once per segment generation), and keeping
    both forms here means the small/large-churn policy (threshold,
    TombstoneFrame construction) can never diverge between the one-shot
    and session paths.

    Volume is bounded by churn since the last merge (merge compacts them
    away) — the Lucene liveDocs trade-off. The size check is a ``count()``
    (a scalar), NOT a collect: small sets ride task closures as a
    frozenset; past ``broadcast_threshold`` the rows stay executor-side as
    a :class:`TombstoneFrame` and the query path joins them in by shard —
    the driver never materializes O(churn) rows. Stats aggregate over
    doc_id-distinct rows so pre-dedup-guard tombstone files can't drift
    idf / go negative under churn.

    ``membership=False`` (with_stats only): return ``(None, n, tok)`` —
    just the statistics correction, no dead-set materialization. The
    chain path uses this when the caller already holds a precomputed
    dead set (topk_segments ``dead=``), so no driver collect / frame
    construction is paid for a membership object that would be thrown
    away."""
    if not os.path.exists(f"{index_dir}/tombstones"):
        if with_stats:
            return (frozenset() if membership else None), 0, 0
        return frozenset()
    if not with_stats:
        df = (
            spark.read.parquet(f"{index_dir}/tombstones")
            .select("doc_id")
            .distinct()
        )
        # one bounded job for both the size check and the rows
        rows = df.limit(broadcast_threshold + 1).collect()
        if not rows:
            return frozenset()
        if len(rows) <= broadcast_threshold:
            return frozenset(r["doc_id"] for r in rows)
        return TombstoneFrame(df)

    if not membership:
        row = (
            spark.read.parquet(f"{index_dir}/tombstones")
            .dropDuplicates(["doc_id"])
            .agg(F.count("*").alias("n"), F.sum("doclen").alias("tok"))
            .collect()[0]
        )
        return None, int(row["n"] or 0), int(row["tok"] or 0)

    dd = (
        spark.read.parquet(f"{index_dir}/tombstones")
        .dropDuplicates(["doc_id"])
        .persist()
    )
    try:
        row = dd.agg(
            F.count("*").alias("n"), F.sum("doclen").alias("tok")
        ).collect()[0]
        n, tok = int(row["n"] or 0), int(row["tok"] or 0)
        if n == 0:
            return frozenset(), 0, 0
        if n <= broadcast_threshold:
            return (
                frozenset(r["doc_id"] for r in dd.select("doc_id").collect()),
                n,
                tok,
            )
        # large churn: rows stay executor-side (the persist above is
        # released; TombstoneFrame wraps a fresh scan so a session never
        # pins O(churn) cache)
        return (
            TombstoneFrame(
                spark.read.parquet(f"{index_dir}/tombstones")
                .select("doc_id")
                .distinct()
            ),
            n,
            tok,
        )
    finally:
        dd.unpersist()


class QuerySession:
    """Warm query handle over one built segment — the shape a query server
    holds: manifest read once, dictionary persisted in executor memory,
    optionally the (pruned-scan) postings too. Per-query work is then just
    a tiny dictionary-lookup job plus the pruned BMW job.

    At 10^12-doc scale: cache the dictionary (small — one row per distinct
    term per bucket), never the postings (``cache_postings`` stays False;
    the postings scan is bucket-pruned to the query's terms' partitions).
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache_dictionary: bool = True,
        cache_postings: bool = False,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.man = read_manifest(index_dir)
        self.dictionary = spark.read.parquet(f"{index_dir}/dictionary")
        self.postings = spark.read.parquet(f"{index_dir}/postings")
        self.dead = load_tombstones(spark, index_dir)
        # driver-side term-stats cache (idf + block-max upper bound per
        # term, ~100 B/entry, negative entries included): what a search
        # server keeps hot. Valid for the session's lifetime because the
        # segment is immutable. Bounded by TERM_META_CACHE_CAP.
        self._term_meta: dict = {}
        if cache_dictionary:
            self.dictionary = self.dictionary.persist()
        if cache_postings:
            self.postings = self.postings.persist()

    def close(self) -> None:
        self.dictionary.unpersist()
        self.postings.unpersist()
        if isinstance(self.dead, BroadcastDeadSet):
            self.dead.release()

    def topk(
        self,
        query: str,
        k: int = 10,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        return _topk_impl(
            self.spark, self.man, self.dictionary, self.postings, query, k,
            shard_range, dead=self.dead, meta_cache=self._term_meta,
            allow=make_allow(self.spark, allow),
        )

    def topk_batch(
        self,
        queries: dict,
        k: int = 10,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """Q queries in ONE job (query/batch.py), sharing this session's
        persisted dictionary, dead set and term-meta cache."""
        from .batch import _topk_batch_impl

        return _topk_batch_impl(
            self.spark, self.man, self.dictionary, self.postings, queries,
            k, shard_range, dead=self.dead, meta_cache=self._term_meta,
            allow=make_allow(self.spark, allow),
        )

    def highlight(self, hits: DataFrame, query: str, **kw) -> DataFrame:
        """Snippets for a top-k result (query/highlight.py) over this
        segment's stored docs."""
        from .highlight import highlight

        return highlight(self.spark, self.index_dir, hits, query, **kw)


def topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    shard_range: int | None = None,
) -> DataFrame:
    """BM25 top-k (doc_id, score) over a built segment, via block-max WAND.

    One-shot convenience over :class:`QuerySession` (no caching).

    Plan: dictionary lookup (bucket-pruned scan, tiny result collected) →
    postings scan pruned to the query terms' buckets → explode blocks over
    overlapped doc-range shards → applyInPandas BMW per shard (≤k rows out)
    → global orderBy(score desc, doc_id asc).limit(k).
    """
    man = read_manifest(index_dir)
    return _topk_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        query,
        k,
        shard_range,
        dead=load_tombstones(spark, index_dir),
    )


#: bound on a QuerySession's driver-side term-stats cache. Entries are
#: ~100 bytes; the cap keeps a hostile/huge query stream from growing the
#: driver unboundedly (on overflow the cache is simply cleared — the next
#: queries repopulate the hot head, which Zipf query streams guarantee).
TERM_META_CACHE_CAP = 1_000_000

#: floor for the doc-range shard width (the historical fixed default).
MIN_SHARD_RANGE = 1 << 17


def _auto_shard_range(man: dict, spark: SparkSession) -> int:
    """Doc-range shard width when the caller doesn't pin one.

    A block is exploded into every shard its [first_doc_id, last_doc_id]
    range overlaps, so the width must scale with the segment's doc-id
    SPAN, not be a constant: at a fixed 2^17 width, a corpus with 10^12
    ids means ~7.6M shards, and a rare term's single 128-posting block
    spanning the corpus would fan out into millions of duplicate rows
    (scores are shard-invariant, so this is pure waste). Sizing the width
    to span / (4 × parallelism) keeps the fan-out at ~4 shard tasks per
    core regardless of corpus size; the 2^17 floor keeps small/test
    corpora on their historical plans. Power-of-two so the downstream
    integer division is stable across chains sharing a width."""
    span = int(man.get("doc_id_hi", -1)) - int(man.get("doc_id_base", 0)) + 1
    if span <= 0:
        span = max(int(man.get("n_docs", 0)), 1)
    target_shards = 4 * max(spark.sparkContext.defaultParallelism, 1)
    want = -(-span // target_shards)
    width = MIN_SHARD_RANGE
    while width < want:
        width <<= 1
    return width


def _topk_impl(
    spark: SparkSession,
    man: dict,
    dictionary: DataFrame,
    postings: DataFrame,
    query: str,
    k: int,
    shard_range: int | None,
    dead: frozenset = frozenset(),
    meta_cache: dict | None = None,
    allow=None,
) -> DataFrame:
    num_buckets = man["num_buckets"]
    avgdl = man["avgdl"]
    if shard_range is None:
        shard_range = _auto_shard_range(man, spark)

    # query must use the SAME analyzer the segment was built with
    # (the reference maintains parallel IndexName / IndexNameStopword
    # indexes, solrIndexCreation.ts:877-880). A pre-expanded term list
    # (prefix/wildcard queries) bypasses tokenization.
    if isinstance(query, (list, tuple, set, frozenset)):
        terms = sorted(set(query))
    else:
        query_tokenizer = ANALYZERS.get(
            man.get("analyzer", "default"), ANALYZERS["default"]
        )[2]
        terms = sorted(set(query_tokenizer(query)))
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty

    # ---- term stats (idf, block-max upper bound), with an optional
    # driver-side cache (QuerySession): segments are immutable, so a
    # term's (df, max_tf_norm) never changes for this segment's lifetime
    # — repeated terms (Zipf query streams) skip the dictionary job
    # entirely, including negative entries for OOV terms -----------------
    from .batch import _resolve_term_meta

    term_meta = _resolve_term_meta(man, dictionary, terms, meta_cache)
    if not term_meta:
        return empty
    buckets = sorted({_term_bucket_py(t, num_buckets) for t in term_meta})

    blocks = (
        postings
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(list(term_meta)))
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

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )
    meta = dict(term_meta)
    kk, rr, avg = k, shard_range, avgdl

    def shard_topk(pdf: pd.DataFrame, dead_local, allow_local) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        lo, hi = shard * rr, (shard + 1) * rr
        cursors = []
        for term, g in pdf.groupby("term", sort=True):
            # doc-range order, NOT block_id: block ids restart per segment,
            # and multi-segment queries (incremental.topk_segments) union
            # blocks from several segments with disjoint doc ranges
            g = g.sort_values("first_doc_id", kind="stable")
            blist = [
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
            idf, ub = meta[term][0], meta[term][1]
            c = _TermCursor(idf, ub, blist, lo, hi)
            if c.cur < _INF:
                cursors.append(c)
        results = shard_topk_auto(
            cursors, kk, avg, dead=dead_local, lo=lo, hi=hi,
            allow=allow_local,
        )
        return pd.DataFrame(results, columns=["doc_id", "score"])

    dead_is_frame = isinstance(dead, TombstoneFrame)
    allow_is_frame = isinstance(allow, TombstoneFrame)  # incl. AllowFrame
    if dead_is_frame or allow_is_frame:
        # large-churn / large-filter path: the doc-id sets stay DataFrames
        # end-to-end. Shuffle them ONCE (unioned, an is_dead flag telling
        # tombstones from fq rows) by the same doc-range shard key the
        # blocks use, then cogroup — each BMW task receives exactly its
        # shard's ids as the right-hand pandas frame. No driver
        # materialization, no broadcast; per-task volume is set/n_shards.
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

        def run_shard_cg(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                # shard has tombstone/fq rows but no matching postings
                return pd.DataFrame(
                    {
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
                # an fq shard with no allow rows admits nothing — correct:
                # the filter has no member in this doc range
                allow_local = frozenset(
                    int(x) for x in right.loc[~right["is_dead"], "doc_id"]
                )
            else:
                allow_local = closure_allow
            return shard_topk(left, dead_local, allow_local)

        candidates = (
            blocks.groupBy("shard")
            .cogroup(right_by_shard.groupBy("shard"))
            .applyInPandas(run_shard_cg, out_schema)
        )
    else:
        dead_b, allow_b = dead, allow

        def run_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return shard_topk(pdf, dead_b, allow_b)

        candidates = blocks.groupBy("shard").applyInPandas(run_shard, out_schema)
    return candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def topk_filtered(
    spark: SparkSession,
    index_dir: str,
    query: str,
    allow,
    k: int = 10,
    shard_range: int | None = None,
) -> DataFrame:
    """Filtered BM25 top-k — the Solr/Lucene filter query (``fq``): the
    best k docs for ``query`` among the docs in ``allow``, with
    corpus-global BM25 statistics (a filter restricts candidates, never
    scoring — Lucene's fq semantics, which the reference's Solr serving
    side exposes on every request).

    ``allow``: a DataFrame with a ``doc_id`` column (any metadata
    predicate the caller wrote over the docs table or a dimension join) or
    an iterable of ids. Policy via :func:`make_allow`: small sets ride
    task closures; past the broadcast threshold the rows stay
    executor-side and are cogrouped into the kernels by doc-range shard —
    exact at any selectivity, no over-fetch window (unlike rescoring-based
    filtering, a filtered-out doc never occupies a heap slot, so a filter
    matching 10 docs in 10^12 still returns all 10 if they score)."""
    man = read_manifest(index_dir)
    return _topk_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        query,
        k,
        shard_range,
        dead=load_tombstones(spark, index_dir),
        allow=make_allow(spark, allow),
    )


def expand_prefix_df(
    dictionary: DataFrame, prefix: str, max_terms: int = 64
) -> list[str]:
    """Dictionary terms starting with ``prefix``, highest-df first, over
    an already-assembled dictionary plan (a segment's, or a session's
    union dictionary) — the shared core of prefix expansion. The
    startswith predicate pushes to parquet and prunes row groups because
    dictionary files are term-range partitioned + sorted (build.py
    ``_write_dictionary``)."""
    rows = (
        dictionary.filter(F.col("term").startswith(prefix.lower()))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def expand_prefix(
    spark: SparkSession, index_dir: str, prefix: str, max_terms: int = 64
) -> list[str]:
    """Dictionary terms starting with ``prefix``, highest-df first (the
    standard wildcard-expansion budget: cap the OR fan-out at the most
    selective-by-mass terms). Dictionary scan only — postings untouched."""
    return expand_prefix_df(
        spark.read.parquet(f"{index_dir}/dictionary"), prefix, max_terms
    )


def topk_prefix(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    k: int = 10,
    max_terms: int = 64,
    shard_range: int | None = None,
) -> DataFrame:
    """BM25 top-k for a prefix query (``pre*``): expand against the
    dictionary, then run the expanded OR-query through block-max WAND —
    the Solr/Lucene multi-term-query rewrite, Spark-side."""
    terms = expand_prefix(spark, index_dir, prefix, max_terms)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return topk(spark, index_dir, terms, k=k, shard_range=shard_range)


def expand_fuzzy_df(
    dictionary: DataFrame,
    term: str,
    max_edits: int = 1,
    prefix_len: int = 1,
    max_terms: int = 64,
) -> list[str]:
    """Dictionary terms within ``max_edits`` Levenshtein edits of
    ``term`` — Lucene FuzzyQuery's candidate enumeration (Solr
    ``term~N``), Spark-side over an already-assembled dictionary plan.

    Pruning, outermost first: ``prefix_len`` (Lucene's
    ``prefixLength``, default 1 — practical Solr deployments pin the
    first character) becomes a ``startswith`` predicate that pushes to
    parquet and prunes the term-range dictionary files exactly like
    prefix queries; a term-length band (edit distance ≥ length delta)
    drops most survivors before the DP runs; Catalyst's
    ``levenshtein(l, r, threshold)`` short-circuits row evaluation past
    the bound. At ``prefix_len=0`` the scan is the full dictionary —
    supported (Lucene's default) but the caller owns that cost; the
    budget cap still bounds the OR fan-out.

    Candidates rank edit-distance-first, then df, then term — Lucene's
    closest-then-commonest priority for the ``max_terms`` rewrite budget.
    """
    t = term.lower()
    d = dictionary
    if prefix_len > 0:
        d = d.filter(F.col("term").startswith(t[:prefix_len]))
    dist = F.levenshtein(F.col("term"), F.lit(t), max_edits)
    rows = (
        d.filter(
            F.length("term").between(len(t) - max_edits, len(t) + max_edits)
        )
        .withColumn("_ed", dist)
        .filter(F.col("_ed") >= 0)
        .groupBy("term")
        .agg(F.min("_ed").alias("_ed"), F.sum("df").alias("df"))
        .orderBy(F.asc("_ed"), F.desc("df"), F.asc("term"))
        .limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def expand_fuzzy(
    spark: SparkSession,
    index_dir: str,
    term: str,
    max_edits: int = 1,
    prefix_len: int = 1,
    max_terms: int = 64,
) -> list[str]:
    """Fuzzy expansion against one segment's dictionary — see
    :func:`expand_fuzzy_df`. Dictionary scan only; postings untouched."""
    return expand_fuzzy_df(
        spark.read.parquet(f"{index_dir}/dictionary"),
        term,
        max_edits,
        prefix_len,
        max_terms,
    )


def topk_fuzzy(
    spark: SparkSession,
    index_dir: str,
    term: str,
    k: int = 10,
    max_edits: int = 1,
    prefix_len: int = 1,
    max_terms: int = 64,
    shard_range: int | None = None,
) -> DataFrame:
    """BM25 top-k for a fuzzy query (Solr ``term~N``): expand against the
    dictionary within the edit-distance bound, then run the expanded
    OR-query through block-max WAND — the same multi-term-query rewrite
    as prefix queries. Scoring is straight OR-BM25 over the expansion
    (consistent with :func:`topk_prefix`; Lucene's optional
    similarity-blended boosts are a rescoring concern, not a candidate
    one)."""
    terms = expand_fuzzy(
        spark, index_dir, term, max_edits, prefix_len, max_terms
    )
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return topk(spark, index_dir, terms, k=k, shard_range=shard_range)


def expand_wildcard_df(
    dictionary: DataFrame, pattern: str, max_terms: int = 64
) -> list[str]:
    """Dictionary terms matching a Lucene wildcard pattern (``*`` = any
    run, ``?`` = exactly one char) — WildcardQuery's enumeration,
    Spark-side. The leading literal run becomes a ``startswith``
    predicate (term-range-file prune — Lucene's own guidance against
    leading wildcards carries over unchanged: a pattern starting with
    ``*``/``?`` scans the full dictionary); the whole pattern compiles
    to an anchored regex evaluated Catalyst-side on the survivors.
    df-descending budget like prefix expansion."""
    import re as _re

    p = pattern.lower()
    lit = _re.match(r"^[^*?]*", p).group(0)
    rx = (
        "^"
        + "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in p
        )
        + "$"
    )
    d = dictionary
    if lit:
        d = d.filter(F.col("term").startswith(lit))
    rows = (
        d.filter(F.col("term").rlike(rx))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def expand_wildcard(
    spark: SparkSession, index_dir: str, pattern: str, max_terms: int = 64
) -> list[str]:
    """Wildcard expansion against one segment's dictionary — see
    :func:`expand_wildcard_df`. Dictionary scan only."""
    return expand_wildcard_df(
        spark.read.parquet(f"{index_dir}/dictionary"), pattern, max_terms
    )


def topk_wildcard(
    spark: SparkSession,
    index_dir: str,
    pattern: str,
    k: int = 10,
    max_terms: int = 64,
    shard_range: int | None = None,
) -> DataFrame:
    """BM25 top-k for a wildcard query (``t?ble``, ``ta*le``): expand
    against the dictionary, then the standard OR rewrite — completes the
    multi-term-query family (prefix / fuzzy / wildcard) on one
    machinery."""
    terms = expand_wildcard(spark, index_dir, pattern, max_terms)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return topk(spark, index_dir, terms, k=k, shard_range=shard_range)


def topk_not(
    spark: SparkSession,
    index_dir: str,
    query,
    exclude,
    k: int = 10,
    shard_range: int | None = None,
    allow=None,
) -> DataFrame:
    """Boolean MUST_NOT (Solr/Lucene ``foo -bar``): top-k for ``query``
    among docs matching NO ``exclude`` term. Exclusion is membership,
    not a stats event — BM25 statistics stay corpus-global, exactly the
    fq discipline (a Lucene prohibited clause removes candidates without
    touching idf/avgdl).

    The exclusion set is computed THROUGH the index (the fq/facet match
    decode — one term-pruned postings scan, facet.matching_doc_ids),
    normalized by the same small-set/frame policy as tombstones, and
    unioned into the dead set: the kernels skip excluded docs without a
    heap slot, so a query whose top docs are all excluded still returns
    the best k survivors. Composes with fq (``allow``)."""
    from .facet import matching_doc_ids

    man = read_manifest(index_dir)
    deny = make_allow(spark, matching_doc_ids(spark, index_dir, exclude))
    dead = load_tombstones(spark, index_dir)
    if deny:
        dead = union_dead(spark, [dead, deny])
    return _topk_impl(
        spark,
        man,
        spark.read.parquet(f"{index_dir}/dictionary"),
        spark.read.parquet(f"{index_dir}/postings"),
        query,
        k,
        shard_range,
        dead=dead,
        allow=make_allow(spark, allow),
    )


def topk_boosted(
    spark: SparkSession,
    index_dir: str,
    query: str,
    boosts,
    k: int = 10,
    boost_weight: float = 1.0,
    shard_range: int | None = None,
) -> DataFrame:
    """Opt-in boosted mode (SURVEY.md §7.4): BM25 relevance plus an additive
    per-document static prior — the reference's documenttypeboost /
    boostpopularity columns (solrIndexCreation.ts:824,2722-2731,...) live in
    the document and Solr applies them at query time, OUTSIDE BM25; this
    mirrors that: the rank-identity gate covers pure BM25 (``topk``), and
    boosts compose on top.

    ``boosts``: DataFrame (doc_id, boost double) — typically small/derived
    (broadcast); candidates come from an over-fetched pure-BM25 pass so a
    boost can promote a doc from below the unboosted top-k (fetch 10×k,
    the standard two-stage rescoring window).
    """
    base = topk(spark, index_dir, query, k=max(k * 10, 100),
                shard_range=shard_range)
    boosts = boosts.select(
        F.col("doc_id"), F.col("boost").cast("double").alias("boost")
    )
    return (
        base.join(F.broadcast(boosts), "doc_id", "left")
        .withColumn(
            "score",
            F.col("score") + F.lit(float(boost_weight)) * F.coalesce("boost", F.lit(0.0)),
        )
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
