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
from .build import build_index, read_docs, read_manifest


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
    build_kwargs.setdefault("num_buckets", man["num_buckets"])
    build_kwargs.setdefault("block_size", man.get("block_size", 128))
    build_kwargs.setdefault("analyzer", man.get("analyzer", "default"))
    # a delta of a positional base must store positions too, or phrase
    # queries lose the updated docs and merge_segments rejects the chain
    build_kwargs.setdefault("store_positions", man.get("positions", False))
    # delta FIRST, tombstones after: the delta only becomes visible at its
    # atomic _manifest.json commit, so a crash mid-way leaves the old docs
    # serving intact (never tombstoned-with-no-replacement). The window
    # between delta commit and tombstone append serves both versions —
    # transient duplicates beat silently lost documents, and a retry
    # re-tombstones idempotently.
    delta_man = build_index(
        spark,
        changed_pages,
        delta_dir,
        base_doc_id=man["doc_id_hi"] + 1,
        **build_kwargs,
    )
    base_docs = read_docs(spark, base_dir, man)
    changed_urls = changed_pages.select("url").distinct()
    dead = base_docs.join(F.broadcast(changed_urls), "url", "left_semi").select(
        "doc_id", "doclen"
    )
    delta_man["n_superseded"] = append_tombstones(spark, base_dir, dead)
    return delta_man


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
    if (
        len({m["num_buckets"] for m in mans}) != 1
        or len({m.get("analyzer", "default") for m in mans}) != 1
        or len({bool(m.get("positions", False)) for m in mans}) != 1
    ):
        raise ValueError(
            "segments disagree on num_buckets/analyzer/positions"
        )
    build_kwargs.setdefault("num_buckets", mans[0]["num_buckets"])
    build_kwargs.setdefault("block_size", mans[0].get("block_size", 128))
    build_kwargs.setdefault("analyzer", mans[0].get("analyzer", "default"))
    build_kwargs.setdefault(
        "store_positions", mans[0].get("positions", False)
    )
    # delta first, tombstones after — see reindex_changed for the crash
    # semantics (old docs keep serving if the build dies; transient
    # duplicates during the tombstone pass; retries self-heal)
    delta_man = build_index(
        spark,
        changed_pages,
        delta_dir,
        base_doc_id=max(m["doc_id_hi"] for m in mans) + 1,
        **build_kwargs,
    )
    changed_urls = changed_pages.select("url").distinct()
    n_superseded = 0
    for d, m in zip(seg_dirs, mans):
        dead = (
            read_docs(spark, d, m)
            .join(F.broadcast(changed_urls), "url", "left_semi")
            .select("doc_id", "doclen")
        )
        n_superseded += append_tombstones(spark, d, dead)
    delta_man["n_superseded"] = n_superseded
    return delta_man


def _chain_state(
    spark: SparkSession,
    seg_dirs: list[str],
    mans: list[dict],
    dead=None,
):
    """Shared chain assembly: validated combined manifest (live n_docs /
    avgdl), union dictionary, union postings, union dead set. Tombstone
    parquet is read once per segment, here. A caller holding a precomputed
    dead set passes it as ``dead`` — then only the per-segment statistics
    aggregates run (one scalar agg each), no membership materialization
    or driver collect."""
    num_buckets = {m["num_buckets"] for m in mans}
    analyzers = {m.get("analyzer", "default") for m in mans}
    if len(num_buckets) != 1 or len(analyzers) != 1:
        raise ValueError("segments disagree on num_buckets/analyzer")

    # ONE read per segment's tombstones → (membership, n_dead, dead_tok):
    # both are per-segment-GENERATION constants (tombstones only change
    # when a partial re-index appends), so chain serving computes them
    # once and reuses them for every query (see SegmentsSession)
    deads, n_dead, dead_tok = [], 0, 0
    for d in seg_dirs:
        dset, n, tok = load_tombstones(
            spark, d, with_stats=True, membership=dead is None
        )
        if dead is None:
            deads.append(dset)
        n_dead += n
        dead_tok += tok
    if dead is None:
        dead = union_dead(spark, deads)

    # live-doc stats: tombstones carry doclen, so the correction is exact
    n_total = max(sum(m["n_docs"] for m in mans) - n_dead, 0)
    tok_total = sum(m["n_docs"] * m["avgdl"] for m in mans) - dead_tok
    avgdl = tok_total / n_total if n_total > 0 else 1.0
    man = {
        "num_buckets": num_buckets.pop(),
        "n_docs": n_total,
        "avgdl": avgdl,
        "analyzer": analyzers.pop(),
        # chain doc-id span — lets _auto_shard_range size the BMW doc-range
        # shards to the chain's actual id space (shards at disjoint
        # base_doc_id strides would otherwise default to a 2^17 width and
        # explode rare-term blocks across millions of shards)
        "doc_id_base": min(m.get("doc_id_base", 0) for m in mans),
        "doc_id_hi": max(m.get("doc_id_hi", -1) for m in mans),
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
    return man, dictionary, postings, dead


class SegmentsSession:
    """Warm serving handle over a segment CHAIN (base + deltas) — the
    multi-segment twin of :class:`..query.bmw.QuerySession`, and the
    posture every partially-updated index lives in until the next merge
    (the reference between *PartialIndex runs and full rebuilds,
    solrIndexCreation.ts:2957-3192).

    Everything that is constant per segment GENERATION is computed once at
    open: the union dead set, the (n_dead, dead_tokens) statistics
    correction, the combined manifest, the union dictionary (persisted in
    executor memory), and the union postings plan. Per-query work is then
    one dictionary-lookup job for cache-miss terms plus the pruned BMW job
    — no tombstone parquet read, no per-segment stats agg (previously
    segments × QPS Spark jobs for values that only change when tombstones
    are appended). Re-open the session after a partial re-index or merge
    (the chain's segment set / tombstones changed).
    """

    def __init__(
        self,
        spark: SparkSession,
        seg_dirs: list[str],
        cache_dictionary: bool = True,
        cache_postings: bool = False,
    ):
        self.spark = spark
        self.seg_dirs = list(seg_dirs)
        self.mans = [read_manifest(d) for d in self.seg_dirs]
        self.man, self.dictionary, self.postings, self.dead = _chain_state(
            spark, self.seg_dirs, self.mans
        )
        # driver-side (idf, upper-bound) cache, negative entries included —
        # valid for the session's lifetime (segments + tombstone stats are
        # frozen at open). Same bound as QuerySession's.
        self._term_meta: dict = {}
        if cache_dictionary:
            self.dictionary = self.dictionary.persist()
        if cache_postings:
            self.postings = self.postings.persist()

    def topk(
        self,
        query: str,
        k: int = 10,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        from ..query.bmw import make_allow

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
        """Q queries in ONE job over the chain (query/batch.py), sharing
        the session's union dictionary, dead set and term-meta cache."""
        from ..query.batch import _topk_batch_impl
        from ..query.bmw import make_allow

        return _topk_batch_impl(
            self.spark, self.man, self.dictionary, self.postings, queries,
            k, shard_range, dead=self.dead, meta_cache=self._term_meta,
            allow=make_allow(self.spark, allow),
        )

    def highlight(self, hits: DataFrame, query: str, **kw) -> DataFrame:
        """Snippets for a top-k result over the chain (docs resolved
        across base + delta segments; query/highlight.py)."""
        from ..query.highlight import highlight_segments

        return highlight_segments(
            self.spark, self.seg_dirs, hits, query, **kw
        )

    def _require_positions(self) -> None:
        if not all(m.get("positions") for m in self.mans):
            raise ValueError(
                "phrase queries require every chain segment built with "
                "store_positions=True"
            )

    def phrase(
        self,
        phrase: str,
        k: int = 10,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """Exact-phrase top-k over the chain, warm: reuses the session's
        combined manifest, persisted union dictionary, union postings and
        precomputed dead set (one-shot ``phrase_topk_segments`` rebuilds
        all four per call)."""
        from ..query.bmw import make_allow
        from ..query.phrase import _phrase_impl

        self._require_positions()
        return _phrase_impl(
            self.spark, self.man, self.dictionary, self.postings, phrase,
            k, shard_range, dead=self.dead,
            allow=make_allow(self.spark, allow),
        )

    def phrase_batch(
        self,
        phrases: dict,
        k: int = 10,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """P phrases in ONE job over the chain (the
        ``phrase_topk_batch_segments`` grid), sharing the session's
        cached chain state."""
        from ..query.bmw import make_allow
        from ..query.phrase import _phrase_batch_impl

        self._require_positions()
        return _phrase_batch_impl(
            self.spark, self.man, self.dictionary, self.postings, phrases,
            k, shard_range, dead=self.dead,
            allow=make_allow(self.spark, allow),
        )

    # ---- the Solr response surface beyond the ranked list (facets,
    # numFound, sort=, MLT): all reuse the session's per-generation
    # postings plan, union dictionary and precomputed dead set — a results
    # page's facet/count/sort calls never re-read tombstone parquet or
    # per-segment stats (pinned by tests/test_serving_session.py) --------

    def _docs_meta(self, cols: list[str]):
        """Union (doc_id, *cols) over the chain's docs tables (shared-docs
        pointers resolved). Plan-only — cheap to rebuild per distinct
        column set; memoized so repeated facet/sort calls reuse one plan."""
        from ..query.facet import docs_meta_union

        key = tuple(cols)
        cache = getattr(self, "_docs_meta_cache", None)
        if cache is None:
            cache = self._docs_meta_cache = {}
        if key not in cache:
            cache[key] = docs_meta_union(
                self.spark, self.seg_dirs, self.mans, list(cols)
            )
        return cache[key]

    def match_ids(self, query, allow=None) -> DataFrame:
        """Distinct live doc_ids matching ANY analyzed query term (the
        OR match set) over the chain, dead set applied from the session's
        precomputed membership."""
        from ..query.facet import _match_ids_impl

        ids = _match_ids_impl(
            self.spark, self.man, self.postings, query, dead=self.dead
        )
        if allow is not None:
            ids = ids.join(
                allow.select("doc_id").distinct(), "doc_id", "left_semi"
            )
        return ids

    def facet(
        self,
        query,
        col: str = "lang",
        allow=None,
        max_values: int | None = None,
    ) -> DataFrame:
        """(facet, n) counts over the live match set — Solr facet.field
        on every results page (query/facet.py semantics)."""
        from ..query.facet import _facet_impl

        return _facet_impl(
            self.match_ids(query, allow=allow),
            self._docs_meta([col]),
            col,
            max_values,
        )

    def count(self, query, allow=None) -> int:
        """numFound — live docs matching any analyzed query term."""
        return self.match_ids(query, allow=allow).count()

    def sorted_topk(
        self,
        query,
        sort_cols="doc_id",
        k: int = 10,
        start: int = 0,
        ascending=True,
        allow=None,
        keys: DataFrame | None = None,
    ) -> DataFrame:
        """Sort-by-stored-field top-k with deep paging — Solr
        ``sort=``/``start``/``rows`` (query/sorting.py semantics), warm."""
        from ..query.sorting import _sorted_impl

        if keys is None:
            cols = (
                [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
            )
            keys = self._docs_meta(cols)
        return _sorted_impl(
            self.spark, self.match_ids(query), keys, sort_cols, k, start,
            ascending, allow=allow,
        )

    def topk_prefix(
        self,
        prefix: str,
        k: int = 10,
        max_terms: int = 64,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """Prefix (``pre*``) BM25 top-k over the chain: expansion runs
        against the session's persisted UNION dictionary (chain-wide df
        ranking — a delta-only term is expandable), then the expanded OR
        query through the standard warm path."""
        from ..query.bmw import expand_prefix_df

        terms = expand_prefix_df(self.dictionary, prefix, max_terms)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return self.topk(terms, k=k, shard_range=shard_range, allow=allow)

    def topk_fuzzy(
        self,
        term: str,
        k: int = 10,
        max_edits: int = 1,
        prefix_len: int = 1,
        max_terms: int = 64,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """Fuzzy (``term~N``) BM25 top-k over the chain: Levenshtein
        expansion against the session's persisted UNION dictionary
        (chain-wide df ranking, delta-only terms expandable), then the
        expanded OR query through the standard warm path — same shape as
        :meth:`topk_prefix`."""
        from ..query.bmw import expand_fuzzy_df

        terms = expand_fuzzy_df(
            self.dictionary, term, max_edits, prefix_len, max_terms
        )
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return self.topk(terms, k=k, shard_range=shard_range, allow=allow)

    def topk_wildcard(
        self,
        pattern: str,
        k: int = 10,
        max_terms: int = 64,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """Wildcard (``t?ble``) BM25 top-k over the chain — expansion
        against the session's union dictionary, same shape as
        :meth:`topk_prefix`."""
        from ..query.bmw import expand_wildcard_df

        terms = expand_wildcard_df(self.dictionary, pattern, max_terms)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        return self.topk(terms, k=k, shard_range=shard_range, allow=allow)

    def topk_not(
        self,
        query,
        exclude,
        k: int = 10,
        shard_range: int | None = None,
        allow=None,
    ) -> DataFrame:
        """Boolean MUST_NOT (``foo -bar``) over the chain: the exclusion
        match set rides the session's postings plan (match_ids — pruned
        union scan, session dead set honored) and is unioned into the
        per-generation dead set for this query only; BM25 stats stay the
        chain's corpus-global values (fq discipline)."""
        from ..query.bmw import make_allow, union_dead

        deny = make_allow(self.spark, self.match_ids(exclude))
        dead = self.dead
        if deny:
            dead = union_dead(self.spark, [dead, deny])
        return _topk_impl(
            self.spark, self.man, self.dictionary, self.postings, query, k,
            shard_range, dead=dead, meta_cache=self._term_meta,
            allow=make_allow(self.spark, allow),
        )

    def score_matches(self, query, allow=None) -> DataFrame:
        """(doc_id, score) for EVERY live doc matching the query over
        the chain — the exact substrate for collapse/grouping (union
        postings + dictionary, session dead set, term-meta cache)."""
        from ..query.bmw import make_allow
        from ..query.group import _score_matches_impl

        scored = _score_matches_impl(
            self.spark, self.man, self.dictionary, self.postings, query,
            dead=self.dead, meta_cache=self._term_meta,
        )
        if allow is not None:
            allow = make_allow(self.spark, allow)
            if isinstance(allow, frozenset):
                allow = self.spark.createDataFrame(
                    [(int(d),) for d in sorted(allow)], "doc_id long"
                )
            else:
                allow = allow.df
            scored = scored.join(
                allow.select("doc_id").distinct(), "doc_id", "left_semi"
            )
        return scored

    def collapse(
        self, query, field: str = "lang", k: int = 10, allow=None
    ) -> DataFrame:
        """Solr field collapse over the chain: top-k group heads of the
        match set by BM25 — exact (full-match scorer, no over-fetch)."""
        from ..query.group import _collapse_heads

        scored = self.score_matches(query, allow=allow)
        return _collapse_heads(
            scored, self._docs_meta([field]), field, k
        )

    def mlt(
        self,
        doc_id: int,
        k: int = 10,
        max_terms: int = 25,
        min_df: int = 2,
        max_df_frac: float = 0.25,
        shard_range: int | None = None,
    ) -> DataFrame:
        """More-Like-This over the chain: interesting terms use the
        session's union dictionary + combined live-doc stats; the source
        doc joins the session's dead set for the rescoring pass."""
        from ..query.mlt import _mlt_impl

        return _mlt_impl(
            self.spark,
            self.man,
            self.dictionary,
            self.postings,
            self._docs_meta(["text"]),
            doc_id,
            k=k,
            max_terms=max_terms,
            min_df=min_df,
            max_df_frac=max_df_frac,
            shard_range=shard_range,
            dead=self.dead,
            meta_cache=self._term_meta,
        )

    def close(self) -> None:
        from ..query.bmw import BroadcastDeadSet

        self.dictionary.unpersist()
        self.postings.unpersist()
        if isinstance(self.dead, BroadcastDeadSet):
            self.dead.release()


def reindex_changed_dual(
    spark: SparkSession,
    seg_dirs: list[str],
    seg_dirs_stop: list[str],
    changed_pages: DataFrame,
    delta_dir: str,
    delta_dir_stop: str,
) -> tuple[dict, dict]:
    """``reindex_changed_multi`` over a DUAL job's two variant chains —
    the reference's partial path bulk-posts per variant by ``indexType``
    (IndexName / IndexNameStopword, solrIndexCreation.ts:3180-3184).

    The two deltas are built by ONE single-pass dual build (one scan /
    tokenize / exchange, build_index_dual), so the variants' doc ids stay
    aligned — the same property the base build guarantees. Tombstoning
    then runs per variant chain (same urls, each chain's own docs).
    Delta-first ordering as in :func:`reindex_changed`."""
    from .build import build_index_dual

    mans = [read_manifest(d) for d in seg_dirs]
    mans_stop = [read_manifest(d) for d in seg_dirs_stop]
    for ms, want in ((mans, "default"), (mans_stop, "stopword")):
        if (
            len({m["num_buckets"] for m in ms}) != 1
            or {m.get("analyzer", "default") for m in ms} != {want}
            or len({bool(m.get("positions", False)) for m in ms}) != 1
        ):
            raise ValueError(
                f"{want} chain disagrees on num_buckets/analyzer/positions"
            )
    if bool(mans[0].get("positions", False)) != bool(
        mans_stop[0].get("positions", False)
    ):
        raise ValueError("variant chains disagree on positions")

    base_doc_id = (
        max(m["doc_id_hi"] for m in mans + mans_stop) + 1
    )
    man_a, man_b = build_index_dual(
        spark,
        changed_pages,
        delta_dir,
        delta_dir_stop,
        num_buckets=mans[0]["num_buckets"],
        block_size=mans[0].get("block_size", 128),
        base_doc_id=base_doc_id,
        store_positions=mans[0].get("positions", False),
    )
    changed_urls = changed_pages.select("url").distinct()
    for dirs, ms, man in (
        (seg_dirs, mans, man_a), (seg_dirs_stop, mans_stop, man_b)
    ):
        n_superseded = 0
        for d, m in zip(dirs, ms):
            dead = (
                read_docs(spark, d, m)
                .join(F.broadcast(changed_urls), "url", "left_semi")
                .select("doc_id", "doclen")
            )
            n_superseded += append_tombstones(spark, d, dead)
        man["n_superseded"] = n_superseded
    return man_a, man_b


def topk_segments(
    spark: SparkSession,
    seg_dirs: list[str],
    query: str,
    k: int = 10,
    shard_range: int | None = None,
    dead=None,
    allow=None,
) -> DataFrame:
    """BM25 top-k across several segments (pre-merge serving path),
    one-shot. A server issuing repeated queries should hold a
    :class:`SegmentsSession` instead — it computes the union dead set and
    the tombstone statistics correction once per segment generation.

    Statistics are combined across segments: N and avgdl from live docs,
    df summed from the union dictionary. Tombstoned docs are excluded from
    results; their residual contribution to df (until the next merge
    compacts them) matches standard segmented-index behavior.

    ``dead``: optional precomputed dead set (e.g. a prior
    ``union_dead(spark, [load_tombstones(spark, d) for d in seg_dirs])``)
    — membership only; the statistics correction is still exact because it
    comes from the per-segment tombstone aggregates (one scalar agg per
    segment — no membership rebuild when ``dead`` is supplied).
    """
    from ..query.bmw import make_allow

    mans = [read_manifest(d) for d in seg_dirs]
    man, dictionary, postings, chain_dead = _chain_state(
        spark, seg_dirs, mans, dead=dead
    )
    return _topk_impl(
        spark, man, dictionary, postings, query, k, shard_range,
        dead=chain_dead,
        allow=make_allow(spark, allow),
    )
