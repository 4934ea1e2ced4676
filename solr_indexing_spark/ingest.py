"""End-to-end ingest job: packed per-doctype rows → composed
``IndexDocument``s → BM25 index segment(s) + completion table, one run.

This is the reference's actual job shape (solrIndexCreation.ts: each
``*Index`` method = ETL loop + BulkIndexing + suggester push in one
pass): a doctype's packed table goes through its composed pipeline
(docprep/pipelines.py), the finalized ``fullcontent`` (searchboosttext
already injected as the hidden metadata div — F12/F13) is indexed into
segment(s) under ``out_dir``, and the per-document ``Suggest[]`` entries
become the completion table. With ``dual=True`` both analyzer variants
are built from one tokenized stream (build_index_dual — the reference
posts every batch to IndexName AND IndexNameStopword, ts:877-880).

Dataflow (all lazy until the builds; no driver materialization of rows):

    packed ──composer (plan-cached linear map)──▶ docs
      ├─ select(id→url, fullcontent→html) ──▶ build_index[_dual]
      │      (extraction + quarantine + docID + postings inside)
      └─ explode(Suggest[].Input) ──▶ build_completion_index

The composed DataFrame is NOT persisted: the two consumers each re-run
the composer map over the packed scan. The completion leg prunes to the
``Suggest`` column only (narrow scan), so the duplicated work is one
cheap column-pruned pass — persisting the full composed output (with
fullcontent) would cost more than it saves at corpus scale.

CLI:  python -m solr_indexing_spark.ingest --doctype case_laws \\
          --input packed.parquet --out /path/idx [--dual] [--positions]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docprep import pipelines as P
from .docprep import sidefiles
from .indexing.build import build_index, build_index_dual
from .query.completion import build_completion_index

#: doctype key → composed pipeline (reference *Index method). CaseFinder
#: fans out one row per digest paragraph (explode), like its loop.
PIPELINES = {
    "case_laws": P.case_laws_document,
    "case_laws_partial": P.case_laws_partial_document,
    "case_finder": P.case_finder_documents,
    "act_rule": P.act_rule_document,
    "cirnot": P.cirnot_document,
    "article": P.article_document,
    "form": P.form_document,
    "treaty": P.treaty_document,
    "news": P.news_document,
    "commentary": P.commentary_document,
    "commentary_book": P.commentary_book_document,
    "aaa": P.aaa_document,
    "aaa_model_report": P.aaa_model_report_document,
}


def compose(
    packed: DataFrame,
    doctype: str,
    templateid: str = "",
    side_files_root: str | None = None,
) -> DataFrame:
    """Packed rows → composed IndexDocument DataFrame, including the S5
    side-file attach for the doctypes that read attachment files."""
    if doctype not in PIPELINES:
        raise ValueError(
            f"unknown doctype {doctype!r}; one of {sorted(PIPELINES)}"
        )
    doc = PIPELINES[doctype](packed, templateid=templateid)
    if side_files_root:
        side = sidefiles.load_side_files(packed.sparkSession, side_files_root)
        if doctype == "aaa":
            doc = sidefiles.attach_compare_file_content(doc, side)
        elif doctype == "aaa_model_report":
            doc = sidefiles.attach_model_report_content(doc, side)
    return doc


def resolve_index(path: str, analyzer: str | None = None) -> str:
    """Job dir or segment dir → the segment dir for the requested
    analyzer — the reference's query-time routing between ``IndexName``
    and ``IndexNameStopword`` (solrIndexCreation.ts:877-880): a dual
    ingest job writes both variants, and queries pick one.

    ``analyzer=None`` on a plain segment passes it through unvalidated
    (pre-existing single-segment usage); on a job dir it means the
    default variant. An explicit analyzer is validated against the
    segment manifest so a stopword query never silently runs against
    default-analyzer postings."""
    if os.path.exists(f"{path}/_job_manifest.json"):
        sub = "index_stopword" if analyzer == "stopword" else "index"
        seg = f"{path}/{sub}"
        if not os.path.exists(f"{seg}/_manifest.json"):
            raise ValueError(
                f"ingest job at {path} has no committed "
                f"{analyzer or 'default'!r} segment ({sub}/ absent — "
                "was the job built without --dual?)"
            )
        return seg
    if analyzer is not None:
        from .indexing.build import read_manifest

        built_with = read_manifest(path).get("analyzer", "default")
        if built_with != analyzer:
            raise ValueError(
                f"segment {path} was built with analyzer="
                f"{built_with!r}, requested {analyzer!r}"
            )
    return path


def suggest_entries(doc: DataFrame) -> DataFrame | None:
    """Flatten ``Suggest[]`` → (url, input, weight) completion rows; None
    for doctypes without suggesters. ``url`` (the composed doc id) is the
    provenance key that lets compaction drop a superseded document's stale
    suggest entries (see ``run_ingest_compact``)."""
    if "Suggest" not in doc.columns:
        return None
    return (
        doc.select(F.col("id").alias("url"), F.explode("Suggest").alias("s"))
        .select(
            "url",
            F.explode("s.Input").alias("input"),
            F.col("s.Weight").alias("weight"),
        )
        .filter(F.col("input").isNotNull() & (F.col("input") != ""))
    )


def run_ingest(
    spark: SparkSession,
    packed: DataFrame,
    doctype: str,
    out_dir: str,
    *,
    dual: bool = False,
    store_positions: bool = False,
    shared_docs: bool = False,
    templateid: str = "",
    side_files_root: str | None = None,
    num_buckets: int = 16,
    base_doc_id: int = 0,
    verify_extraction: bool | float = False,
) -> dict:
    """One job: packed rows in → queryable index + completion table out.

    Layout under ``out_dir``: ``index/`` (default analyzer; with
    ``dual``, also ``index_stopword/``), ``completion/`` (when the
    doctype emits Suggest entries), ``_job_manifest.json`` (atomic —
    written last, the job-level commit point mirroring the segment
    manifest convention)."""
    os.makedirs(out_dir, exist_ok=True)
    doc = compose(
        packed, doctype, templateid=templateid,
        side_files_root=side_files_root,
    )
    if "id" not in doc.columns or "fullcontent" not in doc.columns:
        raise ValueError(
            f"{doctype} composer output lacks id/fullcontent columns"
        )
    # the composed fullcontent is the indexed body (searchboosttext is
    # already injected as the hidden metadata div); id becomes the stable
    # url key that docID assignment orders by
    pages = doc.select(
        F.col("id").alias("url"), F.col("fullcontent").alias("html")
    )
    if dual:
        man_a, man_b = build_index_dual(
            spark, pages, f"{out_dir}/index", f"{out_dir}/index_stopword",
            num_buckets=num_buckets, base_doc_id=base_doc_id,
            store_positions=store_positions, shared_docs=shared_docs,
            verify_extraction=verify_extraction,
        )
        manifests = {"index": man_a, "index_stopword": man_b}
    else:
        manifests = {
            "index": build_index(
                spark, pages, f"{out_dir}/index", num_buckets=num_buckets,
                base_doc_id=base_doc_id, store_positions=store_positions,
                verify_extraction=verify_extraction,
            )
        }

    sugg = suggest_entries(doc)
    n_completion = 0
    if sugg is not None:
        build_completion_index(sugg, f"{out_dir}/completion")
        # provenance rows (url, input, weight, display, gen): the append-only
        # side table compaction rebuilds completions from — per-url, the
        # highest generation's entries are the live ones
        sugg.withColumn("display", F.col("input")).withColumn(
            "gen", F.lit(0)
        ).write.mode("overwrite").parquet(f"{out_dir}/suggest_rows")
        n_completion = (
            spark.read.parquet(f"{out_dir}/completion").count()
        )

    job = {
        "doctype": doctype,
        "dual": dual,
        "n_docs": manifests["index"]["n_docs"],
        "quarantined": manifests["index"]["quarantined"],
        "completion_entries": n_completion,
        "manifests": manifests,
    }
    tmp = f"{out_dir}/_job_manifest.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(job, fh, indent=1)
    os.replace(tmp, f"{out_dir}/_job_manifest.json")
    return job


def _recover_swap(dest: str) -> None:
    """Roll back a fallback ``_swap_dir`` interrupted between its two
    renames (``dest`` absent, ``dest.old`` present): restore the old tree.
    Safe because a swap is the LAST step of its commit — at the moment of
    the crash the old tree's chain (deltas, manifests) is still fully on
    disk, so rolling back returns the job to its exact pre-commit state
    and the staged new tree (still under its staging name) is re-created
    or re-swapped by the retried operation.

    Race-tolerant: two concurrent recoverers (or a recoverer racing the
    in-flight swap's second rename) can both pass the exists() checks;
    whoever loses gets an OSError from ``os.replace`` — by then ``dest``
    is live either way, so the loser swallows it."""
    old = f"{dest}.old"
    if not os.path.exists(dest) and os.path.exists(old):
        try:
            os.replace(old, dest)
        except OSError:
            pass  # another process restored dest (or the swap completed)


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically exchange paths ``a`` and ``b`` via Linux
    ``renameat2(RENAME_EXCHANGE)``. Returns False when the syscall or the
    filesystem doesn't support it (non-Linux, old kernel, some network
    filesystems) — callers fall back to the two-rename protocol."""
    import ctypes

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        renameat2 = libc.renameat2
    except (OSError, AttributeError):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    r = renameat2(
        AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b), RENAME_EXCHANGE
    )
    return r == 0


def _swap_dir(new_dir: str, dest: str) -> None:
    """Swap ``new_dir`` into place at ``dest``.

    Primary path (Linux): one atomic ``renameat2(RENAME_EXCHANGE)`` —
    ``dest`` is never absent, so concurrent readers (``job_segments``,
    ``completion_tables``, a ``query.py --serve`` staleness probe) can
    never observe a half-done swap, and their ``_recover_swap`` has
    nothing to roll back. The old tree lands under the staging name and
    is deleted as cleanup.

    Fallback (no exchange support): rename-old → rename-new → delete-old.
    The old tree is never deleted before the new one is in place; the one
    crash window (between the two renames) leaves ``dest`` absent with
    ``dest.old`` intact, which ``_recover_swap`` rolls back. A concurrent
    reader's recovery racing the live swap can make the swapper's second
    rename fail — the commit aborts with data intact and a retry
    succeeds; single-process operation (or an exchange-capable
    filesystem) has no such window."""
    import shutil

    _recover_swap(dest)  # roll back a prior interrupted swap first
    old = f"{dest}.old"
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    if os.path.exists(dest):
        if _exchange_dirs(new_dir, dest):
            shutil.rmtree(new_dir, ignore_errors=True)  # now the old tree
            return
        os.replace(dest, old)
    os.replace(new_dir, dest)
    shutil.rmtree(old, ignore_errors=True)


def job_segments(out_dir: str, variant: str = "index") -> list[str]:
    """The job's live segment chain for one analyzer variant (base +
    deltas, build order). ``variant``: ``index`` (default analyzer) or
    ``index_stopword``.

    Deltas already folded into the base by a compaction are excluded via
    the base manifest's ``merged_from`` list — this is the compaction
    commit point: the instant the merged segment is renamed onto the base,
    the old deltas stop being part of the chain, whether or not their
    directories have been cleaned up yet (crash-safe; see
    ``run_ingest_compact``)."""
    import glob as _glob

    base = f"{out_dir}/{variant}"
    _recover_swap(base)
    deltas = sorted(_glob.glob(f"{out_dir}/{variant}_delta*"))
    merged_from: set[str] = set()
    if deltas and os.path.exists(f"{base}/_manifest.json"):
        with open(f"{base}/_manifest.json") as fh:
            merged_from = set(json.load(fh).get("merged_from", []))
    return [base] + [
        d
        for d in deltas
        if os.path.exists(f"{d}/_manifest.json")
        and os.path.basename(d) not in merged_from
    ]


def run_ingest_partial(
    spark: SparkSession,
    packed_changed: DataFrame,
    doctype: str,
    out_dir: str,
    *,
    templateid: str = "",
    side_files_root: str | None = None,
) -> dict:
    """The reference's *PartialIndex job shape (CaseLawsPartialIndex,
    solrIndexCreation.ts:2957-3192): re-index only changed/new documents
    against an existing ingest job.

    Changed packed rows go through the SAME composed pipeline; docs they
    supersede are tombstoned in whichever segment of the chain holds
    them (base or an earlier delta); the new versions land in a fresh
    delta segment with doc ids continuing past the chain's maximum.
    Serving before the next merge is ``topk_segments`` over the chain
    (``indexing.incremental``); ``merge_segments`` compacts back to one.

    Completions: the delta's suggest entries become their OWN small
    completion segment (``completion_delta####``), and the provenance rows
    append to ``suggest_rows`` — partial wall is therefore independent of
    the accumulated completion-table size. Serving unions the tables
    (``complete_job``); a superseded document's old entries persist until
    ``run_ingest_compact`` rebuilds from the latest generation per url —
    the reference's suggester dictionary behaves the same way between
    rebuilds. Dual jobs update BOTH variant chains via one single-pass
    dual delta build (the reference's partial path posts per variant by
    ``indexType``, solrIndexCreation.ts:3180-3184).
    """
    job_path = f"{out_dir}/_job_manifest.json"
    with open(job_path) as fh:
        job = json.load(fh)
    if job.get("doctype") != doctype:
        raise ValueError(
            f"job at {out_dir} is doctype {job.get('doctype')!r}, "
            f"got {doctype!r}"
        )
    doc = compose(
        packed_changed, doctype, templateid=templateid,
        side_files_root=side_files_root,
    )
    pages = doc.select(
        F.col("id").alias("url"), F.col("fullcontent").alias("html")
    )

    gen = _next_delta_gen(out_dir)
    if job.get("dual"):
        from .indexing.incremental import reindex_changed_dual

        segs = job_segments(out_dir, "index")
        segs_stop = job_segments(out_dir, "index_stopword")
        delta = f"{out_dir}/index_delta{gen:04d}"
        delta_stop = f"{out_dir}/index_stopword_delta{gen:04d}"
        man, man_stop = reindex_changed_dual(
            spark, segs, segs_stop, pages, delta, delta_stop
        )
        new_mans = {
            os.path.basename(delta): man,
            os.path.basename(delta_stop): man_stop,
        }
        job["segments"] = [
            os.path.basename(s) for s in segs + [delta]
        ]
        job["segments_stopword"] = [
            os.path.basename(s) for s in segs_stop + [delta_stop]
        ]
    else:
        from .indexing.incremental import reindex_changed_multi

        segs = job_segments(out_dir, "index")
        delta = f"{out_dir}/index_delta{gen:04d}"
        man = reindex_changed_multi(spark, segs, pages, delta)
        new_mans = {os.path.basename(delta): man}
        job["segments"] = [os.path.basename(s) for s in segs + [delta]]

    sugg = suggest_entries(doc)
    if sugg is not None:
        comp_delta = f"{out_dir}/completion_delta{gen:04d}"
        build_completion_index(sugg, comp_delta)
        rows = sugg.withColumn("display", F.col("input")).withColumn(
            "gen", F.lit(gen)
        )
        # one null-input MARKER row per updated url: a document whose new
        # version carries no (or fewer) Suggest entries must still bump its
        # url's generation in suggest_rows, else compaction's
        # latest-generation filter would keep serving the superseded
        # version's entries forever. Markers are dropped by the
        # input-not-null filter after the generation election.
        markers = doc.select(F.col("id").alias("url")).distinct().select(
            "url",
            F.lit(None).cast(rows.schema["input"].dataType).alias("input"),
            F.lit(None).cast(rows.schema["weight"].dataType).alias("weight"),
            F.lit(None).cast(rows.schema["display"].dataType).alias(
                "display"
            ),
            F.lit(gen).alias("gen"),
        )
        rows.unionByName(markers).write.mode("append").parquet(
            f"{out_dir}/suggest_rows"
        )
        # upper bound until compaction recomputes exactly: entries shared
        # between tables are double-counted here, never lost
        job["completion_entries"] = job.get("completion_entries", 0) + (
            spark.read.parquet(comp_delta).count()
        )

    # live count: superseded docs are tombstoned, so they no longer serve —
    # n_docs must agree with the live-doc stats topk_segments computes
    job["n_docs"] = (
        job.get("n_docs", 0) + man["n_docs"] - man.get("n_superseded", 0)
    )
    job.setdefault("manifests", {}).update(new_mans)
    tmp = f"{job_path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(job, fh, indent=1)
    os.replace(tmp, job_path)
    return job


def _next_delta_gen(out_dir: str) -> int:
    """Next unused delta generation number: max over ALL delta-like dirs
    (committed or not, both variants, compacted-away or live) AND the
    generations recorded in the base manifests' ``merged_from`` lists.

    The second source is load-bearing: a compaction DELETES the absorbed
    delta directories but ``job_segments`` excludes their names forever
    via ``merged_from`` — if a later partial reused a deleted name (the
    dirs alone say gen 1 is free again), its freshly built delta would be
    silently excluded from the serving chain while the docs it supersedes
    are already tombstoned: the documents would vanish from serving."""
    import glob as _glob
    import re

    gens = [0]
    for d in _glob.glob(f"{out_dir}/*_delta*"):
        m = re.search(r"_delta(\d+)$", d)
        if m:
            gens.append(int(m.group(1)))
    for manp in _glob.glob(f"{out_dir}/*/_manifest.json"):
        try:
            with open(manp) as fh:
                merged = json.load(fh).get("merged_from", [])
        except (OSError, ValueError):
            continue
        for name in merged:
            m = re.search(r"_delta(\d+)$", name)
            if m:
                gens.append(int(m.group(1)))
    return max(gens) + 1


def completion_tables(out_dir: str) -> list[str]:
    """The job's live completion tables: base + per-delta segments not yet
    folded in by a compaction (compaction deletes the deltas it absorbed,
    after the base swap)."""
    import glob as _glob

    base = f"{out_dir}/completion"
    _recover_swap(base)
    out = [base] if os.path.exists(f"{base}/_completion_manifest.json") else []
    return out + sorted(
        d
        for d in _glob.glob(f"{out_dir}/completion_delta*")
        if os.path.exists(f"{d}/_completion_manifest.json")
    )


def complete_job(
    spark: SparkSession, out_dir: str, prefix: str, k: int = 10
) -> DataFrame:
    """Weighted prefix completion over an ingest job: union of the base
    completion table and the partial runs' delta tables, max weight per
    input (heaviest spelling wins) — the pre-compaction serving path,
    mirroring how topk_segments serves the postings chain."""
    from .query.completion import complete

    tables = completion_tables(out_dir)
    if not tables:
        raise ValueError(f"ingest job at {out_dir} has no completion table")
    src = spark.read.parquet(tables[0]).select("input", "weight", "display")
    for t in tables[1:]:
        src = src.unionByName(
            spark.read.parquet(t).select("input", "weight", "display")
        )
    return complete(src, prefix, k)


class JobSession:
    """Warm serving handle over an INGEST JOB directory — the product
    layer above :class:`..indexing.incremental.SegmentsSession`, covering
    both halves of the reference's serving surface (BM25 search +
    suggester, solrIndexCreation.ts:877-880 / the Suggest[] push): one
    analyzer variant's segment chain plus the job's completion tables.

    Computed once at open (valid until the next partial re-index or
    compaction changes the chain — re-open then):

    - the variant chain's ``SegmentsSession`` (union dead set, tombstone
      stats correction, union dictionary, per-term meta cache);
    - the unioned completion source (base table + partial-run delta
      tables), persisted — prefix queries stop re-listing and re-reading
      the table set per call.

    A server wanting both analyzers of a dual job holds two JobSessions
    (they share nothing mutable).
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        analyzer: str | None = None,
        cache_dictionary: bool = True,
        cache_postings: bool = False,
    ):
        from .indexing.incremental import SegmentsSession

        if not os.path.exists(f"{out_dir}/_job_manifest.json"):
            raise ValueError(f"{out_dir} is not an ingest job directory")
        # validates the variant exists (and fails like resolve_index does)
        resolve_index(out_dir, analyzer)
        self.spark = spark
        self.out_dir = out_dir
        self.analyzer = analyzer or "default"
        self._cache_dictionary = cache_dictionary
        self._cache_postings = cache_postings
        variant = "index_stopword" if analyzer == "stopword" else "index"
        self._variant = variant
        self.seg_dirs = job_segments(out_dir, variant)
        self.segments = SegmentsSession(
            spark,
            self.seg_dirs,
            cache_dictionary=cache_dictionary,
            cache_postings=cache_postings,
        )
        self._completion = None
        self._completion_tables = completion_tables(out_dir)
        tables = self._completion_tables
        if tables:
            src = spark.read.parquet(tables[0]).select(
                "input", "weight", "display"
            )
            for t in tables[1:]:
                src = src.unionByName(
                    spark.read.parquet(t).select("input", "weight", "display")
                )
            self._completion = src.persist()
        # generation snapshot for staleness detection: the chain's segment
        # set + per-segment tombstone row counts + completion table set —
        # everything a partial re-index, streaming append or compaction
        # changes. Cheap to recompute (directory listing + parquet footer
        # metadata counts), no Spark job.
        self._generation = self._current_generation()

    def _current_generation(self) -> tuple:
        """Snapshot of everything a partial re-index / compaction changes:
        the chain's segment set, each segment's tombstone file listing
        (name, size, mtime), and the completion table set. Pure os.stat —
        no parquet footer opens, so the per-request staleness probe stays
        O(directory listing) however many small tombstone files churn has
        accumulated."""
        import glob as _glob

        tomb_sigs = []
        for d in job_segments(self.out_dir, self._variant):
            sig = []
            for f in sorted(_glob.glob(f"{d}/tombstones/*.parquet")):
                try:
                    st = os.stat(f)
                    sig.append((f, st.st_size, st.st_mtime_ns))
                except OSError:  # file vanished mid-listing
                    sig.append((f, -1, -1))
            tomb_sigs.append((d, tuple(sig)))
        return (
            tuple(tomb_sigs),
            tuple(completion_tables(self.out_dir)),
        )

    def stale(self) -> bool:
        """True when the job changed under this session (partial
        re-index, compaction, completion delta) — serve loops call this
        per request (file metadata only, no Spark job) and ``reopen()``
        when it flips."""
        return self._generation != self._current_generation()

    def reopen(self) -> "JobSession":
        """Fresh session over the job's CURRENT generation. The new
        session is constructed FIRST and the old one closed only on
        success — if the job directory is mid-rearrangement (a compaction
        swapping dirs under us), the constructor raises and the caller
        keeps its still-usable old session instead of being left with a
        closed (unpersisted) one."""
        new = JobSession(
            self.spark,
            self.out_dir,
            analyzer=None if self.analyzer == "default" else self.analyzer,
            cache_dictionary=self._cache_dictionary,
            cache_postings=self._cache_postings,
        )
        self.close()
        return new

    def topk(self, query: str, k: int = 10, allow=None) -> DataFrame:
        """BM25 top-k (doc_id, score) over the variant's live chain.
        ``allow``: optional filter-query doc set (fq)."""
        return self.segments.topk(query, k=k, allow=allow)

    def topk_batch(self, queries: dict, k: int = 10, allow=None) -> DataFrame:
        """Q queries in ONE job over the variant's live chain
        (query/batch.py) — the bulk-evaluation path."""
        return self.segments.topk_batch(queries, k=k, allow=allow)

    def highlight(self, hits: DataFrame, query: str, **kw) -> DataFrame:
        """Snippets for a top-k result over the variant's live chain
        (query/highlight.py)."""
        return self.segments.highlight(hits, query, **kw)

    def phrase(self, phrase: str, k: int = 10, allow=None) -> DataFrame:
        """Exact-phrase top-k over the variant's live chain (positional
        job required)."""
        return self.segments.phrase(phrase, k=k, allow=allow)

    def phrase_batch(self, phrases: dict, k: int = 10, allow=None) -> DataFrame:
        """P phrases in ONE job over the variant's live chain."""
        return self.segments.phrase_batch(phrases, k=k, allow=allow)

    def facet(self, query, col: str = "lang", **kw) -> DataFrame:
        """Facet counts over the variant's live chain (Solr facet.field;
        query/facet.py semantics via the warm chain state)."""
        return self.segments.facet(query, col=col, **kw)

    def count(self, query, allow=None) -> int:
        """numFound over the variant's live chain."""
        return self.segments.count(query, allow=allow)

    def sorted_topk(self, query, sort_cols="doc_id", **kw) -> DataFrame:
        """Sort-by-stored-field serving with deep paging (Solr sort= /
        start / rows) over the variant's live chain."""
        return self.segments.sorted_topk(query, sort_cols=sort_cols, **kw)

    def mlt(self, doc_id: int, **kw) -> DataFrame:
        """More-Like-This over the variant's live chain."""
        return self.segments.mlt(doc_id, **kw)

    def topk_prefix(self, prefix: str, **kw) -> DataFrame:
        """Prefix (``pre*``) BM25 top-k over the variant's live chain."""
        return self.segments.topk_prefix(prefix, **kw)

    def topk_fuzzy(self, term: str, **kw) -> DataFrame:
        """Fuzzy (``term~N``) BM25 top-k over the variant's live chain."""
        return self.segments.topk_fuzzy(term, **kw)

    def topk_wildcard(self, pattern: str, **kw) -> DataFrame:
        """Wildcard (``t?ble``) BM25 top-k over the variant's live
        chain."""
        return self.segments.topk_wildcard(pattern, **kw)

    def topk_not(self, query, exclude, **kw) -> DataFrame:
        """Boolean MUST_NOT (``foo -bar``) over the variant's live
        chain."""
        return self.segments.topk_not(query, exclude, **kw)

    def complete(self, prefix: str, k: int = 10) -> DataFrame:
        """Weighted prefix completion over the job's completion tables
        (max weight per input across base + deltas, as
        :func:`complete_job`)."""
        if self._completion is None:
            raise ValueError(
                f"ingest job at {self.out_dir} has no completion table"
            )
        from .query.completion import complete

        return complete(self._completion, prefix, k)

    def close(self) -> None:
        self.segments.close()
        if self._completion is not None:
            self._completion.unpersist()


def run_ingest_compact(spark: SparkSession, out_dir: str) -> dict:
    """Compact a partially re-indexed job back to one segment per variant
    and one completion table — the between-rebuilds maintenance the
    reference delegates to Solr's segment merging.

    Per variant chain: ``merge_segments`` (deltas + tombstones → one
    segment, dead postings dropped, stats recomputed from live docs).
    Completions: rebuilt from ``suggest_rows`` keeping only each url's
    LATEST generation — this drops superseded documents' stale entries,
    which the additive pre-compaction serving keeps (documented drift).

    Crash safety: all merge outputs are staged under ``compact_tmp_*``
    names first (invisible to ``job_segments``, and NOT underscore-prefixed
    — Spark's file listing treats ``_``/``.``-prefixed roots as hidden
    metadata and may ignore them); the commit point per variant is
    the atomic base-dir swap — from that instant the absorbed deltas are
    excluded from the chain via the merged manifest's ``merged_from`` list,
    so delta-dir deletion afterwards is pure cleanup. A crash at any point
    leaves a correct serving chain (old chain before the swap, merged
    segment after)."""
    import shutil

    from .indexing.merge import merge_segments

    job_path = f"{out_dir}/_job_manifest.json"
    with open(job_path) as fh:
        job = json.load(fh)
    variants = ["index", "index_stopword"] if job.get("dual") else ["index"]
    # roll back any swap a previous compaction crashed in the middle of
    # (bases/completion recover inside job_segments/completion_tables too;
    # suggest_rows is read directly below)
    for d in variants + ["completion", "suggest_rows"]:
        _recover_swap(f"{out_dir}/{d}")

    # stage every merge before swapping anything: a shared-docs stopword
    # base resolves its docs pointer into the default base, which must
    # still exist while the stopword chain merges
    staged: dict[str, tuple[str, list[str], dict]] = {}
    for v in variants:
        chain = job_segments(out_dir, v)
        stage = f"{out_dir}/compact_tmp_{v}"
        shutil.rmtree(stage, ignore_errors=True)
        man = merge_segments(spark, chain, stage)
        staged[v] = (stage, chain, man)

    comp_stage = None
    sugg_stage = None
    n_completion = job.get("completion_entries", 0)
    if os.path.exists(f"{out_dir}/suggest_rows"):
        from pyspark.sql import Window

        rows = spark.read.parquet(f"{out_dir}/suggest_rows")
        live = (
            rows.withColumn(
                "_mx", F.max("gen").over(Window.partitionBy("url"))
            )
            .filter(F.col("gen") == F.col("_mx"))
            .drop("_mx")
            # partial runs append a null-input marker per updated url so
            # the generation election sees updates that REMOVED suggest
            # entries; the markers themselves carry no completion
            .filter(F.col("input").isNotNull())
        )
        comp_stage = f"{out_dir}/compact_tmp_completion"
        shutil.rmtree(comp_stage, ignore_errors=True)
        build_completion_index(
            live.select("input", "weight", "display"), comp_stage
        )
        sugg_stage = f"{out_dir}/compact_tmp_suggest_rows"
        live.withColumn("gen", F.lit(0)).write.mode("overwrite").parquet(
            sugg_stage
        )
        n_completion = spark.read.parquet(comp_stage).count()

    # commit: per-variant atomic base swap, then cleanup. Stopword FIRST:
    # a shared-docs stopword base resolves docs through ../index/docs, so
    # the default base must still be the OLD one if a crash lands between
    # the two swaps — once the (self-contained) merged stopword segment is
    # in place, nothing points at the default's docs anymore and a re-run
    # recovers cleanly from any interleaving.
    for v in reversed(variants):
        stage, chain, _ = staged[v]
        _swap_dir(stage, f"{out_dir}/{v}")
        for d in chain[1:]:
            shutil.rmtree(d, ignore_errors=True)
    if comp_stage is not None:
        _swap_dir(comp_stage, f"{out_dir}/completion")
        _swap_dir(sugg_stage, f"{out_dir}/suggest_rows")
        import glob as _glob

        for d in _glob.glob(f"{out_dir}/completion_delta*"):
            shutil.rmtree(d, ignore_errors=True)

    job["n_docs"] = staged["index"][2]["n_docs"]
    job["segments"] = ["index"]
    if job.get("dual"):
        job["segments_stopword"] = ["index_stopword"]
    job["completion_entries"] = n_completion
    job["manifests"] = {v: staged[v][2] for v in variants}
    tmp = f"{job_path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(job, fh, indent=1)
    os.replace(tmp, job_path)
    return job


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="packed doctype table → BM25 index + completions"
    )
    ap.add_argument("--doctype", default=None, choices=sorted(PIPELINES))
    ap.add_argument("--input", default=None, help="packed parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--dual", action="store_true",
                    help="also build the stopword-analyzer segment")
    ap.add_argument("--shared-docs", action="store_true",
                    help="with --dual: store the doc text once (stopword "
                         "segment resolves it via a manifest pointer)")
    ap.add_argument("--partial", action="store_true",
                    help="re-index only the input's (changed/new) rows "
                         "against the existing job at --out (the "
                         "reference's *PartialIndex path)")
    ap.add_argument("--compact", action="store_true",
                    help="merge the job's segment chain(s) back to one "
                         "segment per variant and rebuild completions "
                         "from live documents (no --input needed)")
    ap.add_argument("--positions", action="store_true",
                    help="store positional payloads (phrase queries)")
    ap.add_argument("--verify-extraction", nargs="?", type=float,
                    const=1.0, default=0.0, dest="verify_extraction",
                    metavar="FRAC",
                    help="run the raw (non-quarantining) extractor next "
                         "to the dead-letter-safe one in the same scan "
                         "and fail the build on any disagreement — the "
                         "byte-identity invariant as a build gate. With "
                         "no value: every row (CI posture); with a "
                         "fraction (e.g. 0.01): a deterministic url-hash "
                         "sample — the corpus-scale default posture "
                         "(README 'Extraction verification posture')")
    ap.add_argument("--templateid", default="")
    ap.add_argument("--sidefiles", default=None,
                    help="attachment-file root (S5 content reads)")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--cores", type=int, default=0,
                    help="local[N] cores (0 = all)")
    args = ap.parse_args(argv)

    from .session import get_spark

    if args.compact:
        if args.partial or args.input or args.doctype:
            ap.error("--compact takes only --out (and --cores)")
        spark = get_spark("ingest-compact", cores=args.cores or None)
        print(json.dumps(run_ingest_compact(spark, args.out), indent=1))
        spark.stop()
        return
    if not args.input or not args.doctype:
        ap.error("--input and --doctype are required unless --compact")

    spark = get_spark(
        f"ingest-{args.doctype}", cores=args.cores or None
    )
    packed = spark.read.parquet(args.input)
    if args.partial:
        job = run_ingest_partial(
            spark, packed, args.doctype, args.out,
            templateid=args.templateid, side_files_root=args.sidefiles,
        )
    else:
        job = run_ingest(
            spark, packed, args.doctype, args.out, dual=args.dual,
            store_positions=args.positions, shared_docs=args.shared_docs,
            templateid=args.templateid,
            side_files_root=args.sidefiles, num_buckets=args.buckets,
            verify_extraction=args.verify_extraction,
        )
    print(json.dumps(job, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
