#!/usr/bin/env python
"""spark-submit entry: BM25 top-k over a built index.

    spark-submit --py-files engine.zip query.py --index /path/to/index \
        --query "income tax deduction" [--k 10] [--mode bmw|brute]

Batch mode (bulk evaluation — relevance sets over a query log):

    query.py --index /path/to/index --batch queries.txt [--k 10]

evaluates EVERY line of the file as a query in ONE Spark job
(query/batch.py topk_batch) and prints one JSON line per query — the
cluster amortizes the postings scan and shard shuffle across the whole
set instead of paying a job launch per query.

Server mode (warm sessions — the high-QPS posture):

    query.py --index /path/to/job --serve [--analyzer stopword]

reads one request per stdin line and answers each with one JSON line:
``<terms...>`` runs BM25 top-k; ``complete <prefix>`` runs the weighted
suggester (ingest jobs with a completion table only). The process holds a
JobSession / SegmentsSession, so the chain's dead set, tombstone stats,
union dictionary and term-meta cache are computed once, not per query.
"""

from __future__ import annotations

import argparse
import json
import re

# Solr fuzzy syntax on a single token: `term~` (2 edits, the Solr
# default), `term~1`, `term~2`
_FUZZY_RE = re.compile(r"^([^\s~*?]+)~([12])?$")
_PREFIX_RE = re.compile(r"^[^\s~*?]+\*$")


def parse_fuzzy(q: str) -> tuple[str, int] | None:
    """(term, max_edits) when ``q`` is a single-token Solr fuzzy query,
    else None."""
    m = _FUZZY_RE.match(q)
    if m is None:
        return None
    return m.group(1), int(m.group(2) or 2)


def classify_single(q: str):
    """Route a single-token query to its Solr multi-term rewrite:
    ('prefix', stem) for a pure trailing star, ('wildcard', pattern) for
    any other ``*``/``?`` pattern, ('fuzzy', (term, edits)) for
    ``term~N`` — else None (plain term query)."""
    if " " in q:
        return None
    if _PREFIX_RE.match(q):
        return ("prefix", q[:-1])
    if "*" in q or "?" in q:
        return ("wildcard", q)
    fz = parse_fuzzy(q)
    if fz is not None:
        return ("fuzzy", fz)
    return None


def expand_batch_rewrites(
    spark, queries: dict, dictionary, max_terms: int = 64
) -> dict:
    """Apply Solr single-token rewrites to batch lines: ``pre*``,
    ``t?ble`` and ``term~N`` lines become expanded term lists (one
    dictionary job per rewrite line — plain lines pass through
    untouched and still share the ONE batched scoring job).

    ``max_terms`` is the scoring budget (Lucene's top-terms rewrite);
    match-set callers (count/facet/sort) pass it unbounded — Lucene's
    CONSTANT_SCORE_REWRITE enumerates every matching term, since a
    filter has no top-terms notion."""
    from solr_indexing_spark.query.bmw import (
        expand_fuzzy_df,
        expand_prefix_df,
        expand_wildcard_df,
    )

    out = {}
    for qid, q in queries.items():
        kind = classify_single(q)
        if kind is None:
            out[qid] = q
        elif kind[0] == "prefix":
            out[qid] = expand_prefix_df(dictionary, kind[1], max_terms)
        elif kind[0] == "wildcard":
            out[qid] = expand_wildcard_df(dictionary, kind[1], max_terms)
        else:
            out[qid] = expand_fuzzy_df(
                dictionary, kind[1][0], max_edits=kind[1][1],
                max_terms=max_terms,
            )
    return out


def parse_not(q: str) -> tuple[str, str] | None:
    """Solr prohibited clauses: ``foo bar -baz`` → ("foo bar", "baz").
    None unless the query has BOTH positive and ``-``-prefixed terms."""
    toks = q.split()
    pos = [t for t in toks if not t.startswith("-")]
    neg = [t[1:] for t in toks if t.startswith("-") and len(t) > 1]
    if not pos or not neg:
        return None
    return " ".join(pos), " ".join(neg)


def compile_query(spark, sess, q: str, budget: int = 64):
    """Compile a Solr-style query string against a warm session —
    tokens compose freely, the Lucene boolean/multi-term model:

    - ``pre*`` / ``t?ble`` / ``term~N`` tokens expand against the
      session's union dictionary (scoring keeps the ``budget``-term
      top-terms rewrite per token)
    - plain tokens go through the index ANALYZER (a stopword index
      still drops its stopwords)
    - ``-token`` prohibited clauses come back as an exclusion list;
      an exclusion token may itself be a rewrite (``-zan*``) and
      expands UNBOUNDED (constant-score rewrite — filters have no
      top-terms notion)

    Returns None for a plain query (no rewrites, no exclusions) so
    callers keep the zero-extra-job analyzed-string path, else
    ``(positive_terms, exclude_terms_or_None)``."""
    toks = q.split()
    pos = [t for t in toks if not t.startswith("-")]
    neg = [t[1:] for t in toks if t.startswith("-") and len(t) > 1]
    if not pos:
        return None
    if not neg and not any(classify_single(t) for t in toks):
        return None
    from solr_indexing_spark.textprep import ANALYZERS

    tokenizer = ANALYZERS.get(
        sess.man.get("analyzer", "default"), ANALYZERS["default"]
    )[2]

    def _expand(tokens, max_terms):
        out = []
        for t in tokens:
            if classify_single(t) is None:
                out.extend(tokenizer(t))
            else:
                out.extend(
                    expand_batch_rewrites(
                        spark, {0: t}, sess.dictionary, max_terms=max_terms
                    )[0]
                )
        return sorted(set(out))

    positive = _expand(pos, budget)
    exclude = _expand(neg, (1 << 31) - 1) if neg else None
    return positive, exclude or None


def serve(spark, args) -> None:
    """stdin/stdout request loop over a warm session."""
    import os
    import sys

    from pyspark.sql import functions as F

    from solr_indexing_spark.indexing.build import read_docs

    def _docs_of(dirs):
        docs = read_docs(spark, dirs[0]).select("doc_id", "url")
        for d in dirs[1:]:
            docs = docs.unionByName(
                read_docs(spark, d).select("doc_id", "url")
            )
        # the url join runs per request — cache the 2-column projection
        # like the session caches the dictionary (MEMORY_AND_DISK by
        # default, so a corpus-scale docs table spills rather than OOMs)
        return docs.persist()

    job_sess = None
    if os.path.exists(f"{args.index}/_job_manifest.json"):
        from solr_indexing_spark.ingest import JobSession

        job_sess = JobSession(spark, args.index, analyzer=args.analyzer)
        sess, dirs = job_sess.segments, job_sess.seg_dirs
    else:
        from solr_indexing_spark.indexing.incremental import SegmentsSession

        from solr_indexing_spark.ingest import resolve_index

        dirs = [resolve_index(args.index, args.analyzer)]
        sess = SegmentsSession(spark, dirs)

    docs = _docs_of(dirs)
    # full-column docs plan for per-request fq predicates — built lazily
    # on the first `fq` request (most serve streams never pay it),
    # invalidated with the generation like `docs`
    fq_docs = None
    cur_dirs = dirs

    def _full_docs_of(ds):
        full = read_docs(spark, ds[0])
        for d in ds[1:]:
            full = full.unionByName(read_docs(spark, d))
        return full.persist()

    for line in sys.stdin:
        req = line.strip()
        if not req:
            continue
        try:
            # a partial re-index / compaction changes the chain under a
            # warm server; the staleness probe is file metadata only, so
            # checking per request keeps the session current without
            # re-opening on the hot path
            if job_sess is not None and job_sess.stale():
                try:
                    job_sess = job_sess.reopen()
                except Exception:
                    # the job dir is mid-rearrangement (compaction swap in
                    # another process): reopen() left the old session
                    # intact — serve this request from the old generation
                    # and retry the reopen on the next request
                    pass
                else:
                    sess = job_sess.segments
                    docs.unpersist()
                    docs = _docs_of(job_sess.seg_dirs)
                    if fq_docs is not None:
                        fq_docs.unpersist()
                        fq_docs = None
                    cur_dirs = job_sess.seg_dirs
            if req.startswith("facet "):
                _, col, q = req.split(" ", 2)
                vals = [
                    {"facet": r["facet"], "n": r["n"]}
                    for r in sess.facet(q, col=col, max_values=args.k)
                    .collect()
                ]
                print(json.dumps({"facet": col, "query": q, "counts": vals}),
                      flush=True)
                continue
            if req.startswith("count "):
                q = req[len("count "):]
                print(json.dumps({"query": q, "numFound": sess.count(q)}),
                      flush=True)
                continue
            if req.startswith("collapse "):
                # collapse <field> <query terms...> — Solr field
                # collapse: top-k group heads by BM25, exact
                _, col, q = req.split(" ", 2)
                rows = (
                    sess.collapse(q, field=col, k=args.k)
                    # drop is a no-op unless collapsing BY url itself
                    .join(docs.drop(col), "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .collect()
                )
                hits = [
                    {"doc_id": r["doc_id"], col: r[col],
                     "score": r["score"], "url": r["url"]}
                    for r in rows
                ]
                print(json.dumps(
                    {"collapse": col, "query": q, "hits": hits}),
                    flush=True)
                continue
            if req.startswith("mlt "):
                did = int(req[len("mlt "):])
                rows = (
                    sess.mlt(did, k=args.k)
                    .join(docs, "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .collect()
                )
                hits = [
                    {"doc_id": r["doc_id"], "score": r["score"],
                     "url": r["url"]}
                    for r in rows
                ]
                print(json.dumps({"mlt": did, "hits": hits}), flush=True)
                continue
            if req.startswith("sort "):
                # sort <field[:asc|desc]> <start> <query terms...>
                _, spec, start_s, q = req.split(" ", 3)
                col, _, direction = spec.partition(":")
                from solr_indexing_spark.query.sorting import _order_cols

                rows = (
                    sess.sorted_topk(
                        q, sort_cols=col, k=args.k, start=int(start_s),
                        ascending=direction != "desc",
                    )
                    # drop the sort col from the url side: sorting BY url
                    # would otherwise duplicate the column in the join
                    .join(docs.drop(col), "doc_id")
                    # the url join does not preserve order — re-establish
                    # the page's ordering over the ≤k joined rows
                    .orderBy(*_order_cols(col, direction != "desc"))
                    .collect()
                )
                hits = [
                    {"doc_id": r["doc_id"], col: r[col], "url": r["url"]}
                    for r in rows
                ]
                print(json.dumps(
                    {"sort": spec, "start": int(start_s), "query": q,
                     "hits": hits}), flush=True)
                continue
            if req.startswith("complete "):
                prefix = req[len("complete "):]
                if job_sess is None:
                    raise ValueError(
                        "completion requires an ingest job dir with a "
                        "completion table"
                    )
                hits = [
                    {"input": r["input"], "weight": r["weight"],
                     "display": r["display"]}
                    for r in job_sess.complete(prefix, k=args.k).collect()
                ]
                print(json.dumps({"complete": prefix, "hits": hits}),
                      flush=True)
                continue
            # `fq <SQL predicate> :: <query line>` — Solr's per-request
            # filter query: the predicate runs over the full docs table
            # (lazily built + cached per generation), the query side
            # keeps the full query language
            allow_req = None
            req_q = req
            if req.startswith("fq "):
                pred, sep, qline = req[len("fq "):].partition(" :: ")
                qline = qline.strip()
                if not sep or not qline or not pred.strip():
                    raise ValueError("fq syntax: fq <predicate> :: <query>")
                if fq_docs is None:
                    fq_docs = _full_docs_of(cur_dirs)
                allow_req = fq_docs.filter(
                    F.expr(pred.strip())
                ).select("doc_id")
                req_q = qline
            # Solr query language: `pre*` / `t?ble` / `term~N` rewrites
            # and `-token` prohibited clauses compose freely per line;
            # plain lines keep the zero-extra-job analyzed path
            cq = compile_query(spark, sess, req_q)
            if cq is None:
                result = sess.topk(req_q, k=args.k, allow=allow_req)
            elif cq[1]:
                result = sess.topk_not(
                    cq[0], cq[1], k=args.k, allow=allow_req
                )
            else:
                result = sess.topk(cq[0], k=args.k, allow=allow_req)
            rows = (
                result.join(docs, "doc_id")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .collect()
            )
            hits = [
                {"doc_id": r["doc_id"], "score": r["score"], "url": r["url"]}
                for r in rows
            ]
            print(json.dumps({"query": req, "hits": hits}), flush=True)
        except Exception as e:  # one bad request must not kill the server
            print(json.dumps({"request": req, "error": str(e)}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="index segment dir, or an ingest job dir "
                         "(routed via --analyzer)")
    ap.add_argument("--query", default=None)
    ap.add_argument("--serve", action="store_true",
                    help="hold a warm session and answer one request per "
                         "stdin line (see module docstring)")
    ap.add_argument("--batch", default=None,
                    help="file of one query per line — ALL evaluated in "
                         "one Spark job (query/batch.py topk_batch)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--phrase", action="store_true",
                    help="treat --query / --batch lines as EXACT phrases "
                         "(positional index required; query/phrase.py)")
    ap.add_argument("--filter", default=None, dest="filter_expr",
                    help="fq: SQL boolean predicate over the segment docs "
                         "table (e.g. \"lang = 'en'\") restricting results "
                         "— exact, corpus-global BM25 stats "
                         "(query/bmw.py topk_filtered)")
    ap.add_argument("--snippets", action="store_true",
                    help="add a highlighted best-window snippet per hit "
                         "(query/highlight.py — the Solr highlighter "
                         "analog)")
    ap.add_argument("--sort", default=None, metavar="FIELD[:asc|desc]",
                    help="return the match set ordered by a STORED field "
                         "instead of BM25 (Solr sort= — the reference's "
                         "citation/date sort keys exist for this; "
                         "query/sorting.py). Composes with --start/--k "
                         "for deep paging and --filter for fq.")
    ap.add_argument("--start", type=int, default=0,
                    help="pagination offset (Solr start=): with --sort, "
                         "offsets the stored-field ordering; with a plain "
                         "--query, offsets the score ranking (fetches "
                         "start+k, returns the page)")
    ap.add_argument("--facet", default=None, metavar="COL",
                    help="print (value, count) over the query's match set "
                         "for a stored metadata column (Solr facet.field; "
                         "query/facet.py)")
    ap.add_argument("--count", action="store_true",
                    help="print numFound (live match count) only")
    ap.add_argument("--mlt", type=int, default=None, metavar="DOC_ID",
                    help="More-Like-This: top-k docs similar to DOC_ID "
                         "(no --query; query/mlt.py)")
    ap.add_argument("--collapse", default=None, metavar="FIELD",
                    help="Solr field collapse: return the top-k GROUP "
                         "HEADS (best doc per distinct FIELD value) of "
                         "the match set, ranked by BM25 — exact, "
                         "full-match scorer (query/group.py)")
    ap.add_argument("--mode", choices=["bmw", "brute"], default="bmw")
    ap.add_argument("--analyzer", choices=["default", "stopword"],
                    default=None,
                    help="which analyzer variant to query (the "
                         "reference's IndexName vs IndexNameStopword)")
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()
    if sum(
        [bool(args.query), args.serve, bool(args.batch),
         args.mlt is not None]
    ) != 1:
        ap.error(
            "exactly one of --query / --serve / --batch / --mlt is required"
        )
    if (args.sort or args.facet or args.count or args.collapse) \
            and not args.query:
        ap.error("--sort/--facet/--count/--collapse need --query")
    if (
        args.sort or args.facet or args.count or args.collapse
        or args.mlt is not None
    ) and (args.phrase or args.snippets or args.mode != "bmw"):
        ap.error(
            "--sort/--facet/--count/--collapse/--mlt run the "
            "match-set/BMW path (no --phrase/--snippets/--mode brute)"
        )
    if args.start and not (args.sort or args.query):
        ap.error("--start needs --sort or --query")
    if args.start and args.batch:
        ap.error("--start does not apply to --batch")
    if (args.serve or args.batch) and args.mode != "bmw":
        ap.error("--serve/--batch run the BMW path; --mode brute "
                 "is single-query only")
    if args.phrase and (args.serve or args.mode != "bmw"):
        ap.error("--phrase works with --query or --batch (BMW path)")
    if args.filter_expr and (args.serve or args.mode != "bmw"):
        ap.error("--filter works with --query or --batch on the BMW path")
    if args.snippets and (args.serve or args.mode != "bmw"):
        ap.error("--snippets works with --query or --batch (BMW path)")

    import os

    from solr_indexing_spark.ingest import job_segments, resolve_index
    from solr_indexing_spark.session import get_spark

    if args.serve:
        if args.cores:
            spark = get_spark("serve", cores=args.cores)
        else:
            from pyspark.sql import SparkSession

            spark = SparkSession.builder.appName("serve").getOrCreate()
        serve(spark, args)
        return

    # a partially re-indexed job serves a segment CHAIN (base + deltas,
    # combined stats + union tombstones) until the next merge compacts it —
    # per analyzer variant (the reference's IndexName / IndexNameStopword)
    seg_dirs: list[str] | None = None
    if os.path.exists(f"{args.index}/_job_manifest.json"):
        variant = (
            "index_stopword" if args.analyzer == "stopword" else "index"
        )
        chain = job_segments(args.index, variant)
        if len(chain) > 1:
            if args.mode != "bmw":
                raise SystemExit(
                    "--mode brute does not serve a partially re-indexed "
                    "job's segment chain; use --mode bmw or merge first"
                )
            seg_dirs = chain
    if seg_dirs is None:
        args.index = resolve_index(args.index, args.analyzer)

    if args.cores:
        spark = get_spark("query", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("query").getOrCreate()

    # fq: the predicate runs over the segment docs table(s); the resulting
    # doc_id set rides into the kernels (small → closure, large → cogrouped
    # AllowFrame — make_allow policy)
    allow = None
    if args.filter_expr:
        from pyspark.sql import functions as F

        from solr_indexing_spark.indexing.build import read_docs

        fq_sources = seg_dirs if seg_dirs is not None else [args.index]
        fq_docs = read_docs(spark, fq_sources[0])
        for d in fq_sources[1:]:
            fq_docs = fq_docs.unionByName(
                read_docs(spark, d), allowMissingColumns=True
            )
        allow = fq_docs.filter(F.expr(args.filter_expr)).select("doc_id")

    if (
        args.mlt is not None or args.facet or args.count or args.sort
        or args.collapse
    ):
        # match-set serving surface (facets / numFound / sort= / MLT):
        # one-shot over the segment or the job's live chain, via the same
        # SegmentsSession code path a warm server uses
        from pyspark.sql import functions as F

        from solr_indexing_spark.indexing.build import read_docs
        from solr_indexing_spark.indexing.incremental import SegmentsSession

        sources = seg_dirs if seg_dirs is not None else [args.index]
        sess = SegmentsSession(spark, sources, cache_dictionary=False)
        try:
            # the match set honors the same single-token rewrites as
            # scoring: `--count "zan*"` counts the expansion's OR set.
            # Unbounded expansion — Lucene's CONSTANT_SCORE_REWRITE: a
            # filter/count enumerates every matching term, no top-terms
            # budget
            mq = args.query
            if mq and classify_single(mq) is not None:
                mq = expand_batch_rewrites(
                    spark, {0: mq}, sess.dictionary,
                    max_terms=(1 << 31) - 1,
                )[0]
            if args.count:
                print(json.dumps({
                    "query": args.query,
                    "numFound": sess.count(mq, allow=allow),
                }))
                return
            if args.facet:
                for r in sess.facet(
                    mq, col=args.facet, allow=allow,
                    max_values=args.k,
                ).collect():
                    print(json.dumps({"facet": r["facet"], "n": r["n"]}))
                return
            urls = read_docs(spark, sources[0]).select("doc_id", "url")
            for d in sources[1:]:
                urls = urls.unionByName(
                    read_docs(spark, d).select("doc_id", "url")
                )
            if args.collapse:
                # collapse SCORES (BM25 group heads) — rewrites keep the
                # top-terms scoring budget, unlike the constant-score
                # count/facet/sort expansions above
                cqm = args.query
                if classify_single(cqm) is not None:
                    cqm = expand_batch_rewrites(
                        spark, {0: cqm}, sess.dictionary
                    )[0]
                rows = (
                    sess.collapse(
                        cqm, field=args.collapse, k=args.k, allow=allow
                    )
                    # drop is a no-op unless collapsing BY url itself
                    .join(urls.drop(args.collapse), "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .collect()
                )
                for r in rows:
                    print(json.dumps({
                        "doc_id": r["doc_id"],
                        args.collapse: r[args.collapse],
                        "score": r["score"], "url": r["url"],
                    }))
                return
            if args.mlt is not None:
                rows = (
                    sess.mlt(args.mlt, k=args.k)
                    .join(urls, "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .collect()
                )
                for r in rows:
                    print(json.dumps({
                        "doc_id": r["doc_id"], "score": r["score"],
                        "url": r["url"],
                    }))
                return
            col, _, direction = args.sort.partition(":")
            from solr_indexing_spark.query.sorting import _order_cols

            rows = (
                sess.sorted_topk(
                    mq, sort_cols=col, k=args.k, start=args.start,
                    ascending=direction != "desc", allow=allow,
                )
                # drop the sort col from the url side: sorting BY url would
                # otherwise duplicate the column in the join
                .join(urls.drop(col), "doc_id")
                # the url join does not preserve order — re-establish the
                # page's ordering over the ≤k joined rows
                .orderBy(*_order_cols(col, direction != "desc"))
                .collect()
            )
            for r in rows:
                print(json.dumps({
                    "doc_id": r["doc_id"], col: r[col], "url": r["url"],
                }))
            return
        finally:
            sess.close()

    if args.batch:
        with open(args.batch) as fh:
            qlines = [ln.strip() for ln in fh if ln.strip()]
        queries = {i: q for i, q in enumerate(qlines)}
        # output labels keep the ORIGINAL lines even when a rewrite
        # replaces a query with its expanded term list
        orig_queries = dict(queries)
        if args.phrase and seg_dirs is not None:
            # batched phrase over a chain: ONE job on the same
            # (query-group × doc-range-shard) grid, chain state combined
            from solr_indexing_spark.query.phrase import (
                phrase_topk_batch_segments,
            )

            result = phrase_topk_batch_segments(
                spark, seg_dirs, queries, k=args.k, allow=allow
            )
        elif args.phrase:
            from solr_indexing_spark.query.phrase import phrase_topk_batch

            result = phrase_topk_batch(
                spark, args.index, queries, k=args.k, allow=allow
            )
        elif seg_dirs is not None or any(
            classify_single(t) is not None or t.startswith("-")
            for q in queries.values()
            for t in q.split()
        ):
            # chains, or any line using the query language: compile each
            # line (per-token rewrites, analyzed plain tokens,
            # exclusions). Rewrite-only lines still share the ONE
            # batched job; lines with prohibited clauses need a
            # per-query exclusion set the batched kernel doesn't model,
            # so they run per line through topk_not and union in.
            from pyspark.sql import functions as F

            from solr_indexing_spark.indexing.incremental import (
                SegmentsSession,
            )

            sources = seg_dirs if seg_dirs is not None else [args.index]
            sess = SegmentsSession(spark, sources)
            plain: dict = {}
            notted: dict = {}
            for i, q in queries.items():
                cq = compile_query(spark, sess, q)
                if cq is None:
                    plain[i] = q
                elif cq[1]:
                    notted[i] = cq
                else:
                    plain[i] = cq[0]
            queries = {**plain, **{i: cq[0] for i, cq in notted.items()}}
            result = (
                sess.topk_batch(plain, k=args.k, allow=allow)
                if plain
                else None
            )
            for i, (pos, neg) in notted.items():
                r = sess.topk_not(pos, neg, k=args.k, allow=allow).select(
                    F.lit(i).cast("long").alias("query_id"),
                    "doc_id",
                    "score",
                )
                result = r if result is None else result.unionByName(r)
        else:
            from solr_indexing_spark.query.batch import topk_batch

            result = topk_batch(
                spark, args.index, queries, k=args.k, allow=allow
            )

        from pyspark.sql import functions as F

        from solr_indexing_spark.indexing.build import read_docs

        doc_sources = seg_dirs if seg_dirs is not None else [args.index]
        if args.snippets:
            from solr_indexing_spark.query.highlight import highlight_batch

            rows = highlight_batch(
                spark, doc_sources, result, queries
            ).collect()
        else:
            docs = read_docs(spark, doc_sources[0]).select("doc_id", "url")
            for d in doc_sources[1:]:
                docs = docs.unionByName(
                    read_docs(spark, d).select("doc_id", "url")
                )
            rows = result.join(docs, "doc_id").collect()
        by_qid: dict[int, list] = {i: [] for i in queries}
        for r in rows:
            by_qid[r["query_id"]].append(r)
        for i, q in orig_queries.items():
            hits = sorted(by_qid[i], key=lambda r: (-r["score"], r["doc_id"]))
            print(json.dumps({
                "query": q,
                "hits": [
                    {"doc_id": r["doc_id"], "score": r["score"],
                     "url": r["url"],
                     **({"snippet": r["snippet"]} if args.snippets else {})}
                    for r in hits
                ],
            }))
        return

    # Solr-style deep paging on score-ranked results: fetch start+k,
    # return the page (the same cost shape as Lucene's searchAfter-less
    # paging; keep start page-sized, as with --sort)
    fetch_k = args.k + args.start

    qtoks = args.query.split()
    needs_rewrite = (
        not args.phrase
        and args.mode == "bmw"
        and (
            any(classify_single(t) for t in qtoks)
            or parse_not(args.query) is not None
        )
    )
    hl_query = args.query  # what --snippets should tag (expanded terms
    # for rewrites, positive terms for prohibited clauses)
    if needs_rewrite:
        # Solr query language — `pre*` prefix, `t?ble` wildcard,
        # `term~N` fuzzy and `-token` prohibited clauses, composing
        # freely inside one query string (dictionary expansion → the
        # expanded OR query; exclusions union into the dead set);
        # chains + fq compose via the session path
        from solr_indexing_spark.indexing.incremental import SegmentsSession

        sources = seg_dirs if seg_dirs is not None else [args.index]
        sess = SegmentsSession(spark, sources, cache_dictionary=False)
        cq = compile_query(spark, sess, args.query)
        if cq is None:  # e.g. a pure-negative query — plain analyzed path
            result = sess.topk(args.query, k=fetch_k, allow=allow)
        else:
            positive, exclude = cq
            hl_query = positive
            if exclude:
                result = sess.topk_not(
                    positive, exclude, k=fetch_k, allow=allow
                )
            else:
                result = sess.topk(positive, k=fetch_k, allow=allow)
    elif args.phrase and seg_dirs is not None:
        from solr_indexing_spark.query.phrase import phrase_topk_segments

        result = phrase_topk_segments(
            spark, seg_dirs, args.query, k=fetch_k, allow=allow
        )
    elif seg_dirs is not None:
        from solr_indexing_spark.indexing.incremental import topk_segments

        result = topk_segments(
            spark, seg_dirs, args.query, k=fetch_k, allow=allow
        )
    elif args.phrase:
        from solr_indexing_spark.query.phrase import phrase_topk

        result = phrase_topk(
            spark, args.index, args.query, k=fetch_k, allow=allow
        )
    elif allow is not None:
        from solr_indexing_spark.query.bmw import topk_filtered

        result = topk_filtered(
            spark, args.index, args.query, allow, k=fetch_k
        )
    elif args.mode == "bmw":
        from solr_indexing_spark.query.bmw import topk

        result = topk(spark, args.index, args.query, k=fetch_k)
    else:
        from solr_indexing_spark.indexing.build import read_docs, read_manifest
        from solr_indexing_spark.query.brute import bm25_topk

        man = read_manifest(args.index)
        docs = read_docs(spark, args.index, man)
        result = bm25_topk(
            docs, args.query, k=fetch_k, n_docs=man["n_docs"], avgdl=man["avgdl"]
        )

    from pyspark.sql import functions as F

    from solr_indexing_spark.indexing.build import read_docs as _read_docs

    doc_sources = seg_dirs if seg_dirs is not None else [args.index]
    if args.snippets:
        from solr_indexing_spark.query.highlight import highlight_segments

        rows = sorted(
            highlight_segments(
                spark, doc_sources, result, hl_query
            ).collect(),
            key=lambda r: (-r["score"], r["doc_id"]),
        )[args.start:]
        for r in rows:
            print(json.dumps({
                "doc_id": r["doc_id"], "score": r["score"],
                "url": r["url"], "snippet": r["snippet"],
            }))
        return
    docs = _read_docs(spark, doc_sources[0]).select("doc_id", "url")
    for d in doc_sources[1:]:
        docs = docs.unionByName(_read_docs(spark, d).select("doc_id", "url"))
    rows = (
        result.join(docs, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )[args.start:]
    for r in rows:
        print(json.dumps({"doc_id": r["doc_id"], "score": r["score"], "url": r["url"]}))


if __name__ == "__main__":
    main()
