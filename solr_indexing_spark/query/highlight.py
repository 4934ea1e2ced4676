"""Snippet generation / hit highlighting — the serving-surface feature the
reference delegates to Solr's highlighter (solr.highlight on the search
handler; the reference's Solr schema stores fullcontent precisely so the
server can highlight it). Spark-first shape:

    top-k hits (tiny, ≤ Q·k rows) ──broadcast──▶ join onto the segment
    docs table ──mapInPandas──▶ (doc_id, score, snippet)

The per-row Python here is the sanctioned exception (SURVEY §2.10): it
runs over k result rows per query, never over the corpus — the expensive
side of the join is a single scan of the docs table probed by a broadcast
hash of the hit ids, the same plan every doc-side join in the engine uses.

Snippet semantics (deterministic, Lucene-highlighter-like):

- tokenize the STORED extracted text with the index tokenizer's regex
  (``textprep.TOKEN_RE``) over the original string, so character offsets
  point into the stored text (tokens are lowercased only for matching —
  the snippet preserves original casing);
- slide a ``window``-token window and pick the one maximizing
  (#distinct query terms, #total term matches), earliest window on ties —
  the standard best-fragment election;
- emit the window's character span with every query-term occurrence
  wrapped in ``pre_tag``/``post_tag``, with ``…`` marking a clipped edge.

Query terms come from the segment's own analyzer (a stopword segment
never highlights "the"), exactly like Solr highlighting analyzes the
query with the field's analyzer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..indexing.build import read_docs, read_manifest
from ..textprep import ANALYZERS, TOKEN_RE


def _best_window(idx_hits: list[int], n_terms_at: list[int], n_tokens: int,
                 window: int) -> tuple[int, int]:
    """Token-index range [lo, hi) of the best ``window``-token window.

    ``idx_hits``: sorted token indices that match some query term;
    ``n_terms_at``: parallel list of each hit's term id (for distinct
    counting). Two-pointer sweep, O(hits)."""
    if not idx_hits:
        return 0, min(window, n_tokens)
    best = (-1, -1, 0)  # (#distinct, #matches, -lo) maximized
    best_lo = idx_hits[0]
    counts: dict[int, int] = {}
    j = 0
    for i in range(len(idx_hits)):
        lo_tok = idx_hits[i]
        # grow the window to [lo_tok, lo_tok + window)
        while j < len(idx_hits) and idx_hits[j] < lo_tok + window:
            counts[n_terms_at[j]] = counts.get(n_terms_at[j], 0) + 1
            j += 1
        # shrink from the left anything before lo_tok
        if i > 0:
            for p in range(i_prev, i):
                tid = n_terms_at[p]
                counts[tid] -= 1
                if not counts[tid]:
                    del counts[tid]
        i_prev = i
        cand = (len(counts), sum(counts.values()), -lo_tok)
        if cand > best:
            best = cand
            best_lo = lo_tok
    lo = max(min(best_lo, max(n_tokens - window, 0)), 0)
    return lo, min(lo + window, n_tokens)


def _snippet_of(text: str, terms: frozenset, window: int,
                pre_tag: str, post_tag: str) -> str:
    matches = list(TOKEN_RE.finditer(text))
    if not matches:
        return ""
    term_ids = {t: i for i, t in enumerate(sorted(terms))}
    idx_hits, hit_tids = [], []
    for i, m in enumerate(matches):
        tid = term_ids.get(m.group(0).lower())
        if tid is not None:
            idx_hits.append(i)
            hit_tids.append(tid)
    lo, hi = _best_window(idx_hits, hit_tids, len(matches), window)
    span_a = matches[lo].start()
    span_b = matches[hi - 1].end()
    parts = []
    if span_a > 0:
        parts.append("…")
    pos = span_a
    for i in range(lo, hi):
        m = matches[i]
        if m.group(0).lower() in term_ids:
            parts.append(text[pos:m.start()])
            parts.append(pre_tag + m.group(0) + post_tag)
            pos = m.end()
    parts.append(text[pos:span_b])
    if span_b < len(text):
        parts.append("…")
    return "".join(parts)


def _highlight_impl(
    docs: DataFrame,
    hits: DataFrame,
    terms_by_qid: dict | frozenset,
    window: int,
    pre_tag: str,
    post_tag: str,
) -> DataFrame:
    has_qid = "query_id" in hits.columns
    cols = (["query_id"] if has_qid else []) + ["doc_id", "score"]
    joined = docs.select("doc_id", "url", "text").join(
        F.broadcast(hits.select(*cols)), "doc_id"
    )
    out_fields = []
    if has_qid:
        qid_type = dict(joined.dtypes)["query_id"]
        out_fields.append(
            T.StructField(
                "query_id",
                T.LongType() if qid_type in ("bigint", "int") else T.StringType(),
                True,
            )
        )
    out_fields += [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("snippet", T.StringType(), True),
    ]
    out_schema = T.StructType(out_fields)
    w, pre, post = window, pre_tag, post_tag
    tbq = terms_by_qid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            snips = []
            for r in pdf.itertuples():
                terms = (
                    tbq.get(r.query_id, frozenset())
                    if isinstance(tbq, dict)
                    else tbq
                )
                snips.append(
                    _snippet_of(r.text or "", terms, w, pre, post)
                )
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "score": pdf["score"].astype("float64"),
                "url": pdf["url"],
                "snippet": pd.Series(snips, index=pdf.index, dtype="object"),
            }
            if isinstance(tbq, dict):
                out = {"query_id": pdf["query_id"], **out}
            # column order must match out_schema exactly
            yield pd.DataFrame(out)[[f.name for f in out_fields]]

    order = (["query_id"] if has_qid else []) + ["score", "doc_id"]
    return (
        joined.mapInPandas(gen, out_schema)
        .orderBy(
            *[F.asc(c) for c in order[:-2]],
            F.desc("score"),
            F.asc("doc_id"),
        )
    )


def _query_terms(man: dict, query) -> frozenset:
    tokenizer = ANALYZERS.get(
        man.get("analyzer", "default"), ANALYZERS["default"]
    )[2]
    if isinstance(query, (list, tuple, set, frozenset)):
        return frozenset(str(t).lower() for t in query)
    return frozenset(tokenizer(query))


def highlight(
    spark: SparkSession,
    index_dir: str,
    hits: DataFrame,
    query: str,
    window: int = 32,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Snippets for a top-k result over one segment: ``hits`` is the
    (doc_id, score) frame ``topk``/``topk_filtered`` returned; output adds
    (url, snippet) with the best ``window``-token fragment and every query
    term wrapped in the tags. Row order matches the hit ranking."""
    man = read_manifest(index_dir)
    return _highlight_impl(
        read_docs(spark, index_dir, man), hits, _query_terms(man, query),
        window, pre_tag, post_tag,
    )


def highlight_segments(
    spark: SparkSession,
    seg_dirs: list[str],
    hits: DataFrame,
    query: str,
    window: int = 32,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Chain variant (pre-merge serving): docs resolved across base +
    delta segments — a hit living in a delta highlights from the delta's
    stored text."""
    mans = [read_manifest(d) for d in seg_dirs]
    docs = read_docs(spark, seg_dirs[0], mans[0])
    for d, m in zip(seg_dirs[1:], mans[1:]):
        docs = docs.unionByName(
            read_docs(spark, d, m), allowMissingColumns=True
        )
    return _highlight_impl(
        docs, hits, _query_terms(mans[0], query), window, pre_tag, post_tag
    )


def highlight_batch(
    spark: SparkSession,
    index_dir: str | list[str],
    hits: DataFrame,
    queries: dict,
    window: int = 32,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Batch variant: ``hits`` is ``topk_batch``'s (query_id, doc_id,
    score) frame; each row highlights with ITS query's analyzed terms.
    One broadcast join + one mapInPandas for the whole batch — the same
    amortization argument as the batch scorer itself. ``index_dir`` may
    be a segment chain (list) — docs resolved across base + deltas."""
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    mans = [read_manifest(d) for d in dirs]
    docs = read_docs(spark, dirs[0], mans[0])
    for d, m in zip(dirs[1:], mans[1:]):
        docs = docs.unionByName(
            read_docs(spark, d, m), allowMissingColumns=True
        )
    terms_by_qid = {
        qid: _query_terms(mans[0], q) for qid, q in queries.items()
    }
    return _highlight_impl(
        docs, hits, terms_by_qid, window, pre_tag, post_tag
    )
