"""Sort-by-field serving + deep paging — Solr's ``sort=`` / ``start`` /
``rows`` parameters, the OTHER half of the reference's serving surface.

The reference precomputes five zero-padded citation sort keys
(solrIndexCreation.ts:1624-1942), sort-prefix buckets (:6161-6175) and a
``sortnumber`` guard (:7814-7817) for exactly one purpose: so Solr can
ORDER result sets on those stored fields. The engine computes every key
(docprep/citations.py, scalars.py); this module is the serving path that
uses them: top-k of the query's match set ordered by a STORED field
(BM25 plays no part — Solr's non-score sort), with ``start`` offsetting
into the ordering for deep paging.

Plan shape (fully distributed at any match-set size):

    postings (bucket+term pruned scan) ─decode─▶ match doc_ids
      ─anti-join dead [─semi-join fq]─▶ join docs (doc_id + sort cols
      only, column-pruned scan) ─▶ orderBy(key…, doc_id).offset(start)
      .limit(k)

The final order-offset-limit is Spark's TakeOrdered machinery — each
task keeps its local top (start+k) rows, the driver merges O(partitions
× (start+k)) rows — never a global sort. Deep paging cost therefore
grows with ``start`` exactly as in Lucene (Solr recommends cursorMark
past ~10k; same advice applies here: keep ``start`` page-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexing.build import read_manifest
from .facet import docs_meta_union, matching_doc_ids


def _order_cols(sort_cols, ascending) -> list:
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    if isinstance(ascending, bool):
        ascending = [ascending] * len(cols)
    order = [
        # nulls sort last in both directions (Solr's sortMissingLast
        # posture for sort fields — a doc without the key never outranks
        # one with it)
        F.col(c).asc_nulls_last() if a else F.col(c).desc_nulls_last()
        for c, a in zip(cols, ascending)
    ]
    order.append(F.col("doc_id").asc())  # total order: deterministic pages
    return order


def _sorted_impl(
    spark: SparkSession,
    ids: DataFrame,
    keys: DataFrame,
    sort_cols,
    k: int,
    start: int,
    ascending,
    allow: DataFrame | None = None,
) -> DataFrame:
    if allow is not None:
        ids = ids.join(
            allow.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    joined = ids.join(keys.select("doc_id", *cols), "doc_id")
    out = joined.orderBy(*_order_cols(sort_cols, ascending))
    if start:
        out = out.offset(int(start))
    return out.limit(int(k))


def sorted_topk(
    spark: SparkSession,
    index_dir: str | list[str],
    query,
    sort_cols="doc_id",
    k: int = 10,
    start: int = 0,
    ascending=True,
    allow: DataFrame | None = None,
    keys: DataFrame | None = None,
) -> DataFrame:
    """Top-k docs of the query's OR match set ordered by stored field(s)
    — Solr ``q=...&sort=field asc&start=S&rows=K``.

    ``sort_cols``: one column name or a list (compound sort); resolved in
    the segment docs table unless ``keys`` supplies an external
    (doc_id, key…) table — the shape for keys computed by a docprep
    pipeline rather than stored in the segment (e.g. the five citation
    sort variants). ``ascending``: bool or list matching ``sort_cols``.
    Ties always break by doc_id, so pages are deterministic and
    non-overlapping. Tombstoned docs are excluded (matching_doc_ids);
    ``allow`` composes an fq exactly like the scored paths.

    Output preserves the requested order and carries the sort column(s)
    alongside doc_id (a results page shows the field it is sorted by).
    """
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    ids = matching_doc_ids(spark, dirs, query)
    if keys is None:
        cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        mans = [read_manifest(d) for d in dirs]
        keys = docs_meta_union(spark, dirs, mans, cols)
    return _sorted_impl(
        spark, ids, keys, sort_cols, k, start, ascending, allow=allow
    )
