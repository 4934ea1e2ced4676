"""Index build: pages → docs / postings / dictionary / stats / lineage.

This is the from-scratch half (BASELINE.json north_star): the reference hands
documents to Solr for inverted-index construction (commented BulkIndexing,
solrIndexCreation.ts:876-882); here the segments ARE the sink.

Dataflow (one term-hash shuffle of the token stream, everything else narrow):

    pages ──extract/verify──▶ docs (stable doc_id JVM-side, doclen) [range shuffle]
      └─ tokenize (Arrow UDF) ─ explode ─ salt head terms (cf > threshold →
         contiguous doc-range shards)
         └─ repartition(term,salt) + sortWithinPartitions            [term-hash shuffle]
            └─ mapInPandas: run-length tf + block build (vectorized) — the
               tf "groupBy" happens inside this one exchange, not as its own
            └─ postings parquet partitioned by bucket (pruning at query time)
    dictionary = blocks.groupBy(term) agg ; stats from lineage agg ; lineage per partition

Skew handling (SURVEY.md §4.2-1): Zipf head terms would hot-spot single
reducers inside the groupBy — AQE cannot split a groupBy key — so terms whose
df exceeds ``salt_df_threshold`` are salted by *contiguous docID range*
(salt = doc_id // salt_range). Contiguous ranges keep each shard's postings
globally ordered, so shard outputs concatenate into a valid posting list with
no re-merge pass; only the boundary blocks are underfull.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import BLOCK_SIZE, K1, B as B_PARAM
from ..codec import vbyte_encode, vbyte_encode_chunked
from ..textprep import (
    ANALYZERS,
    EXTRACTOR_VERSION,
    STOPWORDS,
    TOKENIZER_VERSION,
    doclens_dual,
    extract_text,
    extract_text_safe,
    tokenize,
    tokenize_tf,
)
from .docids import assign_doc_ids

# Segment on-disk format version. v2 = POSTINGS_SCHEMA carries required
# positions/pos_counts columns (empty binaries when built without
# store_positions). v3 adds payload_bytes (len(doc_gaps)+len(tfs)+
# len(doclens), computed at block-build time) so lineage/size accounting
# reads one int column instead of decompressing every postings binary a
# second time — event-log profiling showed that re-read as a full extra
# scan of the postings table inside _finalize_segment. Readers validate
# via read_manifest so a stale segment fails with a version message, not
# an opaque missing-column error. v4 widens block_id to int64: block ids
# are doc-range-derived (build: salt<<20+i with salt_range 2^16; merge:
# merge_shard<<20+i with merge_shard = first_doc_id/2^17), so any segment
# whose doc ids sit past 2^28 — e.g. merge inputs at disjoint 2^33
# base_doc_id strides, the hierarchical-merge story — overflowed int32
# (Arrow refused the cast; caught by scaling_cluster --merge at stride'd
# shard ids).
FORMAT_VERSION = 4

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        # per-posting doclens (VByte) — Lucene-norms-style: scoring stays
        # local at query time, no join against the docs table
        T.StructField("doclens", T.BinaryType(), False),
        T.StructField("block_max_tf_norm", T.DoubleType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("build_us", T.LongType(), False),
        # positional payload (phrase queries): per-posting position lists,
        # delta+VByte; pos_counts = VByte of per-posting position counts.
        # Empty bytes when the segment is built without positions.
        T.StructField("positions", T.BinaryType(), False),
        T.StructField("pos_counts", T.BinaryType(), False),
        # v3: encoded payload size (gaps+tfs+doclens), so lineage byte
        # accounting never re-reads the binary columns
        T.StructField("payload_bytes", T.LongType(), False),
    ]
)

# dual-build stream schema: the single posting stream is tagged per
# analyzer variant (0 = default, 1 = stopword) and written
# partitionBy(variant, bucket); the variant layer is then renamed away so
# each segment's postings/ has the standard bucket=*/ layout
POSTINGS_SCHEMA_DUAL = T.StructType(
    POSTINGS_SCHEMA.fields
    + [T.StructField("variant", T.IntegerType(), False)]
)


def tf_norm(tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 term-frequency saturation (idf-independent part)."""
    tf = tf.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B_PARAM + B_PARAM * doclen / avgdl))


def _make_block_builder(
    avgdl: float,
    num_buckets: int,
    block_size: int,
    head_terms: list[str] | None = None,
    salt_range: int = 1 << 16,
    dual: tuple[float, frozenset] | None = None,
):
    """Streaming (mapInArrow) block builder over a partition that is
    hash-partitioned by (term, salt) and sorted by (term[, salt], doc_id).

    ``head_terms``: when given, rows do NOT carry a salt column — salt is
    recomputed here as ``doc_id // salt_range`` for head terms (Arrow
    ``is_in`` kernel, zero per-row Python) and 0 otherwise, matching the
    partitioning expression exactly. When None, a ``salt`` column is
    expected in the input (the >4096-heads fallback).

    Why mapInArrow and not groupBy().applyInPandas: a web corpus has one
    posting-list group per distinct term — millions of tiny groups — and
    applyInPandas pays a Python-call + pandas-construction cost per GROUP.
    Here each Python call processes a whole Arrow batch of many groups;
    group boundaries are found vectorized, and a group that straddles a
    batch boundary is carried over in a buffer.

    ``dual``: ``(avgdl_stop, stopword_set)`` — single-pass dual-analyzer
    mode (reference posts every batch to BOTH IndexName and
    IndexNameStopword, solrIndexCreation.ts:877-880). Each flushed chunk
    then ALSO emits variant-1 blocks: rows whose term is a stopword are
    dropped (Arrow is_in kernel) and norms use the row's ``doclen_stop``
    column with ``avgdl_stop`` — exactly what the stopword analyzer's own
    stream would contain, because that analyzer is the default stream
    minus stop terms (position gaps preserved, textprep.py). Output rows
    gain a ``variant`` int column (0 = default, 1 = stopword) for the
    partitioned dual write; single mode keeps the schema unchanged.

    Why Arrow batches and not pandas (round-2 change): the mapInPandas
    path materialized a Python str OBJECT per row for the term column —
    at 60 M (doc, term) rows that is 60 M allocations plus object-header
    memory traffic, and the change-point scan degraded to per-row PyUnicode
    comparisons. Arrow keeps terms in contiguous string buffers end-to-end:
    comparisons run as C++ kernels over sequential memory
    (pc.not_equal on shifted slices), strings are materialized only once
    per GROUP (bucket hashing), and per-block output terms are a zero-copy
    ``take``. This directly reduces the stage's DRAM traffic — the
    scaling-efficiency bottleneck measured in BENCH/BASELINE.md §2.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.pandas.types import to_arrow_schema

    out_schema = to_arrow_schema(
        POSTINGS_SCHEMA_DUAL if dual else POSTINGS_SCHEMA
    )
    head_arr = (
        pa.array(sorted(head_terms)) if head_terms else None
    )
    stop_arr = pa.array(sorted(dual[1])) if dual else None

    def _stop_view(rb: "pa.RecordBatch"):
        """Variant-1 projection: drop stopword-term rows and let the
        row's doclen_stop stand in as doclen (name-based lookup below).

        Zero-copy on the common path: the column swap reuses the chunk's
        buffers, and the filter kernel only runs when the chunk actually
        contains stop rows (measured: the earlier Table round-trip +
        unconditional filter made the dual builder 4× the single one
        instead of the expected ~2× encode doubling)."""
        names = rb.schema.names
        stop_mask = pc.is_in(
            rb.column(names.index("term")), value_set=stop_arr
        )
        n_stop = pc.sum(stop_mask).as_py() or 0
        if n_stop:
            if n_stop == rb.num_rows:
                return None
            rb = rb.filter(pc.invert(stop_mask))
        arrays, out_names = [], []
        for i, nm in enumerate(names):
            if nm == "doclen":
                continue
            arrays.append(rb.column(i))
            out_names.append("doclen" if nm == "doclen_stop" else nm)
        return pa.RecordBatch.from_arrays(arrays, names=out_names)

    def salts_of(rb: "pa.RecordBatch", ids_t: np.ndarray) -> np.ndarray:
        names = rb.schema.names
        if "salt" in names:
            return rb.column(names.index("salt")).to_numpy().astype(np.int64)
        out = np.zeros(rb.num_rows, dtype=np.int64)
        if head_arr is not None and len(head_arr):
            is_head = pc.is_in(
                rb.column(names.index("term")), value_set=head_arr
            ).to_numpy(zero_copy_only=False)
            out[is_head] = ids_t[is_head] // salt_range
        return out

    def blocks_for(
        rb: "pa.RecordBatch", avgdl_: float = avgdl, variant: int | None = None
    ) -> "pa.RecordBatch":
        t0 = time.monotonic_ns()
        names = rb.schema.names
        nt = rb.num_rows
        term_a = rb.column(names.index("term"))
        ids_t = rb.column(names.index("doc_id")).to_numpy().astype(np.int64)
        salts_t = salts_of(rb, ids_t)
        dls_t = rb.column(names.index("doclen")).to_numpy().astype(np.float64)
        if "tf" in names:
            tfs_t = rb.column(names.index("tf")).to_numpy().astype(np.int64)
        else:  # token-occurrence shape: each row counts 1
            tfs_t = np.ones(nt, dtype=np.int64)
        # ---- run-length tf: rows sorted by (term, salt, doc_id); equal-
        # triple runs collapse, summing their tf — inside the one
        # term-partitioned exchange, replacing a whole groupBy shuffle.
        rchange = np.empty(nt, dtype=bool)
        rchange[0] = True
        if nt > 1:
            tdiff = pc.not_equal(
                term_a.slice(1), term_a.slice(0, nt - 1)
            ).to_numpy(zero_copy_only=False)
            rchange[1:] = (
                tdiff
                | (salts_t[1:] != salts_t[:-1])
                | (ids_t[1:] != ids_t[:-1])
            )
        rstarts = np.flatnonzero(rchange)
        tfs = np.add.reduceat(tfs_t, rstarts).astype(np.int64)
        salts = salts_t[rstarts]
        doc_ids = ids_t[rstarts]
        doclens = dls_t[rstarts]
        term_runs = term_a.take(pa.array(rstarts))
        norms = tf_norm(tfs, doclens, avgdl_)
        n = len(rstarts)
        change = np.empty(n, dtype=bool)
        change[0] = True
        if n > 1:
            gdiff = pc.not_equal(
                term_runs.slice(1), term_runs.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            change[1:] = gdiff | (salts[1:] != salts[:-1])
        gstarts = np.flatnonzero(change)
        gends = np.append(gstarts[1:], n)

        # ---- block boundaries (vectorized over ALL groups) -------------
        blocks_per_group = (gends - gstarts + block_size - 1) // block_size
        g_of_block = np.repeat(np.arange(len(gstarts)), blocks_per_group)
        # index of each block within its group
        first_of_g = np.cumsum(blocks_per_group) - blocks_per_group
        block_in_g = np.arange(len(g_of_block)) - first_of_g[g_of_block]
        bstarts = gstarts[g_of_block] + block_in_g * block_size
        bends = np.minimum(bstarts + block_size, gends[g_of_block])
        n_blocks = len(bstarts)

        # ---- per-block stats via reduceat (bstarts are contiguous) -----
        bmax = np.maximum.reduceat(norms, bstarts)
        sum_tf = np.add.reduceat(tfs, bstarts)
        ndocs = bends - bstarts

        # ---- one-pass codec: gaps (diffs, dropping block firsts) -------
        diffs = np.empty(n, dtype=np.int64)
        diffs[0] = 0
        diffs[1:] = doc_ids[1:] - doc_ids[:-1]
        keep = np.ones(n, dtype=bool)
        keep[bstarts] = False
        gaps_enc = vbyte_encode_chunked(diffs[keep].astype(np.uint64), ndocs - 1)
        tfs_enc = vbyte_encode_chunked(tfs.astype(np.uint64), ndocs)
        dls_enc = vbyte_encode_chunked(doclens.astype(np.uint64), ndocs)

        # ---- positional payload (only when the tokenizer shipped it) ----
        if "positions" in names:
            sel = rb.column(names.index("positions")).take(pa.array(rstarts))
            pos_counts = pc.list_value_length(sel).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = pc.list_flatten(sel).to_numpy().astype(np.int64)
            # delta within each posting's position list
            if len(flat):
                deltas = np.empty_like(flat)
                deltas[0] = flat[0]
                deltas[1:] = flat[1:] - flat[:-1]
                pstarts = np.cumsum(pos_counts) - pos_counts
                nz = pstarts[pos_counts > 0]
                deltas[nz] = flat[nz]
            else:
                deltas = flat
            per_block_pos = np.add.reduceat(pos_counts, bstarts)
            pos_enc = vbyte_encode_chunked(deltas.astype(np.uint64), per_block_pos)
            cnt_enc = vbyte_encode_chunked(pos_counts.astype(np.uint64), ndocs)
        else:
            pos_enc = [b""] * n_blocks
            cnt_enc = [b""] * n_blocks

        # ---- per-group scalars, fanned to blocks ------------------------
        # strings materialize ONCE per group (bucket crc32), not per row
        group_terms = term_runs.take(pa.array(gstarts)).to_pylist()
        group_buckets = np.fromiter(
            (_term_bucket_py(t, num_buckets) for t in group_terms),
            dtype=np.int64,
            count=len(group_terms),
        )
        # block ids: globally ordered across salt shards because salting is
        # by contiguous doc range — shard k covers ids < shard k+1.
        block_ids = (salts[gstarts][g_of_block] << 20) + block_in_g

        payload = np.fromiter(
            (len(g) + len(t) + len(d)
             for g, t, d in zip(gaps_enc, tfs_enc, dls_enc)),
            dtype=np.int64,
            count=n_blocks,
        )
        # amortize the partition's wall over its blocks (lineage metric)
        us = (time.monotonic_ns() - t0) // 1000 // max(n_blocks, 1)
        arrays = [
            term_runs.take(pa.array(bstarts)),  # zero-copy block terms
            pa.array(group_buckets[g_of_block].astype(np.int32)),
            pa.array(block_ids.astype(np.int64)),
            pa.array(doc_ids[bstarts]),
            pa.array(doc_ids[bends - 1]),
            pa.array(ndocs.astype(np.int32)),
            pa.array(gaps_enc, type=pa.binary()),
            pa.array(tfs_enc, type=pa.binary()),
            pa.array(dls_enc, type=pa.binary()),
            pa.array(bmax),
            pa.array(sum_tf.astype(np.int64)),
            pa.array(np.full(n_blocks, us, dtype=np.int64)),
            pa.array(pos_enc, type=pa.binary()),
            pa.array(cnt_enc, type=pa.binary()),
            pa.array(payload),
        ]
        if variant is not None:
            arrays.append(pa.array(np.full(n_blocks, variant, dtype=np.int32)))
        return pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    def _concat(rbs: list) -> "pa.RecordBatch":
        tbl = pa.Table.from_batches(rbs).combine_chunks()
        bs = tbl.to_batches()
        if len(bs) == 1:
            return bs[0]
        # combine_chunks yields one chunk per column; to_batches can still
        # split on max_chunksize — re-batch through a single table pass
        return tbl.to_batches(max_chunksize=tbl.num_rows)[0]

    def emit(chunk):
        if dual is None:
            yield blocks_for(chunk)
            return
        yield blocks_for(chunk, avgdl, 0)
        sv = _stop_view(chunk)
        if sv is not None:
            yield blocks_for(sv, dual[0], 1)

    def stream(batches):
        # `pending` accumulates batches whose trailing group may continue in
        # the next batch. It is a LIST concatenated once per flush — a naive
        # concat-per-batch carry buffer is O(batches²) row copies for any
        # posting group spanning many Arrow batches (head terms always do).
        pending: list = []
        for rb in batches:
            nt = rb.num_rows
            if nt == 0:
                continue
            names = rb.schema.names
            term_a = rb.column(names.index("term"))
            if "salt" in names:
                salt_a = rb.column(names.index("salt"))
                tail = pc.and_(
                    pc.equal(term_a, term_a[nt - 1]),
                    pc.equal(salt_a, salt_a[nt - 1]),
                ).to_numpy(zero_copy_only=False)
            else:
                # no salt column: term-only carry is conservative (a head
                # term's trailing span carries a bit more), always correct
                tail = pc.equal(term_a, term_a[nt - 1]).to_numpy(
                    zero_copy_only=False
                )
            not_tail = np.flatnonzero(~tail)
            split = int(not_tail[-1]) + 1 if len(not_tail) else 0
            if split == 0:
                pending.append(rb)  # whole batch continues one group
                continue
            head, tail_rb = rb.slice(0, split), rb.slice(split)
            if pending:
                head = _concat(pending + [head])
                pending = []
            yield from emit(head)
            pending = [tail_rb]
        if pending:
            rest = _concat(pending) if len(pending) > 1 else pending[0]
            if rest.num_rows:
                yield from emit(rest)

    return stream


def _term_bucket_py(term: str, num_buckets: int) -> int:
    """Stable term→bucket hash, identical on driver and executors.

    Not Python's randomized hash(); crc32 of utf-8 bytes, same as the
    query side uses for partition pruning.
    """
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets


def term_bucket_col(term_col, num_buckets: int):
    """Catalyst expression equal to _term_bucket_py (crc32 % buckets)."""
    return F.pmod(F.crc32(F.col(term_col) if isinstance(term_col, str) else term_col), F.lit(num_buckets)).cast("int")


def _verify_ext_expr(verify, html_col: str = "html"):
    """The verification extractor column: ``extract_text(html)`` for the
    verified rows, NULL elsewhere (NULL ``_ext`` passes the byte-identity
    check by construction — ``_ext != text`` is null-false).

    ``verify`` is the posture knob: ``True`` verifies every row (the CI /
    small-corpus gate); a float fraction in (0, 1) verifies a
    DETERMINISTIC url-hash sample — the 100 TB default, where paying the
    second extraction on ~1% of rows catches a systematically broken
    extractor build while costing ~nothing (see README 'Extraction
    verification posture' + BENCH/BASELINE.md §4d)."""
    frac = 1.0 if verify is True else float(verify)
    if frac >= 1.0:
        return extract_text(F.col(html_col))
    pred = F.pmod(F.crc32(F.col("url")), F.lit(1_000_000)) < F.lit(
        int(frac * 1_000_000)
    )
    # gate the UDF's INPUT, not just its output: Catalyst pulls Python
    # UDFs out of conditional expressions and evaluates them on every row
    # (ArrowEvalPython), so `when(pred, extract(html))` would still parse
    # — and Arrow-transfer — 100% of the corpus. Nulling html first keeps
    # the transfer + parse at ~frac of the corpus; the outer when turns
    # the unsampled rows' "" (extract of null) back into NULL so they
    # pass the byte-identity check by construction.
    return F.when(pred, extract_text(F.when(pred, F.col(html_col))))


def build_docs(
    pages: DataFrame,
    num_partitions: int | None = None,
    base_doc_id: int = 0,
    verify_extraction: bool | float = False,
    analyzer: str = "default",
) -> DataFrame:
    """pages → docs(doc_id, url, text, lang, doclen, toks, _pid, _wall_ms).

    If the ``text`` column is absent it is produced by ``extract_text(html)``;
    if present and ``verify_extraction`` (True = all rows, float = url-hash
    sample fraction), rows where extraction disagrees with the provided
    text raise at action time (the byte-identity invariant).
    """
    cols = set(pages.columns)
    if "text" not in cols:
        pages = pages.withColumn("text", extract_text(F.col("html")))
    elif verify_extraction and "html" in cols:
        pages = pages.withColumn("_ext", _verify_ext_expr(verify_extraction))
    # html is dead weight past this point — drop it BEFORE the range
    # shuffle so the shuffle moves text, not raw page bytes
    pages = pages.select(
        *[c for c in ("url", "text", "lang", "_ext") if c in pages.columns]
    )
    docs = assign_doc_ids(pages, order_col="url", num_partitions=num_partitions, base_doc_id=base_doc_id)
    docids_cache = getattr(docs, "_docids_cache", None)
    docids_expected = getattr(docs, "_docids_expected", None)
    # doclen only — the token ARRAYS are deliberately not kept: caching or
    # writing array<string> per doc costs ~10× the docs-table write itself
    # (measured); the posting path re-tokenizes from the compact docs
    # parquet instead (one extra Arrow-UDF pass, fully parallel).
    tok_udf = ANALYZERS[analyzer][0]
    docs = docs.withColumn("doclen", F.size(tok_udf(F.col("text"))))
    keep = ["doc_id", "url", "text", "lang", "doclen", "_pid", "_wall_ms"]
    if "_ext" in docs.columns:
        keep.append("_ext")
    out = docs.select(*[c for c in keep if c in docs.columns])
    out._docids_cache = docids_cache
    out._docids_expected = docids_expected
    return out


def _docs_lineage(
    spark: SparkSession,
    docs_r: DataFrame,
    base_doc_id: int,
    docids_expected: int | None,
    docs_wall: float,
) -> tuple[DataFrame, int, int, float]:
    """Docs-stage lineage from the written table (text pruned to a length
    agg; stats derive driver-side — no separate stats pass), plus the
    docID density invariant. Returns (lineage_df, n_docs, total_tokens,
    avgdl)."""
    lineage_rows = (
        docs_r.groupBy(F.col("_pid").alias("partition_id"))
        .agg(
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
            F.count("*").alias("n_docs"),
            F.sum("doclen").alias("token_count"),
            F.sum("_tbytes").alias("bytes"),
        )
        .collect()
    )
    n_docs_total = sum(r["n_docs"] for r in lineage_rows)
    # docID density invariant: ids written must be exactly
    # [base, base + count) — catches any cache-eviction recompute of the
    # range shuffle (offsets computed against a different materialization)
    # before the segment is committed.
    if lineage_rows:
        max_hi = max(r["doc_hi"] for r in lineage_rows)
        min_lo = min(r["doc_lo"] for r in lineage_rows)
        if min_lo != base_doc_id or max_hi + 1 - base_doc_id != n_docs_total:
            raise RuntimeError(
                f"doc_id assignment violated density invariant: ids span "
                f"[{min_lo}, {max_hi}] but base={base_doc_id}, "
                f"count={n_docs_total} — range-shuffle cache was recomputed?"
            )
        # second leg of the invariant: the count the OFFSET COMPUTATION saw
        # (assign_doc_ids' collected per-partition counts) must match what
        # was written — a dense-but-differently-sized recompute would pass
        # the span check above but fail here
        if docids_expected is not None and n_docs_total != docids_expected:
            raise RuntimeError(
                f"doc_id assignment wrote {n_docs_total} docs but the "
                f"offset pass counted {docids_expected} — range-shuffle "
                "cache was recomputed between passes?"
            )
    total_tokens = sum(r["token_count"] for r in lineage_rows)
    avgdl = (total_tokens / n_docs_total) if n_docs_total else 1.0
    docs_stage_ms = docs_wall * 1000.0 / max(len(lineage_rows), 1)
    docs_lineage = spark.createDataFrame(
        [
            (
                "docs", r["partition_id"], r["doc_lo"], r["doc_hi"],
                r["n_docs"], r["token_count"], r["bytes"], docs_stage_ms,
            )
            for r in lineage_rows
        ],
        "stage string, partition_id int, doc_lo long, doc_hi long, "
        "n_docs long, token_count long, bytes long, wall_ms double",
    )
    return docs_lineage, n_docs_total, total_tokens, avgdl


def _quarantine_pages(
    spark: SparkSession, pages: DataFrame, out_dir: str,
    verify: bool | float = False,
) -> tuple[DataFrame, int, DataFrame | None]:
    """Dead-letter quarantine (reference: per-row try/catch →
    LogErrorId file, common.ts:304-326; here an errors table). Rows that
    cannot become documents (failed/empty extraction, null url) are
    routed to {out_dir}/errors instead of killing the build. Returns the
    clean pages (with ``text`` materialized when extraction ran), the
    quarantined count, and the extraction cache to unpersist once the
    docID range shuffle is materialized (None when no extraction ran).

    The html-only path persists the extracted text ONCE (html dropped
    first — only url/lang/extracted text are cached) and serves both the
    quarantine write and the docID range shuffle from that cache.
    Without it the quarantine action and the docids persist each re-ran
    the full extraction — and on the ingest path, the composed docprep
    pipeline upstream of it — doubling the most expensive map in the
    build. MEMORY_AND_DISK: a partition under memory pressure spills
    instead of being evicted (an evicted partition would silently
    re-extract, paying the cost the cache exists to avoid).

    ``verify``: on the html-only path the byte-identity gate would
    otherwise be unreachable (html is dropped here, so build_docs'
    ``verify_extraction`` branch can never fire) — when set, the raw
    extractor runs next to the dead-letter-safe one IN THE SAME scan and
    its output rides the clean pages as ``_ext``, which build_docs
    passes through for build_index's invariant check."""
    cache = None
    if "text" not in pages.columns:
        from pyspark import StorageLevel

        keep = [c for c in ("url", "lang") if c in pages.columns]
        sel = [*keep, extract_text_safe(F.col("html")).alias("_sx")]
        if verify:
            sel.append(_verify_ext_expr(verify).alias("_ext"))
        ext = pages.select(*sel).persist(StorageLevel.MEMORY_AND_DISK)
        bad = F.col("_sx.error").isNotNull() | F.col("url").isNull()
        quarantine = ext.filter(bad).select(
            "url",
            F.coalesce(F.col("_sx.error"), F.lit("null-url")).alias("reason"),
        )
        out_cols = [*keep, F.col("_sx.text").alias("text")]
        if verify:
            out_cols.append(F.col("_ext"))
        pages = ext.filter(~bad).select(*out_cols)
        cache = ext
    else:
        quarantine = pages.filter(F.col("url").isNull()).select(
            "url", F.lit("null-url").alias("reason")
        )
        pages = pages.filter(F.col("url").isNotNull())
    quarantine.withColumn("stage", F.lit("docprep")).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/errors")
    return pages, spark.read.parquet(f"{out_dir}/errors").count(), cache


def build_docs_dual(
    pages: DataFrame,
    num_partitions: int | None = None,
    base_doc_id: int = 0,
    verify_extraction: bool | float = False,
) -> DataFrame:
    """``build_docs`` twin for the dual-analyzer build: docs carry BOTH
    ``doclen`` (default analyzer) and ``doclen_stop`` (stopword
    analyzer), computed by ONE tokenize pass (textprep.doclens_dual)
    AFTER the range shuffle — like build_docs' doclen. Computing it
    before the shuffle (the original design, so assign_doc_ids' persist
    would cache both values for the two docs writes) ran the UDF at the
    PARQUET SCAN's parallelism (one small input file = 1-2 tasks) and
    TWICE (repartitionByRange's range-bounds sampling job executes the
    child plan, UDF columns included) — measured 11 s of a 25 s dual
    build at 20k docs. Post-shuffle the UDF runs at num_partitions-way
    parallelism; the two docs writes each evaluate it once from the
    cached text, concurrently."""
    cols = set(pages.columns)
    if "text" not in cols:
        pages = pages.withColumn("text", extract_text(F.col("html")))
    elif verify_extraction and "html" in cols:
        pages = pages.withColumn("_ext", _verify_ext_expr(verify_extraction))
    pages = pages.select(
        *[c for c in ("url", "text", "lang", "_ext") if c in pages.columns]
    )
    docs = assign_doc_ids(
        pages, order_col="url", num_partitions=num_partitions,
        base_doc_id=base_doc_id,
    )
    dd = doclens_dual(F.col("text"))
    docs = docs.select(
        "*",
        F.element_at(dd, 1).alias("doclen"),
        F.element_at(dd, 2).alias("doclen_stop"),
    )
    docids_cache = getattr(docs, "_docids_cache", None)
    docids_expected = getattr(docs, "_docids_expected", None)
    keep = [
        "doc_id", "url", "text", "lang", "doclen", "doclen_stop",
        "_pid", "_wall_ms",
    ]
    if "_ext" in docs.columns:
        keep.append("_ext")
    out = docs.select(*[c for c in keep if c in docs.columns])
    out._docids_cache = docids_cache
    out._docids_expected = docids_expected
    return out


def build_index_dual(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    out_dir_stop: str,
    num_buckets: int = 16,
    block_size: int = BLOCK_SIZE,
    salt_df_threshold: int = 100_000,
    salt_range: int = 1 << 16,
    num_partitions: int | None = None,
    base_doc_id: int = 0,
    verify_extraction: bool | float = False,
    store_positions: bool = False,
    shared_docs: bool = False,
) -> tuple[dict, dict]:
    """Single-pass dual-analyzer build (SURVEY §4.1 row 6): the reference
    posts every document batch to BOTH the ``IndexName`` and
    ``IndexNameStopword`` Solr collections (solrIndexCreation.ts:877-880);
    here one job writes the default-analyzer segment to ``out_dir`` and
    the stopword-analyzer segment to ``out_dir_stop``.

    One pages scan, one extraction, one doclen tokenize, one tf tokenize,
    and ONE term-hash exchange serve both segments. This works because
    the stopword analyzer's stream is exactly the default stream minus
    STOPWORDS terms (position gaps preserved — textprep.py), so:

    - ``doclen_stop`` rides the posting stream as one extra int column
      (doclen − Σ tf of stop terms, a Catalyst array aggregate over the
      tokenizer's tf array — no second tokenize);
    - the Arrow block builder emits variant-1 blocks per chunk by
      filtering stop terms (is_in kernel) and swapping in
      (doclen_stop, avgdl_stop) for the norms;
    - blocks are written ONCE, partitioned by (variant, bucket), and the
      variant layer is renamed into each segment's standard ``postings/``
      layout (one directory rename per variant on a local/HDFS-like
      filesystem; an object-store deployment would use a manifest pointer
      or server-side copy instead).

    Each output segment is fully standard — same layout + manifest as a
    ``build_index(analyzer=...)`` twin, interchangeable for query/merge
    (tests/test_dualbuild.py pins dictionary/stats/topk equality against
    independently built twins). By default the docs TEXT is written twice
    (each segment self-contained, matching the reference's choice of
    storing every document in both collections); with ``shared_docs=True``
    it is written ONCE, into the default segment with BOTH doclen columns,
    and the stopword manifest carries a ``docs_ref`` pointer +
    ``docs_doclen_col`` that every docs consumer resolves via
    :func:`read_docs` — the variants differ only in doclen, so this halves
    doc-text storage and one full parquet write at corpus scale with no
    query-path change. Trade-off: the stopword segment is no longer
    self-contained (don't relocate it without its sibling); a merge
    re-materializes standalone docs.
    """
    t_start = time.monotonic()
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(out_dir_stop, exist_ok=True)
    pages, n_quarantined, ext_cache = _quarantine_pages(
        spark, pages, out_dir, verify=verify_extraction
    )
    docids_cache = None
    try:
        # mirror the (tiny) errors table so both segments are self-contained
        shutil.copytree(
            f"{out_dir}/errors", f"{out_dir_stop}/errors", dirs_exist_ok=True
        )

        docs = build_docs_dual(
            pages, num_partitions=num_partitions, base_doc_id=base_doc_id,
            verify_extraction=verify_extraction,
        )
        docids_cache = getattr(docs, "_docids_cache", None)
        docids_expected = getattr(docs, "_docids_expected", None)
        # assign_doc_ids' own persist is fully materialized (its offsets
        # collect ran inside build_docs), so the extraction cache is dead
        # weight from here: release it NOW rather than hold two cached
        # copies of the corpus text through the docs write
        if ext_cache is not None:
            ext_cache.unpersist()

        if "_ext" in docs.columns:
            n_bad = docs.filter(F.col("_ext") != F.col("text")).count()
            if n_bad:
                raise ValueError(
                    f"extract_text(html) != text for {n_bad} rows — "
                    "byte-identity invariant violated"
                )
            docs = docs.drop("_ext")

        lang_cols = ["lang"] if "lang" in docs.columns else []
        base = docs.select(
            "doc_id", "url", "text", *lang_cols, "doclen", "doclen_stop",
            "_pid", F.length("text").alias("_tbytes"),
        )
        # both docs writes read the assign_doc_ids persist (extraction +
        # doclens cached); only the projection differs. Submitted from two
        # threads — independent Spark jobs share the task slots, so the
        # second write overlaps the first instead of serializing behind it.
        t_d0 = time.monotonic()
        from concurrent.futures import ThreadPoolExecutor

        # each write times itself inside its closure: the two jobs run
        # concurrently, so per-variant walls overlap and their sum exceeds
        # the combined wall — report all three rather than attributing the
        # combined wall to one variant
        write_walls: dict[str, float] = {}

        def _write_docs_default():
            t = time.monotonic()
            # shared mode keeps doclen_stop in the one table — the
            # stopword variant's resolver renames it to doclen on read
            cols = ["doc_id", "url", "text", *lang_cols, "doclen"]
            if shared_docs:
                cols.append("doclen_stop")
            base.select(*cols, "_pid", "_tbytes").write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/docs")
            write_walls["docs_write_default"] = round(time.monotonic() - t, 2)

        def _write_docs_stop():
            t = time.monotonic()
            base.select(
                "doc_id", "url", "text", *lang_cols,
                F.col("doclen_stop").alias("doclen"), "_pid", "_tbytes",
            ).write.mode("overwrite").parquet(f"{out_dir_stop}/docs")
            write_walls["docs_write_stopword"] = round(time.monotonic() - t, 2)

        with ThreadPoolExecutor(2) as pool:
            writes = [pool.submit(_write_docs_default)]
            if not shared_docs:
                writes.append(pool.submit(_write_docs_stop))
            for f in writes:
                f.result()
        write_walls["docs_write_combined"] = round(time.monotonic() - t_d0, 2)
        docs_wall = time.monotonic() - t_start
        if docids_cache is not None:
            docids_cache.unpersist()
        docs_r = spark.read.parquet(f"{out_dir}/docs")
        if shared_docs:
            docs_r_stop = (
                docs_r.drop("doclen")
                .withColumnRenamed("doclen_stop", "doclen")
            )
            docs_r = docs_r.drop("doclen_stop")
        else:
            docs_r_stop = spark.read.parquet(f"{out_dir_stop}/docs")

        with ThreadPoolExecutor(2) as pool:
            fa = pool.submit(
                _docs_lineage, spark, docs_r, base_doc_id, docids_expected,
                docs_wall,
            )
            fb = pool.submit(
                _docs_lineage, spark, docs_r_stop, base_doc_id,
                docids_expected, docs_wall,
            )
            lin_a, n_docs_total, total_tokens, avgdl = fa.result()
            lin_b, _, total_tokens_stop, avgdl_stop = fb.result()

        tok_udf, tf_udf, _, tfpos_udf = ANALYZERS["default"]

        # ---- shared head-term detection (same sampling as build_index; the
        # stop terms it finds simply have no variant-1 postings) -------------
        if salt_df_threshold >= n_docs_total:
            head_terms = []
        else:
            frac = min(1.0, max(0.02, 2_000_000.0 / max(total_tokens, 1)))
            scaled = salt_df_threshold * frac * 0.5
            head_terms = [
                r["term"]
                for r in docs_r.sample(fraction=frac, seed=7)
                .select(F.explode(tok_udf(F.col("text"))).alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("cf"))
                .filter(F.col("cf") > scaled)
                .collect()
            ]

        # ---- ONE tf stream for both variants: the dual tokenizer UDF emits
        # the stopword doclen next to the tf entries (one tokenize; a
        # Catalyst higher-order aggregate over the tf array was tried and
        # measured ~13 s of interpreted eval per 20k docs) — doclen_stop then
        # rides the exchange as one extra int --------------------------------
        from ..textprep import tokenize_tf_dual, tokenize_tf_pos_dual

        u = tokenize_tf_pos_dual if store_positions else tokenize_tf_dual
        step = docs_r.select(
            "doc_id",
            F.col("doclen").cast("int").alias("doclen"),
            u(F.col("text")).alias("_p"),
        )
        mid = step.select(
            "doc_id", "doclen",
            F.col("_p.dl_stop").alias("doclen_stop"),
            F.explode("_p.entries").alias("e"),
        )
        out_cols = [
            "doc_id", "doclen", "doclen_stop",
            F.col("e.term").alias("term"), F.col("e.tf").alias("tf"),
        ]
        if store_positions:
            out_cols.append(F.col("e.positions").alias("positions"))
        exploded = mid.select(*out_cols)

        salt_expr = (F.col("doc_id") / F.lit(salt_range)).cast("int")
        carry_salt = bool(head_terms) and len(head_terms) > 4096
        if not head_terms:
            part_cols = [F.col("term")]
        elif not carry_salt:
            part_cols = [
                F.col("term"),
                F.when(F.col("term").isin(head_terms), salt_expr).otherwise(
                    F.lit(0)
                ),
            ]
        else:
            head_df = spark.createDataFrame(
                [(t,) for t in head_terms], "term string"
            ).withColumn("_is_head", F.lit(True))
            exploded = (
                exploded.join(F.broadcast(head_df), "term", "left")
                .withColumn(
                    "salt",
                    F.when(F.col("_is_head"), salt_expr).otherwise(F.lit(0)),
                )
                .drop("_is_head")
            )
            part_cols = [F.col("term"), F.col("salt")]

        builder = _make_block_builder(
            avgdl, num_buckets, block_size,
            head_terms=None if carry_salt else head_terms,
            salt_range=salt_range,
            dual=(avgdl_stop, STOPWORDS),
        )
        sort_cols = (
            ["term", "salt", "doc_id"] if carry_salt else ["term", "doc_id"]
        )
        blocks = (
            exploded.repartition(*part_cols)
            .sortWithinPartitions(*sort_cols)
            .mapInArrow(builder, POSTINGS_SCHEMA_DUAL)
        )
        tmp_post = f"{out_dir}/_dual_postings.tmp"
        t_b0 = time.monotonic()
        blocks.write.mode("overwrite").partitionBy("variant", "bucket").parquet(
            tmp_post
        )
        t_b1 = time.monotonic()
        for vdir, dest in (
            (f"{tmp_post}/variant=0", f"{out_dir}/postings"),
            (f"{tmp_post}/variant=1", f"{out_dir_stop}/postings"),
        ):
            if os.path.exists(dest):
                shutil.rmtree(dest)
            if os.path.isdir(vdir):
                os.replace(vdir, dest)
            else:
                # degenerate corpus (e.g. all-stopword): standard empty table
                spark.createDataFrame([], POSTINGS_SCHEMA).write.mode(
                    "overwrite"
                ).parquet(dest)
        shutil.rmtree(tmp_post, ignore_errors=True)

        common = dict(
            base_doc_id=base_doc_id, num_buckets=num_buckets,
            block_size=block_size, salt_df_threshold=salt_df_threshold,
            salt_range=salt_range, n_head_terms=len(head_terms),
            n_quarantined=n_quarantined, store_positions=store_positions,
            t_start=t_start, docs_wall=docs_wall, n_docs_total=n_docs_total,
        )
        with ThreadPoolExecutor(2) as pool:
            fa = pool.submit(
                _finalize_segment, spark, out_dir, docs_lineage=lin_a,
                avgdl=avgdl, total_tokens=total_tokens, analyzer="default",
                **common,
            )
            stop_extra = None
            if shared_docs:
                stop_extra = {
                    "docs_ref": os.path.join(
                        os.path.relpath(out_dir, out_dir_stop), "docs"
                    ),
                    "docs_doclen_col": "doclen_stop",
                }
            fb = pool.submit(
                _finalize_segment, spark, out_dir_stop, docs_lineage=lin_b,
                avgdl=avgdl_stop, total_tokens=total_tokens_stop,
                analyzer="stopword", extra_manifest=stop_extra, **common,
            )
            man_a, man_b = fa.result(), fb.result()
        # stage walls for the shared pipeline (diagnosis + bench evidence)
        man_a["dual_stage_walls_s"] = man_b["dual_stage_walls_s"] = {
            **write_walls,
            "postings_dual": round(t_b1 - t_b0, 2),
        }
        return man_a, man_b
    finally:
        # idempotent (unpersist on a released DataFrame is a no-op):
        # guarantees no full-corpus cache outlives a failed build —
        # streaming/ingest call this per micro-batch in one session
        for _c in (docids_cache, ext_cache):
            if _c is not None:
                _c.unpersist()


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    num_buckets: int = 16,
    block_size: int = BLOCK_SIZE,
    salt_df_threshold: int = 100_000,
    salt_range: int = 1 << 16,
    num_partitions: int | None = None,
    base_doc_id: int = 0,
    verify_extraction: bool | float = False,
    analyzer: str = "default",
    store_positions: bool = False,
) -> dict:
    """Build one index segment under ``out_dir``. Returns manifest dict.

    Layout: docs/ postings/ (partitioned by bucket) dictionary/ stats/
    lineage/ _manifest.json. Commit is atomic at the manifest write: readers
    (query side, merge) treat a segment without _manifest.json as absent.
    """
    t_start = time.monotonic()
    os.makedirs(out_dir, exist_ok=True)

    pages, n_quarantined, ext_cache = _quarantine_pages(
        spark, pages, out_dir, verify=verify_extraction
    )
    docids_cache = None
    try:

        docs = build_docs(
            pages, num_partitions=num_partitions, base_doc_id=base_doc_id,
            verify_extraction=verify_extraction, analyzer=analyzer,
        )
        # capture the build_docs side-band state NOW: any transformation below
        # (e.g. the verify-path .drop("_ext")) returns a fresh DataFrame that
        # silently discards monkey-patched attributes, which previously leaked
        # the range-shuffle cache and skipped the offset-count invariant leg
        # whenever verify_extraction=True
        docids_cache = getattr(docs, "_docids_cache", None)
        docids_expected = getattr(docs, "_docids_expected", None)
        # assign_doc_ids' own persist is fully materialized (its offsets
        # collect ran inside build_docs), so the extraction cache is dead
        # weight from here: release it NOW rather than hold two cached
        # copies of the corpus text through the docs write
        if ext_cache is not None:
            ext_cache.unpersist()
        tok_udf, tf_udf, _, tfpos_udf = ANALYZERS[analyzer]

        if "_ext" in docs.columns:
            n_bad = docs.filter(F.col("_ext") != F.col("text")).count()
            if n_bad:
                raise ValueError(
                    f"extract_text(html) != text for {n_bad} rows — "
                    "byte-identity invariant violated"
                )
            docs = docs.drop("_ext")

        # ---- docs table write (pass 1: ids + tokenize-for-doclen + write).
        # No .persist(): the docs parquet IS the materialization — later stages
        # re-read the compact columnar file instead of a token-array cache.
        # _tbytes (text length) is persisted as a 4-byte column so the lineage
        # aggregation below reads ONLY narrow columns — computing
        # sum(length(text)) at lineage time would decompress the whole text
        # column a second time (measured as a full extra scan of the corpus)
        docs.select(
            "doc_id", "url", "text",
            *(["lang"] if "lang" in docs.columns else []), "doclen", "_pid",
            F.length("text").alias("_tbytes"),
        ).write.mode("overwrite").parquet(f"{out_dir}/docs")
        docs_wall = time.monotonic() - t_start
        # ids are materialized in the parquet — release the range-shuffle cache
        # that pinned the docID/offset correspondence (leak fix: a long-lived
        # session building many segments would otherwise accumulate these)
        if docids_cache is not None:
            docids_cache.unpersist()
        docs_r = spark.read.parquet(f"{out_dir}/docs")

        docs_lineage, n_docs_total, total_tokens, avgdl = _docs_lineage(
            spark, docs_r, base_doc_id, docids_expected, docs_wall
        )

        # ---- tf stream: re-tokenize from the written docs table with
        # DOC-LOCAL tf aggregation (tokenize_tf) → explode one row per distinct
        # (doc, term) — 2-3× less shuffle volume than raw token occurrences.
        # doclen rides along (functionally dependent on doc_id) to avoid a
        # docs-side join when computing block-max norms. NO tf groupBy shuffle:
        # residual reduction happens inside the term-partitioned sort below, so
        # the whole posting path is ONE exchange of the stream.
        # doclen rides as int (doc lengths are << 2^31): the exchange below
        # streams the whole token table — narrower rows = less memory-bus and
        # shuffle traffic, which profiling shows is this stage's ceiling
        dl_int = F.col("doclen").cast("int").alias("doclen")
        if store_positions:
            exploded = docs_r.select(
                "doc_id", dl_int, F.explode(tfpos_udf(F.col("text"))).alias("e")
            ).select(
                "doc_id", "doclen", F.col("e.term").alias("term"),
                F.col("e.tf").alias("tf"), F.col("e.positions").alias("positions"),
            )
        else:
            exploded = docs_r.select(
                "doc_id", dl_int, F.explode(tf_udf(F.col("text"))).alias("e")
            ).select(
                "doc_id", "doclen", F.col("e.term").alias("term"),
                F.col("e.tf").alias("tf"),
            )

        # ---- head-term salting (contiguous doc ranges) ---------------------
        # Skip the detection pass when the threshold can't be exceeded
        # (df <= cf and cf <= total tokens; cheap guard: threshold >= n_docs
        # means no term's df can cross it). When active, the collection
        # frequency cf is used as the (cheaper, upper-bounding) proxy for df —
        # salting a few extra near-head terms is harmless, missing one is not
        # possible since cf >= df.
        if salt_df_threshold >= n_docs_total:
            head_terms = []
        else:
            # detect head terms on a SAMPLE — a full-corpus cf pass would cost
            # an entire extra tokenize+agg job (event-log profiling: ~20% of
            # the build). Sampling with a 0.5 safety margin over-salts a few
            # near-head terms (harmless) and cannot miss a true head term in
            # expectation; exactness is not required, only skew protection.
            #
            # (A whole-partition _pid-isin sample was tried here to get parquet
            # file pruning — it concentrated the tokenize into k tasks and ran
            # 13× SLOWER than the spread row sample; the row sample keeps all
            # partitions' parallelism and measures ~2 s at 240k docs.)
            frac = min(1.0, max(0.02, 2_000_000.0 / max(total_tokens, 1)))
            scaled = salt_df_threshold * frac * 0.5
            head_terms = [
                r["term"]
                for r in docs_r.sample(fraction=frac, seed=7)
                .select(F.explode(tok_udf(F.col("text"))).alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("cf"))
                .filter(F.col("cf") > scaled)
                .collect()
            ]
        # ---- the ONE big shuffle: hash-partition the token stream by
        # (term, salt), sort within partitions by (term, doc_id), then
        # stream-build tf runs + blocks (many groups per Python call).
        #
        # salt is NOT carried as a row column: it is fully derived from
        # (term ∈ head set, doc_id // salt_range), so it rides the PARTITIONING
        # EXPRESSION only and the builder recomputes it per batch with an
        # Arrow is_in kernel. That keeps the sorted row one 8-byte slot
        # narrower through the exchange + sort — the memory-bandwidth-bound
        # stage (BENCH/BASELINE.md §2) — and sorting by (term, doc_id) is
        # order-identical to (term, salt, doc_id) because salt is monotonic in
        # doc_id within a term. Above 4096 head terms the literal isin would
        # bloat the plan; the head set is then shipped via a broadcast variable
        # lookup inside the partition expression fallback (carry column path).
        #
        # (Partition sizing note: an explicit cache-sized partition count for
        # this exchange was measured at 240k docs — 8 MB targets ran 1.8×
        # SLOWER than the pinned shuffle-partition default; per-task fixed
        # costs (Python stream setup, per-bucket parquet files) dominate any
        # LLC-residency gain here, so the exchange keeps the session default.)
        salt_expr = (F.col("doc_id") / F.lit(salt_range)).cast("int")
        carry_salt = bool(head_terms) and len(head_terms) > 4096
        if not head_terms:
            part_cols = [F.col("term")]
        elif not carry_salt:
            part_cols = [
                F.col("term"),
                F.when(F.col("term").isin(head_terms), salt_expr).otherwise(
                    F.lit(0)
                ),
            ]
        else:
            # degenerate many-head fallback: broadcast-join the head set and
            # carry the salt column (wide rows, but the case implies a
            # pathological salt_df_threshold)
            head_df = spark.createDataFrame(
                [(t,) for t in head_terms], "term string"
            ).withColumn("_is_head", F.lit(True))
            exploded = (
                exploded.join(F.broadcast(head_df), "term", "left")
                .withColumn(
                    "salt",
                    F.when(F.col("_is_head"), salt_expr).otherwise(F.lit(0)),
                )
                .drop("_is_head")
            )
            part_cols = [F.col("term"), F.col("salt")]

        builder = _make_block_builder(
            avgdl, num_buckets, block_size,
            head_terms=None if carry_salt else head_terms,
            salt_range=salt_range,
        )
        sort_cols = (
            ["term", "salt", "doc_id"] if carry_salt else ["term", "doc_id"]
        )
        blocks = (
            exploded.repartition(*part_cols)
            .sortWithinPartitions(*sort_cols)
            .mapInArrow(builder, POSTINGS_SCHEMA)
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(
            f"{out_dir}/postings"
        )
        return _finalize_segment(
            spark, out_dir, docs_lineage=docs_lineage,
            n_docs_total=n_docs_total, avgdl=avgdl, total_tokens=total_tokens,
            base_doc_id=base_doc_id, analyzer=analyzer, num_buckets=num_buckets,
            block_size=block_size, salt_df_threshold=salt_df_threshold,
            salt_range=salt_range, n_head_terms=len(head_terms),
            n_quarantined=n_quarantined, store_positions=store_positions,
            t_start=t_start, docs_wall=docs_wall,
        )
    finally:
        # idempotent (unpersist on a released DataFrame is a no-op):
        # guarantees no full-corpus cache outlives a failed build —
        # streaming/ingest call this per micro-batch in one session
        for _c in (docids_cache, ext_cache):
            if _c is not None:
                _c.unpersist()


def _finalize_segment(
    spark: SparkSession,
    out_dir: str,
    *,
    docs_lineage: DataFrame,
    n_docs_total: int,
    avgdl: float,
    total_tokens: int,
    base_doc_id: int,
    analyzer: str,
    num_buckets: int,
    block_size: int,
    salt_df_threshold: int,
    salt_range: int,
    n_head_terms: int,
    n_quarantined: int,
    store_positions: bool,
    t_start: float,
    docs_wall: float,
    extra_manifest: dict | None = None,
) -> dict:
    """Dictionary + lineage + stats + atomic manifest from a segment's
    written postings. Shared by the single-analyzer build and each side
    of the dual build.

    Both aggregations read ONLY narrow columns (v3: lineage bytes come
    from the per-block ``payload_bytes`` int, not ``F.length`` over the
    binary columns — the latter decompressed the whole postings payload a
    second time, a full extra scan). The three writes are independent
    jobs submitted from threads so their fixed job-launch costs overlap
    instead of serializing — part of the per-build constant F that caps
    strong-scaling efficiency (BENCH/BASELINE.md §2)."""
    from concurrent.futures import ThreadPoolExecutor

    blocks_r = spark.read.parquet(f"{out_dir}/postings")

    def _write_dictionary():
        # term-RANGE partitioned + term-sorted files: every dictionary
        # file covers a narrow contiguous term range, so parquet min/max
        # stats prune BOTH lookup shapes — term-equality (the query path's
        # filter_terms isin) and prefix queries (expand_prefix's
        # startswith, Spark's StringStartsWith pushdown) — to the 1-2
        # files that can contain the terms. A hash layout spreads the
        # alphabet across every file and makes prefix expansion a full
        # dictionary scan (at 10^12 docs the dictionary itself is big).
        # The bucket column keeps its per-row stats for the bucket.isin
        # prune; readers are layout-agnostic (schema unchanged).
        # repartitionByRange runs a separate range-bounds SAMPLING job
        # whose child plan would re-execute the groupBy (a second full
        # postings scan per segment — the dual build runs two finalizes
        # concurrently on saturated cores, so it pays this worst).
        # Persist the aggregated rows once; both the sampling job and the
        # write read the cache. The dictionary is (term, bucket) rows —
        # tiny next to postings — and spills to disk if not.
        from pyspark import StorageLevel

        dic = blocks_r.groupBy("term", "bucket").agg(
            F.sum("n_docs").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.count("*").alias("n_blocks"),
            F.max("block_max_tf_norm").alias("max_tf_norm"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            dic.repartitionByRange(F.col("term")).sortWithinPartitions(
                "term"
            ).write.mode("overwrite").parquet(f"{out_dir}/dictionary")
        finally:
            dic.unpersist()

    def _write_lineage():
        post_lineage = blocks_r.groupBy(
            F.col("bucket").alias("partition_id")
        ).agg(
            F.min("first_doc_id").alias("doc_lo"),
            F.max("last_doc_id").alias("doc_hi"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_tf").alias("token_count"),
            F.sum("payload_bytes").alias("bytes"),
            (F.sum("build_us") / 1000.0).alias("wall_ms"),
        ).withColumn("stage", F.lit("postings"))
        lineage_cols = ["stage", "partition_id", "doc_lo", "doc_hi",
                        "n_docs", "token_count", "bytes", "wall_ms"]
        docs_lineage.select(*lineage_cols).unionByName(
            post_lineage.select(*lineage_cols)
        ).write.mode("overwrite").parquet(f"{out_dir}/lineage")

    def _write_stats():
        spark.createDataFrame(
            [(int(n_docs_total), float(avgdl), int(total_tokens))],
            T.StructType(
                [
                    T.StructField("n_docs", T.LongType(), False),
                    T.StructField("avgdl", T.DoubleType(), False),
                    T.StructField("total_tokens", T.LongType(), False),
                ]
            ),
        ).write.mode("overwrite").parquet(f"{out_dir}/stats")

    with ThreadPoolExecutor(3) as pool:
        for f in [
            pool.submit(_write_dictionary),
            pool.submit(_write_lineage),
            pool.submit(_write_stats),
        ]:
            f.result()


    manifest = {
        "format_version": FORMAT_VERSION,
        "analyzer": analyzer,
        "tokenizer": TOKENIZER_VERSION,
        "extractor": EXTRACTOR_VERSION,
        "num_buckets": num_buckets,
        "block_size": block_size,
        "n_docs": int(n_docs_total),
        "doc_id_base": base_doc_id,
        "doc_id_hi": base_doc_id + int(n_docs_total) - 1,
        "avgdl": avgdl,
        "salt_df_threshold": salt_df_threshold,
        "salt_range": salt_range,
        "head_terms_salted": n_head_terms,
        "quarantined": int(n_quarantined),
        "positions": bool(store_positions),
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "docs_stage_wall_s": round(docs_wall, 3),
        **(extra_manifest or {}),
    }
    tmp = f"{out_dir}/_manifest.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, f"{out_dir}/_manifest.json")
    return manifest


def read_docs(spark: SparkSession, index_dir: str, man: dict | None = None):
    """The segment's docs table, resolving the shared-docs manifest pointer.

    A ``build_index_dual(shared_docs=True)`` stopword segment stores no
    docs parquet of its own: its manifest carries ``docs_ref`` (a relative
    path to the sibling default segment's docs, which holds BOTH doclen
    columns) and ``docs_doclen_col`` (which column is this variant's
    doclen). Every docs consumer (query url join, brute scorer,
    tombstoning, merge) goes through here so both layouts read
    identically: (doc_id, url, text, …, doclen)."""
    man = man if man is not None else read_manifest(index_dir)
    ref = man.get("docs_ref")
    path = (
        os.path.normpath(os.path.join(index_dir, ref))
        if ref
        else f"{index_dir}/docs"
    )
    df = spark.read.parquet(path)
    col = man.get("docs_doclen_col", "doclen")
    if col != "doclen":
        df = df.drop("doclen").withColumnRenamed(col, "doclen")
    return df


def read_manifest(index_dir: str) -> dict:
    with open(f"{index_dir}/_manifest.json") as fh:
        man = json.load(fh)
    ver = man.get("format_version", 0)
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"segment {index_dir} has format_version={ver}, this engine "
            f"reads format_version={FORMAT_VERSION} — rebuild the segment "
            "(v2 added required positions/pos_counts postings columns; "
            "v3 added the payload_bytes size column)"
        )
    return man
