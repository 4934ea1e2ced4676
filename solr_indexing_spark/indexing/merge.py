"""M5 — hierarchical, resumable segment merge.

The reference's incremental path is ``CaseLawsPartialIndex``
(solrIndexCreation.ts:2957-3192) — re-index only what changed; Solr owns
segment merging. Here merging is ours: independently built segments (disjoint
contiguous docID ranges via ``base_doc_id``) are merged pairwise/leveled into
one, resumable from the last committed level (north_rule: "resumable from
checkpoint").

Correctness subtlety: ``block_max_tf_norm`` depends on the corpus ``avgdl``,
which changes when corpora merge. Blocks carry (tf, doclen) per posting, so
the merge re-derives block maxes under the merged avgdl — merged segments
score identically to a from-scratch build over the union.

Skew: re-blocking groups by (term, doc-range shard), not term alone — a head
term's multi-billion-posting list never lands on one reducer. Within a term,
blocks are doc-range disjoint (disjoint segment ranges), so per-shard
re-blocked output concatenates into a globally sorted posting list.

Commit protocol (no Iceberg jars in this sandbox — SURVEY.md §7.6): each merge
output is a normal segment directory whose ``_manifest.json`` is written last
via atomic rename; ``_state.json`` under the merge root records completed
outputs per level. Re-running skips any output with a committed manifest —
idempotent resume at merge-output granularity.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import BLOCK_SIZE

from .. import TOMBSTONE_BROADCAST_THRESHOLD
from ..codec import delta_decode, vbyte_decode, vbyte_encode
from .build import (
    FORMAT_VERSION,
    POSTINGS_SCHEMA,
    read_docs,
    read_manifest,
    tf_norm,
    _term_bucket_py,
)


def _make_group_reblocker(
    avgdl: float,
    num_buckets: int,
    block_size: int,
    has_pos: bool = False,
):
    """Shared per-(term, shard)-group re-block kernel — decode the group's
    blocks, merge-sort postings by doc_id, drop dead ids, re-encode at
    ``block_size``. Used by both the closure-dead mapInPandas path and the
    cogrouped large-churn path.

    ``has_pos`` comes from the segment MANIFESTS (merge_segments rejects
    mixed positional/non-positional inputs up front) — sniffing it per
    (term, shard) group would mis-handle a group whose blocks happen to
    carry empty position blobs."""

    def reblock_group(
        term: str, shard: int, grows: list, dead_arr, t0: int
    ) -> list[tuple]:
        """grows: list of (first_doc_id, n_docs, doc_gaps, tfs, doclens,
        positions, pos_counts) block tuples of ONE (term, shard) group."""
        ids_l, tfs_l, dls_l, pos_l = [], [], [], []
        for first, nd, gaps, tfb, dlb, posb, cntb in grows:
            ids_l.append(delta_decode(first, gaps, nd))
            tfs_l.append(vbyte_decode(tfb))
            dls_l.append(vbyte_decode(dlb))
            if has_pos:
                cnts = vbyte_decode(cntb).astype(np.int64)
                flat = vbyte_decode(posb).astype(np.int64)
                # undo in-posting delta: cumsum with resets at posting starts
                if len(flat):
                    c = np.cumsum(flat)
                    starts = np.cumsum(cnts) - cnts
                    base = c[starts] - flat[starts]
                    flat = c - np.repeat(base, cnts)
                pos_l.extend(np.split(flat, np.cumsum(cnts)[:-1]))
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l).astype(np.int64)
        dls = np.concatenate(dls_l).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order].astype(np.int64), tfs[order], dls[order]
        if has_pos:
            pos_arr = np.empty(len(pos_l), dtype=object)
            pos_arr[:] = pos_l
            pos_arr = pos_arr[order]
        if dead_arr is not None and len(dead_arr):
            pos = np.searchsorted(dead_arr, ids)
            pos[pos >= len(dead_arr)] = len(dead_arr) - 1
            alive = dead_arr[pos] != ids
            ids, tfs, dls = ids[alive], tfs[alive], dls[alive]
            if has_pos:
                pos_arr = pos_arr[alive]
            if not len(ids):
                return []
        norms = tf_norm(tfs, dls.astype(np.float64), avgdl)
        bucket = _term_bucket_py(term, num_buckets)
        rows = []
        base_block = shard << 20
        for b, lo in enumerate(range(0, len(ids), block_size)):
            hi = min(lo + block_size, len(ids))
            blk = ids[lo:hi]
            if has_pos:
                blk_pos = pos_arr[lo:hi]
                cnts = np.fromiter(
                    (len(p) for p in blk_pos), dtype=np.int64, count=hi - lo
                )
                flat = (
                    np.concatenate(list(blk_pos))
                    if cnts.sum()
                    else np.empty(0, dtype=np.int64)
                )
                if len(flat):
                    deltas = np.empty_like(flat)
                    deltas[0] = flat[0]
                    deltas[1:] = flat[1:] - flat[:-1]
                    pstarts = np.cumsum(cnts) - cnts
                    nz = pstarts[cnts > 0]
                    deltas[nz] = flat[nz]
                else:
                    deltas = flat
                pos_bytes = vbyte_encode(deltas.astype(np.uint64))
                cnt_bytes = vbyte_encode(cnts.astype(np.uint64))
            else:
                pos_bytes, cnt_bytes = b"", b""
            gaps_bytes = vbyte_encode(np.diff(blk).astype(np.uint64))
            tfs_bytes = vbyte_encode(tfs[lo:hi].astype(np.uint64))
            dls_bytes = vbyte_encode(dls[lo:hi].astype(np.uint64))
            rows.append(
                (
                    term,
                    bucket,
                    base_block + b,
                    int(blk[0]),
                    int(blk[-1]),
                    int(hi - lo),
                    gaps_bytes,
                    tfs_bytes,
                    dls_bytes,
                    float(norms[lo:hi].max()),
                    int(tfs[lo:hi].sum()),
                    (time.monotonic_ns() - t0) // 1000,
                    pos_bytes,
                    cnt_bytes,
                    len(gaps_bytes) + len(tfs_bytes) + len(dls_bytes),
                )
            )
        return rows

    return reblock_group


def _make_reblocker(
    avgdl: float,
    num_buckets: int,
    block_size: int,
    dead_ids: np.ndarray | None = None,
    has_pos: bool = False,
):
    """Streaming (mapInPandas) re-blocker over a partition hash-partitioned
    by (term, merge_shard) and sorted by (term, merge_shard, first_doc_id).

    Same rationale as the build's block builder: one group per distinct
    term — millions of tiny groups at corpus scale — so per-GROUP
    applyInPandas overhead would dominate; here each Python call walks all
    groups of an Arrow batch, and a group straddling batches is carried
    over in a list flushed once per flush (O(rows), never O(batches²)).

    ``dead_ids``: sorted tombstoned doc_ids riding the task closure —
    their postings are dropped during re-blocking, which is how a merge
    compacts deletes away (Lucene-style: tombstones live only until the
    next merge). Bounded by ``TOMBSTONE_BROADCAST_THRESHOLD``: above it
    merge_segments routes through the cogrouped path
    (:func:`_make_cogroup_reblocker`) and the dead set never reaches the
    driver at all."""

    cols = [f.name for f in POSTINGS_SCHEMA.fields]
    reblock_group = _make_group_reblocker(
        avgdl, num_buckets, block_size, has_pos=has_pos
    )

    def reblock_many(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic_ns()
        dead_arr = dead_ids
        terms = pdf["term"].to_numpy()
        shards = pdf["merge_shard"].to_numpy().astype(np.int64)
        n = len(pdf)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
        gstarts = np.flatnonzero(change)
        gends = np.append(gstarts[1:], n)
        firsts = pdf["first_doc_id"].to_numpy()
        nds = pdf["n_docs"].to_numpy()
        gaps_c = pdf["doc_gaps"].to_numpy()
        tfs_c = pdf["tfs"].to_numpy()
        dls_c = pdf["doclens"].to_numpy()
        pos_c = pdf["positions"].to_numpy()
        cnt_c = pdf["pos_counts"].to_numpy()
        rows: list[tuple] = []
        for s, e in zip(gstarts, gends):
            grows = [
                (
                    int(firsts[i]), int(nds[i]), bytes(gaps_c[i]),
                    bytes(tfs_c[i]), bytes(dls_c[i]), bytes(pos_c[i]),
                    bytes(cnt_c[i]),
                )
                for i in range(s, e)
            ]
            rows.extend(
                reblock_group(terms[s], int(shards[s]), grows, dead_arr, t0)
            )
        return pd.DataFrame(rows, columns=cols)

    def stream(batches):
        pending: list[pd.DataFrame] = []
        for pdf in batches:
            if not len(pdf):
                continue
            last_term = pdf["term"].iloc[-1]
            last_shard = pdf["merge_shard"].iloc[-1]
            tail = (pdf["term"] == last_term) & (pdf["merge_shard"] == last_shard)
            not_tail = np.flatnonzero(~tail.to_numpy())
            split = int(not_tail[-1]) + 1 if len(not_tail) else 0
            if split == 0:
                pending.append(pdf)
                continue
            head, tail_df = pdf.iloc[:split], pdf.iloc[split:]
            if pending:
                head = pd.concat(pending + [head], ignore_index=True)
                pending = []
            yield reblock_many(head)
            pending = [tail_df]
        if pending:
            rest = (
                pd.concat(pending, ignore_index=True)
                if len(pending) > 1
                else pending[0]
            )
            if len(rest):
                yield reblock_many(rest)

    return stream


def _make_cogroup_reblocker(
    avgdl: float,
    num_buckets: int,
    block_size: int,
    has_pos: bool = False,
):
    """Large-churn re-blocker: cogrouped applyInPandas keyed on
    (merge_shard, bucket). The tombstone DataFrame is shuffled by the SAME
    key (dead ids replicated across the ``num_buckets`` bucket values), so
    each task receives its own shard+bucket slice of blocks on the left and
    the shard's dead ids on the right — the O(churn) dead set never
    materializes on the driver and never rides a broadcast. Per-task dead
    volume is churn/n_shards; per-task block volume is one doc-range
    shard's postings for one bucket (1/num_buckets of the terms), the same
    bound the build's bucket partitioning already guarantees."""

    cols = [f.name for f in POSTINGS_SCHEMA.fields]
    reblock_group = _make_group_reblocker(
        avgdl, num_buckets, block_size, has_pos=has_pos
    )

    def reblock_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic_ns()
        if not len(left):
            return pd.DataFrame([], columns=cols)
        dead_arr = (
            np.sort(right["doc_id"].to_numpy(np.int64)) if len(right) else None
        )
        left = left.sort_values(["term", "first_doc_id"], kind="stable")
        shard = int(left["merge_shard"].iloc[0])
        rows: list[tuple] = []
        for term, g in left.groupby("term", sort=True):
            grows = [
                (
                    int(r.first_doc_id), int(r.n_docs), bytes(r.doc_gaps),
                    bytes(r.tfs), bytes(r.doclens), bytes(r.positions),
                    bytes(r.pos_counts),
                )
                for r in g.itertuples()
            ]
            rows.extend(reblock_group(term, shard, grows, dead_arr, t0))
        return pd.DataFrame(rows, columns=cols)

    return reblock_cogroup


def merge_segments(
    spark: SparkSession,
    seg_dirs: list[str],
    out_dir: str,
    num_buckets: int | None = None,
    block_size: int | None = None,
    merge_shard_range: int = 1 << 20,
) -> dict:
    """Merge segments (disjoint doc ranges) into one segment at out_dir."""
    t0 = time.monotonic()
    manifests = [read_manifest(d) for d in seg_dirs]
    num_buckets = num_buckets or manifests[0]["num_buckets"]
    block_size = block_size or manifests[0].get("block_size", BLOCK_SIZE)

    # positional and non-positional segments cannot be merged: their blocks
    # decode differently and the output manifest could not honestly claim
    # either. Rejecting up front (manifest flags) beats a downstream
    # pos_l/ids length-mismatch crash deep inside the reblocker.
    pos_flags = {bool(m.get("positions", False)) for m in manifests}
    if len(pos_flags) > 1:
        raise ValueError(
            "cannot merge positional with non-positional segments: "
            + ", ".join(
                f"{os.path.basename(d)}(positions={bool(m.get('positions', False))})"
                for d, m in zip(seg_dirs, manifests)
            )
            + " — rebuild the odd ones out with store_positions matching"
        )
    has_pos = pos_flags.pop()

    os.makedirs(out_dir, exist_ok=True)

    # tombstones of every input: compacted away by this merge
    tomb_dirs = [d for d in seg_dirs if os.path.exists(f"{d}/tombstones")]
    dead_ids: np.ndarray | None = None
    tomb = None
    n_dead = 0
    # per-segment docs via the manifest resolver (a shared-docs dual
    # stopword segment has no docs parquet of its own), canonicalized to
    # the column set every input carries — the merged segment is always
    # self-contained and variant-independent
    frames = [read_docs(spark, d, m) for d, m in zip(seg_dirs, manifests)]
    common = [c for c in frames[0].columns if all(c in f.columns for f in frames)]
    docs = frames[0].select(*common)
    for f in frames[1:]:
        docs = docs.unionByName(f.select(*common))
    if tomb_dirs:
        tomb = (
            spark.read.parquet(*[f"{d}/tombstones" for d in tomb_dirs])
            .select("doc_id")
            .distinct()
        )
        # Dead-id volume is bounded by churn since the last merge. Size is
        # decided by a count() (a scalar) — below the threshold the sorted
        # array rides the task closure; above it the dead set STAYS a
        # DataFrame and the reblock runs cogrouped by (merge_shard, bucket),
        # so the driver never materializes O(churn) rows.
        n_dead = tomb.count()
        if n_dead and n_dead <= TOMBSTONE_BROADCAST_THRESHOLD:
            dead_ids = np.sort(
                np.array([r["doc_id"] for r in tomb.collect()], dtype=np.int64)
            )
        docs = docs.join(tomb, "doc_id", "left_anti")

    # docs: union of disjoint id ranges minus tombstones
    docs.write.mode("overwrite").parquet(f"{out_dir}/docs")
    docs_r = spark.read.parquet(f"{out_dir}/docs")
    st = docs_r.agg(
        F.count("*").alias("n"), F.sum("doclen").alias("tok")
    ).collect()[0]
    n_docs = int(st["n"] or 0)
    total_tokens = int(st["tok"] or 0)
    avgdl = total_tokens / n_docs if n_docs else 1.0

    # each segment's postings root is independently bucket-partitioned —
    # read separately and union (a single multi-root read conflicts on
    # partition discovery)
    def _union(frames):
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    blocks_in = _union([spark.read.parquet(f"{d}/postings") for d in seg_dirs])
    blocks_in = blocks_in.withColumn(
        "merge_shard", (F.col("first_doc_id") / merge_shard_range).cast("long")
    )
    if n_dead > TOMBSTONE_BROADCAST_THRESHOLD:
        # large-churn path: dead ids stay executor-side; replicate each id
        # across the bucket values so the cogroup key matches the blocks'
        dead_rep = tomb.select(
            (F.col("doc_id") / F.lit(merge_shard_range))
            .cast("long")
            .alias("merge_shard"),
            F.explode(
                F.sequence(F.lit(0), F.lit(num_buckets - 1))
            ).alias("bucket"),
            "doc_id",
        )
        merged = (
            blocks_in.groupBy("merge_shard", "bucket")
            .cogroup(dead_rep.groupBy("merge_shard", "bucket"))
            .applyInPandas(
                _make_cogroup_reblocker(
                    avgdl, num_buckets, block_size, has_pos=has_pos
                ),
                POSTINGS_SCHEMA,
            )
        )
    else:
        reblocker = _make_reblocker(
            avgdl, num_buckets, block_size, dead_ids, has_pos=has_pos
        )
        merged = (
            blocks_in.repartition("term", "merge_shard")
            .sortWithinPartitions("term", "merge_shard", "first_doc_id")
            .mapInPandas(reblocker, POSTINGS_SCHEMA)
        )
    merged.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{out_dir}/postings"
    )
    blocks_r = spark.read.parquet(f"{out_dir}/postings")
    # term-range partitioned + sorted, like build's _write_dictionary: a
    # merged segment's dictionary must prune prefix/equality lookups the
    # same way a freshly built one does. Persisted so repartitionByRange's
    # range-bounds sampling job reads the aggregated rows instead of
    # re-running the groupBy (a second full postings scan).
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

    spark.createDataFrame(
        [(int(n_docs), float(avgdl), int(total_tokens))],
        "n_docs long, avgdl double, total_tokens long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/stats")

    # lineage: carry forward inputs' lineage + one merge-stage row per bucket
    lin_in = spark.read.parquet(*[f"{d}/lineage" for d in seg_dirs])
    merge_lin = blocks_r.groupBy(F.col("bucket").alias("partition_id")).agg(
        F.min("first_doc_id").alias("doc_lo"),
        F.max("last_doc_id").alias("doc_hi"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_tf").alias("token_count"),
        # v3: per-block payload_bytes int — no binary-column re-read
        F.sum("payload_bytes").alias("bytes"),
        (F.sum("build_us") / 1000.0).alias("wall_ms"),
    ).withColumn("stage", F.lit("merge"))
    cols = ["stage", "partition_id", "doc_lo", "doc_hi", "n_docs",
            "token_count", "bytes", "wall_ms"]
    lin_in.select(*cols).unionByName(merge_lin.select(*cols)).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineage")

    manifest = {
        "format_version": FORMAT_VERSION,
        "analyzer": manifests[0].get("analyzer", "default"),
        "positions": has_pos,
        "tokenizer": manifests[0]["tokenizer"],
        "extractor": manifests[0]["extractor"],
        "num_buckets": num_buckets,
        "block_size": block_size,
        "n_docs": int(n_docs),
        "doc_id_base": min(m["doc_id_base"] for m in manifests),
        "doc_id_hi": max(m["doc_id_hi"] for m in manifests),
        "avgdl": float(avgdl),
        "merged_from": [os.path.basename(d) for d in seg_dirs],
        "build_wall_s": round(time.monotonic() - t0, 3),
    }
    tmp = f"{out_dir}/_manifest.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, f"{out_dir}/_manifest.json")
    return manifest


def _is_committed(seg_dir: str) -> bool:
    return os.path.exists(f"{seg_dir}/_manifest.json")


def hierarchical_merge(
    spark: SparkSession,
    seg_dirs: list[str],
    out_root: str,
    fanout: int = 2,
    fail_after: int | None = None,
    **merge_kwargs,
) -> str:
    """Leveled merge of many segments into one; resumable.

    ``fail_after`` (tests only): raise after N completed merge outputs to
    simulate a crash; a re-run must resume and produce identical results.
    Returns the final segment directory.
    """
    os.makedirs(out_root, exist_ok=True)
    state_path = f"{out_root}/_state.json"
    state = {"completed": []}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)
    completed = set(state["completed"])
    done = 0

    current = list(seg_dirs)
    level = 0
    while len(current) > 1:
        nxt = []
        for gi in range(0, len(current), fanout):
            group = current[gi : gi + fanout]
            if len(group) == 1:
                nxt.append(group[0])
                continue
            out = f"{out_root}/L{level}_{gi // fanout}"
            if out in completed and _is_committed(out):
                nxt.append(out)
                continue
            if os.path.exists(out) and not _is_committed(out):
                shutil.rmtree(out)  # uncommitted partial output: redo
            merge_segments(spark, group, out, **merge_kwargs)
            completed.add(out)
            state["completed"] = sorted(completed)
            tmp = state_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(state, fh)
            os.replace(tmp, state_path)
            done += 1
            if fail_after is not None and done >= fail_after:
                raise RuntimeError(f"injected failure after {done} merges")
            nxt.append(out)
        current = nxt
        level += 1
    return current[0]
