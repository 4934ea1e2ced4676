"""Headline benchmark — one JSON line on stdout for the driver.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Times the engine's headline paths:

- index build over the documents table (docs/sec — the BASELINE.md metric)
- index build over a larger deterministic synthetic pages corpus
  (throughput at meaningful scale; synth.gen_pages, no external data)
- BM25 block-max-WAND top-10 latency p50 over the fixed query set (warm)
- brute-force DataFrame BM25 (the scorer A/B)
- dedup suite (exact, MinHash-LSH verified, SimHash) over documents
- ANN (brute cosine + multiprobe LSH) over embeddings
- text-analysis pipeline (quality + langid + fingerprints)
- TPC-H-ish pricing aggregate over lineitem

Scaling evidence (local[8] vs local[32]) lives in tools/scaling_run.py and
BENCH/BASELINE.md — a Spark local master is fixed per JVM, so the
two-parallelism comparison needs two processes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    synth_n = int(os.environ.get("BENCH_SYNTH_N", "20000"))

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from solr_indexing_spark.docprep.analysis import (
        doc_fingerprint,
        lang_id,
        quality_score,
    )
    from solr_indexing_spark.docprep.dedup import (
        exact_dedup,
        minhash_near_dups,
        simhash,
    )
    from solr_indexing_spark.indexing.build import build_index
    from solr_indexing_spark.query.bmw import QuerySession
    from solr_indexing_spark.session import get_spark
    from solr_indexing_spark.similarity import cosine_topk_by_id, lsh_topk
    from solr_indexing_spark.synth import write_pages_parquet

    spark = get_spark("bench", cores=cpus)
    work = tempfile.mkdtemp(prefix="bench_")
    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    def timed_best2(name: str, fn, repeats: int = 2):
        """Best-of-N for co-tenancy-sensitive build legs: this box's
        wall clock varies ±30-100% under co-tenant load, so a single
        sample can misstate a build by 2-3×. ``fn`` takes a repeat index
        so each repeat writes a distinct output dir (identical plans may
        be served from Spark's result cache — a warm repeat of the same
        sink would time nothing). The synth/stop/dual trio is timed
        separately below with interleaved rounds — see that comment."""
        walls = []
        out = None
        for r in range(repeats):
            t0 = time.monotonic()
            out = fn(r)
            walls.append(time.monotonic() - t0)
        timings[name] = round(min(walls), 3)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_docs = docs.count()

    # --- index build over the sf documents table -------------------------
    pages = docs.select(
        F.format_string("doc://%010d", F.col("doc_id")).alias("url"),
        "text",
        "lang",
    )
    idx = f"{work}/idx_docs"
    timed_best2(
        "q_index_build_docs",
        lambda r: build_index(
            spark, pages, idx if r else f"{work}/idx_docs_r0", num_buckets=8
        ),
    )
    docs_per_sec = round(n_docs / timings["q_index_build_docs"], 1)

    # --- index build over the synthetic pages corpus, plus the
    # single-pass dual-analyzer build (IndexName + IndexNameStopword,
    # solrIndexCreation.ts:877-880): one scan/tokenize/exchange, two
    # segments. The dual leg is compared against the alternative the
    # reference implies — building each analyzer's segment separately
    # (ratio < 1.0 = the shared pass wins; the synth corpus has NO
    # stopwords, so this is the worst case: the stopword variant
    # duplicates every posting).
    #
    # The three legs are timed ROUND-ROBIN (synth, stop, dual) × 3 rounds
    # rather than best-of-N per leg in sequential blocks: this box's
    # co-tenant bursts last tens of seconds, so a block of same-leg
    # repeats can be entirely inside one burst (BENCH_r04 measured the
    # dual build at 59.8 s where interleaved A/B repeats span 19.6-42.5 s
    # — tools/ab_dualbuild.py). Interleaving spreads each leg's samples
    # across the whole window (min per leg), and the headline ratio is
    # taken from the best PAIRED round — dual_r / (synth_r + stop_r)
    # within one round shares the round's load, so drift cancels.
    synth_path = f"{work}/pages_synth.parquet"
    write_pages_parquet(synth_path, synth_n, seed=7)
    synth_pages = spark.read.parquet(synth_path)
    idx2 = f"{work}/idx_synth"
    from solr_indexing_spark.indexing.build import build_index_dual

    def trio_rounds(pages_df, sink_prefix: str, rounds: int = 3, last_single=None):
        """Round-robin [single-default, single-stopword, dual] × rounds.
        Per-leg wall = min across rounds; the dual-vs-two-singles ratio is
        the min over PAIRED rounds (the round's load cancels inside the
        ratio). Distinct sink dirs per round: identical plans may be
        served from Spark's result cache — a warm repeat of the same sink
        would time nothing. ``last_single`` (optional) is the sink for the
        LAST round's default build, so sections that read it get it warm."""
        rws: list[dict[str, float]] = []
        for r in range(rounds):
            single_sink = (
                last_single if (last_single and r == rounds - 1)
                else f"{work}/{sink_prefix}_single_r{r}"
            )
            row: dict[str, float] = {}
            for leg, fn in (
                ("single", lambda: build_index(
                    spark, pages_df, single_sink, num_buckets=16)),
                ("stop", lambda: build_index(
                    spark, pages_df, f"{work}/{sink_prefix}_stop_r{r}",
                    num_buckets=16, analyzer="stopword")),
                ("dual", lambda: build_index_dual(
                    spark, pages_df,
                    f"{work}/{sink_prefix}_dual_a{r}",
                    f"{work}/{sink_prefix}_dual_b{r}",
                    num_buckets=16)),
            ):
                t0 = time.monotonic()
                fn()
                row[leg] = time.monotonic() - t0
            rws.append(row)
        mins = {leg: min(rw[leg] for rw in rws) for leg in ("single", "stop", "dual")}
        ratio = min(rw["dual"] / (rw["single"] + rw["stop"]) for rw in rws)
        return mins, round(ratio, 3)

    mins, dual_vs_two_builds = trio_rounds(synth_pages, "syn", last_single=idx2)
    timings["q_index_build_synth"] = round(mins["single"], 3)
    timings["q_index_build_stop"] = round(mins["stop"], 3)
    timings["q_index_build_dual"] = round(mins["dual"], 3)
    synth_docs_per_sec = round(synth_n / timings["q_index_build_synth"], 1)

    # --- dual build on a stopword-rich corpus (the REALISTIC web-text
    # case: ~40% of running English text is stopwords, so the stopword
    # variant's posting stream is much smaller and the shared pass
    # clearly wins; the zero-stopword synth trio above is the worst
    # case). Same round-robin + paired-ratio discipline — a single round
    # measured anywhere from 0.845 to 1.506 on identical code.
    stopmix_path = f"{work}/pages_stopmix.parquet"
    write_pages_parquet(stopmix_path, synth_n, seed=7, stopword_frac=0.4)
    stopmix_pages = spark.read.parquet(stopmix_path)
    sm_mins, dual_vs_two_builds_stopmix = trio_rounds(stopmix_pages, "sm")
    timings["q_index_build_dual_stopmix"] = round(sm_mins["dual"], 3)

    # --- BM25 query latency (warm p50 over the fixed query set) ----------
    queries = list(entry.FT_QUERIES.values()) + [
        "merge sort shuffle",
        "slow scan filter",
        "customer value",
    ]
    qsess = QuerySession(spark, idx, cache_dictionary=True, cache_postings=True)
    qsess.topk(queries[0], k=10).collect()  # warm caches + codegen
    lat = []
    t0 = time.monotonic()
    for q in queries:
        tq = time.monotonic()
        qsess.topk(q, k=10).collect()
        lat.append(time.monotonic() - tq)
    timings["q_bm25_bmw"] = round(time.monotonic() - t0, 3)
    p50_ms = round(statistics.median(lat) * 1000, 1)

    timed(
        "q_bm25_brute",
        lambda: entry._bm25_brute(spark, sf_dir, entry.FT_QUERY.split(), 10).collect(),
    )

    # --- batched multi-query top-k (query/batch.py): 256 queries in ONE
    # Spark job — the bulk-evaluation path (relevance sets / offline eval /
    # training-data labeling). Throughput headline vs the per-query p50:
    # sequential serving pays a job launch per query; the batch amortizes
    # one postings scan + one (query-group × doc-range-shard) shuffle
    # across the whole set and runs the per-query BMW kernels in parallel
    # across that grid (measured ~2 qps sequential → ~100 qps at n=512).
    bterms = entry.FT_TERMS + [
        "merge", "sort", "shuffle", "slow", "filter", "customer", "line",
        "order",
    ]
    batch_queries = {
        i: (
            f"{bterms[i % 16]} {bterms[(3 * i + 1) % 16]} "
            f"{bterms[(7 * i + 2) % 16]} {bterms[(i // 16) % 16]}"
        )
        for i in range(256)
    }
    qsess.topk_batch({0: queries[0]}, k=10).collect()  # warm the batch plan
    timed(
        "q_bm25_batch",
        lambda: qsess.topk_batch(batch_queries, k=10).collect(),
    )
    batch_qps = round(len(batch_queries) / timings["q_bm25_batch"], 1)

    # --- serving extras (the Solr response surface: fq, facets,
    # highlighting, MLT — round-4 session-3 features). All warm-session /
    # small-result paths; runs BEFORE the chain section tombstones idx.
    allow_en = docs.filter(F.col("lang") == "en").select("doc_id")
    timed(
        "q_bm25_filtered",
        lambda: qsess.topk(entry.FT_QUERY, k=10, allow=allow_en).collect(),
    )
    from solr_indexing_spark.query.facet import facet_counts

    timed(
        "q_facets",
        lambda: facet_counts(spark, idx, entry.FT_QUERY, col="lang").collect(),
    )
    hits10 = qsess.topk(entry.FT_QUERY, k=10)
    timed(
        "q_highlight",
        lambda: qsess.highlight(hits10, entry.FT_QUERY).collect(),
    )
    from solr_indexing_spark.query.mlt import more_like_this

    timed(
        "q_mlt",
        lambda: more_like_this(spark, idx, 3, k=10).collect(),
    )
    from solr_indexing_spark.query.sorting import sorted_topk

    # Solr sort=lang desc + deep page (start=20): match set → stored-field
    # order, TakeOrdered offset+limit
    timed(
        "q_sorted_page",
        lambda: sorted_topk(
            spark, idx, entry.FT_QUERY, sort_cols="lang", k=10, start=20,
            ascending=False,
        ).collect(),
    )

    # --- phrase / prefix / completion ------------------------------------
    idx_pos = f"{work}/idx_pos"
    timed(
        "q_index_build_positional",
        lambda: build_index(
            spark, pages, idx_pos, num_buckets=8, store_positions=True
        ),
    )
    from solr_indexing_spark.query.phrase import phrase_topk

    phrase_topk(spark, idx_pos, "hash join", k=10).collect()  # warm
    t0 = time.monotonic()
    for ph in ["hash join", "query data", "fast scan"]:
        phrase_topk(spark, idx_pos, ph, k=10).collect()
    timings["q_phrase"] = round(time.monotonic() - t0, 3)

    from solr_indexing_spark.query.bmw import (
        topk_fuzzy,
        topk_not,
        topk_prefix,
        topk_wildcard,
    )

    timed("q_prefix", lambda: topk_prefix(spark, idx, "sc", k=10).collect())
    # Solr `spart~2`: typo'd probe rescued by Levenshtein expansion
    # (prefix_len=1 → term-range-file pruned dictionary scan) + OR rewrite
    timed(
        "q_fuzzy",
        lambda: topk_fuzzy(spark, idx, "spart", k=10, max_edits=2).collect(),
    )
    # Solr `s?a*` wildcard and `... -hash` prohibited clause
    timed(
        "q_wildcard",
        lambda: topk_wildcard(spark, idx, "s?a*", k=10).collect(),
    )
    timed(
        "q_not",
        lambda: topk_not(
            spark, idx, "spark query data", "hash", k=10
        ).collect(),
    )

    from solr_indexing_spark.query.group import collapse_topk

    # Solr field collapse: exact full-match scorer → best head per group
    timed(
        "q_collapse",
        lambda: collapse_topk(
            spark, idx, "spark query data", field="lang", k=10
        ).collect(),
    )

    from solr_indexing_spark.query.completion import complete

    comp = docs.select(
        F.col("source").alias("input"), F.lit(20).alias("weight")
    )
    timed("q_completion", lambda: complete(comp, "src1", k=10).collect())

    # --- dedup suite -----------------------------------------------------
    timed("q_exact_dedup", lambda: exact_dedup(docs).count())
    timed("q_minhash_dedup", lambda: minhash_near_dups(docs, threshold=0.5).count())
    timed("q_simhash", lambda: simhash(docs).count())
    # pairs → survivors (connected components + keep flags over the full
    # corpus): the drop list a dedup pipeline ships
    from solr_indexing_spark.docprep.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_survivors,
    )

    timed(
        "q_dedup_survivors",
        lambda: near_dup_survivors(
            docs, lsh_candidate_pairs(minhash_signatures(docs))
        ).count(),
    )

    # --- ANN -------------------------------------------------------------
    timed("q_ann_brute", lambda: cosine_topk_by_id(emb, 0, k=10).collect())
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]]
    timed("q_ann_lsh", lambda: lsh_topk(emb, qvec, k=10).collect())

    # --- text analysis pipeline ------------------------------------------
    timed(
        "q_text_analysis",
        lambda: docs.select(
            "doc_id",
            quality_score("text").alias("q"),
            lang_id("text").alias("lang_pred"),
            doc_fingerprint("text").alias("fp"),
        ).count(),
    )

    # --- TPC-H-ish pricing agg -------------------------------------------
    timed("q_tpch_pricing", lambda: entry._dp_agg_pricing(spark, sf_dir).collect())

    # --- composed per-doctype pipeline (packed row → nested document;
    # the reference's actual deliverable, one narrow select) -------------
    timed(
        "q_doc_assembly",
        lambda: entry._dp_doc_assembly(spark, sf_dir).count(),
    )
    timed(
        "q_finder_assembly",
        lambda: entry._dp_finder_assembly(spark, sf_dir).count(),
    )

    # --- full 13-pipeline batch (the reference's multi-doctype run:
    # every *Index method in one job). Driver-side plan construction is
    # amortized by the analyzed-plan cache (plancache.py) — this is the
    # number that was 13 × ~25 s before round 3.
    qs = entry.queries()
    batch_names = [
        k for k in qs if k.startswith("dp_") and k.endswith("_assembly")
    ]

    def _batch13():
        # concurrent submission (what a real multi-doctype driver does):
        # each pipeline's remaining driver-side cost — the plan-cache
        # splice — overlaps the previous pipelines' JVM execution instead
        # of serializing in front of it. Measured 21.4 s serial → 8.4 s
        # at 4 threads on this box (threads-first ordering, counts
        # identical).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(4) as pool:
            list(
                pool.map(
                    lambda name: qs[name](spark, sf_dir).count(),
                    batch_names,
                )
            )

    timed("q_pipeline_batch13", _batch13)

    # --- pre-merge chain serving (SegmentsSession): a base+delta chain's
    # warm p50 should sit ≈ the single-segment p50 — the session computes
    # the union dead set + tombstone stats once per segment generation,
    # so per-query work is the same pruned BMW job (round-4 item; the
    # round-3 path paid segments × QPS tombstone-stat Spark jobs).
    # Runs LAST among idx consumers: it tombstones 200 docs in idx.
    from solr_indexing_spark.indexing.incremental import (
        SegmentsSession,
        reindex_changed,
    )

    chg = docs.orderBy("doc_id").limit(200).select(
        F.format_string("doc://%010d", F.col("doc_id")).alias("url"),
        F.concat(F.lit("chainupdated "), F.col("text")).alias("text"),
        "lang",
    )
    timed(
        "q_chain_delta_build",
        lambda: reindex_changed(spark, idx, chg, f"{work}/idx_delta"),
    )
    sess = SegmentsSession(spark, [idx, f"{work}/idx_delta"])
    sess.topk(queries[0], k=10).collect()  # warm
    lat_chain = []
    t0 = time.monotonic()
    for q in queries:
        tq = time.monotonic()
        sess.topk(q, k=10).collect()
        lat_chain.append(time.monotonic() - tq)
    timings["q_bm25_chain"] = round(time.monotonic() - t0, 3)
    chain_p50_ms = round(statistics.median(lat_chain) * 1000, 1)
    sess.close()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_docs": n_docs,
                "docs_per_sec_sf_corpus": docs_per_sec,
                "synth_corpus_n": synth_n,
                "docs_per_sec_synth": synth_docs_per_sec,
                "bm25_p50_ms": p50_ms,
                "bm25_chain_p50_ms": chain_p50_ms,
                "bm25_batch_n": len(batch_queries),
                "bm25_batch_qps": batch_qps,
                "dual_build_vs_two_builds_ratio": dual_vs_two_builds,
                "dual_build_vs_two_builds_ratio_stopmix":
                    dual_vs_two_builds_stopmix,
                "pipeline_batch_n": len(batch_names),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.stderr.write("bench: starting\n")
    main()
