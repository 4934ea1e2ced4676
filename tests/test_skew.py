"""M4 gate: head-term salting — results invariant, no hot partition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.indexing.build import build_index, read_manifest
from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.synth import SKEW_TERM, gen_pages, write_pages_parquet


@pytest.fixture(scope="module")
def skew_corpus(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("skew")
    path = str(root / "pages.parquet")
    write_pages_parquet(path, 400, seed=5, skew=True)
    return spark.read.parquet(path), gen_pages(400, seed=5, skew=True), str(root)


def test_salted_build_matches_unsalted(spark, skew_corpus):
    pages, pdf, root = skew_corpus
    # unsalted: threshold above any df; salted: force sharding of head terms
    m_plain = build_index(
        spark, pages, f"{root}/plain", num_buckets=4, salt_df_threshold=10**9
    )
    m_salt = build_index(
        spark, pages, f"{root}/salted", num_buckets=4,
        salt_df_threshold=50, salt_range=64,
    )
    assert m_plain["head_terms_salted"] == 0
    assert m_salt["head_terms_salted"] > 0

    oracle = OracleIndex(pdf)
    assert len(oracle.postings[SKEW_TERM]) >= 0.8 * 400  # fixture sanity

    for q in [SKEW_TERM, f"{SKEW_TERM} zanpelmek", "belhax corvim"]:
        a = [(r["doc_id"], r["score"]) for r in topk(spark, f"{root}/plain", q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in topk(spark, f"{root}/salted", q, k=10).collect()]
        want = oracle.topk(q, k=10)
        assert [d for d, _ in a] == [d for d, _ in b] == [d for d, _ in want], q
        for (_, sa), (_, sb), (_, sw) in zip(a, b, want):
            assert abs(sa - sw) < 1e-6 and abs(sb - sw) < 1e-6

    # skew bound: with salting, no (term,salt) group exceeds salt_range docs →
    # the head term's postings split across shards (per-block group sizes)
    blocks = spark.read.parquet(f"{root}/salted/postings").filter(
        F.col("term") == SKEW_TERM
    )
    per_shard = (
        blocks.withColumn("shard", (F.col("block_id") / (1 << 20)).cast("int"))
        .groupBy("shard")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    )
    assert len(per_shard) > 1, "head term not sharded"
    assert max(r["n"] for r in per_shard) <= 64
