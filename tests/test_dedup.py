"""Dedup operators: exact, Jaccard, MinHash-LSH, SimHash, embedding cosine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.docprep.dedup import (
    cosine,
    embedding_near_dups,
    exact_dedup,
    exact_dup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_dups,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    texts = [
        "the quick brown fox",
        "The  quick BROWN fox!",  # normalizes identically
        "a different document entirely",
        "the quick brown fox",  # exact repeat
    ]
    df = _docs(spark, texts)
    kept = exact_dedup(df).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [0, 2]
    assert kept[0]["dup_count"] == 3
    groups = exact_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 0 and groups[0]["dup_count"] == 3


def test_shingles(spark):
    df = _docs(spark, ["a b c d", "a b", ""])
    rows = df.select(shingles("text", 3).alias("sh")).collect()
    assert sorted(rows[0]["sh"]) == ["a b c", "b c d"]
    assert rows[1]["sh"] == ["a b"]  # short doc → single joined shingle
    assert rows[2]["sh"] == []


def test_jaccard_pairs_exact_value(spark):
    # doc0 shingles {a b c, b c d}; doc1 {a b c, b c x}; doc2 disjoint
    df = _docs(spark, ["a b c d", "a b c x", "p q r s"])
    rows = jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["common"]) == (0, 1, 1)
    assert r["jaccard"] == round(1 / 3, 4)


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    base = [
        " ".join(f"tok{i}{j}" for j in range(60)) for i in range(30)
    ]
    # plant near-dups: docs 30.. are copies of doc i with a small edit
    dups = [base[i].replace(f"tok{i}10", "edited") for i in range(10)]
    return _docs(spark, base + dups)


def test_minhash_lsh_finds_planted_dups(spark, near_dup_corpus):
    verified = minhash_near_dups(near_dup_corpus, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    planted = {(i, 30 + i) for i in range(10)}
    assert planted <= pairs, f"missed {planted - pairs}"
    # verified jaccard must equal exact jaccard on those pairs
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(near_dup_corpus, threshold=0.5).collect()
    }
    assert pairs <= set(exact), "LSH-verified pair not in exact pair set"


def test_lsh_candidates_superset_smoke(spark, near_dup_corpus):
    sigs = minhash_signatures(near_dup_corpus)
    assert sigs.count() == 40
    cands = lsh_candidate_pairs(sigs)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # identical-but-one-token docs agree on nearly all minhashes → banded
    assert {(i, 30 + i) for i in range(10)} <= got


def test_simhash_identical_and_near(spark):
    df = _docs(
        spark,
        [
            " ".join(f"w{i}" for i in range(50)),
            " ".join(f"w{i}" for i in range(50)),  # identical
            " ".join(f"w{i}" for i in range(49)) + " different",
            "completely other content about unrelated things entirely",
        ],
    )
    s = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    assert s[0] == s[1]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(df, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # one-token edit stays within 3 bits of 16


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(emb, 0.95).collect()}
    assert got == {(0, 1)}


def test_cosine_column(spark):
    df = spark.range(1).select(
        cosine(
            F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(2.0), F.lit(4.0))
        ).alias("c")
    )
    assert abs(df.collect()[0]["c"] - 1.0) < 1e-12
