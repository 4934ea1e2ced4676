"""Suggest/completion serving + prefix (multi-term) BM25 queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.docprep.enrich import suggest_array, suggest_entry
from solr_indexing_spark.indexing.build import build_index
from solr_indexing_spark.query.bmw import expand_prefix, topk, topk_prefix
from solr_indexing_spark.query.completion import (
    build_completion_index,
    complete,
    complete_dir,
    flatten_suggests,
)
from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.synth import gen_pages, write_pandas_pages


def test_flatten_and_complete(spark):
    df = spark.createDataFrame(
        [("Income Tax Act", "Supreme Court"), ("Finance Act", "High Court")],
        "act string, court string",
    ).select(
        suggest_array(
            suggest_entry(F.array(F.col("act")), "act"),
            suggest_entry(F.array(F.col("court")), "court"),
        ).alias("Suggest")
    )
    comp = flatten_suggests(df)
    # inputs are lowercase-normalized at build time (pushdown contract)
    rows = {(r["input"], r["weight"]) for r in comp.collect()}
    assert ("income tax act", 20) in rows and ("supreme court", 12) in rows

    got = complete(comp, "In", k=5).collect()
    assert [r["input"] for r in got] == ["income tax act"]
    assert got[0]["weight"] == 20


def test_completion_index_roundtrip(spark, tmp_path):
    comp = spark.createDataFrame(
        [("alpha", 5), ("alphabet", 20), ("alpine", 8), ("beta", 9),
         ("alpha", 12)],
        "input string, weight int",
    )
    out = str(tmp_path / "comp")
    build_completion_index(comp, out, num_files=2)
    got = [(r["input"], r["weight"]) for r in complete_dir(spark, out, "alp", k=10).collect()]
    # weight desc, input asc; duplicate 'alpha' keeps max weight 12
    assert got == [("alphabet", 20), ("alpha", 12), ("alpine", 8)]
    assert complete_dir(spark, out, "zzz").collect() == []


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pfx")
    pdf = gen_pages(400, seed=11)
    write_pandas_pages(pdf, str(root / "p.parquet"))
    build_index(
        spark, spark.read.parquet(str(root / "p.parquet")), str(root / "idx"),
        num_buckets=4,
    )
    return str(root / "idx"), pdf


def test_expand_prefix(spark, small_index):
    idx, _ = small_index
    terms = expand_prefix(spark, idx, "ta", max_terms=1000)
    assert terms and all(t.startswith("ta") for t in terms)
    # df-descending order
    dict_df = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{idx}/dictionary").collect()
    }
    dfs = [dict_df[t] for t in terms]
    assert dfs == sorted(dfs, reverse=True)
    assert expand_prefix(spark, idx, "zzzznope") == []


def test_topk_prefix_matches_oracle(spark, small_index):
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    terms = expand_prefix(spark, idx, "mek", max_terms=10_000)
    exp = oracle.topk(" ".join(terms), 10)
    got = [
        (r["doc_id"], r["score"])
        for r in topk_prefix(spark, idx, "mek", k=10, max_terms=10_000).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-6


def test_topk_accepts_term_list(spark, small_index):
    idx, pdf = small_index
    oracle = OracleIndex(pdf)
    got = [(r["doc_id"], r["score"]) for r in topk(spark, idx, ["tabel", "rilo"], k=5).collect()]
    exp = oracle.topk("tabel rilo", 5)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_topk_boosted(spark, small_index):
    """Static priors compose on top of BM25 without touching the
    rank-identity path: zero boosts reproduce pure BM25; a large boost on a
    low-ranked candidate promotes it to the top."""
    from pyspark.sql import functions as F

    from solr_indexing_spark.query.bmw import topk_boosted

    idx, pdf = small_index
    base = topk(spark, idx, "tabel rilo", k=10).collect()
    zero = spark.createDataFrame([(0, 0.0)], "doc_id long, boost double")
    same = topk_boosted(spark, idx, "tabel rilo", zero, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in base] == [
        (r["doc_id"], r["score"]) for r in same
    ]

    # promote the 10th-ranked doc above everything
    target = base[-1]["doc_id"]
    boosts = spark.createDataFrame(
        [(target, 100.0)], "doc_id long, boost double"
    )
    boosted = topk_boosted(spark, idx, "tabel rilo", boosts, k=10).collect()
    assert boosted[0]["doc_id"] == target
    assert abs(boosted[0]["score"] - (base[-1]["score"] + 100.0)) < 1e-9


def test_complete_dir_rejects_pre_v2_table(spark, tmp_path):
    # a table without the completion manifest (round-1 layout, mixed-case
    # inputs possible) must fail loudly, not silently return nothing
    import pytest
    out = str(tmp_path / "old_table")
    spark.createDataFrame(
        [("Alpha", 3)], "input string, weight int"
    ).write.parquet(out)
    with pytest.raises(ValueError, match="pre-v2|manifest"):
        complete_dir(spark, out, "al")


def test_complete_returns_original_casing(spark, tmp_path):
    """Inputs match case-insensitively (lowercased stored column keeps the
    Parquet pushdown) but results carry the original spelling — the
    heaviest entry's casing wins per key (Solr suggester behavior)."""
    comp = spark.createDataFrame(
        [("Income Tax Act", 20), ("income tax act", 5), ("Alpine Pass", 8)],
        "input string, weight int",
    )
    out = str(tmp_path / "cased")
    build_completion_index(comp, out, num_files=1)
    got = complete_dir(spark, out, "Inc", k=5).collect()
    assert [(r["input"], r["weight"], r["display"]) for r in got] == [
        ("income tax act", 20, "Income Tax Act")
    ]
    got2 = complete_dir(spark, out, "alp", k=5).collect()
    assert got2[0]["display"] == "Alpine Pass"
    # bare (input, weight) sources keep the two-column shape
    assert "display" not in complete(comp.select("input", "weight"), "alp").columns
