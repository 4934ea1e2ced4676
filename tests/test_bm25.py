"""M1 gate: brute-force DataFrame BM25 rank-identical to the Python oracle."""

from __future__ import annotations

import pytest

from solr_indexing_spark.query.brute import bm25_topk
from solr_indexing_spark.query.oracle import OracleIndex

QUERIES = [
    "ta ri",  # may or may not hit vocab — exercises OOV handling too
    "zanpelmek",
    "belhax galcorsunrex",
    "corvim fulful rivarrexful",
    "salt0000123",
    "café über",
    "ZANPELMEK Belhax",  # case fold
    "nosuchtermatall",
    "",
]


@pytest.fixture(scope="session")
def oracle(pages_pdf):
    return OracleIndex(pages_pdf)


@pytest.fixture(scope="session")
def docs_df(spark, index_dir):
    return spark.read.parquet(f"{index_dir}/docs")


# index_dir fixture lives in test_index_build; import it for reuse
from tests.test_index_build import index_dir  # noqa: E402,F401


@pytest.mark.parametrize("query", QUERIES)
def test_brute_matches_oracle(spark, docs_df, oracle, query):
    want = oracle.topk(query, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(docs_df, query, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch for {query!r}"
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6
